"""k-core peeling vs a pure-python reference, cascade behavior,
partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.kcore import k_core

CFG = DEFAULT_CONFIG.with_(num_partitions=8)


def ref_k_core(edges, k):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return set(adj)


def _run(edges, k, cfg=CFG):
    import ray.data as rd
    tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                    "dst": pa.array([v for _, v in edges], pa.int64())})
    out = k_core(rd.from_arrow(tab), cfg, k).to_pandas()
    return set() if len(out) == 0 else set(out["node"])


class TestKCore:
    def test_triangle_plus_tail(self, ray_session):
        # triangle {1,2,3} is the 2-core; the tail 3-4-5 peels away
        edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
        assert _run(edges, 2) == {1, 2, 3}
        assert _run(edges, 1) == {1, 2, 3, 4, 5}
        assert _run(edges, 3) == set()

    def test_cascade(self, ray_session):
        # long chain hanging off a clique: peeling must cascade the
        # whole chain, one hop per round
        clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        chain = [(3, 10), (10, 11), (11, 12), (12, 13)]
        edges = clique + chain
        assert _run(edges, 2) == {0, 1, 2, 3}
        assert _run(edges, 3) == {0, 1, 2, 3}

    def test_matches_reference_random(self, ray_session):
        rng = np.random.RandomState(17)
        edges = [tuple(sorted((int(a), int(b))))
                 for a, b in rng.randint(0, 60, size=(300, 2)) if a != b]
        for k in (2, 3, 4, 5):
            assert _run(edges, k) == ref_k_core(edges, k), k

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(23)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 80, size=(400, 2))]
        a = _run(edges, 3, CFG)
        b = _run(edges, 3, DEFAULT_CONFIG.with_(num_partitions=17))
        assert a == b

    def test_self_loops_and_dupes_ignored(self, ray_session):
        edges = [(1, 2), (2, 3), (3, 1), (1, 1), (2, 2), (1, 2), (2, 1)]
        assert _run(edges, 2) == {1, 2, 3}


def test_non_convergence_warns(ray_session):
    """max_rounds too small → RuntimeWarning, superset returned."""
    import warnings
    edges = [(i, i + 1) for i in range(60)]   # long path, k=2 peels ends
    import ray.data as rd
    tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                    "dst": pa.array([v for _, v in edges], pa.int64())})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = k_core(rd.from_arrow(tab), CFG, 2, max_rounds=3).to_pandas()
    assert any("did not converge" in str(x.message) for x in w)
    assert len(out) > 0          # superset, not the (empty) true 2-core


def test_strict_raises_on_non_convergence(ray_session):
    import ray.data as rd
    edges = [(i, i + 1) for i in range(60)]
    tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                    "dst": pa.array([v for _, v in edges], pa.int64())})
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(rd.from_arrow(tab), CFG, 2, max_rounds=3, strict=True)


class TestTrace:
    """Per-round peel trace (return_trace=True) vs a pure-python peel."""

    def ref_trace(self, edges, k):
        adj = {}
        for u, v in edges:
            if u == v:
                continue
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        trace = []
        while True:
            dead = [v for v, ns in adj.items() if len(ns) < k]
            trace.append(len(dead))
            if not dead:
                return trace
            for v in dead:
                for u in adj.pop(v):
                    adj[u].discard(v)

    def _trace(self, edges, k, cfg=CFG):
        import ray.data as rd
        tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                        "dst": pa.array([v for _, v in edges], pa.int64())})
        _, tr = k_core(rd.from_arrow(tab), cfg, k, return_trace=True)
        return tr

    def test_cascade_trace(self, ray_session):
        clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        chain = [(3, 10), (10, 11), (11, 12), (12, 13)]
        # peel cascades one chain hop per round: 13, then 12, then 11, 10
        assert self._trace(clique + chain, 2) == [1, 1, 1, 1, 0]

    def test_matches_reference_random(self, ray_session):
        rng = np.random.RandomState(31)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 50, size=(200, 2)) if a != b]
        for k in (2, 3, 4):
            assert self._trace(edges, k) == self.ref_trace(edges, k), k

    def test_trace_partition_invariance(self, ray_session):
        rng = np.random.RandomState(37)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 40, size=(150, 2)) if a != b]
        a = self._trace(edges, 3, CFG)
        b = self._trace(edges, 3, DEFAULT_CONFIG.with_(num_partitions=17))
        assert a == b
