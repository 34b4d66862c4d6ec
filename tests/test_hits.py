"""HITS: pure-python reference equality, hub/authority separation,
partition invariance, degenerate graphs."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.hits import HITS_SCALE, hits

CFG = DEFAULT_CONFIG.with_(num_partitions=8)


def ref_hits(edges, n_iter=4, scale=HITS_SCALE):
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    h = {v: scale // n for v in nodes}
    a = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        raw = {v: 0 for v in nodes}
        for u, v in edges:
            raw[v] += h[u]
        t = sum(raw.values())
        a = {v: (scale * raw[v]) // t if t > 0 else 0 for v in nodes}
        raw = {v: 0 for v in nodes}
        for u, v in edges:
            raw[u] += a[v]
        t = sum(raw.values())
        h = {v: (scale * raw[v]) // t if t > 0 else 0 for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def _run(edges, cfg=CFG, **kw):
    import ray.data as rd
    tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                    "dst": pa.array([v for _, v in edges], pa.int64())})
    out = hits(rd.from_arrow(tab), cfg, **kw).to_pandas()
    return {r["node"]: (r["hub_fp"], r["auth_fp"])
            for _, r in out.iterrows()}


class TestHits:
    def test_matches_reference(self, ray_session):
        rng = np.random.RandomState(13)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 50, size=(200, 2))]
        assert _run(edges) == ref_hits(edges)

    def test_hub_authority_separation(self, ray_session):
        # 0 links to everything (pure hub); 9 is linked by everything
        # (pure authority)
        edges = [(0, v) for v in range(1, 9)] + [(u, 9) for u in range(8)]
        got = _run(edges)
        hubs = {v: h for v, (h, _) in got.items()}
        auths = {v: a for v, (_, a) in got.items()}
        assert max(hubs, key=hubs.get) == 0
        assert max(auths, key=auths.get) == 9
        assert got == ref_hits(edges)

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(29)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 40, size=(150, 2))]
        assert _run(edges, CFG) == \
            _run(edges, DEFAULT_CONFIG.with_(num_partitions=17))

    def test_no_inlinks_graph(self, ray_session):
        # one-way chain: every score well-defined, matches reference
        edges = [(1, 2), (2, 3)]
        assert _run(edges) == ref_hits(edges)


class TestFans:
    """All fan topologies are bit-identical (combines only reassociate
    integer sums) and match the pure-python reference."""

    def test_flat_tree_nodes_identical(self, ray_session):
        rng = np.random.RandomState(41)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 60, size=(300, 2))]
        flat = _run(edges, CFG, fan="flat")
        assert _run(edges, CFG, fan="tree") == flat
        assert _run(edges, CFG, fan="nodes") == flat
        assert _run(edges, CFG, fan="nodes", node_groups=2) == flat
        assert flat == ref_hits(edges)

    def test_nodes_fan_odd_partition_count(self, ray_session):
        # n_parts not divisible by the group size: ragged last group
        rng = np.random.RandomState(43)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 30, size=(120, 2))]
        cfg = DEFAULT_CONFIG.with_(num_partitions=7)
        assert _run(edges, cfg, fan="nodes", node_groups=3) == \
            _run(edges, cfg, fan="flat") == ref_hits(edges)

    def test_fan_validation(self, ray_session):
        import ray.data as rd
        tab = pa.table({"src": pa.array([1], pa.int64()),
                        "dst": pa.array([2], pa.int64())})
        with pytest.raises(ValueError):
            hits(rd.from_arrow(tab), CFG, fan="Tree")


def test_scale_guard(ray_session):
    import ray.data as rd
    tab = pa.table({"src": pa.array([1], pa.int64()),
                    "dst": pa.array([2], pa.int64())})
    with pytest.raises(ValueError):
        hits(rd.from_arrow(tab), CFG, scale=10**10)
