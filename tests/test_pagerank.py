"""PageRank: exact integer fixed-point semantics, dangling mass,
dedup-on-input, and partition-count invariance."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.pagerank import (DAMPING_DEN, DAMPING_NUM, RANK_SCALE,
                                      pagerank)

CFG8 = DEFAULT_CONFIG.with_(num_partitions=8)


def ref_pagerank(edges, n_iter=5, num=DAMPING_NUM, den=DAMPING_DEN,
                 scale=RANK_SCALE):
    """Pure-python reference of the documented integer recursion."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for u, _ in edges:
        outdeg[u] += 1
    rank = {v: scale // n for v in nodes}
    base = ((scale * (den - num)) // den) // n
    for _ in range(n_iter):
        share = sum(rank[v] for v in nodes if outdeg[v] == 0) // n
        inc = {v: 0 for v in nodes}
        for u, v in edges:
            inc[v] += rank[u] // outdeg[u]
        rank = {v: base + (num * (inc[v] + share)) // den for v in nodes}
    return rank


def _run(edges, cfg, **kw):
    import ray.data as rd
    tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                    "dst": pa.array([v for _, v in edges], pa.int64())})
    out = pagerank(rd.from_arrow(tab), cfg, **kw).to_pandas()
    return dict(zip(out["node"], out["rank_fp"]))


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (10, 3), (10, 4),
         (5, 5)]  # node 5: self-loop only; node 1..4 cycle-ish


class TestPagerank:
    def test_matches_reference(self, ray_session):
        got = _run(EDGES, CFG8)
        assert got == ref_pagerank(EDGES)

    def test_dangling_mass(self, ray_session):
        # 7 is a pure sink: rank flows in, redistributes via share
        edges = [(1, 7), (2, 7), (1, 2)]
        got = _run(edges, CFG8)
        want = ref_pagerank(edges)
        assert got == want
        assert want[7] > want[2] > 0

    def test_duplicate_edges_collapse(self, ray_session):
        got = _run(EDGES + EDGES[:4], CFG8)
        assert got == ref_pagerank(EDGES)

    def test_partition_invariance(self, ray_session):
        a = _run(EDGES, CFG8)
        b = _run(EDGES, DEFAULT_CONFIG.with_(num_partitions=17))
        assert a == b

    def test_more_iterations_converge(self, ray_session):
        # ranks should approach the stationary distribution: the gap
        # between successive iterates shrinks
        r5 = _run(EDGES, CFG8, n_iter=5)
        r6 = _run(EDGES, CFG8, n_iter=6)
        r20 = _run(EDGES, CFG8, n_iter=20)
        r21 = _run(EDGES, CFG8, n_iter=21)
        gap_early = max(abs(r5[v] - r6[v]) for v in r5)
        gap_late = max(abs(r20[v] - r21[v]) for v in r20)
        assert gap_late < gap_early
        # total mass conserved up to floor losses: within n_nodes*(iters+2)
        total = sum(r20.values())
        assert abs(total - RANK_SCALE) < len(r20) * 25 * (DAMPING_DEN + 2)

    def test_empty(self, ray_session):
        import ray.data as rd
        tab = pa.table({"src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64())})
        ds = pagerank(rd.from_arrow(tab), CFG8)
        assert ds.count() == 0
        assert ds.schema().names == ["node", "rank_fp"]


class TestMessageFan:
    def test_tree_equals_flat(self, ray_session):
        cfg = DEFAULT_CONFIG.with_(num_partitions=9)   # group_size=3
        flat = _run(EDGES, cfg, fan="flat")
        tree = _run(EDGES, cfg, fan="tree")
        assert flat == tree == ref_pagerank(EDGES)

    def test_tree_uneven_groups(self, ray_session):
        # 11 partitions, group_size=4 -> groups of 4,4,3
        cfg = DEFAULT_CONFIG.with_(num_partitions=11)
        edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + \
                [(i, 7) for i in range(0, 40, 5)]
        assert _run(edges, cfg, fan="tree") == ref_pagerank(edges)

    def test_auto_threshold(self, ray_session):
        from raydedup.stages.pagerank import FAN_TREE_MIN_PARTS
        cfg = DEFAULT_CONFIG.with_(num_partitions=FAN_TREE_MIN_PARTS)
        assert _run(EDGES, cfg, fan="auto") == ref_pagerank(EDGES)


def ref_pagerank_ext(edges, n_iter=5, weights=None, seeds=None,
                     num=DAMPING_NUM, den=DAMPING_DEN, scale=RANK_SCALE):
    """Reference for the weighted/personalized generalization."""
    if weights is None:
        ew = {e: 1 for e in set(edges)}
    else:
        ew = {}
        for e, w in zip(edges, weights):
            ew[e] = ew.get(e, 0) + w
    nodes = sorted({u for u, _ in ew} | {v for _, v in ew})
    n = len(nodes)
    seed = {v: (1 if (seeds is None or v in seeds) else 0) for v in nodes}
    n_base = sum(seed.values())
    wout = {v: 0 for v in nodes}
    for (u, _), w in ew.items():
        wout[u] += w
    rank = {v: scale // n for v in nodes}
    base = ((scale * (den - num)) // den) // n_base
    for _ in range(n_iter):
        share = sum(rank[v] for v in nodes if wout[v] == 0) // n_base
        inc = {v: 0 for v in nodes}
        for (u, v), w in ew.items():
            inc[v] += (rank[u] * w) // wout[u]
        rank = {v: seed[v] * base
                + (num * (inc[v] + seed[v] * share)) // den
                for v in nodes}
    return rank


class TestPagerankVariants:
    def test_weighted_matches_reference(self, ray_session):
        import ray.data as rd
        edges = EDGES + [(1, 2), (10, 3)]          # duplicate rows sum
        weights = [3, 1, 2, 5, 1, 4, 2, 1, 7, 2]
        tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                        "dst": pa.array([v for _, v in edges], pa.int64()),
                        "w": pa.array(weights, pa.int64())})
        out = pagerank(rd.from_arrow(tab), CFG8, weight_col="w").to_pandas()
        got = dict(zip(out["node"], out["rank_fp"]))
        assert got == ref_pagerank_ext(edges, weights=weights)

    def test_unit_weights_equal_unweighted(self, ray_session):
        import ray.data as rd
        tab = pa.table({"src": pa.array([u for u, _ in EDGES], pa.int64()),
                        "dst": pa.array([v for _, v in EDGES], pa.int64()),
                        "w": pa.array([1] * len(EDGES), pa.int64())})
        w = pagerank(rd.from_arrow(tab), CFG8, weight_col="w").to_pandas()
        u = _run(EDGES, CFG8)
        assert dict(zip(w["node"], w["rank_fp"])) == u

    def test_personalized_matches_reference(self, ray_session):
        got = _run(EDGES, CFG8, personalization=[1, 10])
        assert got == ref_pagerank_ext(EDGES, seeds={1, 10})
        # teleport mass concentrates near the seeds
        uniform = _run(EDGES, CFG8)
        assert got[1] > uniform[1]

    def test_personalized_no_seed_in_graph_raises(self, ray_session):
        with pytest.raises(ValueError):
            _run(EDGES, CFG8, personalization=[999])


def test_fan_validation(ray_session):
    import ray.data as rd
    tab = pa.table({"src": pa.array([1], pa.int64()),
                    "dst": pa.array([2], pa.int64())})
    with pytest.raises(ValueError):
        pagerank(rd.from_arrow(tab), CFG8, fan="Tree")


def test_nonpositive_weight_rejected(ray_session):
    import ray
    import ray.data as rd
    tab = pa.table({"src": pa.array([1, 1], pa.int64()),
                    "dst": pa.array([2, 3], pa.int64()),
                    "w": pa.array([3, -3], pa.int64())})
    with pytest.raises(Exception) as ei:
        pagerank(rd.from_arrow(tab), CFG8, weight_col="w").count()
    assert "positive" in str(ei.value)


class TestNodesFan:
    """fan="nodes": two-level node-local combine — bit-identical to
    flat/tree at every (P, M) shape, telemetry records the object-count
    drop."""

    def test_nodes_equals_flat_and_tree(self, ray_session):
        cfg = DEFAULT_CONFIG.with_(num_partitions=9)
        flat = _run(EDGES, cfg, fan="flat")
        assert _run(EDGES, cfg, fan="nodes") == flat == ref_pagerank(EDGES)
        assert _run(EDGES, cfg, fan="nodes", node_groups=2) == flat
        assert _run(EDGES, cfg, fan="nodes", node_groups=9) == flat

    def test_nodes_uneven_groups(self, ray_session):
        # 11 partitions, 4 node groups -> ppn=3, groups 3,3,3,2
        cfg = DEFAULT_CONFIG.with_(num_partitions=11)
        edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + \
                [(i, 7) for i in range(0, 40, 5)]
        assert _run(edges, cfg, fan="nodes", node_groups=4) \
            == ref_pagerank(edges)

    def test_nodes_weighted_personalized(self, ray_session):
        import ray.data as rd
        edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (2, 4)]
        w = [3, 1, 2, 5, 1, 2]
        tab = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                        "dst": pa.array([b for _, b in edges], pa.int64()),
                        "w": pa.array(w, pa.int64())})
        kw = dict(n_iter=4, weight_col="w", personalization=[1, 4])
        base = pagerank(rd.from_arrow(tab), CFG8, fan="flat",
                        **kw).to_pandas()
        nodes = pagerank(rd.from_arrow(tab), CFG8, fan="nodes",
                         node_groups=3, **kw).to_pandas()
        a = sorted(zip(base["node"], base["rank_fp"]))
        b = sorted(zip(nodes["node"], nodes["rank_fp"]))
        assert a == b

    def test_object_count_telemetry(self, ray_session):
        from raydedup.state import RunCounters
        import ray.data as rd
        tab = pa.table({"src": pa.array([a for a, _ in EDGES], pa.int64()),
                        "dst": pa.array([b for _, b in EDGES], pa.int64())})
        cfg = DEFAULT_CONFIG.with_(num_partitions=16)
        rc = RunCounters()
        pagerank(rd.from_arrow(tab), cfg, fan="nodes", node_groups=4,
                 counters=rc.actor).count()
        got = rc.get()
        assert got["pagerank_fan_nodes"] == 1
        # P=16, M=4: total 16*4 + 16 + 16 = 96; cross-node = 16
        assert got["pagerank_msg_objects_per_round"] == 96
        assert got["pagerank_crossnode_objects_per_round"] == 16
        rc2 = RunCounters()
        pagerank(rd.from_arrow(tab), cfg, fan="flat",
                 counters=rc2.actor).count()
        got2 = rc2.get()
        assert got2["pagerank_msg_objects_per_round"] == 256
        assert got2["pagerank_crossnode_objects_per_round"] == 256
