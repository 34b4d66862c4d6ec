"""BFS hop distances: reference equality, directedness, hop bound,
early exit, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.bfs import bfs_distances

CFG = DEFAULT_CONFIG.with_(num_partitions=8)


def ref_bfs(edges, seeds, max_hops):
    adj = {}
    nodes = set()
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        nodes.update((u, v))
    dist = {s: 0 for s in seeds if s in nodes}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
        if not frontier:
            break
    return dist


def _run(edges, seeds, max_hops=8, cfg=CFG):
    import ray.data as rd
    tab = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                    "dst": pa.array([v for _, v in edges], pa.int64())})
    out = bfs_distances(rd.from_arrow(tab), seeds, cfg,
                        max_hops=max_hops).to_pandas()
    return {} if len(out) == 0 else dict(zip(out["node"], out["dist"]))


class TestBfs:
    def test_chain(self, ray_session):
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        assert _run(edges, [1]) == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    def test_directed(self, ray_session):
        # edges point AWAY from 5; seeding 5 reaches nothing upstream
        edges = [(1, 2), (2, 3), (5, 6)]
        assert _run(edges, [5]) == {5: 0, 6: 1}

    def test_hop_bound(self, ray_session):
        edges = [(i, i + 1) for i in range(10)]
        got = _run(edges, [0], max_hops=3)
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_multi_source_min(self, ray_session):
        edges = [(1, 2), (2, 3), (3, 4), (9, 4)]
        got = _run(edges, [1, 9])
        assert got[4] == 1          # 9→4 beats 1→2→3→4

    def test_seed_not_in_graph_ignored(self, ray_session):
        edges = [(1, 2)]
        assert _run(edges, [1, 777]) == {1: 0, 2: 1}

    def test_random_matches_reference(self, ray_session):
        rng = np.random.RandomState(31)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 70, size=(250, 2))]
        seeds = [0, 5, 11]
        for hops in (2, 5, 9):
            assert _run(edges, seeds, hops) == ref_bfs(edges, seeds, hops)

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(41)
        edges = [(int(a), int(b))
                 for a, b in rng.randint(0, 90, size=(300, 2))]
        a = _run(edges, [3], 6, CFG)
        b = _run(edges, [3], 6, DEFAULT_CONFIG.with_(num_partitions=19))
        assert a == b
