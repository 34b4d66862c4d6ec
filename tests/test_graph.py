"""Phase-1 reference-parity tests: edge-connected Jaccard on fixture
graphs (FIXTURES.md §2), checked against a NumPy brute-force oracle
implementing jaccard.cpp's semantics: score every existing edge,
J = |N(u)∩N(v)| / |N(u)∪N(v)| over symmetrized adjacency with
self-loops dropped."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=2)


def brute_edge_jaccard(edges, weights=None):
    """Oracle: dict[(u,v)] -> J for canonical u<v over symmetrized,
    self-loop-free edges."""
    adj: dict[int, set] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for s in adj:
        for d in adj[s]:
            if s < d:
                na, nb = adj[s], adj[d]
                if weights is None:
                    inter = len(na & nb)
                    union = len(na) + len(nb) - inter
                    out[(s, d)] = inter / union if union else 0.0
                else:
                    wi = sum(weights[x] for x in na & nb)
                    ws = sum(weights[x] for x in na) + sum(weights[x] for x in nb)
                    wu = ws - wi
                    out[(s, d)] = wi / wu if wu else 0.0
    return out


def _run_edge_jaccard(edges, weights=None):
    import ray.data as rd
    from raydedup.stages.graph import edge_jaccard
    tab = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    })
    out = edge_jaccard(rd.from_arrow(tab), CFG, weights=weights).to_pandas()
    return dict(zip(zip(out["a"], out["b"]), out["jaccard"]))


TRI_PLUS_TAIL = [(0, 1), (0, 2), (1, 2), (2, 3)]
SELF_LOOPS = [(0, 0), (0, 1), (1, 1), (1, 2), (2, 0)]
ONE_DIRECTION = [(0, 1), (1, 2), (2, 3), (3, 0)]  # square, one direction only


class TestEdgeJaccard:
    def test_triangle_plus_tail(self, ray_session):
        got = _run_edge_jaccard(TRI_PLUS_TAIL)
        want = brute_edge_jaccard(TRI_PLUS_TAIL)
        # hand-checked: N(0)={1,2}, N(1)={0,2}, N(2)={0,1,3}, N(3)={2}
        assert want[(0, 1)] == pytest.approx(1 / 3)   # {2} / {0,1,2}
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12), k

    def test_self_loops_dropped(self, ray_session):
        got = _run_edge_jaccard(SELF_LOOPS)
        want = brute_edge_jaccard(SELF_LOOPS)
        assert (0, 0) not in got and (1, 1) not in got
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_one_direction_symmetrized(self, ray_session):
        got = _run_edge_jaccard(ONE_DIRECTION)
        want = brute_edge_jaccard(ONE_DIRECTION)
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_skewed_star(self, ray_session):
        hub = [(0, i) for i in range(1, 60)] + [(1, 2), (3, 4)]
        got = _run_edge_jaccard(hub)
        want = brute_edge_jaccard(hub)
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_random_gnp(self, ray_session):
        rng = np.random.default_rng(42)
        n = 120
        mask = rng.random((n, n)) < 0.05
        edges = [(int(i), int(j)) for i in range(n) for j in range(i + 1, n)
                 if mask[i, j]]
        got = _run_edge_jaccard(edges)
        want = brute_edge_jaccard(edges)
        assert len(want) > 100
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_weighted(self, ray_session):
        rng = np.random.default_rng(7)
        w = rng.uniform(0.5, 2.0, size=10)
        edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0)]
        got = _run_edge_jaccard(edges, weights=w)
        want = brute_edge_jaccard(edges, weights=w)
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12)


class TestGraphOps:
    def test_degrees(self, ray_session):
        import ray.data as rd
        from raydedup.stages.graph import degrees, symmetrize
        tab = pa.table({"src": pa.array([0, 0, 1, 2], pa.int64()),
                        "dst": pa.array([1, 2, 2, 3], pa.int64())})
        deg = degrees(symmetrize(rd.from_arrow(tab), CFG)).to_pandas()
        want = {0: 2, 1: 2, 2: 3, 3: 1}
        assert dict(zip(deg["vertex"], deg["degree"])) == want

    def test_degrees_src_partitioned_fused_path(self, ray_session):
        """Over symmetrize output (src-co-partitioned by contract) the
        zero-exchange fused path must equal the combiner exchange."""
        import ray.data as rd
        from raydedup.stages.graph import degrees, drop_self_loops, symmetrize
        rng = np.random.default_rng(3)
        n = 500
        tab = pa.table({
            "src": pa.array(rng.integers(0, 40, n), pa.int64()),
            "dst": pa.array(rng.integers(0, 40, n), pa.int64()),
        })
        sym = symmetrize(drop_self_loops(rd.from_arrow(tab)), CFG) \
            .materialize()
        fused = degrees(sym, src_partitioned=True).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        exch = degrees(sym).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        assert fused.equals(exch)
        assert len(fused) > 0

    def test_symmetrize_integer_weight_schema(self, ray_session):
        """Integer-weighted edges: every output block (incl. empty
        partitions) carries the INPUT weight dtype."""
        import ray
        import ray.data as rd
        from raydedup.stages.graph import symmetrize
        tab = pa.table({"src": pa.array([0, 1], pa.int64()),
                        "dst": pa.array([1, 2], pa.int64()),
                        "weight": pa.array([3, 4], pa.int64())})
        sym = symmetrize(rd.from_arrow(tab), CFG).materialize()
        types = {str(t.schema.field("weight").type)
                 for t in ray.get(sym.to_arrow_refs())
                 if "weight" in t.column_names}
        assert types == {"int64"}

    def test_symmetrize_dedups(self, ray_session):
        import ray.data as rd
        from raydedup.stages.graph import symmetrize
        # (0,1) stored both directions plus duplicate
        tab = pa.table({"src": pa.array([0, 1, 0], pa.int64()),
                        "dst": pa.array([1, 0, 1], pa.int64())})
        sym = symmetrize(rd.from_arrow(tab), CFG).to_pandas()
        assert sorted(map(tuple, sym[["src", "dst"]].values.tolist())) == \
            [(0, 1), (1, 0)]

    def test_canonicalize(self, ray_session):
        import ray.data as rd
        from raydedup.stages.graph import canonicalize
        tab = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                        "dst": pa.array([1, 0, 2], pa.int64())})
        out = canonicalize(rd.from_arrow(tab)).to_pandas()
        assert out[["src", "dst"]].values.tolist() == [[0, 1]]

    def test_adjacency_sorted_unique(self, ray_session):
        import ray.data as rd
        from raydedup.stages.graph import build_adjacency, symmetrize
        from raydedup.functions.text import binary_to_sets
        tab = pa.table({"src": pa.array([0, 0, 0, 1], pa.int64()),
                        "dst": pa.array([5, 3, 3, 0], pa.int64())})
        adj = build_adjacency(symmetrize(rd.from_arrow(tab), CFG), CFG,
                              id_col="id").to_pandas()
        row0 = adj[adj["id"] == 0].iloc[0]
        nbrs = np.frombuffer(row0["neighbors"], dtype=np.uint64)
        assert nbrs.tolist() == [1, 3, 5]
        assert row0["n_neighbors"] == 3

    def test_symmetrize_weighted_min(self, ray_session):
        import ray.data as rd
        from raydedup.stages.graph import symmetrize
        # duplicate (0,1) with different weights: min wins; mirror gets
        # the same min
        tab = pa.table({"src": pa.array([0, 1, 0], pa.int64()),
                        "dst": pa.array([1, 0, 1], pa.int64()),
                        "weight": pa.array([5.0, 2.0, 3.0], pa.float64())})
        sym = symmetrize(rd.from_arrow(tab), CFG).to_pandas() \
            .sort_values(["src", "dst"]).reset_index(drop=True)
        assert list(map(tuple, sym[["src", "dst"]].values.tolist())) == \
            [(0, 1), (1, 0)]
        assert list(sym["weight"]) == [2.0, 2.0]


def brute_edge_similarity(edges):
    """Oracle: dict[(u,v)] -> (inter, da, db, overlap, sorensen, cosine)."""
    adj: dict[int, set] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for s in adj:
        for d in adj[s]:
            if s < d:
                na, nb = adj[s], adj[d]
                i = len(na & nb)
                da, db = len(na), len(nb)
                out[(s, d)] = (i, da, db, i / min(da, db),
                               2 * i / (da + db), i / (da * db) ** 0.5)
    return out


def brute_triangles(edges):
    """Oracle: dict[v] -> (degree, triangles, lcc)."""
    adj: dict[int, set] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for v, nv in adj.items():
        t = sum(len(nv & adj[u]) for u in nv) // 2
        d = len(nv)
        out[v] = (d, t, (2 * t / (d * (d - 1))) if d >= 2 else 0.0)
    return out


class TestEdgeSimilarity:
    def _run(self, edges, **kw):
        import ray.data as rd
        from raydedup.stages.graph import edge_similarity
        tab = pa.table({
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        })
        out = edge_similarity(rd.from_arrow(tab), CFG, **kw).to_pandas()
        return {(a, b): (i, da, db, o, s, c) for a, b, i, da, db, o, s, c in
                zip(out["a"], out["b"], out["intersection"], out["deg_a"],
                    out["deg_b"], out["overlap"], out["sorensen"],
                    out["cosine"])}

    def test_triangle_plus_tail(self, ray_session):
        got = self._run(TRI_PLUS_TAIL)
        want = brute_edge_similarity(TRI_PLUS_TAIL)
        assert got.keys() == want.keys()
        for k, (i, da, db, o, s, c) in want.items():
            gi, gda, gdb, go, gs, gc = got[k]
            assert (gi, gda, gdb) == (i, da, db), k
            assert go == pytest.approx(o, abs=1e-12)
            assert gs == pytest.approx(s, abs=1e-12)
            assert gc == pytest.approx(c, abs=1e-12)

    def test_random_gnp_both_paths(self, ray_session):
        rng = np.random.default_rng(11)
        n = 80
        mask = rng.random((n, n)) < 0.07
        edges = [(int(i), int(j)) for i in range(n) for j in range(i + 1, n)
                 if mask[i, j]]
        want = brute_edge_similarity(edges)
        for bcast in (True, False):  # broadcast lookup vs partitioned joins
            got = self._run(edges, broadcast=bcast)
            assert got.keys() == want.keys(), bcast
            for k, w in want.items():
                g = got[k]
                assert g[:3] == w[:3], (bcast, k)
                for gi, wi in zip(g[3:], w[3:]):
                    assert gi == pytest.approx(wi, abs=1e-12), (bcast, k)


class TestTriangleCounts:
    def _run(self, edges, **kw):
        import ray.data as rd
        from raydedup.stages.graph import triangle_counts
        tab = pa.table({
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        })
        out = triangle_counts(rd.from_arrow(tab), CFG, **kw).to_pandas()
        return {v: (d, t, l) for v, d, t, l in
                zip(out["vertex"], out["degree"], out["triangles"],
                    out["lcc"])}

    def test_triangle_plus_tail(self, ray_session):
        got = self._run(TRI_PLUS_TAIL)
        # one triangle {0,1,2}; vertex 3 is a tail
        assert got[0][1] == 1 and got[1][1] == 1 and got[2][1] == 1
        assert got[3][1] == 0 and got[3][2] == 0.0
        assert got[0][2] == pytest.approx(1.0)   # deg 2, 1 triangle
        assert got[2][2] == pytest.approx(1 / 3)  # deg 3, 1 triangle

    def test_random_gnp_both_paths(self, ray_session):
        rng = np.random.default_rng(13)
        n = 90
        mask = rng.random((n, n)) < 0.08
        edges = [(int(i), int(j)) for i in range(n) for j in range(i + 1, n)
                 if mask[i, j]]
        want = brute_triangles(edges)
        assert sum(t for _, t, _ in want.values()) > 0
        for bcast in (True, False):
            got = self._run(edges, broadcast=bcast)
            assert got.keys() == want.keys(), bcast
            for v, (d, t, l) in want.items():
                gd, gt, gl = got[v]
                assert (gd, gt) == (d, t), (bcast, v)
                assert gl == pytest.approx(l, abs=1e-12), (bcast, v)


def test_edge_similarity_empty_graph(ray_session):
    # only self-loops → zero edges → empty (not a concat crash)
    import ray.data as rd
    from raydedup.stages.graph import edge_similarity, triangle_counts
    tab = pa.table({"src": pa.array([1, 2], pa.int64()),
                    "dst": pa.array([1, 2], pa.int64())})
    assert edge_similarity(rd.from_arrow(tab), CFG).count() == 0
    assert triangle_counts(rd.from_arrow(tab), CFG).count() == 0
