"""SemDeDup-style semantic dedup (stages/semdedup.py).

k-means is not SQL-expressible, so these tests ARE the correctness
gate for the rows-only driver queries: precision is exact (every
emitted pair re-scored), recall is measured against global brute
force on planted duplicate groups.
"""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.semdedup import (assign_clusters, semantic_dedup,
                                      semantic_dup_pairs)

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=64)
DIM = 16
THRESH = 0.97


def _planted(n_groups=12, per_group=4, n_noise=80, seed=3):
    """Well-separated group directions, each with per_group tiny-noise
    members (pairwise cosine > 0.99), plus isolated noise vectors."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_groups, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, gid = [], []
    for g in range(n_groups):
        for _ in range(per_group):
            v = base[g] + 0.02 * rng.standard_normal(DIM)
            vecs.append(v / np.linalg.norm(v))
            gid.append(g)
    noise = rng.standard_normal((n_noise, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    vecs.extend(noise)
    gid.extend([-1] * n_noise)
    mat = np.asarray(vecs)
    ids = np.arange(len(mat), dtype=np.int64)
    tab = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    return tab, mat, np.asarray(gid)


def _brute_pairs(mat, thresh):
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ m.T
    a, b = np.nonzero(np.triu(sims >= thresh, k=1))
    return set(zip(a.tolist(), b.tolist()))


def _ds(tab):
    import ray.data as rd
    return rd.from_arrow(tab).repartition(3)


def test_pairs_precision_exact_and_recall(ray_session):
    tab, mat, _ = _planted()
    got = semantic_dup_pairs(_ds(tab), THRESH, CFG,
                             n_clusters=12, train_sample=10**6).to_pandas()
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    # precision: every emitted pair really is >= threshold (exact)
    for a, b, ce6 in got[["a", "b", "cosine_e6"]].itertuples(index=False):
        cos = float(m[a] @ m[b])
        assert cos >= THRESH
        assert abs(cos * 1e6 - ce6) <= 1.0
    # recall vs global brute force
    want = _brute_pairs(mat, THRESH)
    have = set(zip(got["a"].tolist(), got["b"].tolist()))
    assert len(want) > 0
    recall = len(want & have) / len(want)
    assert recall >= 0.9, f"recall {recall:.3f} ({len(have)}/{len(want)})"


def test_dedup_keeps_min_id_per_component(ray_session):
    tab, mat, gid = _planted()
    kept = semantic_dedup(_ds(tab), THRESH, CFG,
                          n_clusters=12, train_sample=10**6).to_pandas()
    kept_ids = set(kept["vec_id"].tolist())
    assert "cluster" not in kept.columns
    assert set(kept.columns) >= {"vec_id", "embedding"}
    # all noise singletons survive
    noise_ids = set(np.flatnonzero(gid == -1).tolist())
    assert noise_ids <= kept_ids
    # each planted group collapses to roughly one representative and
    # always retains its minimum id
    for g in range(gid.max() + 1):
        members = np.flatnonzero(gid == g)
        surv = kept_ids & set(members.tolist())
        assert int(members.min()) in surv
        assert len(surv) <= 2  # allow a stray cluster split, not more


def test_pairs_subset_of_brute(ray_session):
    """Within-cluster pairs are a SUBSET of the global brute-force set
    (clustering may lose pairs, it can never invent them)."""
    tab, mat, _ = _planted(seed=11)
    got = semantic_dup_pairs(_ds(tab), THRESH, CFG,
                             n_clusters=10, train_sample=10**6).to_pandas()
    have = set(zip(got["a"].tolist(), got["b"].tolist()))
    assert have <= _brute_pairs(mat, THRESH)


def _mega_cluster(n_ball=200, n_noise=60, seed=7):
    """A dense 'boilerplate ball' (>50% of rows, all pairwise cosine
    > 0.99) plus isolated noise — the skewed embedding space that makes
    an uncapped per-cluster self-matmul O(m²) in one task."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal(DIM)
    base /= np.linalg.norm(base)
    vecs = []
    for _ in range(n_ball):
        v = base + 0.01 * rng.standard_normal(DIM)
        vecs.append(v / np.linalg.norm(v))
    noise = rng.standard_normal((n_noise, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    vecs.extend(noise)
    mat = np.asarray(vecs)
    ids = np.arange(len(mat), dtype=np.int64)
    tab = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    return tab, mat, n_ball


def test_mega_cluster_capped_pairs_and_counter(ray_session):
    """Over-cap cluster: pair emission stays O(m·cap) (salted overlap
    chain), every pair is still real, and the cap counter surfaces."""
    from raydedup.state.counters import RunCounters
    tab, mat, n_ball = _mega_cluster()
    rc = RunCounters()
    cap = 16
    got = semantic_dup_pairs(_ds(tab), THRESH, CFG, n_clusters=4,
                             train_sample=10**6, cluster_cap=cap,
                             counters=rc.actor).to_pandas()
    # precision unchanged: emitted ⊆ brute force
    have = set(zip(got["a"].tolist(), got["b"].tolist()))
    assert have <= _brute_pairs(mat, THRESH)
    # bounded emission: ≤ n_chunks · C(cap,2), nowhere near C(m,2)
    step = cap - 1
    n_chunks = -(-(n_ball - 1) // step)
    assert len(got) <= n_chunks * cap * (cap - 1) // 2
    assert len(got) < n_ball * (n_ball - 1) // 2 / 4
    cnt = rc.get()
    assert cnt.get("semdedup_capped_clusters", 0) >= 1
    assert cnt.get("semdedup_capped_rows", 0) >= n_ball


def test_mega_cluster_dedup_single_survivor(ray_session):
    """The dense ball is one component through the overlap chain: dedup
    keeps exactly its min id; noise singletons all survive."""
    tab, mat, n_ball = _mega_cluster()
    kept = semantic_dedup(_ds(tab), THRESH, CFG, n_clusters=4,
                          train_sample=10**6, cluster_cap=16).to_pandas()
    kept_ids = set(kept["vec_id"].tolist())
    ball = set(range(n_ball))
    assert kept_ids & ball == {0}
    assert set(range(n_ball, len(mat))) <= kept_ids


def test_pairs_scored_matches_argmax_brute(ray_session):
    """semantic_pairs_scored == brute force restricted to argmax-dim
    buckets (the oracle the driver checks in SQL)."""
    from raydedup.stages.semdedup import semantic_pairs_scored
    tab, mat, _ = _planted(seed=5)
    thr = 0.4
    got = semantic_pairs_scored(_ds(tab), thr, CFG).to_pandas()
    m32 = np.asarray(
        [np.asarray(r, dtype=np.float32) for r in tab["embedding"].to_pylist()])
    m = m32.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    bucket = np.argmax(m32, axis=1)
    sims = m @ m.T
    a, b = np.nonzero(np.triu(sims >= thr, k=1))
    same = bucket[a] == bucket[b]
    want = {(int(x), int(y)): int(round(sims[x, y] * 1e6))
            for x, y in zip(a[same], b[same])}
    have = {(int(r.a), int(r.b)): int(r.cosine_e6)
            for r in got.itertuples(index=False)}
    assert have == want


def test_assign_clusters_shapes(ray_session):
    tab, _, _ = _planted()
    assigned, cents = assign_clusters(_ds(tab), CFG, n_clusters=8,
                                      train_sample=10**6)
    df = assigned.to_pandas()
    assert cents.shape == (8, DIM)
    assert df["cluster"].between(0, 7).all()
    assert len(df) == len(tab)


def test_assign_clusters_order_invariant(ray_session):
    """The trained quantizer must not depend on row/block arrival order:
    Ray Data does not preserve block order, and seeded k-means init
    indexes rows, so assign_clusters sorts its pulled sample by id.
    Feeding the same rows in reversed order (and a different partition
    layout) must yield identical centroids and identical assignment."""
    import ray.data as rd
    tab, _, _ = _planted(seed=11)
    rev = tab.take(pa.array(np.arange(len(tab) - 1, -1, -1), pa.int64()))
    a1, c1 = assign_clusters(rd.from_arrow(tab).repartition(3), CFG,
                             n_clusters=6, train_sample=10**6)
    a2, c2 = assign_clusters(rd.from_arrow(rev).repartition(5), CFG,
                             n_clusters=6, train_sample=10**6)
    assert np.array_equal(c1, c2)
    d1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    d2 = a2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert d1["cluster"].tolist() == d2["cluster"].tolist()
