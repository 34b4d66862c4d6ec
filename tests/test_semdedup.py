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


def test_assign_clusters_shapes(ray_session):
    tab, _, _ = _planted()
    assigned, cents = assign_clusters(_ds(tab), CFG, n_clusters=8,
                                      train_sample=10**6)
    df = assigned.to_pandas()
    assert cents.shape == (8, DIM)
    assert df["cluster"].between(0, 7).all()
    assert len(df) == len(tab)
