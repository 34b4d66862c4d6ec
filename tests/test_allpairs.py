"""Exact all-pairs similarity join: brute-force truth (recall must be
exactly 1.0 — the prefix-filter theorem), partition invariance, the
duplicate-flood guard, and the LSH-agreement surface (the reference's
EC-vs-VC two-implementations design, run_proteus.sh:18-19)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.allpairs import allpairs_jaccard, doc_token_sets

CFG = DEFAULT_CONFIG.with_(num_partitions=8)


def _mk_docs(n=300, seed=7):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, size=rng.randint(3, 30)))
            for _ in range(n)]
    for i in range(0, 40, 2):               # planted near-dups
        docs[i + 1] = docs[i] + " extra"
    docs[50] = ""                            # empty doc
    docs[51] = "   "                         # whitespace-only doc
    return docs


def _ds(docs, n_blocks=5):
    import ray.data as rd
    tab = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    step = max(1, len(docs) // n_blocks)
    return rd.from_arrow([tab.slice(i, step)
                          for i in range(0, len(docs), step)])


def _brute(docs, th):
    sets = [set(d.split()) - {""} for d in docs]
    out = {}
    for a, b in itertools.combinations(range(len(docs)), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if u and i / u >= th:
            out[(a, b)] = (i, u)
    return out


class TestExactness:
    @pytest.mark.parametrize("th", [0.3, 0.6, 0.9])
    @pytest.mark.parametrize("order", ["df", "hash"])
    def test_matches_brute_force(self, ray_session, th, order):
        docs = _mk_docs()
        got = allpairs_jaccard(_ds(docs), CFG, threshold=th,
                               order=order).to_pandas()
        want = _brute(docs, th)
        gp = {(a, b): (i, u) for a, b, i, u in zip(
            got["a"], got["b"], got["intersection"], got["union"])}
        assert gp == want

    def test_partition_invariance(self, ray_session):
        docs = _mk_docs(seed=13)
        a = allpairs_jaccard(_ds(docs, 3), CFG,
                             threshold=0.5).to_pandas()
        b = allpairs_jaccard(_ds(docs, 11),
                             DEFAULT_CONFIG.with_(num_partitions=17),
                             threshold=0.5).to_pandas()
        ka = sorted(zip(a["a"], a["b"], a["jaccard"]))
        kb = sorted(zip(b["a"], b["b"], b["jaccard"]))
        assert ka == kb and len(ka) > 0

    def test_prebuilt_sets_input(self, ray_session):
        docs = _mk_docs(seed=3)
        sets_ds = doc_token_sets(_ds(docs), CFG)
        got = allpairs_jaccard(None, CFG, threshold=0.6,
                               sets_ds=sets_ds).to_pandas()
        want = _brute(docs, 0.6)
        assert {(a, b) for a, b in zip(got["a"], got["b"])} \
            == set(want)


class TestFloodGuard:
    def test_duplicate_flood_raises(self, ray_session):
        docs = ["alpha beta gamma delta"] * 500
        with pytest.raises((RuntimeError, Exception)) as ei:
            allpairs_jaccard(_ds(docs), CFG, threshold=0.8,
                             max_bucket=100).to_pandas()
        assert "max_bucket" in str(ei.value)

    def test_flood_passes_when_raised(self, ray_session):
        docs = ["alpha beta gamma delta"] * 60 + ["zeta eta"]
        got = allpairs_jaccard(_ds(docs), CFG, threshold=0.8,
                               max_bucket=100).to_pandas()
        assert len(got) == 60 * 59 // 2
        assert (got["jaccard"] == 1.0).all()


def _brute_cross(left, right, lids, rids, th):
    ls = [set(d.split()) - {""} for d in left]
    rs = [set(d.split()) - {""} for d in right]
    out = {}
    for ai, a in enumerate(lids):
        for bi, b in enumerate(rids):
            i = len(ls[ai] & rs[bi])
            u = len(ls[ai] | rs[bi])
            if u and i / u >= th:
                out[(a, b)] = (i, u)
    return out


class TestCrossPairs:
    """R-S join: exact recall against a brute-force cross product,
    overlapping id spaces, and the no-within-side guarantee."""

    def _sides(self, seed=19, n=220):
        docs = _mk_docs(n=n, seed=seed)
        left, right = docs[: n // 2], docs[n // 2:]
        # plant cross dups: right[j] is a near-copy of left[j]
        for j in range(0, 30, 3):
            right[j] = left[j] + " extra"
        return left, right

    @pytest.mark.parametrize("th", [0.4, 0.8])
    @pytest.mark.parametrize("order", ["df", "hash"])
    def test_matches_brute_force(self, ray_session, th, order):
        from raydedup.stages.allpairs import crosspairs_jaccard
        left, right = self._sides()
        got = crosspairs_jaccard(_ds(left, 3), _ds(right, 4), CFG,
                                 threshold=th, order=order).to_pandas()
        want = _brute_cross(left, right, range(len(left)),
                            range(len(right)), th)
        gp = {(a, b): (i, u) for a, b, i, u in zip(
            got["a"], got["b"], got["intersection"], got["union"])}
        assert gp == want and len(want) > 0

    def test_overlapping_id_spaces_and_no_within_side(self, ray_session):
        """Both sides use ids 0..n-1; identical WITHIN-side docs must
        not pair, identical cross docs must — ids decode to the
        original values on the right output columns."""
        from raydedup.stages.allpairs import crosspairs_jaccard
        left = ["a b c d", "a b c d", "x y z w"]   # ids 0,1,2
        right = ["a b c d", "p q r s"]             # ids 0,1
        got = crosspairs_jaccard(_ds(left, 2), _ds(right, 1), CFG,
                                 threshold=0.9).to_pandas()
        pairs = set(zip(got["a"], got["b"]))
        assert pairs == {(0, 0), (1, 0)}
        assert (got["jaccard"] == 1.0).all()

    def test_negative_ids_roundtrip(self, ray_session):
        import ray.data as rd
        from raydedup.stages.allpairs import crosspairs_jaccard
        lt = pa.table({"doc_id": pa.array([-5, 4], pa.int64()),
                       "text": ["m n o p", "h i j k"]})
        rt = pa.table({"doc_id": pa.array([-7, 0], pa.int64()),
                       "text": ["m n o p", "h i j k q"]})
        got = crosspairs_jaccard(rd.from_arrow(lt), rd.from_arrow(rt),
                                 CFG, threshold=0.5).to_pandas()
        pairs = set(zip(got["a"], got["b"]))
        assert pairs == {(-5, -7), (4, 0)}

    def test_cli_cross_join(self, ray_session, tmp_path):
        import argparse

        import pyarrow.parquet as pq

        from raydedup.__main__ import cmd_allpairs
        left, right = self._sides(seed=5, n=80)
        for name, docs in (("l", left), ("r", right)):
            pq.write_table(
                pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                          "text": pa.array(docs, pa.string())}),
                tmp_path / f"{name}.parquet")
        out = tmp_path / "pairs"
        cmd_allpairs(argparse.Namespace(
            input=str(tmp_path / "l.parquet"), output=str(out),
            threshold=0.8, order="df", max_bucket=20_000,
            right=str(tmp_path / "r.parquet")))
        import ray.data as rd
        got = rd.read_parquet(str(out)).to_pandas()
        want = _brute_cross(left, right, range(len(left)),
                            range(len(right)), 0.8)
        assert set(zip(got["a"], got["b"])) == set(want)

    def test_id_overflow_guard(self, ray_session):
        import ray.data as rd
        from raydedup.stages.allpairs import crosspairs_jaccard
        big = pa.table({"doc_id": pa.array([1 << 62], pa.int64()),
                        "text": ["a b c"]})
        with pytest.raises(Exception) as ei:
            crosspairs_jaccard(rd.from_arrow(big), rd.from_arrow(big),
                               CFG, threshold=0.5).to_pandas()
        assert "overflow" in str(ei.value) or "2^62" in str(ei.value)


class TestLSHAgreement:
    """Two independent implementations, one answer: the probabilistic
    MinHash-LSH tier's verified pairs vs this tier's exact truth over
    THE SAME shingle sets and threshold."""

    def test_lsh_pairs_subset_and_recall(self, ray_session):
        from raydedup.pipelines.neardup import near_dup_pairs
        from raydedup.stages.signatures import signatures
        rng = np.random.RandomState(23)
        base = [" ".join(f"t{rng.randint(0, 5000)}" for _ in range(80))
                for _ in range(150)]
        docs = list(base)
        for i in range(0, 60, 2):            # heavy near-dups: J well > τ
            toks = base[i].split()
            toks[rng.randint(0, len(toks))] = "changed"
            docs[i + 1] = " ".join(toks)
        ds = _ds(docs, 4)
        cfg = CFG
        lsh = near_dup_pairs(ds, cfg).to_pandas()
        sig = signatures(ds, cfg, keep_shingles=True, keep_bands=False,
                         keep_minhash=False, with_simhash=False)
        exact = allpairs_jaccard(None, cfg,
                                 threshold=cfg.verify_threshold,
                                 sets_ds=sig,
                                 set_col="shingles").to_pandas()
        lp = set(zip(lsh["a"], lsh["b"]))
        ep = set(zip(exact["a"], exact["b"]))
        assert lp <= ep, "LSH emitted a pair the exact join disproves"
        assert len(ep) >= 30
        recall = len(lp & ep) / len(ep)
        assert recall >= 0.99, f"LSH recall {recall:.3f} vs exact truth"
        # scores agree bit-for-bit on the common pairs
        le = lsh.set_index(["a", "b"])["jaccard"]
        ee = exact.set_index(["a", "b"])["jaccard"]
        common = le.index.intersection(ee.index)
        assert (le.loc[common] == ee.loc[common]).all()
