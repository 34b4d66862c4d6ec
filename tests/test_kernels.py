"""Unit tests for the pure-numpy kernels (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.functions.hashing import hash_strings, perm_seeds, splitmix64
from raydedup.functions.setops import (
    pairwise_intersection_sizes,
    pairwise_jaccard,
    pairwise_weighted_jaccard,
)
from raydedup.functions.sketches import (
    band_keys,
    hamming64,
    minhash_jaccard_estimate,
    minhash_signatures,
    simhash64,
)
from raydedup.functions.text import (
    arrow_to_sets,
    binary_to_sets,
    sets_to_arrow,
    sets_to_binary,
    shingle_batch,
)

from .oracle import jaccard as brute_jaccard
from .oracle import shingle_set

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "a b c",
    "",
    "x x x x x x x x",
    "é ü ß 你好 é ü ß 你好 é ü",
]


def _sets(texts, k=5):
    return shingle_batch(pa.array(texts, type=pa.string()), k)


class TestShingles:
    def test_counts_match_brute_force(self):
        vals, offs = _sets(TEXTS)
        for i, t in enumerate(TEXTS):
            assert offs[i + 1] - offs[i] == len(shingle_set(t, 5)), t

    def test_sorted_unique_invariant(self):
        # the ordering invariant of the intersection kernel (jaccard.cpp:353)
        vals, offs = _sets(TEXTS)
        for i in range(len(TEXTS)):
            seg = vals[offs[i] : offs[i + 1]]
            assert np.all(np.diff(seg.astype(np.uint64)) > 0) if len(seg) > 1 else True

    def test_short_doc_empty_set(self):
        vals, offs = _sets(["a b", ""], k=5)
        assert offs.tolist() == [0, 0, 0]

    def test_deterministic(self):
        v1, o1 = _sets(TEXTS)
        v2, o2 = _sets(TEXTS)
        assert (v1 == v2).all() and (o1 == o2).all()


class TestShingleStream:
    def test_stream_oph_bit_identical_to_set_oph(self):
        # the fused slim path must produce EXACTLY the signatures of the
        # sorted-unique path (min per bin is duplicate/order-invariant)
        from raydedup.functions.sketches import (
            minhash_oph_stream, minhash_signatures_oph)
        from raydedup.functions.text import shingle_stream
        texts = TEXTS + ["w1 w2 w3 w4 w5 w6 " * 40]   # heavy duplication
        arr = pa.array(texts, type=pa.string())
        salt = perm_seeds(128, 42)[0]
        vals, offs = shingle_batch(arr, 5)
        want = minhash_signatures_oph(vals, offs, 128, salt)
        wh, wd, nd = shingle_stream(arr, 5)
        got = minhash_oph_stream(wh, wd, nd, 128, salt)
        assert nd == len(texts)
        assert (got == want).all()

    def test_stream_window_counts(self):
        from raydedup.functions.text import shingle_stream
        wh, wd, nd = shingle_stream(pa.array(TEXTS, type=pa.string()), 5)
        counts = np.bincount(wd, minlength=nd)
        for i, t in enumerate(TEXTS):
            toks = t.split(" ") if t else [""]
            want = max(0, len(toks) - 4)
            assert counts[i] == want, t
        # zero-window docs agree between stream and set paths
        _, offs = _sets(TEXTS)
        set_sizes = offs[1:] - offs[:-1]
        assert ((counts == 0) == (set_sizes == 0)).all()

    def test_stream_empty_batch(self):
        from raydedup.functions.sketches import minhash_oph_stream
        from raydedup.functions.text import shingle_stream
        wh, wd, nd = shingle_stream(pa.array([], type=pa.string()), 5)
        sig = minhash_oph_stream(wh, wd, nd, 128, np.uint64(1))
        assert sig.shape == (0, 128)


class TestJaccardKernel:
    def test_matches_brute_force(self):
        vals, offs = _sets(TEXTS)
        # pair each doc with each other doc
        a_idx, b_idx = np.triu_indices(len(TEXTS), k=1)
        av, ao = _gather(vals, offs, a_idx)
        bv, bo = _gather(vals, offs, b_idx)
        _, _, j = pairwise_jaccard(av, ao, bv, bo)
        for p, (ia, ib) in enumerate(zip(a_idx, b_idx)):
            expect = brute_jaccard(shingle_set(TEXTS[ia], 5), shingle_set(TEXTS[ib], 5))
            assert j[p] == pytest.approx(expect, abs=1e-12)

    def test_identical_disjoint_empty(self):
        a = np.array([1, 2, 3], dtype=np.uint64)
        b = np.array([4, 5, 6], dtype=np.uint64)
        off1 = np.array([0, 3])
        _, _, j_same = pairwise_jaccard(a, off1, a.copy(), off1)
        _, _, j_disj = pairwise_jaccard(a, off1, b, off1)
        empty = np.empty(0, dtype=np.uint64)
        off0 = np.array([0, 0])
        _, _, j_empty = pairwise_jaccard(empty, off0, empty, off0)
        assert j_same[0] == 1.0 and j_disj[0] == 0.0 and j_empty[0] == 0.0

    def test_intersection_sizes(self):
        a = np.array([1, 2, 3, 10, 20], dtype=np.uint64)
        b = np.array([2, 3, 4, 20, 30, 40], dtype=np.uint64)
        ao = np.array([0, 3, 5])
        bo = np.array([0, 3, 6])
        inter = pairwise_intersection_sizes(a, ao, b, bo)
        assert inter.tolist() == [2, 1]

    def test_weighted_unit_weights_match_unweighted(self):
        vals, offs = _sets(TEXTS[:2])
        av, ao = _gather(vals, offs, [0])
        bv, bo = _gather(vals, offs, [1])
        _, _, j = pairwise_jaccard(av, ao, bv, bo)
        _, _, wj = pairwise_weighted_jaccard(av, ao, bv, bo)
        assert wj[0] == pytest.approx(j[0], abs=1e-12)

    def test_weighted_custom_weights(self):
        # A = {1,2}, B = {2,3}; w(1)=1, w(2)=2, w(3)=3
        # vol(A)=3, vol(B)=5, Wi=2, J = 2/(3+5-2) = 1/3
        a = np.array([1, 2], dtype=np.uint64)
        b = np.array([2, 3], dtype=np.uint64)
        w = np.array([0.0, 1.0, 2.0, 3.0])
        _, _, j = pairwise_weighted_jaccard(
            a, np.array([0, 2]), b, np.array([0, 2]), weight_of=w
        )
        assert j[0] == pytest.approx(1 / 3)


def _gather(vals, offs, idx):
    segs = [vals[offs[i] : offs[i + 1]] for i in idx]
    out_offs = np.zeros(len(segs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=out_offs[1:])
    return (np.concatenate(segs) if segs else np.empty(0, np.uint64)), out_offs


class TestMinHash:
    def test_estimate_close_to_true(self):
        rng = np.random.default_rng(0)
        base = rng.integers(0, 2**63, 400).astype(np.uint64)
        # two sets with known overlap 0.5 of the union
        a = np.sort(base[:300])
        b = np.sort(base[100:400])
        vals = np.concatenate([a, b])
        offs = np.array([0, 300, 600])
        sig = minhash_signatures(vals, offs, perm_seeds(128, 42))
        est = minhash_jaccard_estimate(sig[0:1], sig[1:2])[0]
        true_j = 200 / 400
        assert abs(est - true_j) < 0.15

    def test_identical_sets_identical_signatures(self):
        a = np.sort(np.random.default_rng(1).integers(0, 2**63, 100).astype(np.uint64))
        vals = np.concatenate([a, a])
        offs = np.array([0, 100, 200])
        sig = minhash_signatures(vals, offs, perm_seeds(128, 42))
        assert (sig[0] == sig[1]).all()

    def test_empty_set_sentinel(self):
        sig = minhash_signatures(np.empty(0, np.uint64), np.array([0, 0]),
                                 perm_seeds(8, 42))
        assert (sig == np.uint64(2**64 - 1)).all()

    def test_empty_between_nonempty(self):
        # empty doc sandwiched between non-empty docs must not shift segments
        a = np.array([5, 6, 7], dtype=np.uint64)
        b = np.array([100, 200], dtype=np.uint64)
        vals = np.concatenate([a, b])
        offs = np.array([0, 3, 3, 5])
        sig = minhash_signatures(vals, offs, perm_seeds(16, 42))
        solo_a = minhash_signatures(a, np.array([0, 3]), perm_seeds(16, 42))
        solo_b = minhash_signatures(b, np.array([0, 2]), perm_seeds(16, 42))
        assert (sig[0] == solo_a[0]).all()
        assert (sig[1] == np.uint64(2**64 - 1)).all()
        assert (sig[2] == solo_b[0]).all()

    def test_band_keys_deterministic_and_band_salted(self):
        sig = np.arange(256, dtype=np.uint64).reshape(2, 128)
        bk1 = band_keys(sig, 32, 4)
        bk2 = band_keys(sig.copy(), 32, 4)
        assert (bk1 == bk2).all()
        # same row values in different bands must produce different keys
        flat = np.tile(np.arange(4, dtype=np.uint64), 32).reshape(1, 128)
        bk = band_keys(flat, 32, 4)
        assert len(np.unique(bk)) == 32


class TestSimHash:
    def test_identical_and_perturbed(self):
        rng = np.random.default_rng(3)
        a = np.sort(rng.integers(0, 2**63, 500).astype(np.uint64))
        b = np.sort(np.concatenate([a[:490], rng.integers(0, 2**63, 10).astype(np.uint64)]))
        vals = np.concatenate([a, a, b])
        offs = np.array([0, 500, 1000, 1490 + 10])
        sh = simhash64(vals, offs)
        assert sh[0] == sh[1]
        assert hamming64(sh[0:1], sh[2:3])[0] <= 10

    def test_empty_zero(self):
        assert simhash64(np.empty(0, np.uint64), np.array([0, 0]))[0] == 0

    def test_hamming(self):
        a = np.array([0b1011], dtype=np.uint64)
        b = np.array([0b0010], dtype=np.uint64)
        assert hamming64(a, b)[0] == 2


class TestArrowRoundtrip:
    def test_list_roundtrip(self):
        vals, offs = _sets(TEXTS)
        arr = sets_to_arrow(vals, offs)
        v, o = arrow_to_sets(arr)
        assert (v == vals).all() and (o == offs).all()

    def test_list_slice(self):
        vals, offs = _sets(TEXTS)
        v, o = arrow_to_sets(sets_to_arrow(vals, offs).slice(1, 3))
        assert (o == offs[1:5] - offs[1]).all()
        assert (v == vals[offs[1] : offs[4]]).all()

    def test_binary_roundtrip(self):
        vals, offs = _sets(TEXTS)
        arr = sets_to_binary(vals, offs)
        v, o = binary_to_sets(arr)
        assert (v == vals).all() and (o == offs).all()

    def test_binary_empty(self):
        v, o = binary_to_sets(pa.array([b"", b""], type=pa.large_binary()))
        assert len(v) == 0 and o.tolist() == [0, 0, 0]


class TestHashing:
    def test_hash_strings_deterministic(self):
        h1 = hash_strings(["a", "b", "a"])
        assert h1[0] == h1[2] and h1[0] != h1[1]

    def test_splitmix_avalanche(self):
        x = np.array([0, 1], dtype=np.uint64)
        y = splitmix64(x)
        assert y[0] != y[1]
        assert bin(int(y[0]) ^ int(y[1])).count("1") > 10


class TestLongPairHybridDispatch:
    """Pairs whose merge length exceeds _LOCKSTEP_MAX_MERGE route to a
    per-pair searchsorted instead of stretching the lockstep loop
    (round-3 ADVICE: one giant pair must not dominate the batch)."""

    def test_long_pairs_exact(self):
        import numpy as np
        from raydedup.functions.setops import (
            _LOCKSTEP_MAX_MERGE, pairwise_intersection_sizes,
            pairwise_weighted_jaccard)
        rng = np.random.default_rng(11)
        sets_a, sets_b = [], []
        for _ in range(30):                       # short tail
            sets_a.append(np.unique(rng.integers(0, 2**63, 40).astype(np.uint64)))
            sets_b.append(np.unique(rng.integers(0, 2**63, 40).astype(np.uint64)))
        big = np.unique(rng.integers(0, 2**63, 3 * _LOCKSTEP_MAX_MERGE)
                        .astype(np.uint64))
        sets_a.append(big[: 2 * _LOCKSTEP_MAX_MERGE])   # giant overlapping pair
        sets_b.append(big[_LOCKSTEP_MAX_MERGE:])
        sets_a.append(big[:10])                          # asymmetric long/short
        sets_b.append(big)
        av = np.concatenate(sets_a)
        bv = np.concatenate(sets_b)
        ao = np.concatenate([[0], np.cumsum([len(s) for s in sets_a])]).astype(np.int64)
        bo = np.concatenate([[0], np.cumsum([len(s) for s in sets_b])]).astype(np.int64)
        got = pairwise_intersection_sizes(av, ao, bv, bo)
        want = np.array([len(np.intersect1d(a, b))
                         for a, b in zip(sets_a, sets_b)])
        assert (got == want).all()
        wi, _, _ = pairwise_weighted_jaccard(av, ao, bv, bo)
        assert np.allclose(wi, want)
