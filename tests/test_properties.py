"""Property-based tests (hypothesis) for the core kernels."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raydedup.functions.setops import (
    _intersection_mergecount,
    _intersection_packed,
    pairwise_jaccard,
)
from raydedup.functions.sketches import minhash_signatures_oph
from raydedup.functions.text import char_ngram_batch, shingle_batch
from raydedup.functions.hashing import perm_seeds

set_lists = st.lists(
    st.lists(st.integers(min_value=0, max_value=120), max_size=25),
    min_size=1, max_size=12,
)


def _csr(list_of_sets):
    rows = [np.array(sorted(set(s)), dtype=np.uint64) for s in list_of_sets]
    offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offs[1:])
    vals = np.concatenate(rows) if rows else np.empty(0, np.uint64)
    return vals, offs


@settings(max_examples=80, deadline=None)
@given(set_lists, set_lists)
def test_jaccard_matches_python_sets(a_sets, b_sets):
    n = min(len(a_sets), len(b_sets))
    a_sets, b_sets = a_sets[:n], b_sets[:n]
    av, ao = _csr(a_sets)
    bv, bo = _csr(b_sets)
    inter, union, j = pairwise_jaccard(av, ao, bv, bo)
    for i in range(n):
        sa, sb = set(a_sets[i]), set(b_sets[i])
        assert inter[i] == len(sa & sb)
        assert union[i] == len(sa | sb)
        want = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
        assert abs(j[i] - want) < 1e-12


@settings(max_examples=60, deadline=None)
@given(set_lists, set_lists)
def test_packed_equals_mergecount(a_sets, b_sets):
    n = min(len(a_sets), len(b_sets))
    av, ao = _csr(a_sets[:n])
    bv, bo = _csr(b_sets[:n])
    assert (_intersection_packed(av, ao, bv, bo)
            == _intersection_mergecount(av, ao, bv, bo)).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=200),
       st.integers(0, 2**31))
def test_oph_identical_sets_identical_sigs(elems, salt):
    vals = np.array(sorted(set(elems)), dtype=np.uint64)
    offs = np.array([0, len(vals), 2 * len(vals)], dtype=np.int64)
    both = np.concatenate([vals, vals])
    sig = minhash_signatures_oph(both, offs, 128, np.uint64(salt))
    assert (sig[0] == sig[1]).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", max_size=60), min_size=1, max_size=8),
       st.integers(1, 4), st.integers(0, 2**31))
def test_stream_oph_equals_set_oph(texts, k, salt):
    # the fused banding path must be bit-identical to the sorted-set
    # construction on arbitrary text (duplicates, empties, short docs)
    from raydedup.functions.sketches import minhash_oph_stream
    from raydedup.functions.text import shingle_stream
    arr = pa.array(texts, pa.string())
    vals, offs = shingle_batch(arr, k)
    want = minhash_signatures_oph(vals, offs, 64, np.uint64(salt))
    wh, wd, nd = shingle_stream(arr, k)
    got = minhash_oph_stream(wh, wd, nd, 64, np.uint64(salt))
    assert nd == len(texts)
    assert (got == want).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 300)),
                min_size=1, max_size=120),
       st.integers(2, 12))
def test_salted_emission_invariants(rows, cap):
    # over-cap runs: every member appears, pair graph per bucket is
    # connected, no pair duplicated after dedup, all pairs canonical
    from raydedup.stages.lsh import _emit_run_pairs
    from tests.oracle import union_find_components
    keys = np.array([r[0] for r in rows], dtype=np.int64)
    ids = np.array([r[1] for r in rows], dtype=np.int64)
    # ids must be unique per bucket for connectivity semantics
    uniq = {}
    for k_, i_ in zip(keys, ids):
        uniq.setdefault(k_, set()).add(i_)
    keys = np.array([k_ for k_, s in uniq.items() for _ in s], np.int64)
    ids = np.array([i_ for _, s in uniq.items() for i_ in s], np.int64)
    lo, hi, stats = _emit_run_pairs(keys, ids, cap)
    assert (lo < hi).all()
    for k_, members in uniq.items():
        if len(members) < 2:
            continue
        sel = [(a, b) for a, b in zip(lo, hi)
               if a in members and b in members]
        comp = union_find_components(sel)
        # all members of the bucket connected through its pairs
        assert set(comp) >= members
        assert len({comp[m] for m in members}) == 1


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", max_size=40), min_size=1, max_size=8),
       st.integers(1, 4))
def test_shingle_count_matches_python(texts, k):
    vals, offs = shingle_batch(pa.array(texts, pa.string()), k)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        want = {tuple(toks[j:j + k]) for j in range(len(toks) - k + 1)} \
            if len(toks) >= k else set()
        assert offs[i + 1] - offs[i] == len(want), (t, k)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="xyz", max_size=20), min_size=1, max_size=6))
def test_char_ngrams_match_python(texts):
    vals, offs = char_ngram_batch(pa.array(texts, pa.string()), 2)
    for i, t in enumerate(texts):
        want = {t[j:j + 2] for j in range(len(t) - 1)} if len(t) >= 2 else set()
        assert offs[i + 1] - offs[i] == len(want), t


@settings(max_examples=50, deadline=None)
@given(set_lists, set_lists)
def test_weighted_jaccard_matches_python(a_sets, b_sets):
    from raydedup.functions.setops import pairwise_weighted_jaccard
    n = min(len(a_sets), len(b_sets))
    a_sets, b_sets = a_sets[:n], b_sets[:n]
    av, ao = _csr(a_sets)
    bv, bo = _csr(b_sets)
    w = np.arange(130, dtype=np.float64) * 0.5 + 1.0   # w(x) = 1 + x/2
    wi, wu, j = pairwise_weighted_jaccard(av, ao, bv, bo, weight_of=w)
    for i in range(n):
        sa, sb = set(a_sets[i]), set(b_sets[i])
        want_wi = sum(w[x] for x in sa & sb)
        want_ws = sum(w[x] for x in sa) + sum(w[x] for x in sb)
        assert abs(wi[i] - want_wi) < 1e-9
        assert abs(wu[i] - (want_ws - want_wi)) < 1e-9


# ------------------------ round-5 kernels: side tags, BM25, quantiles

side_ids = st.lists(st.integers(min_value=-(2**62) + 1,
                                max_value=2**62 - 1),
                    min_size=1, max_size=50)


@settings(max_examples=80, deadline=None)
@given(side_ids, side_ids)
def test_side_tag_decode_roundtrip(left, right):
    """tag_side/decode_sides: any cross pair of tagged ids decodes to
    the original (left, right) pair regardless of canonical order."""
    from raydedup.stages.allpairs import decode_sides
    la = np.asarray(left, dtype=np.int64) * 2
    rb = np.asarray(right, dtype=np.int64) * 2 + 1
    n = min(len(la), len(rb))
    a = np.minimum(la[:n], rb[:n])      # canonical a<b order
    b = np.maximum(la[:n], rb[:n])
    gl, gr = decode_sides(a, b)
    assert (gl == np.asarray(left[:n], dtype=np.int64)).all()
    assert (gr == np.asarray(right[:n], dtype=np.int64)).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=2, max_size=120),
       st.lists(st.text(alphabet="abcd", min_size=1, max_size=2),
                min_size=2, max_size=120),
       st.sampled_from([0.1, 0.25, 0.5, 0.9, 1.0]))
def test_grouped_quantile_reduce_matches_duckdb(vals, keys, q):
    """The partition-local rank-read kernel (same arithmetic the
    distributed _reduce runs) matches DuckDB quantile_disc per group
    on arbitrary key/value multisets."""
    import math

    import duckdb
    n = min(len(vals), len(keys))
    vals, keys = vals[:n], keys[:n]
    got = {}
    for k in set(keys):
        kv = sorted(v for v, kk in zip(vals, keys) if kk == k)
        rank = max(1, math.ceil(q * len(kv)))
        got[k] = kv[rank - 1]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS k, unnest(?) AS v",
                [keys, vals])
    want = dict(con.execute(
        "SELECT k, quantile_disc(v, ?) FROM t GROUP BY k", [q]).fetchall())
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(1, 5), min_size=2, max_size=30),
       st.lists(st.integers(10, 60), min_size=2, max_size=30))
def test_bm25_contract_properties(tfs, dls):
    """The e6-integer BM25 contract: scores are positive when tf>0,
    monotonically non-decreasing in tf and non-increasing in dl
    (same idf), and invariant to term summation order."""
    import math
    n = min(len(tfs), len(dls))
    tfs, dls = tfs[:n], dls[:n]
    N, df = 1000, 37
    idf = math.log((N - df + 0.5) / (df + 0.5) + 1)
    avgdl = sum(dls) / len(dls)

    def c_e6(tf, dl):
        c = idf * tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75
                                                  + 0.75 * dl / avgdl))
        return int(math.copysign(math.floor(abs(c * 1e6) + 0.5), c))

    for tf, dl in zip(tfs, dls):
        assert c_e6(tf, dl) > 0
        assert c_e6(tf + 1, dl) >= c_e6(tf, dl)
        assert c_e6(tf, dl + 10) <= c_e6(tf, dl)
    # integer sum is order-invariant by construction
    parts = [c_e6(tf, dl) for tf, dl in zip(tfs, dls)]
    assert sum(parts) == sum(reversed(parts))
