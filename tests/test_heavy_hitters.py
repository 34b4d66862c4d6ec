"""Misra-Gries heavy hitters: exactness under real compression, the
no-false-negative guarantee at the theoretical summary-size limit, and
the candidate-set bound."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.vocab import heavy_hitters

CFG = DEFAULT_CONFIG.with_(num_partitions=8)


def _zipf_docs(n_docs=400, vocab=3000, tokens_per_doc=60, seed=7):
    """Zipf-ish token stream: head tokens dominate, long tail of
    singletons — the distribution MG compression exists for."""
    rng = np.random.RandomState(seed)
    ranks = rng.zipf(1.3, size=(n_docs, tokens_per_doc)) % vocab
    texts = [" ".join(f"w{r}" for r in row) for row in ranks]
    return texts


def _truth(texts, num, den):
    cnt = collections.Counter(t for s in texts for t in s.split(" ") if t)
    n = sum(cnt.values())
    thresh = (num * n + den - 1) // den
    return {t: c for t, c in cnt.items() if c >= thresh}


def _run(texts, num, den, **kw):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    out = heavy_hitters(ds, CFG, support_num=num, support_den=den,
                        **kw).to_pandas()
    if len(out) == 0:
        return {}
    return dict(zip(out["token"], out["n"]))


class TestHeavyHitters:
    def test_exact_under_compression(self, ray_session):
        texts = _zipf_docs()
        # summary far smaller than the ~3000-token vocab → the
        # subtract-and-drop compress runs on every map chunk
        got = _run(texts, 1, 100, summary_size=250)
        assert got == _truth(texts, 1, 100)

    def test_limit_summary_size(self, ray_session):
        # the guarantee boundary: summary_size = 2/support exactly
        texts = _zipf_docs(seed=11)
        got = _run(texts, 1, 50, summary_size=100)
        assert got == _truth(texts, 1, 50)

    def test_no_hitters(self, ray_session):
        # all tokens distinct → nothing reaches 10% support
        texts = [f"u{i}a u{i}b u{i}c" for i in range(500)]
        assert _run(texts, 1, 10) == {}

    def test_single_dominant_token(self, ray_session):
        texts = ["spam spam spam spam"] * 50 + _zipf_docs(n_docs=50)
        truth = _truth(texts, 1, 20)
        assert "spam" in truth          # fixture sanity: 200 ≥ N/20
        got = _run(texts, 1, 20, summary_size=40)
        assert got == truth
        assert "spam" in got

    def test_counts_are_exact_not_lower_bounds(self, ray_session):
        texts = _zipf_docs(n_docs=100, seed=3)
        got = _run(texts, 1, 32, summary_size=64)   # 64 = the 2/support floor
        cnt = collections.Counter(
            t for s in texts for t in s.split(" ") if t)
        assert got == _truth(texts, 1, 32)
        for tok, n in got.items():
            assert n == cnt[tok]

    def test_sub_guarantee_summary_size_rejected(self, ray_session):
        with pytest.raises(ValueError):
            _run(_zipf_docs(n_docs=20), 1, 100, summary_size=64)


class TestBigramPmi:
    def test_matches_pure_python(self, ray_session):
        import collections
        import math

        import ray.data as rd

        from raydedup.stages.vocab import bigram_pmi

        texts = (["new york city hall", "new york is big", "in new york"] * 7
                 + ["the cat sat on the mat", "a b", ""] * 5)
        tab = pa.table({"text": pa.array(texts, pa.string())})
        out = bigram_pmi(rd.from_arrow(tab), CFG, k=10).to_pandas()
        # pure-python truth (empties kept, bigrams never cross docs)
        uni = collections.Counter()
        bi = collections.Counter()
        for t in texts:
            ws = t.split(" ")
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        n_uni, n_bi = sum(uni.values()), sum(bi.values())
        top = sorted(bi.items(),
                     key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[:10]
        assert len(out) == 10
        got = {(r["x"], r["y"]): (r["n_xy"], r["pmi_e6"])
               for _, r in out.iterrows()}
        for (x, y), c in top:
            pmi = math.log((c / n_bi) / ((uni[x] / n_uni)
                                         * (uni[y] / n_uni)))
            n_got, pmi_got = got[(x, y)]
            assert n_got == c
            assert abs(pmi_got - round(pmi * 1e6)) <= 1
        # perfect collocations (words appearing only in this pair)
        # outrank "the cat"-style pairs with promiscuous member words
        assert got[("city", "hall")][1] > got[("on", "the")][1]


class TestDocSurprisal:
    def test_matches_pure_python(self, ray_session):
        import math

        import ray.data as rd

        from raydedup.stages.vocab import doc_surprisal

        texts = (["the cat sat on the mat"] * 20
                 + ["zqxj vwpk bbfg"] * 2 + [""])
        ids = np.arange(len(texts), dtype=np.int64)
        tab = pa.table({"doc_id": pa.array(ids),
                        "text": pa.array(texts, pa.string())})
        out = doc_surprisal(rd.from_arrow(tab), CFG,
                            support_num=1, support_den=10).to_pandas()
        # truth
        toks = [t.split(" ") for t in texts]
        cnt = collections.Counter(w for ws in toks for w in ws if w)
        n = sum(cnt.values())
        thresh = (n + 9) // 10
        head = {w: c for w, c in cnt.items() if c >= thresh}
        got = {r["doc_id"]: (r["n_tokens"], r["surprisal_e6"])
               for _, r in out.iterrows()}
        assert len(ids) - 1 == len(got)          # empty doc omitted
        for i, ws in enumerate(toks):
            ws = [w for w in ws if w]
            if not ws:
                assert i not in got
                continue
            s = sum(-math.log2((head.get(w, 0.5)) / n) for w in ws) / len(ws)
            n_got, s_got = got[i]
            assert n_got == len(ws)
            assert abs(s_got - round(s * 1e6)) <= 1
        # garbled docs (all OOV) score strictly higher than boilerplate
        assert got[20][1] > got[0][1]
