"""Decontamination-stage tests: planted leaks must be dropped, clean
docs kept, matches audited, exact variant byte-precise."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=4, batch_size=64)


def _ds(ids, texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


def _mk_corpus():
    rng = np.random.default_rng(5)
    base = ["w%d" % i for i in range(60)]
    ref_texts = [" ".join(rng.permutation(base).tolist()) for _ in range(5)]
    # leaked: reference doc with ONE token changed (J ≈ 55/57 > 0.8)
    leaked = []
    for t in ref_texts[:3]:
        toks = t.split()
        toks[30] = "CHANGED"
        leaked.append(" ".join(toks))
    clean = [" ".join("c%d_%d" % (i, j) for j in range(50))
             for i in range(10)]
    corpus_texts = leaked + clean
    return ref_texts, corpus_texts


class TestDecontaminate:
    def test_planted_leaks_dropped_clean_kept(self, ray_session):
        from raydedup.stages.decontam import decontaminate
        ref_texts, corpus_texts = _mk_corpus()
        ref = _ds(range(1000, 1000 + len(ref_texts)), ref_texts)
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        kept = decontaminate(corpus, ref, CFG).to_pandas()
        assert sorted(kept["doc_id"]) == list(range(3, 13))  # leaks 0-2 gone

    def test_matches_against_bruteforce(self, ray_session):
        from raydedup.functions.text import shingle_batch
        from raydedup.functions.setops import pairwise_jaccard
        from raydedup.stages.decontam import decontamination_matches
        ref_texts, corpus_texts = _mk_corpus()
        ref = _ds(range(1000, 1000 + len(ref_texts)), ref_texts)
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        got = decontamination_matches(corpus, ref, CFG).to_pandas()
        # brute force: all (corpus, ref) pairs
        want = set()
        cv, co = shingle_batch(pa.array(corpus_texts), CFG.k_shingle)
        rv, ro = shingle_batch(pa.array(ref_texts), CFG.k_shingle)
        for i in range(len(corpus_texts)):
            for j in range(len(ref_texts)):
                _, _, jac = pairwise_jaccard(
                    cv[co[i]:co[i + 1]], np.array([0, co[i + 1] - co[i]]),
                    rv[ro[j]:ro[j + 1]], np.array([0, ro[j + 1] - ro[j]]))
                if jac[0] >= CFG.verify_threshold:
                    want.add((i, 1000 + j))
        assert set(zip(got["corpus_id"], got["ref_id"])) == want
        assert len(want) == 3

    def test_exact_variant(self, ray_session):
        from raydedup.stages.decontam import decontaminate_exact
        ref = _ds([100, 101], ["exact duplicate body", "other ref"])
        corpus = _ds([0, 1, 2], ["exact duplicate body",
                                 "near exact duplicate body",
                                 "completely different"])
        kept = decontaminate_exact(corpus, ref, CFG).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 2]   # only byte-identical dropped

    def test_empty_reference_keeps_all(self, ray_session):
        from raydedup.stages.decontam import decontaminate, decontaminate_exact
        corpus = _ds([0, 1], ["a doc here today", "another doc there now"])
        empty_ref = _ds([], [])
        assert decontaminate(corpus, empty_ref, CFG).count() == 2
        assert decontaminate_exact(corpus, empty_ref, CFG).count() == 2

    def test_short_docs_never_match(self, ray_session):
        # < k tokens → empty shingle set → never dropped (matches the
        # SQL oracle's len(t) >= 5 guard)
        from raydedup.stages.decontam import decontaminate
        ref = _ds([100], ["tiny doc"])
        corpus = _ds([0], ["tiny doc"])   # identical but sub-shingle-length
        assert decontaminate(corpus, ref, CFG).count() == 1

    def test_prebuilt_pack_reuse(self, ray_session):
        from raydedup.stages.decontam import (
            build_reference_pack, decontaminate, decontamination_matches)
        ref_texts, corpus_texts = _mk_corpus()
        ref = _ds(range(1000, 1000 + len(ref_texts)), ref_texts)
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        pack = build_reference_pack(ref, CFG)
        kept = decontaminate(corpus, None, CFG, pack=pack).to_pandas()
        m = decontamination_matches(corpus, None, CFG, pack=pack).to_pandas()
        assert sorted(kept["doc_id"]) == list(range(3, 13))
        assert len(m) == 3


class TestDecontamCLI:
    def test_cmd_decontam_writes_both_outputs(self, ray_session, tmp_path):
        import argparse
        import pyarrow.parquet as pq
        from raydedup.__main__ import cmd_decontam

        ref_texts, corpus_texts = _mk_corpus()
        ref_tab = pa.table({
            "doc_id": pa.array(np.arange(1000, 1000 + len(ref_texts))),
            "text": pa.array(ref_texts, pa.string())})
        cor_tab = pa.table({
            "doc_id": pa.array(np.arange(len(corpus_texts))),
            "text": pa.array(corpus_texts, pa.string())})
        pq.write_table(ref_tab, tmp_path / "ref.parquet")
        pq.write_table(cor_tab, tmp_path / "corpus.parquet")
        out = tmp_path / "out"
        cmd_decontam(argparse.Namespace(
            input=str(tmp_path / "corpus.parquet"),
            reference=str(tmp_path / "ref.parquet"),
            output=str(out), threshold=None, exact=False))
        import ray.data as rd
        kept = rd.read_parquet(str(out / "corpus")).to_pandas()
        matches = rd.read_parquet(str(out / "matches")).to_pandas()
        assert sorted(kept["doc_id"]) == list(range(3, 13))
        assert len(matches) == 3


class TestNgramGuard:
    """13-gram leakage guard: exact window semantics vs a DuckDB
    per-position oracle on planted overlaps."""

    def _mk(self):
        # ref doc 1000 = 30 tokens; corpus doc 0 embeds tokens 5..25 of
        # it (a 21-token run → shares many 13-grams); doc 1 shares a
        # 12-token run (BELOW the width → clean at n=13); doc 2 clean.
        ref = ["r%d" % i for i in range(30)]
        d0 = ["x%d" % i for i in range(5)] + ref[5:26] + ["y0", "y1"]
        d1 = ["p%d" % i for i in range(10)] + ref[5:17] + ["q0", "q1"]
        d2 = ["z%d" % i for i in range(25)]
        return [" ".join(ref)], [" ".join(d) for d in (d0, d1, d2)]

    def test_planted_overlap_vs_duckdb(self, ray_session):
        import duckdb
        from raydedup.stages.decontam import (
            decontaminate_ngram, ngram_contamination_stats)
        ref_texts, corpus_texts = self._mk()
        ref = _ds([1000], ref_texts)
        corpus = _ds([0, 1, 2], corpus_texts)
        kept = decontaminate_ngram(corpus, ref, CFG, n=13).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 2]
        stats = ngram_contamination_stats(corpus, ref, CFG, n=13) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        # DuckDB oracle: per-position 13-gram windows
        con = duckdb.connect()
        con.execute("CREATE TABLE c(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO c VALUES (?, ?)",
                        list(zip([0, 1, 2], corpus_texts)))
        con.execute("CREATE TABLE r(text VARCHAR)")
        con.executemany("INSERT INTO r VALUES (?)",
                        [(t,) for t in ref_texts])
        want = con.execute("""
            WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM c),
            grams AS (
              SELECT doc_id, array_to_string(t[i:i+12], ' ') g
              FROM toks, LATERAL (SELECT unnest(range(1, len(t)-11)) i)
              WHERE len(t) >= 13),
            rt AS (SELECT string_split(text,' ') t FROM r),
            rg AS (SELECT DISTINCT array_to_string(t[i:i+12], ' ') g
                   FROM rt, LATERAL (SELECT unnest(range(1, len(t)-11)) i)
                   WHERE len(t) >= 13)
            SELECT g.doc_id, count(*)::BIGINT n_grams,
                   count(rg.g)::BIGINT n_contaminated
            FROM grams g LEFT JOIN rg ON rg.g = g.g
            GROUP BY g.doc_id HAVING count(rg.g) > 0
            ORDER BY g.doc_id""").df()
        assert list(stats["doc_id"]) == list(want["doc_id"])
        assert list(stats["n_grams"]) == list(want["n_grams"])
        assert list(stats["n_contaminated"]) == list(want["n_contaminated"])
        # 21-token shared run → 21-13+1 = 9 contaminated windows
        assert stats.loc[0, "n_contaminated"] == 9

    def test_max_hits_tolerance(self, ray_session):
        from raydedup.stages.decontam import decontaminate_ngram
        ref_texts, corpus_texts = self._mk()
        ref = _ds([1000], ref_texts)
        corpus = _ds([0, 1, 2], corpus_texts)
        kept = decontaminate_ngram(corpus, ref, CFG, n=13,
                                   max_hits=9).to_pandas()
        assert sorted(kept["doc_id"]) == [0, 1, 2]   # 9 hits tolerated
        kept = decontaminate_ngram(corpus, ref, CFG, n=13,
                                   max_hits=8).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 2]

    def test_prebuilt_pack_and_empty_ref(self, ray_session):
        from raydedup.stages.decontam import (
            build_ngram_pack, decontaminate_ngram)
        ref_texts, corpus_texts = self._mk()
        ref = _ds([1000], ref_texts)
        corpus = _ds([0, 1, 2], corpus_texts)
        pack = build_ngram_pack(ref, 13)
        kept = decontaminate_ngram(corpus, None, CFG, n=13,
                                   pack=pack).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 2]
        # reference with only sub-width docs → no grams → keep all
        short_ref = _ds([2000], ["only four tokens here"])
        assert decontaminate_ngram(corpus, short_ref, CFG,
                                   n=13).count() == 3

    def test_pack_n_mismatch_and_missing_ref_raise(self, ray_session):
        import pytest
        from raydedup.stages.decontam import (
            build_ngram_pack, decontaminate_ngram)
        ref_texts, corpus_texts = self._mk()
        ref = _ds([1000], ref_texts)
        corpus = _ds([0, 1, 2], corpus_texts)
        pack = build_ngram_pack(ref, 13)
        assert pack.n == 13
        # a pack built at n=13 probed at n=7 would silently match
        # nothing — it must fail loudly instead
        with pytest.raises(ValueError, match="n=13"):
            decontaminate_ngram(corpus, None, CFG, n=7, pack=pack)
        # pack's n wins when no explicit n is passed
        kept = decontaminate_ngram(corpus, None, CFG, pack=pack)
        assert sorted(kept.to_pandas()["doc_id"]) == [1, 2]
        # the guard without any reference side is a loud error
        with pytest.raises(ValueError, match="reference"):
            decontaminate_ngram(corpus, None, CFG, n=13)
        from raydedup.pipelines.build import build_corpus
        with pytest.raises(ValueError, match="ngram_n"):
            build_corpus(corpus, CFG, ngram_n=13)
