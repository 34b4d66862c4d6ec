"""End-to-end build_corpus composition: each stage drops its planted
doc class, the composition equals the manual stage chain, the CLI
writes split dirs + disposition + report."""

import numpy as np
import pyarrow as pa

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=4, batch_size=64)


def _ds(ids, texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


def _fixture():
    rng = np.random.default_rng(9)
    base = ["tok%d" % i for i in range(60)]
    ref_texts = [" ".join(rng.permutation(base).tolist()) for _ in range(3)]
    # 0: leaked (1 token changed vs ref[0]) — decontam drops
    leaked = ref_texts[0].split()
    leaked[10] = "CHANGED"
    # 1,2: exact dups of each other — tier exact drops one
    exact = " ".join(rng.permutation(base).tolist())
    # 3,4: near dups (1 token changed) — tier neardup drops one
    nd_a = " ".join(rng.permutation(base).tolist())
    toks = nd_a.split()
    toks[5] = "ALTERED"
    nd_b = " ".join(toks)
    # 5: low quality (too few tokens)
    shorty = "just a few tokens"
    # 6,7: clean unique docs
    clean = [" ".join("c%d_%d" % (i, j) for j in range(50)) for i in range(2)]
    corpus = [" ".join(leaked), exact, exact, nd_a, nd_b, shorty] + clean
    return ref_texts, corpus


class TestBuildCorpus:
    def test_stagewise_drops_and_report(self, ray_session):
        from raydedup.pipelines.build import build_corpus
        ref_texts, corpus_texts = _fixture()
        ref = _ds(range(100, 100 + len(ref_texts)), ref_texts)
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        res = build_corpus(
            corpus, CFG, quality={"min_tokens": 10}, reference=ref,
            splits={"train": 0.7, "val": 0.3})
        out = res.corpus.to_pandas().sort_values("doc_id")
        # doc 5 (quality), doc 0 (leak), one of {1,2}, one of {3,4} gone
        assert set(out["doc_id"]) == {1, 3, 6, 7}
        assert set(out.columns) == {"doc_id", "text", "split"}
        assert set(out["split"]) <= {"train", "val"}
        rep = res.report()
        assert rep.get("quality_dropped") == 1
        assert rep.get("decontam_dropped") == 1
        disp = res.disposition.to_pandas()
        tiers = dict(zip(disp["doc_id"], disp["tier"]))
        assert tiers[2] == "exact" and tiers[4] == "neardup"

    def test_equals_manual_composition(self, ray_session):
        from raydedup.pipelines.build import build_corpus
        from raydedup.pipelines.tiered import tiered_dedup
        from raydedup.stages.decontam import decontaminate
        from raydedup.stages.textstats import quality_filter
        ref_texts, corpus_texts = _fixture()
        ref = _ds(range(100, 100 + len(ref_texts)), ref_texts)
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        got = build_corpus(corpus, CFG, quality={"min_tokens": 10},
                           reference=ref).corpus.to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        manual = tiered_dedup(
            decontaminate(quality_filter(corpus, min_tokens=10),
                          ref, CFG), CFG).corpus.to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.equals(manual)

    def test_minimal_no_optional_stages(self, ray_session):
        from raydedup.pipelines.build import build_corpus
        _, corpus_texts = _fixture()
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        res = build_corpus(corpus, CFG)
        out = res.corpus.to_pandas()
        # only the dedup tiers act: exact dup + near dup each lose one
        assert set(out["doc_id"]) == {0, 1, 3, 5, 6, 7}


class TestBuildCLI:
    def test_cmd_build_writes_everything(self, ray_session, tmp_path):
        import argparse
        import json
        import pyarrow.parquet as pq
        from raydedup.__main__ import cmd_build

        ref_texts, corpus_texts = _fixture()
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(100, 100 + len(ref_texts))),
            "text": pa.array(ref_texts, pa.string())}),
            tmp_path / "ref.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(len(corpus_texts))),
            "text": pa.array(corpus_texts, pa.string())}),
            tmp_path / "corpus.parquet")
        out = tmp_path / "out"
        cmd_build(argparse.Namespace(
            input=str(tmp_path / "corpus.parquet"),
            reference=str(tmp_path / "ref.parquet"),
            output=str(out), ngram=None, min_tokens=10, min_alpha=None,
            max_dup_frac_e6=None, threshold=None, line_min_docs=None,
            splits="train=0.7,val=0.3"))
        import ray.data as rd
        kept = rd.read_parquet(str(out / "corpus")).to_pandas()
        assert set(kept["doc_id"]) == {1, 3, 6, 7}
        disp = rd.read_parquet(str(out / "disposition")).to_pandas()
        assert len(disp) == 6   # tiered input: 8 - quality 1 - decontam 1
        rep = json.load(open(out / "report.json"))
        assert rep["quality_dropped"] == 1


class TestBuildOptionalStages:
    def test_ngram_guard_and_line_tier(self, ray_session):
        from raydedup.pipelines.build import build_corpus
        # reference doc shares a 13-token run with corpus doc 0 (not a
        # near-dup — only ~25% overlap); boilerplate line in all docs
        run = ["r%d" % i for i in range(13)]
        ref = _ds([500], [" ".join(run + ["extra%d" % i for i in range(40)])])
        nav = "NAVBAR HOME ABOUT"
        c0 = nav + "\n" + " ".join(["x%d" % i for i in range(40)] + run)
        c1 = nav + "\n" + " ".join("y%d" % i for i in range(50))
        c2 = nav + "\n" + " ".join("z%d" % i for i in range(50))
        corpus = _ds([0, 1, 2], [c0, c1, c2])
        # line tier counts docs AFTER decontam (doc 0 already gone)
        res = build_corpus(corpus, CFG, reference=ref, ngram_n=13,
                           line_min_docs=2)
        out = res.corpus.to_pandas().sort_values("doc_id")
        assert sorted(out["doc_id"]) == [1, 2]          # doc 0 leaked
        # line tier stripped the nav line before dedup tiers
        assert all(not t.startswith(nav) for t in out["text"])
        rep = res.report()
        assert rep.get("decontam_ngram_dropped") == 1

    def test_prebuilt_packs(self, ray_session):
        from raydedup.pipelines.build import build_corpus
        from raydedup.stages.decontam import (build_ngram_pack,
                                              build_reference_pack)
        ref_texts, corpus_texts = _fixture()
        ref = _ds(range(100, 100 + len(ref_texts)), ref_texts)
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        dpack = build_reference_pack(ref, CFG)
        npack = build_ngram_pack(ref, 13)
        got = build_corpus(corpus, CFG, reference=None, ngram_n=13,
                           decontam_pack=dpack, ngram_pack=npack) \
            .corpus.to_pandas()
        want = build_corpus(corpus, CFG, reference=ref, ngram_n=13) \
            .corpus.to_pandas()
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])


class TestTokenizeOncePrefix:
    def test_cache_column_roundtrip_and_slices(self, ray_session):
        from raydedup.functions.text import (column_to_tokens,
                                             tokenize_arrow,
                                             tokens_to_column)
        texts = pa.array(["a b c", "", "d e", "f"], pa.string())
        h, offs = tokenize_arrow(texts)
        col = tokens_to_column(h, offs)
        h2, offs2 = column_to_tokens(col)
        assert np.array_equal(h, h2) and np.array_equal(offs, offs2)
        # filtered/sliced arrays reconstruct the kept rows' tokens
        keep = pa.array([True, False, True, True])
        fcol = col.filter(keep)
        fh, foffs = column_to_tokens(fcol)
        want_h = np.concatenate([h[offs[0]:offs[1]], h[offs[2]:offs[3]],
                                 h[offs[3]:offs[4]]])
        assert np.array_equal(fh, want_h)
        assert foffs.tolist() == [0, 3, 5, 6]
        scol = col.slice(2, 2)
        sh, soffs = column_to_tokens(scol)
        assert np.array_equal(sh, h[offs[2]:offs[4]])
        assert soffs.tolist() == [0, 2, 3]

    def test_carry_chain_bit_identical(self, ray_session):
        """quality -> decontam -> ngram with the token cache carried ==
        the same chain tokenizing per stage, and the transient column
        never leaks into the final corpus."""
        from raydedup.functions.text import TOKEN_CACHE_COL
        from raydedup.stages.decontam import (decontaminate,
                                              decontaminate_ngram)
        from raydedup.stages.textstats import quality_filter
        ref_texts, corpus_texts = _fixture()
        ref = _ds(range(100, 100 + len(ref_texts)), ref_texts)

        def chain(carry):
            corpus = _ds(range(len(corpus_texts)), corpus_texts)
            cur = quality_filter(corpus, min_tokens=10,
                                 carry_tokens=carry)
            cur = decontaminate(cur, ref, CFG, carry_tokens=carry)
            cur = decontaminate_ngram(cur, ref, CFG, n=13)
            if carry:
                cur = cur.map_batches(
                    lambda t: (t.drop_columns([TOKEN_CACHE_COL])
                               if TOKEN_CACHE_COL in t.column_names
                               else t), batch_format="pyarrow")
            return cur.to_pandas().sort_values("doc_id") \
                .reset_index(drop=True)

        a, b = chain(False), chain(True)
        assert list(a.columns) == list(b.columns)
        assert a.equals(b)
        assert TOKEN_CACHE_COL not in b.columns

    def test_build_corpus_output_has_no_cache_column(self, ray_session):
        from raydedup.functions.text import TOKEN_CACHE_COL
        from raydedup.pipelines.build import build_corpus
        ref_texts, corpus_texts = _fixture()
        ref = _ds(range(100, 100 + len(ref_texts)), ref_texts)
        corpus = _ds(range(len(corpus_texts)), corpus_texts)
        res = build_corpus(corpus, CFG, quality={"min_tokens": 10},
                           reference=ref, ngram_n=13)
        out = res.corpus.to_pandas()
        assert TOKEN_CACHE_COL not in out.columns
        assert set(out["doc_id"]) <= {1, 2, 3, 4, 6, 7}
