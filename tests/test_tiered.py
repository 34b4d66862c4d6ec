"""Tiered dedup (exact → near-dup → substring) composition tests."""

import numpy as np
import pyarrow as pa

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=4)


def _docs_ds(rows):
    import ray.data as rd
    ids, texts = zip(*rows)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "text": pa.array(list(texts), pa.string()),
    }))


BASE = " ".join(f"w{i}" for i in range(60))


def _fixture():
    """doc_ids with known dispositions:
      0,1,2  — byte-identical           → 0 kept, 1/2 exact
      3,10   — byte-identical to each other → 3 survives tier 1, 10 exact
      0,3,11 — all share BASE (J≥0.8 pairwise) → near-dup cluster
               {0,3,11}; 0 (min id) kept, 3 and 11 neardup-removed
      20..22 — unique docs              → kept
    """
    rows = [
        (0, BASE + " zz"),
        (1, BASE + " zz"),
        (2, BASE + " zz"),
        (3, BASE + " near"),
        (10, BASE + " near"),
        (11, BASE + " near extra"),
        (20, "unique alpha " + " ".join(f"a{i}" for i in range(30))),
        (21, "unique beta " + " ".join(f"b{i}" for i in range(30))),
        (22, "unique gamma " + " ".join(f"c{i}" for i in range(30))),
    ]
    return _docs_ds(rows)


class TestTieredDedup:
    def test_disposition_and_corpus(self, ray_session):
        from raydedup.pipelines.tiered import tiered_dedup
        res = tiered_dedup(_fixture(), CFG)
        disp = res.disposition.to_pandas().set_index("doc_id")["tier"]
        assert disp.to_dict() == {
            0: "kept", 1: "exact", 2: "exact",
            3: "neardup", 10: "exact", 11: "neardup",
            20: "kept", 21: "kept", 22: "kept",
        }
        corpus = res.corpus.to_pandas()
        assert sorted(corpus["doc_id"]) == [0, 20, 21, 22]
        # corpus keeps original columns
        assert set(corpus.columns) == {"doc_id", "text"}
        # every input doc appears exactly once in the disposition
        assert len(disp) == 9

    def test_stats(self, ray_session):
        from raydedup.pipelines.tiered import tiered_dedup_stats
        st = tiered_dedup_stats(_fixture(), CFG).to_pandas()
        got = dict(zip(st["tier"], st["n_docs"]))
        assert got == {"kept": 4, "exact": 3, "neardup": 2}

    def test_trim_stats_on_kept_corpus(self, ray_session):
        # two KEPT docs sharing a long run (but below J=0.8 overall so
        # the near-dup tier keeps both) → the substring tier reports a
        # cut on the non-first occurrence
        from raydedup.pipelines.tiered import tiered_trim_stats
        run = " ".join(f"r{i}" for i in range(25))
        pad_a = " ".join(f"pa{i}" for i in range(60))
        pad_b = " ".join(f"pb{i}" for i in range(60))
        rows = [(1, run + " " + pad_a), (2, run + " " + pad_b)]
        out = tiered_trim_stats(_docs_ds(rows), CFG,
                                min_tokens=20).to_pandas()
        got = dict(zip(out["doc_id"], out["n_cut_tokens"]))
        assert list(got) == [2] and got[2] >= 20

    def test_empty_and_all_unique(self, ray_session):
        from raydedup.pipelines.tiered import tiered_dedup
        rows = [(i, f"solo{i} " + " ".join(f"s{i}_{j}" for j in range(20)))
                for i in range(5)]
        res = tiered_dedup(_docs_ds(rows), CFG)
        disp = res.disposition.to_pandas()
        assert set(disp["tier"]) == {"kept"}
        assert res.corpus.count() == 5


class TestLineTier:
    def test_line_tier_equals_manual_compose(self, ray_session):
        """tiered_dedup(line_min_docs=N) == remove_boilerplate_lines
        then tiered_dedup — same corpus text and same disposition."""
        from raydedup.pipelines.tiered import tiered_dedup
        from raydedup.stages.lines import remove_boilerplate_lines

        # three docs sharing a footer line, bodies near-identical after
        # the footer is stripped; without tier 0 the footer keeps them
        # from being byte-identical
        rows = [(i, BASE + f" only{i}\nSHARED FOOTER") for i in range(3)]
        rows += [(10, "solo doc\nSHARED FOOTER"),
                 (11, "another body entirely")]
        ds = _docs_ds(rows)

        res = tiered_dedup(ds, CFG, line_min_docs=4)
        import pyarrow.compute as pc_

        def _swap(t):
            i = t.column_names.index("text")
            return t.set_column(i, "text", t["__line_clean"]) \
                .drop_columns(["__line_clean"])

        manual = tiered_dedup(
            remove_boilerplate_lines(ds, CFG, min_docs=4,
                                     out_col="__line_clean")
            .map_batches(_swap, batch_format="pyarrow"), CFG)

        a = res.corpus.to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        b = manual.corpus.to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        assert a.equals(b)
        da = res.disposition.to_pandas().set_index("doc_id")["tier"].to_dict()
        db = manual.disposition.to_pandas().set_index("doc_id")["tier"].to_dict()
        assert da == db
        # the footer is gone from every surviving text
        assert not a["text"].str.contains("SHARED FOOTER").any()
