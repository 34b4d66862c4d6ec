"""Substring (≥L-token run) dedup tests."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=2, batch_size=256)
L = 8  # min duplicated run length for tests


def _mk_docs(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


SHARED = " ".join(f"s{i}" for i in range(12))   # 12-token shared run


class TestDuplicateSpans:
    def test_cross_doc_duplicate_found(self, ray_session):
        from raydedup.stages.substring import find_duplicate_spans
        texts = [
            "a1 a2 a3 " + SHARED + " a4 a5",
            "b1 b2 " + SHARED + " b3",
            "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
        ]
        spans = find_duplicate_spans(_mk_docs(texts), CFG, min_tokens=L) \
            .to_pandas().sort_values("doc_id")
        # only the LATER doc (doc 1) gets a span; doc 0 is the original
        assert spans["doc_id"].tolist() == [1]
        row = spans.iloc[0]
        # the span covers exactly the shared 12 tokens (positions 2..14)
        assert row["start_tok"] == 2 and row["end_tok"] == 14

    def test_no_false_spans_on_random_docs(self, ray_session):
        from raydedup.stages.substring import find_duplicate_spans
        rng = np.random.default_rng(0)
        texts = [" ".join(f"w{rng.integers(0, 10**9)}" for _ in range(100))
                 for _ in range(20)]
        spans = find_duplicate_spans(_mk_docs(texts), CFG, min_tokens=L)
        assert spans.count() == 0

    def test_within_doc_repeat(self, ray_session):
        from raydedup.stages.substring import find_duplicate_spans
        texts = ["x1 x2 " + SHARED + " mid " + SHARED + " end"]
        spans = find_duplicate_spans(_mk_docs(texts), CFG, min_tokens=L) \
            .to_pandas()
        assert len(spans) == 1
        row = spans.iloc[0]
        assert row["start_tok"] == 15 and row["end_tok"] == 27

    def test_substring_dedup_cuts_later_copy(self, ray_session):
        from raydedup.stages.substring import substring_dedup
        texts = [
            "a1 a2 a3 " + SHARED + " a4 a5",
            "b1 b2 " + SHARED + " b3",
        ]
        out = substring_dedup(_mk_docs(texts), CFG, min_tokens=L) \
            .to_pandas().sort_values("doc_id")
        assert out.iloc[0]["text_deduped"] == texts[0]
        assert out.iloc[0]["n_cut_tokens"] == 0
        assert out.iloc[1]["text_deduped"] == "b1 b2 b3"
        assert out.iloc[1]["n_cut_tokens"] == 12

    def test_many_spans_partitioned_cut_matches_python_oracle(
            self, ray_session):
        # hundreds of spans over hundreds of docs: the doc-partitioned
        # vectorized cut must agree with a straightforward per-doc
        # Python cut (the span table never touches a broadcast)
        from raydedup.stages.substring import (
            find_duplicate_spans, substring_dedup)
        rng = np.random.default_rng(7)
        boiler = " ".join(f"bp{i}" for i in range(L + 4))
        texts = []
        for d in range(300):
            toks = [f"u{d}_{i}" for i in range(int(rng.integers(20, 60)))]
            if d % 3:
                ins = int(rng.integers(0, len(toks)))
                toks = toks[:ins] + boiler.split(" ") + toks[ins:]
            texts.append(" ".join(toks))
        cfg = PipelineConfig(num_partitions=4, batch_size=64)
        spans = find_duplicate_spans(_mk_docs(texts), cfg, min_tokens=L) \
            .to_pandas()
        out = substring_dedup(_mk_docs(texts), cfg, min_tokens=L) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out) == 300
        # python oracle cut from the same span table
        by_doc = spans.groupby("doc_id")
        for d in range(300):
            toks = texts[d].split(" ")
            keep = np.ones(len(toks), bool)
            if d in by_doc.groups:
                for _, r in by_doc.get_group(d).iterrows():
                    keep[int(r["start_tok"]):int(r["end_tok"])] = False
            want = " ".join(t for t, k in zip(toks, keep) if k)
            assert out.iloc[d]["text_deduped"] == want, d
            assert out.iloc[d]["n_cut_tokens"] == int((~keep).sum())
        # sanity: the planted boilerplate produced real spans
        assert len(spans) > 100

    def test_exact_dup_docs_keep_one(self, ray_session):
        from raydedup.stages.substring import substring_dedup
        base = " ".join(f"t{i}" for i in range(30))
        out = substring_dedup(_mk_docs([base, base]), CFG, min_tokens=L) \
            .to_pandas().sort_values("doc_id")
        assert out.iloc[0]["text_deduped"] == base
        assert out.iloc[1]["text_deduped"] == ""
        assert out.iloc[1]["n_cut_tokens"] == 30
