"""Line-level boilerplate dedup (stages/lines.py)."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.lines import line_doc_counts, remove_boilerplate_lines

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=3)


def _corpus():
    # 6 docs; "FOOTER" in 5 docs, "NAV" in 3 (twice in doc 0 — counts
    # once), "rare" in 1; doc 5 is all boilerplate
    rows = [
        (0, "NAV\nbody zero\nNAV\nFOOTER"),
        (1, "NAV\nbody one\nFOOTER"),
        (2, "NAV\nbody two\nFOOTER"),
        (3, "body three\nrare\nFOOTER"),
        (4, "body four\nFOOTER"),
        (5, "FOOTER"),
    ]
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def _ds(tab):
    import ray.data as rd
    return rd.from_arrow(tab).repartition(3)


def test_line_doc_counts_distinct_docs(ray_session):
    counts = line_doc_counts(_ds(_corpus()), CFG, min_docs=2).to_pandas()
    got = dict(zip(counts["line"], counts["n_docs"]))
    assert got == {"NAV": 3, "FOOTER": 6}  # within-doc repeat counts once


def test_remove_boilerplate_order_and_empty(ray_session):
    out = remove_boilerplate_lines(_ds(_corpus()), CFG, min_docs=4) \
        .to_pandas().set_index("doc_id")["text_clean"].to_dict()
    # FOOTER (6 docs) removed; NAV (3 docs) kept; doc 5 becomes ''
    assert out[0] == "NAV\nbody zero\nNAV"
    assert out[3] == "body three\nrare"
    assert out[5] == ""
    assert len(out) == 6


def test_no_boilerplate_is_identity(ray_session):
    out = remove_boilerplate_lines(_ds(_corpus()), CFG, min_docs=99) \
        .to_pandas().set_index("doc_id")["text_clean"].to_dict()
    src = {i: t for i, t in zip(_corpus()["doc_id"].to_pylist(),
                                _corpus()["text"].to_pylist())}
    assert out == src


def test_partitioned_path_matches_broadcast(ray_session):
    """broadcast_max=0 forces the exploded co-partitioned scale path;
    results must be row-identical to the broadcast path."""
    a = remove_boilerplate_lines(_ds(_corpus()), CFG, min_docs=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = remove_boilerplate_lines(_ds(_corpus()), CFG, min_docs=3,
                                 broadcast_max=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a[["doc_id", "text_clean"]].equals(b[["doc_id", "text_clean"]])


def test_partitioned_path_larger_random(ray_session):
    """Randomized cross-check of the two physical plans on a corpus big
    enough that every partition is non-trivial."""
    rng = np.random.default_rng(7)
    pool = [f"line{i}" for i in range(40)]
    texts = ["\n".join(rng.choice(pool, size=rng.integers(1, 8)))
             for _ in range(200)]
    tab = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    a = remove_boilerplate_lines(_ds(tab), CFG, min_docs=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = remove_boilerplate_lines(_ds(tab), CFG, min_docs=10,
                                 broadcast_max=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "text_clean"]].equals(b[["doc_id", "text_clean"]])
    # sanity: something was actually removed
    assert (a["text_clean"] != tab["text"].to_pandas()).any()


class TestParagraphGranularity:
    def test_sep_paragraphs(self, ray_session):
        import duckdb
        from raydedup.stages.lines import remove_boilerplate_lines
        import ray.data as rd
        # same footer paragraph in all 6 docs; bodies unique; one doc
        # has a body containing single newlines (NOT paragraph breaks)
        texts = ["body %d\nstill body %d\n\nshared footer" % (i, i)
                 for i in range(6)]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "text": pa.array(texts, pa.string())}))
        out = remove_boilerplate_lines(ds, CFG, min_docs=5, sep="\n\n") \
            .to_pandas().sort_values("doc_id")
        # footer paragraph stripped; single-\n body intact
        assert list(out["text_clean"]) == \
            ["body %d\nstill body %d" % (i, i) for i in range(6)]
        # line granularity strips the footer LINE and the empty line
        # (both in all 6 docs) — same bodies, different mechanics
        out_line = remove_boilerplate_lines(ds, CFG, min_docs=5) \
            .to_pandas().sort_values("doc_id")
        assert list(out_line["text_clean"]) == \
            ["body %d\nstill body %d" % (i, i) for i in range(6)]
