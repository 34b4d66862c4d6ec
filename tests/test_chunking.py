"""chunk_documents vs a pure-python reference and the DuckDB oracle —
edge cases: empty text, multi-byte UTF-8, double spaces (empty tokens),
exact-boundary lengths, stride == chunk (disjoint windows)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _ref_chunks(text: str, chunk: int, stride: int):
    toks = text.split(" ")
    n = len(toks)
    nc = 1 if n <= chunk else 1 + -(-(n - chunk) // stride)
    return [(" ".join(toks[i * stride: i * stride + chunk]),
             min(i * stride + chunk, n) - i * stride)
            for i in range(nc)]


TEXTS = [
    "",                                        # 1 empty token
    "a b c",                                   # shorter than chunk
    "x " * 31 + "x",                           # exactly 32 tokens
    "y " * 32 + "y",                           # 33 -> 2 chunks at stride 24
    " ".join(f"t{i}" for i in range(99)),      # 4 chunks
    "ü ß 漢字 " * 20 + "end",                   # multi-byte UTF-8
    "a  b   c",                                # empty tokens (runs of spaces)
    "solo",
]


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunks")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS, pa.string())}),
        d / "documents.parquet")
    return str(d)


def test_chunks_match_reference(ray_session, chunk_dir):
    from raydedup.pipelines.queries import q_chunk_documents
    got = q_chunk_documents(chunk_dir).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    want = []
    for i, t in enumerate(TEXTS):
        for ci, (ct, nt) in enumerate(_ref_chunks(t, 32, 24)):
            want.append((i, ci, nt, ct))
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_chunks_match_sql_oracle(ray_session, chunk_dir):
    from raydedup.pipelines.queries import SQL_CHUNK_DOCUMENTS, \
        q_chunk_documents
    got = q_chunk_documents(chunk_dir).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{chunk_dir}/documents.parquet')")
    want = con.execute(SQL_CHUNK_DOCUMENTS).fetchdf() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert got["chunk_text"].tolist() == want["chunk_text"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_disjoint_and_overlap_coverage(ray_session):
    """stride == chunk tiles the doc exactly once; stride < chunk covers
    every token at least once with the last window reaching the end."""
    import ray.data as rd
    from raydedup.stages.chunking import chunk_documents
    text = " ".join(str(i) for i in range(100))
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                   "text": [text]}))
    flat = chunk_documents(docs, chunk_tokens=10, stride=10).to_pandas()
    rebuilt = " ".join(flat.sort_values("chunk_id")["chunk_text"])
    assert rebuilt == text
    assert flat["n_tokens"].sum() == 100
    over = chunk_documents(docs, chunk_tokens=10, stride=7).to_pandas() \
        .sort_values("chunk_id")
    last = over.iloc[-1]
    assert last["chunk_text"].endswith("99")
    starts = (over["chunk_id"] * 7).tolist()
    assert all(s + 10 <= 100 or s == starts[-1] for s in starts)


def test_chunk_dup_stats_planted(ray_session, tmp_path):
    """Two docs sharing an aligned 32-token run produce exactly the
    planted duplicate-chunk count through the chunking→dedup
    composition."""
    shared = " ".join(f"s{i}" for i in range(32))
    texts = [
        shared,                                  # doc 0: 1 chunk
        shared,                                  # doc 1: exact dup chunk
        " ".join(f"a{i}" for i in range(10)),    # unique
        " ".join(f"b{i}" for i in range(40)),    # 2 chunks, both unique
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    from raydedup.pipelines.queries import q_chunk_dup_stats
    got = q_chunk_dup_stats(str(tmp_path)).to_pandas()
    assert got.iloc[0].to_dict() == {
        "n_chunks": 5, "n_distinct": 4, "n_dup_chunks": 1}


def test_param_validation(ray_session):
    import ray.data as rd
    from raydedup.stages.chunking import chunk_documents
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                   "text": ["a b"]}))
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, stride=9)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0, stride=0)
