"""The round-5 SQL-oracle legs for the three formerly rows-only
surfaces: simhash_scored (md5-token-hash SimHash through the production
simhash64 kernel), ann_lsh_scored (axis-plane hyperplane LSH through
the production actor stage), and the lang_id oracle itself — each
checked against BOTH a pure-python reference and the committed DuckDB
oracle SQL on a planted fixture."""

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_lower(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16],
                          "little")


def test_md5_lower64_matches_duckdb():
    from raydedup.functions.hashing import md5_lower64_array
    samples = ["", "tok", "hello world", "ünïcode", "a" * 300,
               " ", "0", "the"]
    got = md5_lower64_array(pa.array(samples, pa.string()))
    con = duckdb.connect()
    for s, g in zip(samples, got):
        want = con.execute("select md5_number_lower(?)", [s]).fetchone()[0]
        assert int(g) == want == _md5_lower(s)


def _py_simhash(text: str) -> int:
    """Independent reference: distinct md5-lower token hashes vote ±1
    per bit, ties round up (the simhash64 contract)."""
    hs = {_md5_lower(t) for t in text.split(" ")}
    n = len(hs)
    out = 0
    for b in range(64):
        ones = sum((h >> b) & 1 for h in hs)
        if 2 * ones >= n:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """A tiny sf_dir with documents.parquet + embeddings.parquet that
    exercises the edge cases: empty text, repeated tokens, stopword
    ties, docs with no stopword hits, and zero/negative embedding
    coordinates."""
    rng = np.random.default_rng(7)
    texts = [
        "",                                     # empty -> [''] token
        "the the the and of a",                 # en, repeated tokens
        "der die das und ist",                  # de
        "que que",                              # fr/es tie -> 'es' (alpha)
        "zzz qqq www",                          # no stopword -> 'und'
        "la de en un",                          # es-heavy
        "the und",                              # en/de tie -> 'de' (alpha)
    ]
    # plus random filler docs for bulk coverage
    vocab = ["alpha", "beta", "the", "und", "la", "gamma", "de", "x1",
             "que", "dans", "los", "nicht", ""]
    for _ in range(50):
        texts.append(" ".join(rng.choice(vocab, size=rng.integers(1, 30))))
    d = tmp_path_factory.mktemp("sfdir")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet")
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    emb[0, :3] = [0.0, -0.0, -1.0]              # exact-zero sign cases
    pq.write_table(
        pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.array(list(emb),
                                        pa.list_(pa.float32()))}),
        d / "embeddings.parquet")
    return str(d)


def _oracle(sf_dir: str, sql: str, tables=("documents", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def test_simhash_scored_vs_reference_and_sql(ray_session, fixture_dir):
    from raydedup.pipelines.queries import SQL_SIMHASH_SCORED, \
        q_simhash_scored
    got = q_simhash_scored(fixture_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    texts = pq.read_table(f"{fixture_dir}/documents.parquet") \
        .to_pydict()["text"]
    want_py = [_py_simhash(t) for t in texts]
    assert got["simhash"].tolist() == want_py
    want_sql = _oracle(fixture_dir, SQL_SIMHASH_SCORED) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["simhash"].tolist() == want_sql["simhash"].tolist()


def test_ann_lsh_axes_vs_reference_and_sql(ray_session, fixture_dir):
    from raydedup.pipelines.queries import SQL_ANN_LSH_SCORED, \
        q_ann_lsh_scored
    got = q_ann_lsh_scored(fixture_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    emb = pq.read_table(f"{fixture_dir}/embeddings.parquet") \
        .to_pydict()["embedding"]
    want_py = [sum((1 << j) for j in range(12) if v[j] >= 0) for v in emb]
    assert got["bucket"].tolist() == want_py
    want_sql = _oracle(fixture_dir, SQL_ANN_LSH_SCORED) \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["bucket"].tolist() == want_sql["bucket"].tolist()


def test_ann_lsh_random_planes_unchanged(ray_session, fixture_dir):
    """The oracle leg must not perturb the production leg: random-plane
    buckets differ from axis buckets (planes really are different) and
    are deterministic across two runs (seeded once per actor)."""
    import ray.data as rd
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.ann import ann_lsh_buckets
    emb = rd.read_parquet(f"{fixture_dir}/embeddings.parquet")
    a = ann_lsh_buckets(emb, dim=16, cfg=DEFAULT_CONFIG).to_pandas() \
        .sort_values("vec_id")["bucket"].tolist()
    b = ann_lsh_buckets(emb, dim=16, cfg=DEFAULT_CONFIG).to_pandas() \
        .sort_values("vec_id")["bucket"].tolist()
    axes = ann_lsh_buckets(emb, dim=16, cfg=DEFAULT_CONFIG,
                           planes="axes").to_pandas() \
        .sort_values("vec_id")["bucket"].tolist()
    assert a == b
    assert a != axes


def test_lang_id_vs_reference_and_sql(ray_session, fixture_dir):
    from raydedup.pipelines.queries import SQL_LANG_ID, q_lang_id
    from raydedup.stages.textstats import _STOPWORDS
    got = q_lang_id(fixture_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    texts = pq.read_table(f"{fixture_dir}/documents.parquet") \
        .to_pydict()["text"]
    langs = sorted(_STOPWORDS)

    def _ref(t):
        votes = [sum(1 for tok in t.split(" ") if tok in _STOPWORDS[lg])
                 for lg in langs]
        return langs[int(np.argmax(votes))] if max(votes) > 0 else "und"

    assert got["lang_pred"].tolist() == [_ref(t) for t in texts]
    # planted tie semantics: alphabetical winner
    assert got.loc[3, "lang_pred"] == "es"      # 'que' in es+fr -> es
    assert got.loc[6, "lang_pred"] == "de"      # the/und tie -> de
    assert got.loc[4, "lang_pred"] == "und"
    want_sql = _oracle(fixture_dir, SQL_LANG_ID) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["lang_pred"].tolist() == want_sql["lang_pred"].tolist()
