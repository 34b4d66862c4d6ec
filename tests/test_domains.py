"""Domain/host operators (stages/domains.py)."""

import pyarrow as pa

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.domains import domain_stats, filter_domains, with_host

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=3)


def _ds(rows):
    import ray.data as rd
    tab = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })
    return rd.from_arrow(tab).repartition(2)


ROWS = [
    (0, "https://a.com/x", "one two three"),
    (1, "http://a.com/y", "four five"),
    (2, "b.org/path", "six"),
    (3, "b.org", "seven eight nine ten"),
    (4, "", "eleven"),
    (5, None, "twelve"),
]


def test_with_host_edge_cases(ray_session):
    got = with_host(_ds(ROWS)).to_pandas().set_index("doc_id")["host"].to_dict()
    assert got == {0: "a.com", 1: "a.com", 2: "b.org", 3: "b.org",
                   4: "", 5: ""}


def test_domain_stats(ray_session):
    df = domain_stats(_ds(ROWS), CFG).to_pandas().set_index("host")
    assert df.loc["a.com", "n_docs"] == 2
    assert df.loc["a.com", "sum_tokens"] == 5
    assert df.loc["b.org", "n_docs"] == 2
    assert df.loc["b.org", "sum_tokens"] == 5
    assert df.loc["", "n_docs"] == 2


def test_filter_domains(ray_session):
    kept = filter_domains(_ds(ROWS), ["a.com"]).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3, 4, 5]
    assert set(kept.columns) == {"doc_id", "url", "text", "host"}
    # host column droppable
    kept2 = filter_domains(_ds(ROWS), ["a.com"], keep_host_col=None) \
        .to_pandas()
    assert "host" not in kept2.columns


def test_host_top_docs(ray_session):
    from raydedup.stages.domains import host_top_docs
    # batch_size=3 forces the map-side per-batch trim across batches —
    # the combiner must still produce the global per-host top-k
    out = host_top_docs(_ds(ROWS), CFG, k=1).to_pandas() \
        .set_index("host")
    # a.com: doc0 (3 tokens) beats doc1 (2); b.org: doc3 (4) beats doc2
    assert out.loc["a.com", "doc_id"] == 0
    assert out.loc["a.com", "n_tokens"] == 3
    assert out.loc["b.org", "doc_id"] == 3
    assert (out["rank"] == 1).all()


def test_host_top_docs_tiebreak_and_k(ray_session):
    from raydedup.stages.domains import host_top_docs
    rows = [(i, "https://x.com/p", "a b") for i in range(5)]
    out = host_top_docs(_ds(rows), CFG, k=3).to_pandas() \
        .sort_values("rank")
    # equal lengths -> doc_id asc breaks ties, exactly k rows kept
    assert list(out["doc_id"]) == [0, 1, 2]
    assert list(out["rank"]) == [1, 2, 3]
