"""URL canonicalization + url-dedup tests."""

import numpy as np
import pyarrow as pa

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=4)


class TestCanonicalUrls:
    def test_canonical_steps(self, ray_session):
        from raydedup.stages.urls import canonical_url_array
        cases = {
            "a.com/x#frag": "a.com/x",
            "a.com/x?utm_source=t": "a.com/x",
            "a.com/x?utm_source=t&q=1": "a.com/x?q=1",
            "a.com/x?q=1&utm_campaign=c&r=2": "a.com/x?q=1&r=2",
            "a.com/x?fbclid=abc#f": "a.com/x",
            "a.com/x/": "a.com/x",
            "a.com/x///": "a.com/x",
            "a.com/x?gclid=1&utm_a=2": "a.com/x",
            "a.com/x?q=1": "a.com/x?q=1",
            "a.com": "a.com",
        }
        got = canonical_url_array(pa.array(list(cases), pa.string()))
        assert got.to_pylist() == list(cases.values())

    def test_matches_duckdb_regexp_chain(self, ray_session):
        import duckdb
        from raydedup.stages.urls import CANONICAL_STEPS, canonical_url_array
        urls = ["b.io/p?utm_x=1&y=2#z", "b.io/p/", "b.io/p?y=2&gclid=g",
                "b.io/q?utm_a=&utm_b=2", "b.io//", "b.io/p?&"]
        expr = "url"
        for pat, rep in CANONICAL_STEPS:
            pat_sql = pat.replace("\\", "\\\\").replace("'", "''")
            expr = f"regexp_replace({expr}, '{pat_sql}', '{rep}', 'g')"
        df = pa.table({"url": pa.array(urls, pa.string())}).to_pandas()
        want = duckdb.connect().execute(
            f"SELECT {expr} AS c FROM df").df()["c"].tolist()
        got = canonical_url_array(pa.array(urls, pa.string())).to_pylist()
        assert got == want


class TestUrlDedup:
    def test_keep_earliest_capture(self, ray_session):
        import ray.data as rd
        from raydedup.stages.urls import url_dedup
        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "url": pa.array(["s/a", "s/a#f", "s/a/", "s/b", "s/b?utm_x=1"],
                            pa.string()),
            "ts": pa.array([50, 20, 30, 10, 5], pa.int64()),
        })
        out = url_dedup(rd.from_arrow(t), CFG, ts_col="ts").to_pandas()
        got = dict(zip(out["canonical_url"], out["doc_id"]))
        # earliest ts wins within each canonical group
        assert got == {"s/a": 2, "s/b": 5}
        assert set(out.columns) == {"doc_id", "url", "ts", "canonical_url"}


class TestCrawlDiff:
    def test_diff_statuses(self, ray_session):
        import ray.data as rd
        from raydedup.stages.urls import crawl_diff
        old = pa.table({
            "url": pa.array(["u/a", "u/b", "u/c", "u/d"], pa.string()),
            "text": pa.array(["A", "B", "C", "D"], pa.string()),
        })
        new = pa.table({
            "url": pa.array(["u/b", "u/c", "u/d", "u/e"], pa.string()),
            "text": pa.array(["B", "C2", "D", "E"], pa.string()),
        })
        out = crawl_diff(rd.from_arrow(old), rd.from_arrow(new), CFG) \
            .to_pandas()
        got = dict(zip(out["url"], out["status"]))
        # u/b and u/d unchanged -> omitted
        assert got == {"u/a": "removed", "u/c": "changed", "u/e": "added"}

    def test_empty_sides(self, ray_session):
        import ray.data as rd
        from raydedup.stages.urls import crawl_diff
        empty = pa.table({"url": pa.array([], pa.string()),
                          "text": pa.array([], pa.string())})
        one = pa.table({"url": pa.array(["u/x"], pa.string()),
                        "text": pa.array(["X"], pa.string())})
        out = crawl_diff(rd.from_arrow(empty), rd.from_arrow(one), CFG) \
            .to_pandas()
        assert dict(zip(out["url"], out["status"])) == {"u/x": "added"}


def test_crawl_diff_duplicate_url_deterministic(ray_session):
    """A url violating the url-unique precondition (3+ rows across the
    sides) must drop deterministically — never emit a garbage status
    (regression: status array was np.empty)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.urls import crawl_diff

    cfg = DEFAULT_CONFIG.with_(num_partitions=8)
    old = rd.from_arrow(pa.table({
        "url": pa.array(["u/dup", "u/dup", "u/gone"], pa.string()),
        "text": pa.array(["a", "b", "c"], pa.string())}))
    new = rd.from_arrow(pa.table({
        "url": pa.array(["u/dup", "u/new"], pa.string()),
        "text": pa.array(["a", "n"], pa.string())}))
    outs = []
    for _ in range(3):
        df = crawl_diff(old, new, cfg).to_pandas()
        outs.append(df.sort_values(["url", "status"])
                    .reset_index(drop=True))
    # identical across runs, and the dup url never appears
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    assert "u/dup" not in set(outs[0]["url"])
    got = dict(zip(outs[0]["url"], outs[0]["status"]))
    assert got == {"u/gone": "removed", "u/new": "added"}


def test_snapshot_drift_planted(ray_session):
    """Planted drift classes: minor edit (one appended token over a
    30-token page -> J well above 0.8), full rewrite (disjoint tokens
    -> J == 0), too-short-to-shingle change (empty sets -> J == 0,
    rewritten), unchanged / added / removed urls omitted."""
    import ray.data as rd

    from raydedup.stages.urls import snapshot_drift

    base = " ".join(f"w{i}" for i in range(30))
    old = rd.from_arrow(pa.table({
        "url": pa.array(["u/minor", "u/rw", "u/short", "u/same",
                         "u/gone"], pa.string()),
        "text": pa.array([base, base, "tiny doc", base, base],
                         pa.string())}))
    new = rd.from_arrow(pa.table({
        "url": pa.array(["u/minor", "u/rw", "u/short", "u/same",
                         "u/new"], pa.string()),
        "text": pa.array([base + " v2",
                          " ".join(f"z{i}" for i in range(30)),
                          "tiny rev", base, base], pa.string())}))
    out = snapshot_drift(old, new, CFG, threshold=0.8).to_pandas() \
        .set_index("url")
    assert sorted(out.index) == ["u/minor", "u/rw", "u/short"]
    # 30 tokens -> 26 shingles; +1 token adds 1 window, last windows
    # shift: old 26 all shared except none change -> inter 26, new 27
    assert out.loc["u/minor", "drift"] == "minor_edit"
    assert out.loc["u/minor", "jaccard"] >= 0.8
    assert out.loc["u/rw", "drift"] == "rewritten"
    assert out.loc["u/rw", "intersection"] == 0
    assert out.loc["u/short", "jaccard"] == 0.0
    assert out.loc["u/short", "union"] == 0
    assert out.loc["u/short", "drift"] == "rewritten"


def test_snapshot_drift_same_side_duplicate_dropped(ray_session):
    """A url duplicated WITHIN one snapshot (url-unique violation)
    must not fabricate a drift row from its two same-side copies
    (review finding), and a legitimate cross-side pair in the same
    run must still score."""
    import ray.data as rd

    from raydedup.stages.urls import snapshot_drift

    base = " ".join(f"w{i}" for i in range(30))
    old = rd.from_arrow(pa.table({
        "url": pa.array(["u/dup", "u/dup", "u/ok"], pa.string()),
        "text": pa.array([base, base + " variant", base], pa.string())}))
    new = rd.from_arrow(pa.table({
        "url": pa.array(["u/ok"], pa.string()),
        "text": pa.array([base + " v2"], pa.string())}))
    out = snapshot_drift(old, new, CFG, threshold=0.8).to_pandas()
    assert sorted(out["url"]) == ["u/ok"]


def test_crawl_diff_same_side_pair_dropped(ray_session):
    """Two same-side copies of a url absent from the other snapshot
    form a 2-run; it must drop like any url-unique violation, not be
    labeled changed/same (review finding)."""
    import ray.data as rd

    from raydedup.stages.urls import crawl_diff

    old = rd.from_arrow(pa.table({
        "url": pa.array(["u/dd", "u/dd", "u/gone"], pa.string()),
        "text": pa.array(["x", "y", "z"], pa.string())}))
    new = rd.from_arrow(pa.table({
        "url": pa.array(["u/new"], pa.string()),
        "text": pa.array(["n"], pa.string())}))
    got = crawl_diff(old, new, CFG).to_pandas()
    d = dict(zip(got["url"], got["status"]))
    assert d == {"u/gone": "removed", "u/new": "added"}
