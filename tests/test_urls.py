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
