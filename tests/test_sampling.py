"""quota_per_key (stages/sampling.py): string and int keys, randomized
DuckDB row_number cross-check, pass-through of original columns."""

import duckdb
import numpy as np
import pyarrow as pa

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=4)


def _ds(table):
    import ray.data as rd
    return rd.from_arrow(table)


class TestQuotaPerKey:
    def test_string_key_matches_duckdb(self, ray_session):
        from raydedup.stages.sampling import quota_per_key
        rng = np.random.default_rng(13)
        n = 1000
        tab = pa.table({
            "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
            "source": pa.array([f"s{i}" for i in rng.integers(0, 9, n)],
                               pa.string()),
            "extra": pa.array(rng.integers(0, 99, n), pa.int64()),
        })
        out = quota_per_key(_ds(tab), CFG, key_col="source",
                            order_col="doc_id", n=30).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("d", tab.to_pandas())
        gold = con.sql("""
            SELECT doc_id, source, extra FROM (
              SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY doc_id) AS rn FROM d)
            WHERE rn <= 30 ORDER BY doc_id""").df()
        assert list(out.columns) == ["doc_id", "source", "extra"]
        assert (out["doc_id"].to_numpy() == gold["doc_id"].to_numpy()).all()
        assert (out["extra"].to_numpy() == gold["extra"].to_numpy()).all()

    def test_int_key(self, ray_session):
        from raydedup.stages.sampling import quota_per_key
        tab = pa.table({
            "k": pa.array([7, 7, 7, 8, 8], pa.int64()),
            "o": pa.array([5, 1, 3, 2, 4], pa.int64()),
        })
        out = quota_per_key(_ds(tab), CFG, key_col="k", order_col="o",
                            n=2).to_pandas().sort_values(["k", "o"])
        assert list(map(tuple, out.to_numpy())) == [(7, 1), (7, 3), (8, 2),
                                                    (8, 4)]
