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


class TestMixSample:
    def _ds(self, n=4000):
        import ray.data as rd
        sources = ["web", "wiki", "code", "junk"]
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([sources[i % 4] for i in range(n)]),
        }))

    WEIGHTS = {"web": 0.3, "wiki": 1.0, "junk": 0.0}

    def test_rates_and_determinism(self, ray_session):
        from raydedup.stages.sampling import mix_sample
        out1 = mix_sample(self._ds(), self.WEIGHTS).to_pandas()
        out2 = mix_sample(self._ds(), self.WEIGHTS).to_pandas()
        # deterministic: identical kept set across runs
        assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
        by = out1.groupby("source").size()
        assert by.get("junk", 0) == 0          # w=0 drops all
        assert by["wiki"] == 1000              # w=1 keeps all
        assert 200 <= by["web"] <= 400         # w=0.3 of 1000
        assert by.get("code", 0) == 1000       # default_weight=1.0

    def test_seed_changes_selection(self, ray_session):
        from raydedup.stages.sampling import mix_sample
        a = set(mix_sample(self._ds(), {"web": 0.3}, seed=0)
                .to_pandas().query("source=='web'")["doc_id"])
        b = set(mix_sample(self._ds(), {"web": 0.3}, seed=1)
                .to_pandas().query("source=='web'")["doc_id"])
        assert a != b

    def test_md5_method_matches_duckdb(self, ray_session):
        import duckdb

        from raydedup.stages.sampling import mix_sample
        ds = self._ds(800)
        got = sorted(mix_sample(ds, self.WEIGHTS, method="md5")
                     .to_pandas()["doc_id"])
        df = ds.to_pandas()
        want = sorted(duckdb.connect().execute("""
            SELECT doc_id FROM df
            WHERE (('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT)::DOUBLE
                    / 4294967296.0
                  < CASE source WHEN 'web' THEN 0.3 WHEN 'wiki' THEN 1.0
                                WHEN 'junk' THEN 0.0 ELSE 1.0 END
        """).df()["doc_id"])
        assert got == want


class TestCorpusSplit:
    def test_partition_exhaustive_and_deterministic(self, ray_session):
        from raydedup.stages.sampling import corpus_split
        ids = np.arange(2000, dtype=np.int64)
        ds = _ds(pa.table({"doc_id": pa.array(ids)}))
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = corpus_split(ds, w).to_pandas().sort_values("doc_id")
        # exhaustive + exclusive: every row exactly one label
        assert len(out) == 2000
        frac = out["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.05
        # rerun identical; independent of partition layout
        out2 = corpus_split(ds.repartition(7), w).to_pandas() \
            .sort_values("doc_id")
        assert list(out["split"]) == list(out2["split"])
        # `only=` returns exactly the labelled subset
        tr = corpus_split(ds, w, only="train").to_pandas()
        want = set(out.loc[out["split"] == "train", "doc_id"])
        assert set(tr["doc_id"]) == want
        assert "split" not in tr.columns

    def test_md5_matches_duckdb(self, ray_session):
        from raydedup.stages.sampling import corpus_split
        ids = np.arange(500, dtype=np.int64)
        ds = _ds(pa.table({"doc_id": pa.array(ids)}))
        out = corpus_split(ds, {"a": 0.5, "b": 0.5}, method="md5") \
            .to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        want = con.execute("""
            SELECT i AS doc_id,
                   CASE WHEN (('0x' || substr(md5(i::VARCHAR), 1, 8))::BIGINT)
                             ::DOUBLE / 4294967296.0 < 0.5
                        THEN 'a' ELSE 'b' END AS split
            FROM unnest(range(0, 500)) t(i) ORDER BY 1""").df()
        assert list(out["split"]) == list(want["split"])

    def test_bad_weights_raise(self, ray_session):
        import pytest
        from raydedup.stages.sampling import corpus_split
        ds = _ds(pa.table({"doc_id": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError):
            corpus_split(ds, {"a": -1.0, "b": 2.0})
        with pytest.raises(ValueError):
            corpus_split(ds, {"a": 0.5}, only="nope")


class TestClusterSizeHistogram:
    def test_known_components(self, ray_session):
        from raydedup.stages.cc import cluster_size_histogram
        # components: {0,1,2}, {10,11}, {20,21}, {30..34} → sizes 3,2,2,5
        comp = []
        for grp in ([0, 1, 2], [10, 11], [20, 21], [30, 31, 32, 33, 34]):
            comp += [(n, grp[0]) for n in grp]
        tab = pa.table({
            "node": pa.array([c[0] for c in comp], pa.int64()),
            "component": pa.array([c[1] for c in comp], pa.int64())})
        out = cluster_size_histogram(_ds(tab), CFG).to_pandas() \
            .sort_values("cluster_size").reset_index(drop=True)
        assert list(out["cluster_size"]) == [2, 3, 5]
        assert list(out["n_clusters"]) == [2, 1, 1]

    def test_empty(self, ray_session):
        from raydedup.stages.cc import cluster_size_histogram
        tab = pa.table({"node": pa.array([], pa.int64()),
                        "component": pa.array([], pa.int64())})
        assert cluster_size_histogram(_ds(tab), CFG).count() == 0


class TestSplitCLI:
    def test_cmd_split_writes_exhaustive_dirs(self, ray_session, tmp_path):
        import argparse
        import pyarrow.parquet as pq
        from raydedup.__main__ import cmd_split

        tab = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                        "source": pa.array(["s"] * 300, pa.string())})
        pq.write_table(tab, tmp_path / "c.parquet")
        out = tmp_path / "out"
        cmd_split(argparse.Namespace(
            input=str(tmp_path / "c.parquet"), output=str(out),
            weights="train=0.8,val=0.2", seed=0))
        import ray.data as rd
        # one-pass hive-partitioned layout (out/split=train/...), the
        # same shape cmd_build writes
        tr = rd.read_parquet(str(out / "split=train")).to_pandas()
        va = rd.read_parquet(str(out / "split=val")).to_pandas()
        ids = sorted(list(tr["doc_id"]) + list(va["doc_id"]))
        assert ids == list(range(300))        # exhaustive + exclusive
        assert 0 < len(va) < len(tr)
