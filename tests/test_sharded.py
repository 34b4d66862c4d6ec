"""Shard-resumable corpus runs (pipelines/sharded.py): resume skips
complete shards, torn shards recompute, config/transform/input changes
invalidate, and read_sharded sees exactly the complete shards."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydedup.config import PipelineConfig
from raydedup.pipelines.sharded import (MANIFEST, read_sharded,
                                        shard_manifest, sharded_run)

CFG = PipelineConfig(num_partitions=4)


@pytest.fixture
def corpus_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for i in range(6):
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(i * 10, i * 10 + 10,
                                         dtype=np.int64)),
            "n": pa.array(np.full(10, i, dtype=np.int64)),
        }), d / f"part{i}.parquet")
    return str(d)


def _double(ds):
    import pyarrow.compute as pc

    def f(t):
        return pa.table({"doc_id": t["doc_id"],
                         "n2": pc.multiply(t["n"], 2)})
    return ds.map_batches(f, batch_format="pyarrow")


class TestShardedRun:
    def test_run_and_resume_skips(self, ray_session, corpus_dir, tmp_path):
        out = str(tmp_path / "out")
        r1 = sharded_run(corpus_dir, out, _double, CFG, n_shards=3)
        assert r1["computed"] == [0, 1, 2] and r1["skipped"] == []
        assert r1["rows"] == 60
        r2 = sharded_run(corpus_dir, out, _double, CFG, n_shards=3)
        assert r2["computed"] == [] and r2["skipped"] == [0, 1, 2]
        assert r2["rows"] == 60
        df = read_sharded(out).to_pandas().sort_values("doc_id")
        assert len(df) == 60
        assert (df["n2"].to_numpy() == (df["doc_id"].to_numpy() // 10) * 2).all()

    def test_torn_shard_recomputes(self, ray_session, corpus_dir, tmp_path):
        out = str(tmp_path / "out")
        sharded_run(corpus_dir, out, _double, CFG, n_shards=3)
        os.remove(os.path.join(out, "shard=00001", MANIFEST))
        r = sharded_run(corpus_dir, out, _double, CFG, n_shards=3)
        assert r["computed"] == [1] and r["skipped"] == [0, 2]
        assert shard_manifest(out, 1)["rows"] == 20

    def test_input_change_invalidates_only_its_shard(
            self, ray_session, corpus_dir, tmp_path):
        out = str(tmp_path / "out")
        sharded_run(corpus_dir, out, _double, CFG, n_shards=3)
        # grow one input file -> its shard (files are round-robin:
        # part3 is shard 0's second file) must recompute
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(30, 45, dtype=np.int64)),
            "n": pa.array(np.full(15, 3, dtype=np.int64)),
        }), os.path.join(corpus_dir, "part3.parquet"))
        r = sharded_run(corpus_dir, out, _double, CFG, n_shards=3)
        assert r["computed"] == [0] and r["skipped"] == [1, 2]
        assert r["rows"] == 65

    def test_transform_version_invalidates_all(self, ray_session,
                                               corpus_dir, tmp_path):
        out = str(tmp_path / "out")
        sharded_run(corpus_dir, out, _double, CFG, n_shards=2,
                    transform_version=1)
        r = sharded_run(corpus_dir, out, _double, CFG, n_shards=2,
                        transform_version=2)
        assert r["computed"] == [0, 1]

    def test_read_sharded_excludes_torn(self, ray_session, corpus_dir,
                                        tmp_path):
        out = str(tmp_path / "out")
        sharded_run(corpus_dir, out, _double, CFG, n_shards=3)
        os.remove(os.path.join(out, "shard=00002", MANIFEST))
        assert read_sharded(out).count() == 40
