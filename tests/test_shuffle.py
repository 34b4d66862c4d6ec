"""Unit tests for the manual raw-task hash shuffle."""

import numpy as np
import pyarrow as pa
import pytest


def _mk(n, n_keys, seed=0):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, size=n).astype(np.int64)
    vals = rng.integers(0, 1000, size=n).astype(np.int64)
    tab = pa.table({"key": pa.array(keys, pa.int64()),
                    "val": pa.array(vals, pa.int64())})
    return rd.from_arrow(tab), keys, vals


class TestHashPartitionMap:
    def test_partitions_complete_and_disjoint(self, ray_session):
        from raydedup.functions.shuffle import hash_partition_map
        ds, keys, vals = _mk(5000, 97)
        P = 8
        tagged = ds.map_batches(
            lambda t: t.append_column(
                "part", pa.array(np.asarray(t["key"]) % P, pa.int64())),
            batch_format="pyarrow")

        def _sum(tab):
            if tab is None or len(tab) == 0:
                return pa.table({"key": pa.array([], pa.int64()),
                                 "total": pa.array([], pa.int64())})
            k = np.asarray(tab["key"], dtype=np.int64)
            v = np.asarray(tab["val"], dtype=np.int64)
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            uniq, starts = np.unique(k, return_index=True)
            sums = np.add.reduceat(v, starts)
            return pa.table({"key": pa.array(uniq, pa.int64()),
                             "total": pa.array(sums, pa.int64())})

        out = hash_partition_map(tagged, "part", _sum, P).to_pandas()
        got = dict(zip(out["key"], out["total"]))
        import pandas as pd
        want = pd.DataFrame({"key": keys, "val": vals}).groupby("key")["val"] \
                 .sum().to_dict()
        assert got == want

    def test_empty_dataset(self, ray_session):
        import ray.data as rd
        from raydedup.functions.shuffle import hash_partition_map
        ds = rd.from_arrow(pa.table({"key": pa.array([], pa.int64()),
                                     "part": pa.array([], pa.int64())}))

        def _fn(tab):
            return pa.table({"n": pa.array(
                [0 if tab is None else len(tab)], pa.int64())})

        out = hash_partition_map(ds, "part", _fn, 4).to_pandas()
        assert out["n"].sum() == 0

    def test_single_partition(self, ray_session):
        from raydedup.functions.shuffle import hash_partition_map
        ds, keys, vals = _mk(100, 5, seed=1)
        tagged = ds.map_batches(
            lambda t: t.append_column(
                "part", pa.array(np.zeros(len(t), np.int64), pa.int64())),
            batch_format="pyarrow")
        out = hash_partition_map(
            tagged, "part",
            lambda tab: pa.table({"n": pa.array(
                [0 if tab is None else len(tab)], pa.int64())}),
            1).to_pandas()
        assert out["n"].sum() == 100
