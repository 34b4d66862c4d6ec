"""Exact distributed integer quantiles (stages/quantiles.py).

Property-checked against DuckDB's quantile_disc on random multisets —
the histogram exchange must reproduce the sorted-array definition
exactly, including tie plateaus and extreme q.
"""

import duckdb
import pytest
import numpy as np
import pyarrow as pa

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.quantiles import int_quantiles, value_histogram

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=7)


def _ds(values):
    import ray.data as rd
    return rd.from_arrow(pa.table({"x": pa.array(values, pa.int64())})) \
        .repartition(3)


def test_histogram_counts(ray_session):
    vals = [5, 5, 5, 2, 9, 2, 5]
    h = value_histogram(_ds(vals), "x", CFG).to_pandas()
    assert dict(zip(h["value"], h["n"])) == {5: 4, 2: 2, 9: 1}


def test_matches_duckdb_quantile_disc(ray_session):
    rng = np.random.default_rng(5)
    for trial in range(3):
        vals = rng.integers(0, 50, size=rng.integers(10, 400)).tolist()
        qs = (0.0, 0.1, 0.5, 0.9, 0.99, 1.0)
        got = int_quantiles(_ds(vals), "x", qs=qs, cfg=CFG).to_pandas()
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals])
        for q, v in zip(qs, got["value"]):
            want = con.execute(
                "SELECT quantile_disc(x, ?) FROM t", [q]).fetchone()[0]
            assert v == want, (trial, q, v, want)


def test_labels(ray_session):
    got = int_quantiles(_ds([1, 2, 3]), "x", qs=(0.5, 0.999), cfg=CFG) \
        .to_pandas()
    assert list(got["q"]) == ["p50", "p99.9"]


def test_cont_quantiles_matches_duckdb_and_numpy(ray_session):
    from raydedup.stages.quantiles import cont_quantiles
    rng = np.random.default_rng(17)
    for trial in range(3):
        vals = rng.integers(0, 1000, size=rng.integers(10, 400)).tolist()
        qs = (0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
        got = cont_quantiles(_ds(vals), "x", qs=qs, cfg=CFG).to_pandas()
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals])
        for q, v in zip(qs, got["value"]):
            want = con.execute(
                "SELECT quantile_cont(x, ?) FROM t", [q]).fetchone()[0]
            assert v == want, (trial, q, v, want)
            # and the textbook linear-interpolation definition (numpy's
            # one-sided form differs from DuckDB's by at most an ulp)
            assert v == pytest.approx(
                np.percentile(np.array(vals, dtype=np.float64),
                              q * 100, method="linear"), rel=1e-12)


def test_cont_quantiles_single_value(ray_session):
    from raydedup.stages.quantiles import cont_quantiles
    got = cont_quantiles(_ds([7]), "x", qs=(0.0, 0.5, 1.0), cfg=CFG) \
        .to_pandas()
    assert list(got["value"]) == [7.0, 7.0, 7.0]


def _kv_ds(keys, values):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "x": pa.array(values, pa.int64())})).repartition(3)


def test_grouped_quantile_matches_duckdb(ray_session):
    from raydedup.stages.quantiles import grouped_int_quantile
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(20, 500))
        keys = rng.choice(["aa", "bb", "cc", "dd"], size=n).tolist()
        vals = rng.integers(0, 40, size=n).tolist()
        for q in (0.1, 0.25, 0.5, 1.0):
            got = grouped_int_quantile(_kv_ds(keys, vals), "x", "k",
                                       q=q, cfg=CFG).to_pandas()
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE t AS SELECT unnest(?) AS k, unnest(?) AS x",
                [keys, vals])
            want = dict(con.execute(
                "SELECT k, quantile_disc(x, ?) FROM t GROUP BY k",
                [q]).fetchall())
            assert dict(zip(got["k"], got["value"])) == want, (trial, q)


def test_grouped_quantile_validation(ray_session):
    from raydedup.stages.quantiles import grouped_int_quantile
    with pytest.raises(ValueError):
        grouped_int_quantile(_kv_ds(["a"], [1]), "x", "k", q=0.0)


def test_percentile_filter_drops_bottom_quartile_per_group(ray_session):
    from raydedup.stages.quantiles import percentile_filter
    # group a: 1..100 (p25=25); group b: 1001..1020 (p25=1005)
    keys = ["a"] * 100 + ["b"] * 20
    vals = list(range(1, 101)) + list(range(1001, 1021))
    got = percentile_filter(_kv_ds(keys, vals), "x", "k", q=0.25,
                            cfg=CFG).to_pandas()
    a = sorted(got[got["k"] == "a"]["x"])
    b = sorted(got[got["k"] == "b"]["x"])
    assert a == list(range(25, 101))
    assert b == list(range(1005, 1021))


def test_percentile_filter_partition_invariance(ray_session):
    from raydedup.stages.quantiles import percentile_filter
    rng = np.random.default_rng(3)
    keys = rng.choice(["x", "y"], size=300).tolist()
    vals = rng.integers(0, 60, size=300).tolist()
    a = percentile_filter(_kv_ds(keys, vals), "x", "k", q=0.5,
                          cfg=CFG).to_pandas()
    b = percentile_filter(_kv_ds(keys, vals), "x", "k", q=0.5,
                          cfg=DEFAULT_CONFIG.with_(num_partitions=7,
                                                   batch_size=13)
                          ).to_pandas()
    assert sorted(zip(a["k"], a["x"])) == sorted(zip(b["k"], b["x"]))


def test_grouped_quantile_null_keys(ray_session):
    """Null group keys fill to '' (review finding: they used to
    TypeError in the reduce's lexsort)."""
    import ray.data as rd
    from raydedup.stages.quantiles import grouped_int_quantile
    tab = pa.table({"k": pa.array(["a", None, "a", None], pa.string()),
                    "x": pa.array([10, 1, 20, 3], pa.int64())})
    got = grouped_int_quantile(rd.from_arrow(tab), "x", "k", q=0.5,
                               cfg=CFG).to_pandas()
    assert dict(zip(got["k"], got["value"])) == {"a": 10, "": 1}
