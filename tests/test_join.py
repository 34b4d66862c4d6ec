"""General equi-join primitives (stages/join.py)."""

import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.join import broadcast_join, partitioned_join

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=3)


def _left():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 5, None], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e", "f"], pa.string()),
    })).repartition(3)


def _right_tab():
    return pa.table({
        "rk": pa.array([1, 2, 4], pa.int64()),
        "rv": pa.array(["X", "Y", "Z"], pa.string()),
    })


def _norm(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_broadcast_inner(ray_session):
    out = broadcast_join(_left(), _right_tab(), "k", right_on="rk") \
        .to_pandas()
    got = sorted(zip(out["k"], out["lv"], out["rv"]))
    assert got == [(1, "a", "X"), (2, "b", "Y"), (2, "c", "Y")]


def test_broadcast_left(ray_session):
    out = broadcast_join(_left(), _right_tab(), "k", right_on="rk",
                         how="left").to_pandas()
    assert len(out) == 6
    assert out.loc[out["lv"] == "d", "rv"].isna().all()


def test_broadcast_gate(ray_session):
    big = pa.table({"rk": pa.array(range(100), pa.int64())})
    with pytest.raises(ValueError, match="partitioned_join"):
        broadcast_join(_left(), big, "k", right_on="rk", max_rows=10)


def test_partitioned_matches_broadcast(ray_session):
    import ray.data as rd
    r = rd.from_arrow(_right_tab()).repartition(2)
    a = _norm(broadcast_join(_left(), _right_tab(), "k", right_on="rk")
              .to_pandas()[["k", "lv", "rv"]])
    b = _norm(partitioned_join(_left(), r, "k", CFG, right_on="rk")
              .to_pandas()[["k", "lv", "rv"]])
    assert a.equals(b)


def test_partitioned_left_with_empty_partitions(ray_session):
    import ray.data as rd
    # only one key: most of the 4 partitions see an empty right side
    r = rd.from_arrow(pa.table({"rk": pa.array([2], pa.int64()),
                                "rv": pa.array(["Y"], pa.string())}))
    out = partitioned_join(_left(), r, "k", CFG, right_on="rk",
                           how="left").to_pandas()
    assert len(out) == 6
    assert set(out.loc[out["k"] == 2, "rv"]) == {"Y"}
    assert out.loc[out["k"] == 3, "rv"].isna().all()


def test_string_keys(ray_session):
    import ray.data as rd
    l = rd.from_arrow(pa.table({
        "host": pa.array(["a.com", "b.org", "a.com"], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64())}))
    r = rd.from_arrow(pa.table({
        "host": pa.array(["a.com"], pa.string()),
        "tag": pa.array(["good"], pa.string())}))
    out = partitioned_join(l, r, "host", CFG).to_pandas()
    assert sorted(out["v"]) == [1, 3]
    assert set(out["tag"]) == {"good"}


def test_broadcast_semi_anti(ray_session):
    semi = broadcast_join(_left(), _right_tab(), "k", right_on="rk",
                          how="semi").to_pandas()
    assert sorted(semi["lv"]) == ["a", "b", "c"]
    assert "rv" not in semi.columns
    anti = broadcast_join(_left(), _right_tab(), "k", right_on="rk",
                          how="anti").to_pandas()
    assert sorted(anti["lv"]) == ["d", "e", "f"]


def test_partitioned_semi_matches_broadcast(ray_session):
    import ray.data as rd
    r = rd.from_arrow(_right_tab()).repartition(2)
    a = _norm(broadcast_join(_left(), _right_tab(), "k", right_on="rk",
                             how="semi").to_pandas()[["k", "lv"]])
    b = _norm(partitioned_join(_left(), r, "k", CFG, right_on="rk",
                               how="semi").to_pandas()[["k", "lv"]])
    assert a.equals(b)


def test_revenue_by_nation_matches_duckdb(ray_session):
    """3-way join ladder + combiner rollup vs DuckDB on sf0.001."""
    import duckdb

    from raydedup.pipelines.queries import (SQL_REVENUE_BY_NATION,
                                            q_revenue_by_nation)

    sf = "/root/testdata/sf0.001"
    got = q_revenue_by_nation(sf).to_pandas().sort_values("n_name") \
        .reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(SQL_REVENUE_BY_NATION).df().sort_values("n_name") \
        .reset_index(drop=True)
    assert list(got["n_name"]) == list(want["n_name"])
    assert [int(x) for x in got["revenue"]] == \
        [int(x) for x in want["revenue"]]
