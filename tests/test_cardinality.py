"""HyperLogLog: accuracy gate vs exact truth, merge/partition
invariance, determinism, and the linear-counting small range."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.functions.hashing import hash_utf8_array
from raydedup.stages.cardinality import (approx_distinct, estimate,
                                         fold_registers, hll_registers)

CFG = DEFAULT_CONFIG.with_(num_partitions=8)


def _ds(values, n_blocks=6):
    import ray.data as rd
    tabs = [pa.table({"text": pa.array(list(chunk), pa.string())})
            for chunk in np.array_split(np.asarray(values, dtype=object),
                                        n_blocks)]
    return rd.from_arrow(tabs)


class TestFoldKernel:
    def test_rank_extremes(self):
        # hash with top bit set after the p-shift -> rank 1;
        # all-zero rest -> rank nbits+1
        p = 14
        h_top = np.array([np.uint64(1) << np.uint64(63 - p)], dtype=np.uint64)
        regs = fold_registers(h_top, p)
        assert regs.max() == 1
        h_zero = np.array([0], dtype=np.uint64)   # bucket 0, rest 0
        regs = fold_registers(h_zero, p)
        assert regs[0] == 64 - p + 1

    def test_matches_bitlength_reference(self):
        p = 12
        rng = np.random.RandomState(5)
        h = rng.randint(0, 2**63, size=2000, dtype=np.int64).view(np.uint64)
        regs = fold_registers(h.copy(), p)
        ref = np.zeros(1 << p, dtype=np.int8)
        for v in h:
            v = int(v)
            bucket = v >> (64 - p)
            rest = (v << p) & ((1 << 64) - 1)
            rank = (64 - rest.bit_length() + 1) if rest else (64 - p + 1)
            rank = min(rank, 64 - p + 1)
            ref[bucket] = max(ref[bucket], rank)
        assert np.array_equal(regs, ref)


class TestApproxDistinct:
    def test_accuracy_100k(self, ray_session):
        vals = [f"item-{i}-{i*i}" for i in range(100_000)] * 2  # dups too
        got = approx_distinct(_ds(vals, 10), CFG)["n_distinct_est"][0].as_py()
        err = abs(got - 100_000) / 100_000
        assert err < 0.02, f"relative error {err:.4f}"

    def test_small_range_linear_counting(self, ray_session):
        vals = [f"v{i}" for i in range(500)]
        got = approx_distinct(_ds(vals, 3), CFG)["n_distinct_est"][0].as_py()
        assert abs(got - 500) / 500 < 0.02

    def test_partition_and_block_invariance(self, ray_session):
        vals = [f"x{i % 7000}" for i in range(30_000)]
        a = hll_registers(_ds(vals, 4), CFG)
        b = hll_registers(_ds(vals, 13),
                          DEFAULT_CONFIG.with_(num_partitions=17))
        assert np.array_equal(a, b)

    def test_tokens_mode(self, ray_session):
        docs = ["a b c", "b c d", "c d e"]
        got = approx_distinct(_ds(docs, 2), CFG,
                              tokens=True)["n_distinct_est"][0].as_py()
        assert got == 5   # exact in the tiny linear-counting regime

    def test_empty(self, ray_session):
        got = approx_distinct(_ds([""], 1), CFG,
                              tokens=True)["n_distinct_est"][0].as_py()
        assert got == 0


def _grouped_ds(n_blocks=5):
    import ray.data as rd
    rng = np.random.RandomState(11)
    rows_k, rows_t = [], []
    for i in range(4000):
        k = f"g{i % 3}"
        toks = [f"{k}-tok{rng.randint(0, 900)}" for _ in range(6)]
        rows_k.append(k)
        rows_t.append(" ".join(toks))
    tabs = [pa.table({"lang": pa.array(list(ks), pa.string()),
                      "text": pa.array(list(ts), pa.string())})
            for ks, ts in zip(
                np.array_split(np.asarray(rows_k, dtype=object), n_blocks),
                np.array_split(np.asarray(rows_t, dtype=object), n_blocks))]
    return rd.from_arrow(tabs), rows_k, rows_t


class TestGroupedHLL:
    def test_matches_per_group_fold_truth(self, ray_session):
        from raydedup.stages.cardinality import hll_registers_by
        ds, ks, ts = _grouped_ds()
        tab = hll_registers_by(ds, CFG, key="lang", tokens=True)
        got = {tab["lang"][i].as_py():
               np.frombuffer(tab["regs"][i].as_py(), dtype=np.int8)
               for i in range(len(tab))}
        assert sorted(got) == ["g0", "g1", "g2"]
        for g in got:
            toks = [w for k, t in zip(ks, ts) if k == g
                    for w in t.split(" ") if w]
            truth = fold_registers(
                hash_utf8_array(pa.array(toks, pa.string())), 14)
            assert np.array_equal(got[g], truth), g

    def test_estimates_and_partition_invariance(self, ray_session):
        from raydedup.stages.cardinality import approx_distinct_by
        ds, ks, ts = _grouped_ds()
        est = approx_distinct_by(ds, CFG, key="lang", tokens=True)
        est2 = approx_distinct_by(
            _grouped_ds(n_blocks=11)[0],
            DEFAULT_CONFIG.with_(num_partitions=17), key="lang",
            tokens=True)
        by = {est["lang"][i].as_py(): est["n_distinct_est"][i].as_py()
              for i in range(len(est))}
        by2 = {est2["lang"][i].as_py(): est2["n_distinct_est"][i].as_py()
               for i in range(len(est2))}
        assert by == by2
        for g, v in by.items():
            exact = len({w for k, t in zip(ks, ts) if k == g
                         for w in t.split(" ") if w})
            assert abs(v - exact) / exact < 0.02, (g, v, exact)


class TestScoredOracleFamily:
    """The md5-family register fold vs DuckDB, on a fixture far richer
    than the 31-token testdata vocab (exercises thousands of buckets
    and the full rank range incl. ties and the low=0 edge)."""

    def test_register_table_matches_duckdb(self, ray_session):
        import duckdb

        from raydedup.stages.cardinality import hll_registers, register_table
        rng = np.random.RandomState(3)
        docs = [" ".join(f"w{rng.randint(0, 50_000)}"
                         for _ in range(40)) for _ in range(1500)]
        docs += ["", "   ", "solo"]
        regs = hll_registers(_ds(docs, 7), CFG, tokens=True,
                             hash_family="md5")
        got = register_table(regs).to_pandas()

        con = duckdb.connect()
        con.register("docs_tbl", pa.table({"text": pa.array(docs)}))
        sql = """
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM docs_tbl
        ),
        hv AS (SELECT DISTINCT md5_number_lower(tok) AS h FROM toks
               WHERE tok <> ''),
        parts AS (SELECT (h >> 50)::BIGINT AS bucket,
                         (h % 1125899906842624::UBIGINT)::BIGINT AS low
                  FROM hv),
        ranks AS (
          SELECT p.bucket, p.low, coalesce(min(t.b) + 1, 51)::BIGINT AS rank
          FROM parts p
          LEFT JOIN (SELECT unnest(range(50)) AS b) t
            ON ((p.low >> (49 - t.b)) & 1) = 1
          GROUP BY p.bucket, p.low
        )
        SELECT bucket, max(rank) AS register FROM ranks
        GROUP BY bucket ORDER BY bucket
        """
        want = con.execute(sql).df()
        assert len(got) == len(want) and len(got) > 1000
        assert (got["bucket"].to_numpy() == want["bucket"].to_numpy()).all()
        assert (got["register"].to_numpy()
                == want["register"].to_numpy()).all()

    def test_md5_low50_zero_edge(self):
        # a hash whose low 50 bits are zero must yield register 51
        from raydedup.stages.cardinality import fold_registers
        h = np.array([1 << 50], dtype=np.uint64)   # bucket 0? no: h>>50 = 1
        regs = fold_registers(h, 14)
        assert regs[1] == 51
