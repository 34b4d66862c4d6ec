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
