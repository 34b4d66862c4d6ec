"""Sequence-packing (token-budget bin assignment) tests."""

import numpy as np
import pyarrow as pa

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=4)


def _ds(rows):
    import ray.data as rd
    ids, texts = zip(*rows)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "text": pa.array(list(texts), pa.string()),
    }))


class TestPackSequences:
    def test_contiguous_budget_bins(self, ray_session):
        from raydedup.stages.packing import pack_sequences
        # 10 docs x 4 tokens, budget 10 -> exclusive cumsum 0,4,8,...
        rows = [(i, "a b c d") for i in range(10)]
        out = pack_sequences(_ds(rows), CFG, budget=10).to_pandas() \
            .sort_values("doc_id")
        assert list(out["n_tokens"]) == [4] * 10
        # cumsum-start bin: 0,4,8 -> 0; 12,16 -> 1; ...
        assert list(out["bin"]) == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]

    def test_matches_window_oracle(self, ray_session):
        import duckdb

        from raydedup.stages.packing import pack_sequences
        rng = np.random.default_rng(7)
        # sparse, shuffled-arrival ids with varied lengths
        ids = rng.choice(10_000, size=300, replace=False)
        rows = [(int(i), " ".join(f"t{j}" for j in range(int(l))))
                for i, l in zip(ids, rng.integers(1, 50, size=300))]
        out = pack_sequences(_ds(rows), CFG, budget=97).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        df = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }).to_pandas()
        want = duckdb.connect().execute("""
            WITH tok AS (SELECT doc_id,
                                len(string_split(text,' '))::BIGINT AS n_tokens
                         FROM df),
            c AS (SELECT doc_id, n_tokens,
                         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS cexcl
                  FROM tok)
            SELECT doc_id, n_tokens, (cexcl // 97)::BIGINT AS bin
            FROM c ORDER BY doc_id
        """).df()
        assert list(out["bin"]) == list(want["bin"])
        assert list(out["n_tokens"]) == list(want["n_tokens"])

    def test_sparse_skewed_ids_quantile_partitioner(self, ray_session):
        """Sparse/skewed id space (a dense low clump + a huge-offset
        strided tail): the quantile partitioner must yield the SAME
        bins as the arithmetic one (output is partition-invariant) and
        as a local oracle, while arithmetic ranges would have dumped
        every low id into one partition."""
        from raydedup.stages.packing import pack_sequences
        rng = np.random.default_rng(13)
        low = list(range(100))                         # dense clump at 0
        high = [10**12 + 7919 * i for i in range(100)]  # far strided tail
        ids = low + high
        lens = rng.integers(1, 30, size=len(ids))
        rows = [(int(i), " ".join("w" * 1 for _ in range(int(l))))
                for i, l in zip(ids, lens)]
        outq = pack_sequences(_ds(rows), CFG, budget=53,
                              partitioner="quantile").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outa = pack_sequences(_ds(rows), CFG, budget=53,
                              partitioner="arith").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # local oracle: exclusive cumsum in ascending id order
        order = np.argsort(np.asarray(ids, dtype=np.int64))
        ntok = np.asarray(lens, dtype=np.int64)[order]
        excl = np.concatenate(([0], np.cumsum(ntok)[:-1]))
        want = (excl // 53).tolist()
        assert list(outq["bin"]) == want
        assert list(outa["bin"]) == want
        # auto picks quantile here (span >> rows) and agrees too
        outo = pack_sequences(_ds(rows), CFG, budget=53).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(outo["bin"]) == want
