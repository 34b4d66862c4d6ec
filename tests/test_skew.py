"""Skew-handling tests: over-cap LSH bucket salting, bounded pair
emission, distributed-CC checkpoint rounds."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig


def _docs_ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


BASE = " ".join(f"w{i}" for i in range(40))
BIGBASE = " ".join(f"w{i}" for i in range(200))


class TestBucketSalting:
    def test_over_cap_near_dup_group_still_clusters(self, ray_session):
        # 60 NEAR-identical (not byte-identical — exact dedup can't help)
        # docs with cap=20: every band bucket is over cap.  The old
        # behavior dropped these buckets (zero recall on boilerplate
        # floods); salting must keep the flood connected as one cluster
        # and surface counters.
        from raydedup.pipelines.neardup import near_dup_clusters
        from raydedup.state import RunCounters
        cfg = PipelineConfig(num_partitions=4, batch_size=64,
                             band_bucket_cap=20)
        flood = [BIGBASE + f" tail{i}" for i in range(60)]
        uniq = [f"u{i}x " * 30 for i in range(20)]
        rc = RunCounters()
        labels = near_dup_clusters(_docs_ds(flood + uniq), cfg,
                                   counters=rc.actor).to_pandas()
        got = dict(zip(labels["node"], labels["component"]))
        # every flood doc present and in ONE component
        assert set(range(60)) <= set(got)
        assert len({got[i] for i in range(60)}) == 1
        # unique docs untouched
        assert not (set(got) & set(range(60, 80))) or all(
            got[i] not in {got[j] for j in range(60)} for i in got
            if i >= 60)
        counters = rc.get()
        assert counters["lsh_overcap_buckets"] > 0
        assert counters["lsh_salted_pairs"] > 0
        assert counters["cc_rounds"] >= 1

    def test_under_cap_bucket_kept(self, ray_session):
        from raydedup.pipelines.neardup import near_dup_pairs
        cfg = PipelineConfig(num_partitions=4, batch_size=64,
                             band_bucket_cap=100)
        texts = [BASE] * 10 + [f"u{i} " * 30 for i in range(20)]
        pairs = near_dup_pairs(_docs_ds(texts), cfg).to_pandas()
        got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
        want = {(a, b) for a in range(10) for b in range(a + 1, 10)}
        assert want <= got


class TestEmitRunPairsSalting:
    def test_bounded_emission_and_connectivity(self):
        from raydedup.stages.lsh import _emit_run_pairs
        from tests.oracle import union_find_components
        n, cap = 1000, 20
        keys = np.full(n, 7, dtype=np.int64)
        ids = np.arange(n, dtype=np.int64)
        lo, hi, stats = _emit_run_pairs(keys, ids, cap)
        allp = n * (n - 1) // 2
        # linear, not quadratic: well under 5% of all-pairs
        assert 0 < len(lo) < 0.05 * allp
        # every member appears
        assert set(np.concatenate([lo, hi]).tolist()) == set(range(n))
        # the salted pair graph is connected (overlap chaining)
        comp = union_find_components(list(zip(lo.tolist(), hi.tolist())))
        assert len(set(comp.values())) == 1
        assert stats["lsh_overcap_buckets"] == 1
        assert stats["lsh_overcap_rows"] == n
        assert stats["lsh_salted_pairs"] == len(lo)

    def test_salting_deterministic_and_partition_independent(self):
        from raydedup.stages.lsh import _emit_run_pairs
        keys = np.concatenate([np.full(50, 3), np.full(7, 9)]).astype(np.int64)
        ids = np.arange(57, dtype=np.int64)
        out1 = _emit_run_pairs(keys, ids, 10)
        # different input row order → identical output pair set
        perm = np.random.default_rng(0).permutation(57)
        out2 = _emit_run_pairs(keys[perm], ids[perm], 10)
        p1 = set(zip(out1[0].tolist(), out1[1].tolist()))
        p2 = set(zip(out2[0].tolist(), out2[1].tolist()))
        assert p1 == p2

    def test_small_runs_emit_all_pairs(self):
        from raydedup.stages.lsh import _emit_run_pairs
        keys = np.array([1, 1, 1, 2, 2, 3], dtype=np.int64)
        ids = np.array([10, 11, 12, 20, 21, 30], dtype=np.int64)
        lo, hi, stats = _emit_run_pairs(keys, ids, 512)
        got = set(zip(lo.tolist(), hi.tolist()))
        assert got == {(10, 11), (10, 12), (11, 12), (20, 21)}
        assert stats["lsh_overcap_buckets"] == 0


class TestExactPairsGroupGuard:
    def test_10k_copy_text_no_quadratic_blowup(self, ray_session):
        # 10k byte-identical copies: all-pairs would be ~50M rows; the
        # star guard emits the linear (min_id, member) pairs instead,
        # and components stay identical to full enumeration.
        import ray.data as rd
        from raydedup.config import PipelineConfig
        from raydedup.stages.cc import connected_components
        from raydedup.stages.dedup import exact_dup_pairs
        from raydedup.state import RunCounters
        n = 10_000
        texts = ["same doc body here"] * n + ["unique %d" % i
                                              for i in range(50)]
        ds = _docs_ds(texts)
        cfg = PipelineConfig(num_partitions=4, batch_size=2048)
        rc = RunCounters()
        pairs = exact_dup_pairs(ds, cfg, counters=rc.actor).to_pandas()
        # linear star output, not ~50M
        assert len(pairs) == n - 1
        assert (pairs["a"] == 0).all()
        assert rc.get()["exact_overcap_groups"] == 1
        # clustering equivalent to full enumeration: one component
        comp = connected_components(
            rd.from_arrow(pa.Table.from_pandas(pairs)), cfg).to_pandas()
        assert comp["component"].nunique() == 1
        assert len(comp) == n

    def test_small_groups_full_enumeration(self, ray_session):
        from raydedup.config import PipelineConfig
        from raydedup.stages.dedup import exact_dup_pairs
        texts = ["x"] * 4 + ["y"] * 2 + ["z%d" % i for i in range(5)]
        pairs = exact_dup_pairs(_docs_ds(texts),
                                PipelineConfig(num_partitions=4)).to_pandas()
        got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
        want = {(a, b) for a in range(4) for b in range(a + 1, 4)} | {(4, 5)}
        assert got == want


class TestDistributedCCCheckpoint:
    def test_checkpoint_fn_called_and_result_correct(self, ray_session):
        import ray.data as rd
        from raydedup.stages.cc import connected_components
        from tests.oracle import union_find_components
        rng = np.random.default_rng(1)
        # chain graph forces multiple propagation rounds
        edges = [(i, i + 1) for i in range(0, 40)] + \
                [(100 + i, 100 + rng.integers(0, i + 1)) for i in range(1, 30)]
        pairs = rd.from_arrow(pa.table({
            "a": pa.array([min(e) for e in edges], pa.int64()),
            "b": pa.array([max(e) for e in edges], pa.int64()),
        }))
        rounds = []

        def ckpt(i, labels_ds):
            rounds.append(i)
            return labels_ds

        cfg = PipelineConfig(num_partitions=4, cc_max_iters=50)
        out = connected_components(pairs, cfg, checkpoint_fn=ckpt,
                                   mode="distributed").to_pandas()
        got = dict(zip(out["node"], out["component"]))
        want = union_find_components(edges)
        assert got == want
        assert len(rounds) >= 2     # the chain needs several rounds

    def test_parquet_roundtrip_checkpoint_fn(self, ray_session, tmp_path):
        # checkpoint_fn that round-trips labels through Parquet destroys
        # block layout; the repartition guard must restore
        # co-partitioning (this corrupted labels silently before).
        import ray.data as rd
        from raydedup.stages.cc import connected_components
        from tests.oracle import union_find_components
        edges = [(i, i + 1) for i in range(0, 25)] + [(50, 51), (51, 52)]
        pairs = rd.from_arrow(pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }))

        def ckpt(i, labels_ds):
            p = str(tmp_path / f"cc_round_{i}")
            labels_ds.write_parquet(p)
            return rd.read_parquet(p)

        cfg = PipelineConfig(num_partitions=4, cc_max_iters=50)
        out = connected_components(pairs, cfg, checkpoint_fn=ckpt,
                                   mode="distributed").to_pandas()
        got = dict(zip(out["node"], out["component"]))
        assert got == union_find_components(edges)

    def test_non_convergence_warns(self, ray_session):
        import ray.data as rd
        from raydedup.stages.cc import connected_components
        edges = [(i, i + 1) for i in range(0, 30)]
        pairs = rd.from_arrow(pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }))
        cfg = PipelineConfig(num_partitions=4, cc_max_iters=2)
        with pytest.warns(RuntimeWarning, match="did not converge"):
            connected_components(pairs, cfg, mode="distributed").to_pandas()

    def test_overcap_star_matches_oracle_sql(self, ray_session):
        # The documented contract (SQL_EXACT_DUP_PAIRS) is hybrid:
        # all-pairs for groups ≤ EXACT_PAIRS_MAX_GROUP, star above.
        # Verify Ray output == DuckDB oracle on a corpus containing an
        # OVER-cap group (1200 copies), a small dup group and uniques —
        # the skew case where the round-2 oracle silently diverged.
        import duckdb
        import pandas as pd
        from raydedup.config import PipelineConfig
        from raydedup.stages.dedup import exact_dup_pairs
        from raydedup.pipelines.queries import SQL_EXACT_DUP_PAIRS
        texts = (["flooded boilerplate"] * 1200
                 + ["small dup group"] * 4
                 + ["unique %d" % i for i in range(30)])
        ds = _docs_ds(texts)
        cfg = PipelineConfig(num_partitions=4, batch_size=2048)
        got = exact_dup_pairs(ds, cfg).to_pandas()
        docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                             "text": texts})
        con = duckdb.connect()
        con.register("documents", docs)
        want = con.execute(SQL_EXACT_DUP_PAIRS).df()
        assert set(zip(got["a"], got["b"])) == set(zip(want["a"], want["b"]))
        # star for the flood (1199 pairs), all-pairs for the small group (6)
        assert len(got) == 1199 + 6


class TestAdaptiveOvercapChunk:
    def test_chunk_shrinks_with_flood_size(self):
        from raydedup.stages.lsh import SALT_CHUNK, SALT_CHUNK_MIN, _overcap_chunk
        cap = 512
        assert _overcap_chunk(cap + 1, cap) == SALT_CHUNK       # just over cap
        assert _overcap_chunk(2_048, cap) == SALT_CHUNK          # budget edge
        assert _overcap_chunk(8_192, cap) == 32
        assert _overcap_chunk(300_000, cap) == SALT_CHUNK_MIN    # mega-flood
        # small-cap configs keep their historical chunk (= cap) until the
        # SALT_CHUNK^2 budget floor is exceeded
        assert _overcap_chunk(60, 20) == 20
        assert _overcap_chunk(1_000, 20) == 20
        assert _overcap_chunk(4_000, 20) == 8

    def test_mega_flood_emission_linear_and_connected(self):
        from raydedup.stages.lsh import _emit_run_pairs
        from tests.oracle import union_find_components
        n, cap = 50_000, 512
        keys = np.full(n, 42, dtype=np.int64)
        ids = np.arange(n, dtype=np.int64)
        lo, hi, stats = _emit_run_pairs(keys, ids, cap)
        # adaptive chunk=8 -> ~4 pairs per member, nowhere near 64x
        assert len(lo) < 4.2 * n
        assert set(np.concatenate([lo, hi]).tolist()) == set(range(n))
        comp = union_find_components(list(zip(lo.tolist(), hi.tolist())))
        assert len(set(comp.values())) == 1
        assert stats["lsh_salted_pairs"] == len(lo)

    def test_adaptive_flood_still_clusters_end_to_end(self, ray_session):
        # big enough that _overcap_chunk drops below the small cap: the
        # flood must still come out as ONE component after verify + CC
        from raydedup.pipelines.neardup import near_dup_clusters
        cfg = PipelineConfig(num_partitions=4, batch_size=512,
                             band_bucket_cap=20)
        flood = [BIGBASE + f" tail{i}" for i in range(1_700)]
        labels = near_dup_clusters(_docs_ds(flood), cfg).to_pandas()
        got = dict(zip(labels["node"], labels["component"]))
        assert set(range(1_700)) <= set(got)
        assert len({got[i] for i in range(1_700)}) == 1


class TestLocalCCContraction:
    """label_components_arrays is the driver-local CC; the salted-chain
    flood gives it a diameter ~L/chunk graph — the contraction rewrite
    must label it right in O(log V) rounds (the one-hop propagation it
    replaced needed O(diameter) rounds: 4 077 at a 300k-member flood)."""

    def test_long_path_min_label(self):
        from raydedup.stages.cc import label_components_arrays
        n = 200_000
        # path over PERMUTED ids: the min sits somewhere in the middle
        ids = np.random.default_rng(3).permutation(n).astype(np.int64) + 17
        nodes, comp = label_components_arrays(ids[:-1], ids[1:])
        assert len(nodes) == n
        assert (comp == ids.min()).all()

    def test_matches_union_find_oracle(self):
        from raydedup.stages.cc import label_components_arrays
        from tests.oracle import union_find_components
        rng = np.random.default_rng(11)
        a = rng.integers(0, 500, 3_000).astype(np.int64) * 3 + 1
        b = rng.integers(0, 500, 3_000).astype(np.int64) * 3 + 1
        nodes, comp = label_components_arrays(a, b)
        uf = union_find_components(list(zip(a.tolist(), b.tolist())))
        # normalize oracle labels to min member id per component
        import collections
        members = collections.defaultdict(list)
        for node, root in uf.items():
            members[root].append(node)
        want = {}
        for mem in members.values():
            lo = min(mem)
            for node in mem:
                want[node] = lo
        got = dict(zip(nodes.tolist(), comp.tolist()))
        assert got == want
