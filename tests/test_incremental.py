"""Incremental exact dedup (stages/incremental.py)."""

import pyarrow as pa

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.incremental import incremental_exact_dedup

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=3)


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(2)


def test_corpus_wins_and_increment_keep_min(ray_session):
    corpus = _ds([(0, "old one"), (1, "old two"), (2, "old three")])
    inc = _ds([
        (100, "old two"),        # exists in corpus -> dropped
        (101, "brand new"),      # fresh -> kept
        (102, "inc dup"),        # min of its increment group -> kept
        (103, "inc dup"),        # same text, higher id -> dropped
        (104, "old one"),        # exists in corpus -> dropped
        (105, "another fresh"),  # kept
    ])
    out = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
    assert sorted(out["doc_id"]) == [101, 102, 105]
    assert set(out.columns) == {"doc_id", "text"}


def test_empty_corpus_reduces_to_exact_dedup(ray_session):
    import ray.data as rd
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    inc = _ds([(1, "a"), (2, "a"), (3, "b")])
    out = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_all_duplicate_increment(ray_session):
    corpus = _ds([(0, "x"), (1, "y")])
    inc = _ds([(10, "x"), (11, "y")])
    out = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
    assert len(out) == 0


# ------------------------------------------------------- near-dup variant

def _sent(seed, n=30):
    words = [f"w{(seed * 31 + i) % 97}_{i}" for i in range(n)]
    return " ".join(words)


def _near(base, tail="zzz"):
    """High-Jaccard variant: replace the last token."""
    return " ".join(base.split()[:-1] + [tail])


def _nd_fixture():
    corpus = _ds([
        (0, _sent(1)),
        (1, _sent(2)),
        (2, _sent(3)),
    ])
    inc = _ds([
        (100, _near(_sent(1))),   # near-dup of corpus 0 -> dropped
        (101, _sent(50)),         # fresh -> kept
        (102, _sent(60)),         # inc-internal cluster min -> kept
        (103, _near(_sent(60))),  # near-dup of 102 -> dropped
        (104, _sent(70)),         # fresh -> kept
    ])
    return corpus, inc


def test_incremental_near_dup_matches(ray_session):
    from raydedup.stages.incremental import incremental_near_dup_matches
    corpus, inc = _nd_fixture()
    m = incremental_near_dup_matches(inc, corpus, CFG).to_pandas()
    assert sorted(zip(m["a"], m["b"])) == [(100, 0)]
    assert (m["jaccard"] >= 0.8).all()


def test_incremental_near_dup_survivors(ray_session):
    from raydedup.stages.incremental import incremental_near_dup
    corpus, inc = _nd_fixture()
    out = incremental_near_dup(inc, corpus, CFG).to_pandas()
    assert sorted(out["doc_id"]) == [101, 102, 104]


def test_prebuilt_band_store_agrees(ray_session):
    from raydedup.stages.incremental import (corpus_band_table,
                                             incremental_near_dup)
    corpus, inc = _nd_fixture()
    bands = corpus_band_table(corpus, CFG).materialize()
    direct = incremental_near_dup(inc, corpus, CFG).to_pandas()
    stored = incremental_near_dup(inc, corpus, CFG,
                                  corpus_bands=bands).to_pandas()
    assert sorted(direct["doc_id"]) == sorted(stored["doc_id"])


def test_near_dup_corpus_wins_within_increment_chain(ray_session):
    """X≈corpus, Y≈X only: X dropped (corpus), Y survives (standard
    incremental semantics — no transitive chase through dropped sibs),
    and both-corpus near-dup pairs are never even generated."""
    from raydedup.stages.incremental import (incremental_near_dup,
                                             incremental_near_dup_matches)
    base = _sent(9, n=40)
    corpus = _ds([(0, base), (1, _near(base, "c1"))])  # corpus-internal pair
    x = _near(base, "x1")
    inc = _ds([(100, x), (101, _near(x, "y1"))])
    m = incremental_near_dup_matches(inc, corpus, CFG).to_pandas()
    assert set(m["a"]) == {100, 101} or set(m["a"]) == {100}
    out = incremental_near_dup(inc, corpus, CFG).to_pandas()
    # whoever is NOT corpus-matched survives; corpus-matched are dropped
    surv = set(out["doc_id"]) if len(out) else set()
    assert surv == set(inc.to_pandas()["doc_id"]) - set(m["a"])


def test_prebuilt_hash_store_agrees(ray_session):
    from raydedup.stages.incremental import (corpus_hash_table,
                                             incremental_exact_dedup)
    corpus = _ds([(0, "old one"), (1, "old two"), (2, "old three")])
    inc = _ds([(100, "old two"), (101, "brand new"), (102, "inc dup"),
               (103, "inc dup")])
    hashes = corpus_hash_table(corpus, CFG).materialize()
    direct = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
    stored = incremental_exact_dedup(inc, None, CFG,
                                     corpus_hashes=hashes).to_pandas()
    assert sorted(direct["doc_id"]) == sorted(stored["doc_id"]) == [101, 102]


def test_with_matches_one_exchange(ray_session):
    from raydedup.stages.incremental import (incremental_near_dup,
                                             incremental_near_dup_matches)
    corpus, inc = _nd_fixture()
    kept, matches = incremental_near_dup(inc, corpus, CFG,
                                         with_matches=True)
    kept, matches = kept.to_pandas(), matches.to_pandas()
    assert sorted(kept["doc_id"]) == [101, 102, 104]
    want = incremental_near_dup_matches(inc, corpus, CFG).to_pandas()
    assert sorted(zip(matches["a"], matches["b"])) \
        == sorted(zip(want["a"], want["b"]))


def test_incremental_cli(ray_session, tmp_path):
    import argparse
    import pyarrow.parquet as pq
    from raydedup.__main__ import cmd_bandstore, cmd_incremental

    corpus, inc = _nd_fixture()
    pq.write_table(pa.table(corpus.to_pandas()), tmp_path / "corpus.parquet")
    pq.write_table(pa.table(inc.to_pandas()), tmp_path / "inc.parquet")
    cmd_bandstore(argparse.Namespace(input=str(tmp_path / "corpus.parquet"),
                                     output=str(tmp_path / "store")))
    cmd_incremental(argparse.Namespace(
        increment=str(tmp_path / "inc.parquet"),
        corpus=str(tmp_path / "corpus.parquet"),
        output=str(tmp_path / "out"), store=str(tmp_path / "store"),
        threshold=None, exact_only=False))
    import ray.data as rd
    kept = rd.read_parquet(str(tmp_path / "out/kept")).to_pandas()
    m = rd.read_parquet(str(tmp_path / "out/matches")).to_pandas()
    assert sorted(kept["doc_id"]) == [101, 102, 104]
    assert sorted(zip(m["a"], m["b"])) == [(100, 0)]


class TestBloomPrefilter:
    def test_matches_plain_path_random(self, ray_session):
        import numpy as np
        from raydedup.stages.incremental import incremental_exact_dedup_bloom
        rng = np.random.default_rng(23)
        texts = [f"doc text {i}" for i in range(60)]
        corpus = _ds([(i, texts[rng.integers(0, 40)]) for i in range(50)])
        inc = _ds([(100 + i, texts[rng.integers(0, 60)])
                   for i in range(40)])
        plain = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
        bloom = incremental_exact_dedup_bloom(inc, corpus, CFG).to_pandas()
        assert sorted(bloom["doc_id"]) == sorted(plain["doc_id"])

    def test_false_positives_confirmed_exactly(self, ray_session):
        # bits_per_key=1 → massive FP rate; exact confirm must still
        # produce the identical answer
        from raydedup.stages.incremental import (build_hash_bloom,
                                                 incremental_exact_dedup_bloom)
        corpus = _ds([(i, f"old {i}") for i in range(30)])
        inc = _ds([(100 + i, f"new {i}") for i in range(30)]
                  + [(200, "old 7"), (201, "old 7")])
        bl = build_hash_bloom(corpus, CFG, bits_per_key=1).materialize()
        out = incremental_exact_dedup_bloom(
            inc, corpus, CFG, corpus_bloom=bl).to_pandas()
        plain = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
        assert sorted(out["doc_id"]) == sorted(plain["doc_id"])
        assert 200 not in set(out["doc_id"])  # corpus wins
        assert set(out["doc_id"]) == set(100 + i for i in range(30))

    def test_store_roundtrip_and_size(self, ray_session, tmp_path):
        import ray.data as rd
        from raydedup.stages.incremental import (build_hash_bloom,
                                                 corpus_hash_table,
                                                 incremental_exact_dedup_bloom)
        corpus = _ds([(i, f"corpus doc number {i}") for i in range(200)])
        bl = build_hash_bloom(corpus, CFG)
        path = str(tmp_path / "bloom_store")
        bl.write_parquet(path)
        reloaded = rd.read_parquet(path)
        inc = _ds([(1000, "corpus doc number 5"), (1001, "fresh")])
        out = incremental_exact_dedup_bloom(
            inc, corpus, CFG, corpus_bloom=reloaded).to_pandas()
        assert sorted(out["doc_id"]) == [1001]
        # the filter is an order of magnitude leaner than the hash store
        bloom_bytes = sum(len(b) for b in
                          reloaded.to_pandas()["bits"])
        hash_rows = corpus_hash_table(corpus, CFG).count()
        assert bloom_bytes < hash_rows * 16

    def test_store_built_under_different_partition_count(self, ray_session):
        # the store carries n_parts; probing under ANOTHER config must
        # still route to the right filter (else dups leak as new)
        from raydedup.config import DEFAULT_CONFIG
        from raydedup.stages.incremental import (build_hash_bloom,
                                                 incremental_exact_dedup_bloom)
        corpus = _ds([(i, f"old {i}") for i in range(40)])
        inc = _ds([(100 + i, f"old {i}") for i in range(40)]
                  + [(900, "genuinely new")])
        build_cfg = DEFAULT_CONFIG.with_(num_partitions=16)
        probe_cfg = DEFAULT_CONFIG.with_(num_partitions=3)
        bl = build_hash_bloom(corpus, build_cfg).materialize()
        out = incremental_exact_dedup_bloom(
            inc, corpus, probe_cfg, corpus_bloom=bl).to_pandas()
        assert sorted(out["doc_id"]) == [900]


class TestBandBloom:
    """Band-key Bloom store: prunes the corpus band table before the
    exchange; output IDENTICAL to the plain band-store path."""

    def _bigger_fixture(self, n_corpus=40, n_inc=15):
        corpus = _ds([(i, _sent(i)) for i in range(n_corpus)])
        inc_rows = [(100 + i, _near(_sent(i * 3)))      # some hit corpus
                    for i in range(n_inc // 3)]
        # fresh seeds 50+i: _sent is periodic mod 97 (word = f(seed %
        # 97, pos)), so seeds must not collide with corpus 0..39 mod 97
        inc_rows += [(200 + i, _sent(50 + i))
                     for i in range(n_inc - len(inc_rows))]
        return corpus, _ds(inc_rows)

    def test_matches_plain_band_store(self, ray_session):
        from raydedup.state import RunCounters
        from raydedup.stages.incremental import (build_band_bloom,
                                                 corpus_band_table,
                                                 incremental_near_dup)
        corpus, inc = self._bigger_fixture()
        bands = corpus_band_table(corpus, CFG).materialize()
        bloom = build_band_bloom(bands, CFG).materialize()
        plain = incremental_near_dup(inc, corpus, CFG,
                                     corpus_bands=bands).to_pandas()
        rc = RunCounters()
        bl = incremental_near_dup(inc, corpus, CFG, corpus_bands=bands,
                                  corpus_band_bloom=bloom,
                                  counters=rc.actor).to_pandas()
        assert sorted(plain["doc_id"]) == sorted(bl["doc_id"])
        got = rc.get()
        # the filter actually pruned: shipped < seen corpus band rows
        assert got["band_bloom_corpus_rows_shipped"] \
            < got["band_bloom_corpus_rows_seen"]
        assert got["band_bloom_hit_keys"] <= got["band_bloom_inc_keys"]

    def test_fp_stress_output_identical(self, ray_session):
        """1 bit/key forces a huge false-positive rate: output must
        stay identical (FPs only ship corpus rows the in-exchange
        bucket drop then discards)."""
        from raydedup.stages.incremental import (build_band_bloom,
                                                 corpus_band_table,
                                                 incremental_near_dup)
        corpus, inc = self._bigger_fixture()
        bands = corpus_band_table(corpus, CFG).materialize()
        tiny = build_band_bloom(bands, CFG, bits_per_key=1).materialize()
        plain = incremental_near_dup(inc, corpus, CFG,
                                     corpus_bands=bands).to_pandas()
        bl = incremental_near_dup(inc, corpus, CFG, corpus_bands=bands,
                                  corpus_band_bloom=tiny).to_pandas()
        assert sorted(plain["doc_id"]) == sorted(bl["doc_id"])

    def test_matches_variant_and_store_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd
        from raydedup.stages.incremental import (build_band_bloom,
                                                 corpus_band_table,
                                                 incremental_near_dup_matches)
        corpus, inc = _nd_fixture()
        bands = corpus_band_table(corpus, CFG).materialize()
        build_band_bloom(bands, CFG).write_parquet(str(tmp_path / "bb"))
        bloom = rd.read_parquet(str(tmp_path / "bb"))
        m = incremental_near_dup_matches(
            inc, corpus, CFG, corpus_bands=bands,
            corpus_band_bloom=bloom).to_pandas()
        assert sorted(zip(m["a"], m["b"])) == [(100, 0)]

    def test_no_false_negatives(self, ray_session):
        """Every key actually in the store must hit the filter."""
        import numpy as np
        import ray
        from raydedup.stages.incremental import (build_band_bloom,
                                                 corpus_band_table,
                                                 load_band_bloom,
                                                 probe_band_bloom)
        corpus, _ = self._bigger_fixture()
        bands = corpus_band_table(corpus, CFG).materialize()
        keys = np.unique(np.concatenate(
            [np.asarray(t["band_key"], np.int64)
             for t in ray.get(bands.to_arrow_refs()) if len(t)]))
        blooms, store_np = load_band_bloom(
            build_band_bloom(bands, CFG).materialize())
        assert probe_band_bloom(keys, blooms, store_np).all()
        # absent keys mostly miss at the default 16 bits/key
        absent = keys[: 200] + np.int64(0x5DEECE66D)
        absent = absent[~np.isin(absent, keys)]
        fp = probe_band_bloom(absent, blooms, store_np).mean()
        assert fp < 0.05

    def test_bloom_requires_bands(self, ray_session):
        import pytest as _pytest
        from raydedup.stages.incremental import (build_band_bloom,
                                                 corpus_band_table,
                                                 incremental_near_dup)
        corpus, inc = _nd_fixture()
        bloom = build_band_bloom(
            corpus_band_table(corpus, CFG).materialize(), CFG).materialize()
        with _pytest.raises(ValueError, match="corpus_bands"):
            incremental_near_dup(inc, corpus, CFG,
                                 corpus_band_bloom=bloom).to_pandas()
