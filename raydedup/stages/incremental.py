"""Incremental dedup: a new crawl increment against an existing corpus.

The production shape of exact dedup is not one batch job over a frozen
corpus — it is a DAILY increment arriving next to petabytes already
curated.  Re-deduplicating the union from scratch is O(corpus) per day;
the correct plan touches the increment in full but the corpus only as
16-byte content hashes.

``incremental_exact_dedup`` keeps an increment row iff
  (a) its text does not appear anywhere in the existing corpus, and
  (b) it is the min-id row of its text group WITHIN the increment
(the existing corpus always wins; ties inside the increment resolve
exactly like stages/dedup.exact_dedup).

Physical plan: both sides get the 128-bit content hash
(stages/dedup.with_text_hash); the CORPUS side is immediately projected
to its two hash columns — its text never moves.  Both sides are
exchanged once by hash(text_hash) and the co-partitioned block pairs
are resolved independently (zip-by-partition, stages/join.py plan):
sort the corpus hashes, one vectorized searchsorted membership probe,
then a lexsort keep-min within the increment partition.  Shuffle
volume: |increment| rows + 16 B × |corpus|; no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.broadcast import bcast_get
from ..functions.shuffle import hash_partition_map
from .dedup import with_text_hash

_HASH_COLS = ["text_hash", "text_hash2"]


def _uniq_hash_pairs(t: pa.Table) -> pa.Table:
    """Per-batch unique (text_hash, text_hash2) projection — a
    duplicate-heavy side ships one pair per distinct text per batch."""
    h1 = np.asarray(t["text_hash"], dtype=np.int64)
    h2 = np.asarray(t["text_hash2"], dtype=np.int64)
    order = np.lexsort((h2, h1))
    keep = np.ones(len(order), dtype=bool)
    h1o, h2o = h1[order], h2[order]
    keep[1:] = (h1o[1:] != h1o[:-1]) | (h2o[1:] != h2o[:-1])
    idx = pa.array(order[keep], pa.int64())
    return t.select(_HASH_COLS).take(idx)


def _pair_member(sorted_h1: np.ndarray, sorted_h2: np.ndarray,
                 h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized membership of (h1, h2) pairs in a (h1, h2)-lexsorted
    pair set: searchsorted run bounds on h1, then a bounded linear scan
    over the run for the h2 hit — runs are true 64-bit h1 collisions
    (~1 element), so the loop stays O(1) whatever the dup skew."""
    if not len(h1) or not len(sorted_h1):
        return np.zeros(len(h1), dtype=bool)
    lo = np.searchsorted(sorted_h1, h1, side="left")
    hi = np.searchsorted(sorted_h1, h1, side="right")
    hit = np.zeros(len(h1), dtype=bool)
    width = hi - lo
    for w in range(int(width.max()) if len(width) else 0):
        act = width > w
        hit[act] |= sorted_h2[lo[act] + w] == h2[act]
    return hit


def _tag_part(n_parts: int):
    def _tag(t: pa.Table) -> pa.Table:
        h = np.asarray(t["text_hash"], dtype=np.int64)
        part = (splitmix64(h.view(np.uint64)) % np.uint64(n_parts)) \
            .astype(np.int64)
        return t.append_column("_part", pa.array(part, pa.int64()))
    return _tag


def _exchange(ds, n_parts: int, cfg: PipelineConfig):
    def _ident(t: pa.Table | None) -> pa.Table:
        return t if t is not None else pa.table({})

    return hash_partition_map(ds, "_part", _ident, n_parts,
                              map_fn=_tag_part(n_parts),
                              map_chunk_rows=cfg.batch_size)


def corpus_hash_table(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                      text_col: str = "text"):
    """(text_hash, text_hash2) rows for a corpus — the persistable
    exact-dedup store an incremental run probes instead of re-hashing
    corpus text (write_parquet once, read_parquet every increment; the
    exact-tier companion of ``corpus_band_table``)."""
    return with_text_hash(docs.select_columns([text_col]), text_col) \
        .select_columns(_HASH_COLS)


def incremental_exact_dedup(new_ds, corpus_ds,
                            cfg: PipelineConfig = DEFAULT_CONFIG, *,
                            id_col: str = "doc_id", text_col: str = "text",
                            corpus_hashes=None):
    """→ the increment rows that survive against the existing corpus
    (original columns, hash columns dropped).  ``corpus_hashes``: a
    prebuilt ``corpus_hash_table`` store (corpus_ds ignored then —
    corpus text is never re-read)."""
    import ray
    import ray.data as rd

    n_parts = cfg.resolved_partitions()

    # per-batch unique BEFORE the exchange: a duplicate-heavy corpus
    # ships one hash pair per distinct text per batch, not per row
    if corpus_hashes is None:
        corpus_hashes = with_text_hash(
            corpus_ds.select_columns([text_col]), text_col)
    corpus_hashes = corpus_hashes.map_batches(
        _uniq_hash_pairs, batch_format="pyarrow", zero_copy_batch=True)
    new_hashed = with_text_hash(new_ds, text_col)

    new_parts = _exchange(new_hashed, n_parts, cfg)
    corpus_parts = _exchange(corpus_hashes, n_parts, cfg)

    @ray.remote
    def _resolve(new_tab: pa.Table, corp_tab: pa.Table) -> pa.Table:
        if new_tab is None or new_tab.num_columns == 0 or not len(new_tab):
            return pa.table({})
        h1 = np.asarray(new_tab["text_hash"], dtype=np.int64)
        h2 = np.asarray(new_tab["text_hash2"], dtype=np.int64)
        keep = np.ones(len(h1), dtype=bool)
        if corp_tab is not None and corp_tab.num_columns and len(corp_tab):
            c1 = np.asarray(corp_tab["text_hash"], dtype=np.int64)
            c2 = np.asarray(corp_tab["text_hash2"], dtype=np.int64)
            co = np.lexsort((c2, c1))
            c1, c2 = c1[co], c2[co]
            uq = np.ones(len(c1), dtype=bool)
            uq[1:] = (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1])
            c1, c2 = c1[uq], c2[uq]   # bounds the probe-run width to
            # true 64-bit h1 collisions (~1), whatever the dup skew
            keep &= ~_pair_member(c1, c2, h1, h2)
        # within-increment keep-min on surviving rows
        ids = np.asarray(new_tab[id_col], dtype=np.int64)
        surv = np.flatnonzero(keep)
        if len(surv):
            s1, s2, sid = h1[surv], h2[surv], ids[surv]
            order = np.lexsort((sid, s2, s1))
            s1o, s2o = s1[order], s2[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = (s1o[1:] != s1o[:-1]) | (s2o[1:] != s2o[:-1])
            winners = surv[order[first]]
            keep = np.zeros(len(h1), dtype=bool)
            keep[winners] = True
        out = new_tab.filter(pa.array(keep))
        return out.drop_columns([c for c in _HASH_COLS
                                 if c in out.column_names])

    n_refs = new_parts.to_arrow_refs()
    c_refs = corpus_parts.to_arrow_refs()
    return rd.from_arrow_refs(
        [_resolve.remote(a, b) for a, b in zip(n_refs, c_refs)])


# ------------------------------------------------------- bloom-prefiltered

BLOOM_BITS_PER_KEY = 16          # ~0.04% false-positive rate at k=11


def _bloom_k(bits_per_key: int) -> int:
    """Optimal probe count k = (m/n)·ln2, fixed per store."""
    return max(1, int(round(0.6931 * bits_per_key)))


def _bloom_positions(h1: np.ndarray, h2: np.ndarray, m: int,
                     k: int) -> np.ndarray:
    """(k, n) bit positions via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i·h2) mod m — two 64-bit hashes give k independent
    probes (public construction, Kirsch & Mitzenmacher 2006)."""
    u1 = h1.view(np.uint64) if h1.dtype == np.int64 else h1.astype(np.uint64)
    u2 = h2.view(np.uint64) if h2.dtype == np.int64 else h2.astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((u1[None, :] + i * u2[None, :]) % np.uint64(m))


def build_hash_bloom(corpus_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                     text_col: str = "text", corpus_hashes=None,
                     bits_per_key: int = BLOOM_BITS_PER_KEY):
    """Per-partition Bloom filters over a corpus's content hashes —
    → Dataset(part:int64, m:int64, k:int64, bits:large_binary), one row
    per hash partition (persistable: write_parquet once, read_parquet
    every increment — ~``bits_per_key`` bits per corpus doc instead of
    the 128-bit ``corpus_hash_table``).

    The partition key is the SAME splitmix64(text_hash) routing every
    incremental exchange uses, so a membership probe touches exactly
    one filter.  The store rows carry ``n_parts`` — probes route by the
    STORE's partition count, so a store built under one config stays
    correct under any later config.  Build is one exchange of
    per-batch-uniqued hash pairs; each reduce packs its filter with one
    ``np.packbits``."""
    n_parts = cfg.resolved_partitions()
    k = _bloom_k(bits_per_key)

    if corpus_hashes is None:
        corpus_hashes = with_text_hash(
            corpus_ds.select_columns([text_col]), text_col) \
            .select_columns(_HASH_COLS)

    hashed = corpus_hashes.map_batches(_uniq_hash_pairs,
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)

    def _pack(tab: pa.Table | None) -> pa.Table:
        if tab is None or tab.num_columns == 0 or not len(tab):
            return pa.table({"part": pa.array([], pa.int64()),
                             "n_parts": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.large_binary())})
        h1 = np.asarray(tab["text_hash"], dtype=np.int64)
        h2 = np.asarray(tab["text_hash2"], dtype=np.int64)
        # the whole partition shares one routing key value
        part = int(splitmix64(h1[:1].view(np.uint64))[0]
                   % np.uint64(n_parts))
        m = max(64, int(bits_per_key) * len(h1))
        m += (-m) % 8                      # whole bytes for packbits
        bools = np.zeros(m, dtype=bool)
        bools[_bloom_positions(h1, h2, m, k).ravel()] = True
        bits = np.packbits(bools, bitorder="little").tobytes()
        return pa.table({"part": pa.array([part], pa.int64()),
                         "n_parts": pa.array([n_parts], pa.int64()),
                         "m": pa.array([m], pa.int64()),
                         "k": pa.array([k], pa.int64()),
                         "bits": pa.array([bits], pa.large_binary())})

    return hash_partition_map(hashed, "_part", _pack, n_parts,
                              map_fn=_tag_part(n_parts),
                              map_chunk_rows=cfg.batch_size)


def incremental_exact_dedup_bloom(new_ds, corpus_ds,
                                  cfg: PipelineConfig = DEFAULT_CONFIG, *,
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  corpus_bloom=None, corpus_hashes=None,
                                  counters=None):
    """``incremental_exact_dedup`` with a Bloom prefilter — output is
    IDENTICAL (the filter only prunes, never decides): increment rows
    whose hash misses the corpus Bloom are definitely-new; only the
    hits (true duplicates + the ~0.04% false-positive tail) are
    confirmed exactly against the corpus hash store.

    Why it exists: the baseline plan ships 16 B × |corpus| hashes
    through the exchange EVERY increment.  Here the corpus-side
    exchange disappears — the corpus contributes a ``bits_per_key``-bit
    per doc filter (built once, persisted, reused across increments)
    plus a zero-shuffle confirmation scan of the hash store restricted
    to bloom-hit keys (searchsorted against a broadcast candidate set;
    volume ∝ increment hits, not corpus).  Driver state: the candidate
    and confirmed hash arrays (≤ 16 B × bloom hits).

    The P filter blobs are collected once and re-broadcast via
    ray.put — at extreme corpus scale (≥10⁹ docs) keep ``cfg``'s
    partition count high enough that a single blob stays worker-sized;
    the driver never holds more than the store's total
    (n·bits_per_key/8 bytes ≈ 1/8 of the hash store)."""
    import ray
    import ray.data as rd

    n_parts = cfg.resolved_partitions()

    if corpus_bloom is None:
        corpus_bloom = build_hash_bloom(corpus_ds, cfg, text_col=text_col,
                                        corpus_hashes=corpus_hashes)
    if corpus_hashes is None:
        corpus_hashes = with_text_hash(
            corpus_ds.select_columns([text_col]), text_col) \
            .select_columns(_HASH_COLS)

    blooms = {}
    store_n_parts = None
    for t in (ray.get(r) for r in corpus_bloom.to_arrow_refs()):
        for i in range(len(t)):
            blooms[int(t["part"][i].as_py())] = (
                int(t["m"][i].as_py()), int(t["k"][i].as_py()),
                np.frombuffer(t["bits"][i].as_py(), dtype=np.uint8))
            if "n_parts" in t.column_names:
                store_n_parts = int(t["n_parts"][i].as_py())
    # probes MUST route by the partition count the store was BUILT
    # with — a store persisted under one config and probed under
    # another would otherwise look up the wrong filter and leak
    # duplicates as definitely-new (silent corruption)
    if store_n_parts is None:
        store_n_parts = n_parts        # pre-n_parts stores: same-config only
    bloom_ref = ray.put(blooms)

    new_hashed = with_text_hash(new_ds, text_col)
    new_parts = _exchange(new_hashed, n_parts, cfg).materialize()

    def _probe(t: pa.Table) -> pa.Table:
        """+ _hit flag: 1 iff the row's hash may be in the corpus."""
        if not len(t):
            return t.append_column("_hit", pa.array([], pa.int8()))
        bl = bcast_get(bloom_ref)
        h1 = np.asarray(t["text_hash"], dtype=np.int64)
        h2 = np.asarray(t["text_hash2"], dtype=np.int64)
        part = (splitmix64(h1.view(np.uint64))
                % np.uint64(store_n_parts)).astype(np.int64)
        hit = np.zeros(len(h1), dtype=bool)
        for p in np.unique(part):
            if int(p) not in bl:
                continue                   # empty corpus partition
            m, k, bits = bl[int(p)]
            sel = np.flatnonzero(part == p)
            pos = _bloom_positions(h1[sel], h2[sel], m, k)
            ok = np.ones(len(sel), dtype=bool)
            for row in pos:                # k probes, vectorized per probe
                b = (bits[(row >> np.uint64(3)).astype(np.int64)]
                     >> (row & np.uint64(7)).astype(np.uint8))
                ok &= (b & 1).astype(bool)
            hit[sel] = ok
        return t.append_column("_hit", pa.array(hit.astype(np.int8)))

    probed = new_parts.map_batches(_probe, batch_format="pyarrow",
                                   batch_size=None, zero_copy_batch=True) \
        .materialize()

    # candidate hash set (bloom hits) — tiny: true dups + FP tail
    _hash_empty = pa.table({"text_hash": pa.array([], pa.int64()),
                            "text_hash2": pa.array([], pa.int64())})

    def _hits_only(t: pa.Table) -> pa.Table:
        if "_hit" not in t.column_names:    # empty exchange partition
            return _hash_empty
        return t.filter(pc.equal(t["_hit"], 1)).select(_HASH_COLS)

    cand = [t for t in (ray.get(r) for r in probed.map_batches(
        _hits_only, batch_format="pyarrow").to_arrow_refs()) if len(t)]
    if counters is not None:
        counters.add.remote({"bloom_hits": sum(len(t) for t in cand)})
    if cand:
        ct = pa.concat_tables(cand)
        c1 = np.asarray(ct["text_hash"], dtype=np.int64)
        c2 = np.asarray(ct["text_hash2"], dtype=np.int64)
        order = np.lexsort((c2, c1))
        c1, c2 = c1[order], c2[order]
        cand_ref = ray.put((c1, c2))

        def _confirm(t: pa.Table) -> pa.Table:
            """Zero-shuffle semi-filter of the corpus hash store down
            to candidate keys (sorted-array membership per batch)."""
            a1, a2 = bcast_get(cand_ref)
            h1 = np.asarray(t["text_hash"], dtype=np.int64)
            h2 = np.asarray(t["text_hash2"], dtype=np.int64)
            return t.select(_HASH_COLS).filter(
                pa.array(_pair_member(a1, a2, h1, h2)))

        conf = [t for t in (ray.get(r) for r in corpus_hashes.map_batches(
            _confirm, batch_format="pyarrow").to_arrow_refs()) if len(t)]
    else:
        conf = []
    if conf:
        ft = pa.concat_tables(conf)
        f1 = np.asarray(ft["text_hash"], dtype=np.int64)
        f2 = np.asarray(ft["text_hash2"], dtype=np.int64)
        order = np.lexsort((f2, f1))
        f1, f2 = f1[order], f2[order]
    else:
        f1 = np.empty(0, dtype=np.int64)
        f2 = np.empty(0, dtype=np.int64)
    conf_ref = ray.put((f1, f2))

    def _finish(t: pa.Table) -> pa.Table:
        """Per co-partitioned block: drop confirmed-in-corpus rows,
        then within-increment keep-min (partition-complete by the
        exchange, so both steps are exact per block)."""
        if not len(t):
            return pa.table({})
        a1, a2 = bcast_get(conf_ref)
        h1 = np.asarray(t["text_hash"], dtype=np.int64)
        h2 = np.asarray(t["text_hash2"], dtype=np.int64)
        keep = np.ones(len(h1), dtype=bool)
        flagged = np.flatnonzero(
            np.asarray(t["_hit"], dtype=np.int8) == 1)
        if len(flagged) and len(a1):
            ind = _pair_member(a1, a2, h1[flagged], h2[flagged])
            keep[flagged[ind]] = False
        ids = np.asarray(t[id_col], dtype=np.int64)
        surv = np.flatnonzero(keep)
        if len(surv):
            s1, s2, sid = h1[surv], h2[surv], ids[surv]
            order = np.lexsort((sid, s2, s1))
            s1o, s2o = s1[order], s2[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = (s1o[1:] != s1o[:-1]) | (s2o[1:] != s2o[:-1])
            winners = surv[order[first]]
            keep = np.zeros(len(h1), dtype=bool)
            keep[winners] = True
        out = t.filter(pa.array(keep))
        return out.drop_columns([c for c in ("_hit", *_HASH_COLS)
                                 if c in out.column_names])

    return probed.map_batches(_finish, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


# --------------------------------------------------------- near-dup variant

def build_band_bloom(corpus_bands, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                     bits_per_key: int = BLOOM_BITS_PER_KEY):
    """Per-partition Bloom filters over a corpus band store's DISTINCT
    band keys → Dataset(part, n_parts, m, k, bits) — the near-dup
    analogue of ``build_hash_bloom`` (persist next to the band table;
    ~``bits_per_key`` bits per distinct corpus band key instead of the
    12-byte band rows).

    Partition = ``band_key % n_parts`` — the SAME routing every band
    exchange uses (lsh.incremental_candidate_pairs), and the rows carry
    the build-time ``n_parts`` so probes route by the STORE's count
    under any later config.  Probe hash family: h1 = the band key
    itself (already a 64-bit mix), h2 = splitmix64(key) —
    Kirsch–Mitzenmacher double hashing like the content-hash filter."""
    n_parts = cfg.resolved_partitions()
    k = _bloom_k(bits_per_key)

    def _keys(t: pa.Table) -> pa.Table:
        bk = np.unique(np.asarray(t["band_key"], dtype=np.int64)) \
            if len(t) else np.empty(0, np.int64)
        part = (bk.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"band_key": pa.array(bk, pa.int64()),
                         "_part": pa.array(part, pa.int64())})

    _EMPTY = pa.table({"part": pa.array([], pa.int64()),
                       "n_parts": pa.array([], pa.int64()),
                       "m": pa.array([], pa.int64()),
                       "k": pa.array([], pa.int64()),
                       "bits": pa.array([], pa.large_binary())})

    def _pack(tab: pa.Table | None) -> pa.Table:
        if tab is None or tab.num_columns == 0 or not len(tab):
            return _EMPTY
        bk = np.unique(np.asarray(tab["band_key"], dtype=np.int64))
        part = int(bk[:1].view(np.uint64)[0] % np.uint64(n_parts))
        h2 = np.asarray(splitmix64(bk.view(np.uint64))).view(np.int64)
        m = max(64, int(bits_per_key) * len(bk))
        m += (-m) % 8                      # whole bytes for packbits
        bools = np.zeros(m, dtype=bool)
        bools[_bloom_positions(bk, h2, m, k).ravel()] = True
        bits = np.packbits(bools, bitorder="little").tobytes()
        return pa.table({"part": pa.array([part], pa.int64()),
                         "n_parts": pa.array([n_parts], pa.int64()),
                         "m": pa.array([m], pa.int64()),
                         "k": pa.array([k], pa.int64()),
                         "bits": pa.array([bits], pa.large_binary())})

    return hash_partition_map(corpus_bands.select_columns(["band_key"]),
                              "_part", _pack, n_parts, map_fn=_keys,
                              map_chunk_rows=cfg.batch_size)


def load_band_bloom(bloom_ds):
    """Collect a band-bloom Dataset into the broadcastable
    ``(blooms: dict[part → (m, k, uint8 bits)], store_n_parts)`` form
    probes consume — total driver/object-store footprint is the store's
    own size (bits_per_key/8 bytes per distinct corpus band key)."""
    import ray
    blooms: dict[int, tuple] = {}
    store_n_parts = None
    for t in (ray.get(r) for r in bloom_ds.to_arrow_refs()):
        if t.num_columns == 0:
            continue
        for i in range(len(t)):
            blooms[int(t["part"][i].as_py())] = (
                int(t["m"][i].as_py()), int(t["k"][i].as_py()),
                np.frombuffer(t["bits"][i].as_py(), dtype=np.uint8))
            store_n_parts = int(t["n_parts"][i].as_py())
    return blooms, store_n_parts


def probe_band_bloom(keys: np.ndarray, blooms: dict,
                     store_n_parts: int) -> np.ndarray:
    """Membership mask over int64 band keys: True ⇒ the key MAY be in
    the corpus store (no false negatives — every true member hits)."""
    hit = np.zeros(len(keys), dtype=bool)
    if not len(keys) or not blooms:
        return hit
    part = (keys.view(np.uint64)
            % np.uint64(store_n_parts)).astype(np.int64)
    h2a = np.asarray(splitmix64(keys.view(np.uint64))).view(np.int64)
    for p in np.unique(part):
        bl = blooms.get(int(p))
        if bl is None:
            continue                       # empty corpus partition
        m, k, bits = bl
        sel = np.flatnonzero(part == p)
        pos = _bloom_positions(keys[sel], h2a[sel], m, k)
        ok = np.ones(len(sel), dtype=bool)
        for row in pos:                    # k probes, vectorized each
            b = (bits[(row >> np.uint64(3)).astype(np.int64)]
                 >> (row & np.uint64(7)).astype(np.uint8))
            ok &= (b & 1).astype(bool)
        hit[sel] = ok
    return hit


def corpus_band_table(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                      id_col: str = "doc_id", text_col: str = "text"):
    """(band_key, id) rows for a corpus — the persistable signature
    store an incremental run probes instead of re-hashing corpus text
    (write_parquet it once, read_parquet it every increment)."""
    from .lsh import explode_bands
    from .signatures import signatures
    sig = signatures(docs, cfg, id_col=id_col, text_col=text_col,
                     keep_shingles=False, keep_minhash=False,
                     with_simhash=False)
    return explode_bands(sig, cfg, id_col=id_col)


def incremental_near_dup_matches(new_ds, corpus_ds,
                                 cfg: PipelineConfig = DEFAULT_CONFIG, *,
                                 corpus_bands=None, corpus_band_bloom=None,
                                 threshold: float | None = ...,
                                 id_col: str = "doc_id",
                                 text_col: str = "text", counters=None):
    """→ Dataset(a=increment doc, b=corpus doc, intersection, union,
    jaccard): every verified near-duplicate link (exact Jaccard ≥
    threshold) between the increment and the existing corpus.

    Corpus cost per run: one banding pass (or zero with a prebuilt
    ``corpus_bands`` store) + shingle-set recompute for ONLY the corpus
    docs that share a bucket with an increment doc."""
    from ..pipelines.neardup import verify_candidates
    from .lsh import incremental_candidate_pairs

    cands = incremental_candidate_pairs(
        new_ds, corpus_ds, cfg, corpus_bands=corpus_bands,
        corpus_band_bloom=corpus_band_bloom, id_col=id_col,
        text_col=text_col, counters=counters).materialize()

    def _cross_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["cross"], 1)).drop_columns(["cross"])

    cross = cands.map_batches(_cross_only, batch_format="pyarrow")
    union_docs = new_ds.select_columns([id_col, text_col]).union(
        corpus_ds.select_columns([id_col, text_col]))
    return verify_candidates(union_docs, cross, cfg, threshold=threshold,
                             id_col=id_col, text_col=text_col,
                             counters=counters)


def incremental_near_dup(new_ds, corpus_ds,
                         cfg: PipelineConfig = DEFAULT_CONFIG, *,
                         corpus_bands=None, corpus_band_bloom=None,
                         threshold: float | None = ...,
                         id_col: str = "doc_id", text_col: str = "text",
                         counters=None, with_matches: bool = False):
    """Near-dup dedup of an increment against an existing corpus: an
    increment doc survives iff (a) it is not a verified near-duplicate
    of ANY corpus doc (the corpus always wins), and (b) among the
    corpus-survivors, it is the min-id member of its within-increment
    near-dup component.  Returns the surviving increment rows.

    NOTE this is the standard production-incremental semantics, not a
    re-run of batch dedup over the union: near-similarity is not
    transitive, so an increment doc that chains to the corpus only
    THROUGH a dropped sibling is kept here (batch ``near_dup_dedup``
    over the union may drop it).  Physical plan: one band exchange
    where corpus-only buckets die before pair emission
    (stages/lsh.incremental_candidate_pairs), two increment-scale
    verify exchanges, CC over the internal pairs, anti-joins for the
    final cut — the corpus never moves as text except for the bucket
    neighbours of increment docs.

    ``with_matches=True``: also return the verified increment↔corpus
    match table (the same rows ``incremental_near_dup_matches`` yields)
    as ``(kept, matches)`` — one band exchange serves both outputs
    instead of each caller paying it separately."""
    import pyarrow.compute as pc

    from ..pipelines.neardup import verify_candidates
    from .cc import connected_components
    from .join import partitioned_join
    from .lsh import incremental_candidate_pairs

    cands = incremental_candidate_pairs(
        new_ds, corpus_ds, cfg, corpus_bands=corpus_bands,
        corpus_band_bloom=corpus_band_bloom, id_col=id_col,
        text_col=text_col, counters=counters).materialize()

    def _split(flag):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["cross"], flag)) \
                    .drop_columns(["cross"])
        return _f

    cross = cands.map_batches(_split(1), batch_format="pyarrow")
    internal = cands.map_batches(_split(0), batch_format="pyarrow")

    union_docs = new_ds.select_columns([id_col, text_col]).union(
        corpus_ds.select_columns([id_col, text_col]))
    matches = verify_candidates(union_docs, cross, cfg, threshold=threshold,
                                id_col=id_col, text_col=text_col,
                                counters=counters)
    # cross pairs are oriented a=increment: column "a" IS the matched set
    matched = matches.select_columns(["a"]).materialize()

    internal_v = verify_candidates(new_ds, internal, cfg,
                                   threshold=threshold, id_col=id_col,
                                   text_col=text_col) \
        .select_columns(["a", "b"]).materialize()
    # cluster among corpus-survivors only: drop internal pairs touching
    # a matched doc (matched is increment-scale; pair tables are small)
    if matched.count() and internal_v.count():
        internal_v = partitioned_join(internal_v, matched, "a", cfg,
                                      how="anti")
        internal_v = partitioned_join(internal_v, matched, "b", cfg,
                                      how="anti", right_on="a") \
            .materialize()

    def _as_drop(col):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({"_drop": t[col].cast(pa.int64())})
        return _f

    drop_sets = []
    if matched.count():
        drop_sets.append(matched.map_batches(_as_drop("a"),
                                             batch_format="pyarrow"))
    if internal_v.count():
        comp = connected_components(internal_v, cfg)

        def _nonmin(t: pa.Table) -> pa.Table:
            return pa.table({"_drop": t.filter(
                pc.not_equal(t["node"], t["component"]))["node"]
                .cast(pa.int64())})

        drop_sets.append(comp.map_batches(_nonmin, batch_format="pyarrow"))
    if not drop_sets:
        return (new_ds, matches) if with_matches else new_ds
    drops = drop_sets[0] if len(drop_sets) == 1 \
        else drop_sets[0].union(*drop_sets[1:])
    kept = partitioned_join(new_ds, drops.materialize(), id_col, cfg,
                            how="anti", right_on="_drop")
    return (kept, matches) if with_matches else kept
