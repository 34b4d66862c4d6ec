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

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.shuffle import hash_partition_map
from .dedup import with_text_hash

_HASH_COLS = ["text_hash", "text_hash2"]


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

    def _uniq_hashes(t: pa.Table) -> pa.Table:
        h1 = np.asarray(t["text_hash"], dtype=np.int64)
        h2 = np.asarray(t["text_hash2"], dtype=np.int64)
        order = np.lexsort((h2, h1))
        keep = np.ones(len(order), dtype=bool)
        h1o, h2o = h1[order], h2[order]
        keep[1:] = (h1o[1:] != h1o[:-1]) | (h2o[1:] != h2o[:-1])
        idx = pa.array(order[keep], pa.int64())
        return t.select(_HASH_COLS).take(idx)

    # per-batch unique BEFORE the exchange: a duplicate-heavy corpus
    # ships one hash pair per distinct text per batch, not per row
    if corpus_hashes is None:
        corpus_hashes = with_text_hash(
            corpus_ds.select_columns([text_col]), text_col)
    corpus_hashes = corpus_hashes.map_batches(
        _uniq_hashes, batch_format="pyarrow", zero_copy_batch=True)
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
            pos = np.searchsorted(c1, h1, side="left")
            # probe the (h1 run) for an exact (h1,h2) hit
            end = np.searchsorted(c1, h1, side="right")
            for_probe = np.flatnonzero(end > pos)
            hit = np.zeros(len(h1), dtype=bool)
            if len(for_probe):
                lo = pos[for_probe]
                hi = end[for_probe]
                # vectorized per-row binary search bounded to [lo, hi)
                found = np.zeros(len(for_probe), dtype=bool)
                # runs are tiny (hash collisions on 64 bits): linear scan
                # over the run via a flattened gather stays vectorized in
                # the common len==1 case and exact always
                width = hi - lo
                maxw = int(width.max())
                for w in range(maxw):
                    active = width > w
                    idx = lo[active] + w
                    found[active] |= c2[idx] == h2[for_probe[active]]
                hit[for_probe] = found
            keep &= ~hit
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


# --------------------------------------------------------- near-dup variant

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
                                 corpus_bands=None,
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
        new_ds, corpus_ds, cfg, corpus_bands=corpus_bands, id_col=id_col,
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
                         corpus_bands=None, threshold: float | None = ...,
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
        new_ds, corpus_ds, cfg, corpus_bands=corpus_bands, id_col=id_col,
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
