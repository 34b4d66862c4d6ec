"""The flagship pipeline: MinHash-LSH near-duplicate detection + clustering.

    docs ──map_batches(SignatureStage, slim)──► band keys        (~300 B/doc)
         ──explode bands──► (band_key, doc_id)
         ──partition shuffles──► candidate pairs (a<b)
         ──semi-filter docs by candidate endpoints──► recompute
           shingle sets for JUST those docs──► verify (exact Jaccard)
         ──hash-min CC──► (doc_id, component)

Bandwidth design: the banding pass materializes only band keys (the
full signature table with shingle blobs is ~15x larger); shingle sets
are recomputed for the candidate-endpoint subset only — recomputing a
few percent of the corpus is far cheaper than materializing and
re-shuffling everyone's sets.  When the candidate set is too large to
collect its endpoint ids (> SEMI_FILTER_MAX_PAIRS), the pipeline falls
back to the full-signature path automatically.

Every wide step's shuffle key is explicit (stages/lsh.py, stages/cc.py,
stages/verify.py); stage outputs can be checkpointed to Parquet
(pipelines/checkpoint.py) so a resumed run skips completed stages.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.cc import connected_components
from ..stages.lsh import candidate_pairs, explode_bands
from ..stages.signatures import signatures
from ..stages.verify import SEMI_FILTER_MAX_PAIRS, verify_pairs


def near_dup_pairs(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   threshold: float | None = ..., sig_ds=None,
                   strategy: str = "slim", counters=None,
                   debug_dir: str | None = None):
    """→ Dataset(a, b, intersection, union, jaccard) of verified
    near-duplicate pairs with jaccard ≥ threshold (default
    cfg.verify_threshold).

    ``strategy``: "slim" (default) never materializes a signature table
    at all — fused stream-OPH banding runs inside the candidate
    exchange's split tasks, then shingle sets are recomputed for just
    the candidate-endpoint docs inside the verify exchange
    (candidate_pairs_from_docs; measured 3x the throughput of the
    materializing path AND strictly less object-store traffic).  "full"
    materializes the complete signature table (shingle blobs included)
    once and verifies against it — right when nearly every doc is a
    candidate endpoint, or when the caller reuses the signature table.

    ``debug_dir`` (slim path only): dump the fused intermediates (band
    rows, bucket candidate pairs) as parquet under this directory — the
    DEBUG_2 analogue for the path whose intermediates otherwise never
    exist in storage.
    """
    if sig_ds is not None:
        # caller-provided full signatures (must carry shingles)
        bands = explode_bands(sig_ds, cfg, id_col=id_col)
        cands = candidate_pairs(bands, cfg, id_col=id_col, counters=counters)
        return verify_pairs(cands, sig_ds, cfg, threshold=threshold,
                            id_col=id_col)

    if strategy == "full":
        full = signatures(docs, cfg, id_col=id_col, text_col=text_col,
                          with_simhash=False).materialize()
        bands = explode_bands(full, cfg, id_col=id_col)
        cands = candidate_pairs(bands, cfg, id_col=id_col, counters=counters)
        return verify_pairs(cands, full, cfg, threshold=threshold,
                            id_col=id_col)

    # FUSED STREAMING: the whole map side (stream-OPH signatures → band
    # explosion → partition tag) runs inside the candidate exchange's
    # split tasks (candidate_pairs_from_docs) — no signature table and no
    # exploded band-row dataset ever hit the object store.
    from ..stages.lsh import candidate_pairs_from_docs
    cands = candidate_pairs_from_docs(
        docs, cfg, id_col=id_col, text_col=text_col, counters=counters,
        debug_dir=debug_dir)
    return verify_candidates(docs, cands, cfg, threshold=threshold,
                             id_col=id_col, text_col=text_col,
                             counters=counters)


def verify_candidates(docs, cands, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                      threshold: float | None = ..., id_col: str = "doc_id",
                      text_col: str = "text", counters=None):
    """Exact-Jaccard verification of an arbitrary candidate-pair Dataset
    (columns ``a``, ``b``) against the docs that own both endpoints:
    shingle sets are recomputed for JUST the candidate-endpoint docs,
    then scored through the broadcast or two-pass co-partitioned
    exchange — the tail of the slim flagship path, reusable by any
    candidate generator (incremental probes, custom blockers).

    ``docs`` must contain every id that appears in ``cands`` (extra docs
    are streamed past the semi-filter and cost only the scan)."""
    import time as _time

    import numpy as np
    import pyarrow as pa
    import ray

    def _mark(name, t0):
        if counters is not None:
            counters.add.remote(
                {f"wall_ms_{name}": int((_time.perf_counter() - t0) * 1000)})
        return _time.perf_counter()

    t0 = _time.perf_counter()
    # ONE pass over the candidate blocks: the refs are already
    # materialized tables (raw-task exchange output).  Row counts come
    # from worker-side len() tasks first, so the driver only collects
    # the (two int64 column) pair blocks when they are under the cap —
    # bounded driver state.
    cand_refs = cands.to_arrow_refs()

    @ray.remote
    def _nrows(t):
        return len(t)

    n_cands = sum(ray.get([_nrows.remote(r) for r in cand_refs]))
    t0 = _mark("candidates", t0)
    if counters is not None:
        counters.add.remote({"candidate_pairs": n_cands})

    if n_cands > SEMI_FILTER_MAX_PAIRS:
        # endpoint ids too many to collect: recompute shingle SETS for
        # the whole corpus (verification needs only the sets — skip
        # minhash/bands/simhash on this pass)
        full = signatures(docs, cfg, id_col=id_col, text_col=text_col,
                          with_simhash=False, keep_minhash=False,
                          keep_bands=False).materialize()
        return verify_pairs(cands, full, cfg, threshold=threshold,
                            id_col=id_col, assume_small=False)

    if n_cands == 0:
        from ..stages.verify import _empty_joined, score_pairs
        return score_pairs(_empty_joined(), cfg, threshold=threshold)
    tab = pa.concat_tables([t for t in ray.get(list(cand_refs)) if len(t)])
    need = np.unique(np.concatenate([
        np.asarray(tab["a"], dtype=np.int64),
        np.asarray(tab["b"], dtype=np.int64)]))

    from ..stages.verify import (
        VERIFY_BROADCAST_MAX_PAIRS, attach_and_score, verify_pairs_broadcast)
    thr = cfg.verify_threshold if threshold is ... else threshold

    def _semi(t, nd=need):
        ids = np.asarray(t[id_col], dtype=np.int64)
        pos = np.searchsorted(nd, ids)
        pos = np.clip(pos, 0, max(len(nd) - 1, 0))
        return t.filter(pa.array(nd[pos] == ids))

    if n_cands <= VERIFY_BROADCAST_MAX_PAIRS:
        docs_sub = docs.map_batches(_semi, batch_format="pyarrow")
        sig_sub = signatures(docs_sub, cfg, id_col=id_col, text_col=text_col,
                             keep_minhash=False, with_simhash=False,
                             keep_bands=False)
        return verify_pairs_broadcast(cands, sig_sub, cfg, threshold=thr,
                                      id_col=id_col)

    # big-candidate path: fuse semi-filter + shingle-set recompute +
    # partition tag into the signature exchange's split tasks, then the
    # two-pass co-partitioned verification
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map
    from ..stages.signatures import SignatureStage
    from ..stages.verify import _sort_sig_block

    n_parts = cfg.resolved_partitions()
    stage_cache: dict = {}

    def _sets_map(t: pa.Table, nd=need) -> pa.Table:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "blob": pa.array([], pa.large_binary()),
                          "part": pa.array([], pa.int64())})
        if len(t) == 0 or id_col not in t.column_names:
            return empty
        t = _semi(t, nd)
        if len(t) == 0:
            return empty
        stage = stage_cache.get("s")
        if stage is None:
            stage = SignatureStage(cfg, id_col=id_col, text_col=text_col,
                                   keep_minhash=False, with_simhash=False,
                                   keep_bands=False)
            stage_cache["s"] = stage
        sig = stage(t)
        ids = np.asarray(sig[id_col], dtype=np.int64)
        part = (splitmix64(ids.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "blob": sig["shingles"].cast(pa.large_binary()),
                         "part": pa.array(part, pa.int64())})

    sig_blocks = hash_partition_map(
        docs.select_columns([id_col, text_col]), "part", _sort_sig_block,
        n_parts, map_fn=_sets_map,
        map_chunk_rows=cfg.batch_size).to_arrow_refs()
    t0 = _mark("endpoint_sets", t0)
    out = attach_and_score(cands, None, cfg, thr, id_col=id_col,
                           sig_blocks=sig_blocks)
    _mark("verify", t0)
    return out


NEAR_DEDUP_BROADCAST_MAX_DROPS = 5_000_000


def near_dup_dedup(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   threshold: float | None = ..., counters=None):
    """End-to-end corpus dedup: keep exactly one doc (the min doc_id)
    per near-duplicate cluster, pass every other doc through — the
    operation a training-data pipeline actually runs.  Returns the
    deduplicated Dataset with the original columns.

    Physical plan: cluster labels → the DROP set is every node whose
    label isn't itself (bounded by the dup count).  Small drop sets are
    broadcast as a sorted int64 array (one ray.put, searchsorted filter
    per batch); larger ones anti-join by hash(doc_id) through the raw
    exchange (the 10^12-doc path — a drop set of 40% of a crawl cannot
    be broadcast)."""
    import numpy as np
    import pyarrow as pa
    import ray

    labels = near_dup_clusters(docs, cfg, id_col=id_col, text_col=text_col,
                               threshold=threshold,
                               counters=counters).materialize()
    ltabs = [t for t in ray.get(list(labels.to_arrow_refs())) if len(t)]
    n_drop = sum(
        int((np.asarray(t["node"]) != np.asarray(t["component"])).sum())
        for t in ltabs)
    if counters is not None:
        counters.add.remote({"near_dedup_dropped": n_drop})
    if n_drop == 0:
        return docs

    if n_drop <= NEAR_DEDUP_BROADCAST_MAX_DROPS:
        drops = np.sort(np.concatenate([
            np.asarray(t["node"], dtype=np.int64)[
                np.asarray(t["node"]) != np.asarray(t["component"])]
            for t in ltabs]))
        return _broadcast_drop_filter(docs, drops, id_col)

    def _to_drops(t):
        node = np.asarray(t["node"], dtype=np.int64)
        comp = np.asarray(t["component"], dtype=np.int64)
        return pa.table({"drop_id": pa.array(node[node != comp], pa.int64())})

    drops_ds = labels.map_batches(_to_drops, batch_format="pyarrow")
    return _partitioned_anti_join(docs, drops_ds, cfg, id_col)


def _broadcast_drop_filter(docs, drops_sorted, id_col: str):
    """Filter out a SORTED int64 id array from docs: one ray.put, a
    searchsorted probe per batch."""
    import numpy as np
    import pyarrow as pa
    import ray

    drop_ref = ray.put(drops_sorted)

    def _keep(t: pa.Table) -> pa.Table:
        dr = ray.get(drop_ref)
        ids = np.asarray(t[id_col], dtype=np.int64)
        pos = np.clip(np.searchsorted(dr, ids), 0, len(dr) - 1)
        return t.filter(pa.array(dr[pos] != ids))

    return docs.map_batches(_keep, batch_format="pyarrow",
                            zero_copy_batch=True)


def _partitioned_anti_join(docs, drops_ds, cfg: PipelineConfig, id_col: str):
    """Anti-join docs against a Dataset with one int64 ``drop_id``
    column, co-partitioned by hash(id) — the 10^12-doc path (a drop set
    of 40% of a crawl cannot be broadcast)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()
    doc_schema = docs.schema()
    doc_cols = list(doc_schema.names)
    doc_types = dict(zip(doc_schema.names, doc_schema.types))

    def _hashp(x):
        return (np.asarray(splitmix64(x.view(np.uint64)))
                % np.uint64(n_parts)).astype(np.int64)

    def _tag_docs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        cols = {c: t[c] for c in doc_cols}
        cols["part"] = pa.array(_hashp(ids), pa.int64())
        cols["_isdrop"] = pa.array(np.zeros(len(t), np.int8), pa.int8())
        return pa.table(cols)

    def _tag_drops(t: pa.Table) -> pa.Table:
        node = np.asarray(t["drop_id"], dtype=np.int64)
        cols = {}
        for c in doc_cols:
            cols[c] = (pa.array(node, doc_types[c]) if c == id_col
                       else pa.nulls(len(node), doc_types[c]))
        cols["part"] = pa.array(_hashp(node), pa.int64())
        cols["_isdrop"] = pa.array(np.ones(len(node), np.int8), pa.int8())
        return pa.table(cols)

    def _anti(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            return pa.table({c: pa.array([], doc_types[c])
                             for c in doc_cols})
        isdrop = np.asarray(group["_isdrop"], dtype=np.int8) == 1
        drows = np.sort(np.asarray(
            group.filter(pa.array(isdrop))[id_col], dtype=np.int64))
        keep_tab = group.filter(pa.array(~isdrop))
        ids = np.asarray(keep_tab[id_col], dtype=np.int64)
        if len(drows):
            pos = np.clip(np.searchsorted(drows, ids), 0, len(drows) - 1)
            keep_tab = keep_tab.filter(pa.array(drows[pos] != ids))
        return keep_tab.select(doc_cols)

    tagged = docs.map_batches(_tag_docs, batch_format="pyarrow").union(
        drops_ds.map_batches(_tag_drops, batch_format="pyarrow"))
    return hash_partition_map(tagged, "part", _anti, n_parts)


def near_dup_canonical(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                       id_col: str = "doc_id", text_col: str = "text",
                       quality_col: str = "n_chars",
                       threshold: float | None = ..., counters=None):
    """Quality-aware cluster collapse: keep, per near-dup cluster, the
    member with the HIGHEST ``quality_col`` (tie → min id) instead of
    blindly keeping the min id — the selection a production pipeline
    runs so the canonical copy is the longest / highest-scoring variant,
    not whichever crawled first.  Docs outside any cluster pass through.

    Physical plan: cluster labels (bounded by the dup count, same
    contract as near_dup_dedup) → member quality via a broadcast
    semi-filter of the corpus → per-component argmax → drop set → the
    shared broadcast-filter / partitioned-anti-join gate.  Above the
    broadcast gate everything stays an exchange: (doc_id, quality) rows
    co-partitioned with labels by hash(id), argmax co-partitioned by
    hash(component), drops anti-joined by hash(id).
    """
    import numpy as np
    import pyarrow as pa
    import ray

    labels = near_dup_clusters(docs, cfg, id_col=id_col, text_col=text_col,
                               threshold=threshold,
                               counters=counters).materialize()
    ltabs = [t for t in ray.get(list(labels.to_arrow_refs())) if len(t)]
    if not ltabs:
        return docs
    node = np.concatenate([np.asarray(t["node"], dtype=np.int64)
                           for t in ltabs])
    comp = np.concatenate([np.asarray(t["component"], dtype=np.int64)
                           for t in ltabs])
    if counters is not None:
        counters.add.remote({"canonical_members": len(node)})

    if len(node) <= NEAR_DEDUP_BROADCAST_MAX_DROPS:
        order = np.argsort(node)
        node_s, comp_s = node[order], comp[order]
        ids_ref = ray.put(node_s)

        def _stats(t: pa.Table) -> pa.Table:
            nd = ray.get(ids_ref)
            ids = np.asarray(t[id_col], dtype=np.int64)
            pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            m = pa.array(nd[pos] == ids)
            return pa.table({
                id_col: t[id_col].filter(m).cast(pa.int64()),
                "q": t[quality_col].filter(m).cast(pa.int64()),
            })

        stabs = [t for t in ray.get(list(
            docs.map_batches(_stats, batch_format="pyarrow",
                             zero_copy_batch=True).to_arrow_refs())) if len(t)]
        sid = np.concatenate([np.asarray(t[id_col], np.int64) for t in stabs])
        sq = np.concatenate([np.asarray(t["q"], np.int64) for t in stabs])
        so = np.argsort(sid)
        sid, sq = sid[so], sq[so]
        q = sq[np.searchsorted(sid, node_s)]
        o2 = np.lexsort((node_s, -q, comp_s))
        comp_o = comp_s[o2]
        first = np.empty(len(comp_o), dtype=bool)
        first[0] = True
        first[1:] = comp_o[1:] != comp_o[:-1]
        drops = np.sort(node_s[o2][~first])
        if counters is not None:
            counters.add.remote({"canonical_dropped": len(drops)})
        return _broadcast_drop_filter(docs, drops, id_col)

    # over the gate: two member-sized exchanges, then partitioned anti
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()

    def _hashp(x):
        return (np.asarray(splitmix64(x.view(np.uint64)))
                % np.uint64(n_parts)).astype(np.int64)

    def _tag_stat(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        return pa.table({
            "i": pa.array(ids, pa.int64()),
            "q": t[quality_col].cast(pa.int64()),
            "c": pa.nulls(len(t), pa.int64()),
            "part": pa.array(_hashp(ids), pa.int64()),
        })

    def _tag_label(t: pa.Table) -> pa.Table:
        n = np.asarray(t["node"], dtype=np.int64)
        return pa.table({
            "i": pa.array(n, pa.int64()),
            "q": pa.nulls(len(n), pa.int64()),
            "c": t["component"].cast(pa.int64()),
            "part": pa.array(_hashp(n), pa.int64()),
        })

    def _merge(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        isl = np.asarray(tab["c"].combine_chunks().is_valid())
        st = tab.filter(pa.array(~isl))
        sid = np.asarray(st["i"], dtype=np.int64)
        sq = np.asarray(st["q"], dtype=np.int64)
        so = np.argsort(sid)
        sid, sq = sid[so], sq[so]
        lt = tab.filter(pa.array(isl))
        n = np.asarray(lt["i"], dtype=np.int64)
        c = np.asarray(lt["c"], dtype=np.int64)
        q = sq[np.searchsorted(sid, n)]
        return pa.table({"i": pa.array(n, pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64()),
                         "part": pa.array(_hashp(c), pa.int64())})

    docs_stats = docs.map_batches(_tag_stat, batch_format="pyarrow")
    tagged = docs_stats.union(
        labels.map_batches(_tag_label, batch_format="pyarrow"))
    members = hash_partition_map(tagged, "part", _merge, n_parts)

    def _argmax_drops(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return pa.table({"drop_id": pa.array([], pa.int64())})
        n = np.asarray(tab["i"], dtype=np.int64)
        q = np.asarray(tab["q"], dtype=np.int64)
        c = np.asarray(tab["c"], dtype=np.int64)
        o = np.lexsort((n, -q, c))
        c_o = c[o]
        first = np.empty(len(c_o), dtype=bool)
        first[0] = True
        first[1:] = c_o[1:] != c_o[:-1]
        return pa.table({"drop_id": pa.array(n[o][~first], pa.int64())})

    drops_ds = hash_partition_map(members, "part", _argmax_drops, n_parts)
    return _partitioned_anti_join(docs, drops_ds, cfg, id_col)


def near_dup_clusters(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      threshold: float | None = ..., checkpoint_fn=None,
                      counters=None):
    """→ Dataset(node, component): connected components of the verified
    near-dup graph; component = min doc_id of each cluster.  Docs that
    belong to no cluster are absent (their implicit component is
    themselves)."""
    pairs = near_dup_pairs(docs, cfg, id_col=id_col, text_col=text_col,
                           threshold=threshold, counters=counters)
    # materialize: the verified dup-pair set is tiny relative to the
    # corpus, and CC references it twice (fwd+rev symmetrize)
    pairs = pairs.select_columns(["a", "b"]).materialize()
    if counters is not None:
        counters.add.remote({"verified_pairs": pairs.count()})
    if pairs.count() == 0:
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64()),
        }))
    return connected_components(pairs, cfg, checkpoint_fn=checkpoint_fn,
                                counters=counters)


def dedup_weights(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  threshold: float | None = ..., counters=None):
    """SoftDeDup-style training weights: → Dataset(doc_id, cluster_size,
    weight) where weight = 1 / near-dup-cluster size (docs in no cluster
    weigh 1.0) — the soft alternative to dropping duplicates outright
    (keep every copy, downweight its gradient share so a template
    crawled a million times contributes one document's worth of signal).

    Physical plan: cluster labels (bounded by the dup count, same
    contract as near_dup_dedup) → component sizes.  Under the broadcast
    gate the (node→size) map ships once via ray.put and the corpus
    streams through one lookup map — zero shuffle.  Above it, two
    doc-cardinality exchanges: labels keyed hash(component) → (node,
    size) rows keyed hash(node), met by the corpus's id rows (same
    union-schema exchange shape as near_dup_canonical's big path).

    weight is an IEEE division of exact integers (1.0 / size), mirrored
    by the SQL oracle."""
    import numpy as np
    import pyarrow as pa
    import ray

    labels = near_dup_clusters(docs, cfg, id_col=id_col, text_col=text_col,
                               threshold=threshold,
                               counters=counters).materialize()
    ltabs = [t for t in ray.get(list(labels.to_arrow_refs())) if len(t)]
    if ltabs:
        node = np.concatenate([np.asarray(t["node"], dtype=np.int64)
                               for t in ltabs])
        comp = np.concatenate([np.asarray(t["component"], dtype=np.int64)
                               for t in ltabs])
    else:
        node = np.empty(0, np.int64)
        comp = np.empty(0, np.int64)

    def _emit(ids: np.ndarray, sz: np.ndarray) -> pa.Table:
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster_size": pa.array(sz, pa.int64()),
            "weight": pa.array(1.0 / sz, pa.float64()),
        })

    if len(node) <= NEAR_DEDUP_BROADCAST_MAX_DROPS:
        order = np.argsort(node)
        node_s = node[order]
        comp_u, inv = np.unique(comp[order], return_inverse=True)
        size_s = np.bincount(inv, minlength=len(comp_u))[inv] \
            .astype(np.int64) if len(node) else np.empty(0, np.int64)
        ref = ray.put((node_s, size_s))

        from ..functions.broadcast import bcast_get

        def _weigh(t: pa.Table) -> pa.Table:
            nd, sz = bcast_get(ref)
            ids = np.asarray(t[id_col], dtype=np.int64)
            out = np.ones(len(ids), dtype=np.int64)
            if len(nd):
                pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
                hit = nd[pos] == ids
                out[hit] = sz[pos[hit]]
            return _emit(ids, out)

        return docs.map_batches(_weigh, batch_format="pyarrow",
                                zero_copy_batch=True)

    # over the gate: size the components with one exchange keyed
    # hash(component), then meet the corpus id stream keyed hash(id)
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()

    def _hashp(x: np.ndarray) -> np.ndarray:
        return (np.asarray(splitmix64(
            np.ascontiguousarray(x).view(np.uint64).copy()))
            % np.uint64(n_parts)).astype(np.int64)

    def _tag_label(t: pa.Table) -> pa.Table:
        c = np.asarray(t["component"], dtype=np.int64)
        return pa.table({
            "i": t["node"].cast(pa.int64()),
            "c": pa.array(c, pa.int64()),
            "part": pa.array(_hashp(c), pa.int64()),
        })

    def _size_members(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        n = np.asarray(tab["i"].combine_chunks(), dtype=np.int64)
        c = np.asarray(tab["c"].combine_chunks(), dtype=np.int64)
        cu, inv = np.unique(c, return_inverse=True)
        sz = np.bincount(inv, minlength=len(cu))[inv].astype(np.int64)
        return pa.table({"i": pa.array(n, pa.int64()),
                         "s": pa.array(sz, pa.int64()),
                         "part": pa.array(_hashp(n), pa.int64())})

    sized = hash_partition_map(
        labels.map_batches(_tag_label, batch_format="pyarrow"),
        "part", _size_members, n_parts)

    def _tag_doc(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        return pa.table({
            "i": pa.array(ids, pa.int64()),
            "s": pa.nulls(len(ids), pa.int64()),
            "part": pa.array(_hashp(ids), pa.int64()),
        })

    def _finish(tab: pa.Table | None) -> pa.Table:
        import pyarrow.compute as pc
        if tab is None or len(tab) == 0:
            return _emit(np.empty(0, np.int64), np.empty(0, np.int64))
        s_col = tab["s"].combine_chunks()
        s_valid = np.asarray(s_col.is_valid())
        i = np.asarray(tab["i"].combine_chunks(), dtype=np.int64)
        docs_i = np.sort(i[~s_valid])             # one row per doc
        sz = np.ones(len(docs_i), dtype=np.int64)
        mi = i[s_valid]
        if len(mi):
            ms = np.asarray(pc.fill_null(s_col, 0), dtype=np.int64)[s_valid]
            sz[np.searchsorted(docs_i, mi)] = ms
        return _emit(docs_i, sz)

    tagged = docs.select_columns([id_col]) \
        .map_batches(_tag_doc, batch_format="pyarrow").union(sized)
    return hash_partition_map(tagged, "part", _finish, n_parts)


def cross_source_overlap(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                         id_col: str = "doc_id", text_col: str = "text",
                         source_col: str = "source",
                         threshold: float | None = ..., counters=None):
    """→ Dataset(source_a, source_b, n_pairs): verified near-dup pairs
    bucketed by the (unordered) source pair of their endpoints — the
    cross-crawl contamination matrix (how much of source X is source Y
    re-serving) that decides dedup ORDER across dumps.

    Physical plan: near_dup_pairs → endpoint ids collected (bounded by
    the verified-pair count, the same contract as source_dup_rates) →
    one streaming semi-filter pulls JUST the endpoints' (id, source)
    rows → broadcast lookup over the pair stream → tiny groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    pairs = near_dup_pairs(docs.select_columns([id_col, text_col]), cfg,
                           id_col=id_col, text_col=text_col,
                           threshold=threshold, counters=counters) \
        .select_columns(["a", "b"]).materialize()
    ptabs = [t for t in ray.get(list(pairs.to_arrow_refs())) if len(t)]
    if not ptabs:
        import ray.data as rd
        # Dataset, not a bare Table — the return type must not depend
        # on whether the corpus happened to contain dup pairs
        return rd.from_arrow(pa.table({
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64())}))
    cat = pa.concat_tables(ptabs)
    ids_sorted = np.unique(np.concatenate(
        [np.asarray(cat["a"], dtype=np.int64),
         np.asarray(cat["b"], dtype=np.int64)]))
    ids_ref = ray.put(ids_sorted)

    from ..functions.broadcast import bcast_get

    def _semi(t: pa.Table) -> pa.Table:
        nd = bcast_get(ids_ref)
        ids = np.asarray(t[id_col], dtype=np.int64)
        pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
        m = pa.array(nd[pos] == ids)
        return pa.table({id_col: t[id_col].filter(m).cast(pa.int64()),
                         source_col: t[source_col].filter(m)})

    stabs = [t for t in ray.get(list(
        docs.select_columns([id_col, source_col])
            .map_batches(_semi, batch_format="pyarrow",
                         zero_copy_batch=True).to_arrow_refs())) if len(t)]
    stab = pa.concat_tables(stabs)
    sid = np.asarray(stab[id_col], dtype=np.int64)
    so = np.argsort(sid)
    src_sorted = stab[source_col].combine_chunks().take(pa.array(so))
    sid = sid[so]
    src_ref = ray.put((sid, src_sorted))

    def _label(t: pa.Table) -> pa.Table:
        nd, src = bcast_get(src_ref)
        a = np.asarray(t["a"], dtype=np.int64)
        b = np.asarray(t["b"], dtype=np.int64)
        sa = src.take(pa.array(np.searchsorted(nd, a)))
        sb = src.take(pa.array(np.searchsorted(nd, b)))
        lo = pc.less_equal(sa, sb)
        return pa.table({
            "source_a": pc.if_else(lo, sa, sb),
            "source_b": pc.if_else(lo, sb, sa),
            "one": pa.array(np.ones(len(a), np.int64)),
        })

    agg = pairs.map_batches(_label, batch_format="pyarrow") \
        .groupby(["source_a", "source_b"]) \
        .aggregate(Sum("one", alias_name="n_pairs"))
    return agg.map_batches(
        lambda t: pa.table({"source_a": t["source_a"],
                            "source_b": t["source_b"],
                            "n_pairs": t["n_pairs"].cast(pa.int64())}),
        batch_format="pyarrow")


def cluster_profile(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                    id_col: str = "doc_id", text_col: str = "text",
                    source_col: str = "source",
                    length_col: str = "n_chars",
                    threshold: float | None = ..., counters=None):
    """Per-near-dup-cluster audit table → Dataset(component, size,
    n_sources, max_chars, sum_chars, keep_id) — the review-your-dedup
    surface: a cluster spanning many sources is syndication (keep per
    policy), one spanning one source is a crawler artifact (drop all
    but one), and max/sum chars show what the min-id survivor rule is
    about to discard.  ``keep_id`` currently ALIASES ``component``
    (CC labels components by min member id, which is also the default
    survivor); it is kept as an explicit column so the survivor policy
    is named in the schema even if the labeling convention changes.
    NULL sources count toward size/sums but not n_sources (SQL
    count(DISTINCT) semantics); distinct sources are counted by
    source-hash distinctness (the repo's hash-equality convention).

    Physical plan: below ``NEAR_DEDUP_BROADCAST_MAX_DROPS`` labels,
    the id→component map broadcasts and ONE streaming semi-map emits
    member rows only (sources hashed AFTER the member filter); above
    the gate — the 30%-dup regime where members are a large corpus
    fraction anyway — labels and (id, source, length) rows co-partition
    by hash(id) in a union-schema exchange, join partition-locally,
    and re-route by hash(component).  Either way each cluster
    aggregates whole on its hash(component) partition.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..functions.broadcast import bcast_get
    from ..functions.hashing import hash_utf8_array
    from ..functions.shuffle import hash_partition_map, part_of

    n_parts = cfg.resolved_partitions()
    labels = near_dup_clusters(docs.select_columns([id_col, text_col]),
                               cfg, id_col=id_col, text_col=text_col,
                               threshold=threshold,
                               counters=counters).materialize()
    n_labels = labels.count()
    empty_out = pa.table({
        "component": pa.array([], pa.int64()),
        "size": pa.array([], pa.int64()),
        "n_sources": pa.array([], pa.int64()),
        "max_chars": pa.array([], pa.int64()),
        "sum_chars": pa.array([], pa.int64()),
        "keep_id": pa.array([], pa.int64())})
    if n_labels == 0:
        import ray.data as rd
        return rd.from_arrow(empty_out)

    def _src_cols(t: pa.Table, mask=None):
        """(src_hash, src_valid) for the rows selected by mask (hash
        AFTER the filter — non-members pay nothing)."""
        src = t[source_col].cast(pa.string()).combine_chunks()
        if mask is not None:
            src = src.filter(pa.array(mask))
        valid = src.is_valid().to_numpy(zero_copy_only=False)
        sh = hash_utf8_array(pc.fill_null(src, "")).view(np.int64)
        return sh, valid

    def _agg(group) -> pa.Table:
        if group is None or len(group) == 0:
            return empty_out
        c = np.asarray(group["component"], dtype=np.int64)
        sh = np.asarray(group["src_h"], dtype=np.int64)
        sv = np.asarray(group["src_v"], dtype=np.int64).astype(bool)
        ch = np.asarray(group["chars"], dtype=np.int64)
        nd = np.asarray(group["node"], dtype=np.int64)
        order = np.argsort(c, kind="stable")
        c, sh, sv, ch, nd = (c[order], sh[order], sv[order], ch[order],
                             nd[order])
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c))
        size = ends - starts
        max_chars = np.maximum.reduceat(ch, starts)
        sum_chars = np.add.reduceat(ch, starts)
        keep_id = np.minimum.reduceat(nd, starts)
        # distinct NON-NULL sources per component
        if sv.any():
            pairs = np.unique(np.stack([c[sv], sh[sv]], axis=1), axis=0)
        else:
            pairs = np.empty((0, 2), np.int64)
        nsrc = np.diff(np.append(
            np.searchsorted(pairs[:, 0], c[starts]), len(pairs)))
        return pa.table({
            "component": pa.array(c[starts], pa.int64()),
            "size": pa.array(size.astype(np.int64), pa.int64()),
            "n_sources": pa.array(nsrc.astype(np.int64), pa.int64()),
            "max_chars": pa.array(max_chars, pa.int64()),
            "sum_chars": pa.array(sum_chars, pa.int64()),
            "keep_id": pa.array(keep_id, pa.int64())})

    stream = docs.select_columns([id_col, source_col, length_col])

    if n_labels <= NEAR_DEDUP_BROADCAST_MAX_DROPS:
        ltabs = [t for t in ray.get(list(labels.to_arrow_refs()))
                 if len(t)]
        node = np.concatenate([np.asarray(t["node"], dtype=np.int64)
                               for t in ltabs])
        comp = np.concatenate([np.asarray(t["component"], dtype=np.int64)
                               for t in ltabs])
        order = np.argsort(node)
        map_ref = ray.put((node[order], comp[order]))

        def _rows(t: pa.Table) -> pa.Table:
            nd, cp = bcast_get(map_ref)
            ids = np.asarray(t[id_col], dtype=np.int64)
            pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            hit = nd[pos] == ids
            if not hit.any():
                z = pa.array([], pa.int64())
                return pa.table({"component": z, "src_h": z, "src_v": z,
                                 "chars": z, "node": z, "part": z})
            comp_v = cp[pos[hit]]
            sh, sval = _src_cols(t, hit)
            chars = np.asarray(t[length_col], dtype=np.int64)[hit]
            return pa.table({"component": pa.array(comp_v, pa.int64()),
                             "src_h": pa.array(sh, pa.int64()),
                             "src_v": pa.array(sval.astype(np.int64),
                                               pa.int64()),
                             "chars": pa.array(chars, pa.int64()),
                             "node": pa.array(ids[hit], pa.int64()),
                             "part": pa.array(part_of(comp_v, n_parts),
                                              pa.int64())})

        return hash_partition_map(stream, "part", _agg, n_parts,
                                  map_fn=_rows,
                                  map_chunk_rows=cfg.batch_size)

    # partitioned path: union-schema exchange co-keyed by hash(id)
    # (tag 0 = label row carrying component; tag 1 = doc row carrying
    # source/length), partition-local join, re-route by hash(component)
    def _lab_rows(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"], dtype=np.int64)
        comp = np.asarray(t["component"], dtype=np.int64)
        z = np.zeros(len(node), dtype=np.int64)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "component": pa.array(comp, pa.int64()),
                         "src_h": pa.array(z, pa.int64()),
                         "src_v": pa.array(z, pa.int64()),
                         "chars": pa.array(z, pa.int64()),
                         "tag": pa.array(z, pa.int64()),
                         "part": pa.array(part_of(node, n_parts),
                                          pa.int64())})

    def _doc_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        sh, sval = _src_cols(t)
        chars = np.asarray(t[length_col], dtype=np.int64)
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "component": pa.array(
                             np.zeros(len(ids), np.int64), pa.int64()),
                         "src_h": pa.array(sh, pa.int64()),
                         "src_v": pa.array(sval.astype(np.int64),
                                           pa.int64()),
                         "chars": pa.array(chars, pa.int64()),
                         "tag": pa.array(np.ones(len(ids), np.int64),
                                         pa.int64()),
                         "part": pa.array(part_of(ids, n_parts),
                                          pa.int64())})

    def _join(group) -> pa.Table:
        z = pa.array([], pa.int64())
        empty = pa.table({"component": z, "src_h": z, "src_v": z,
                          "chars": z, "node": z, "part": z})
        if group is None or len(group) == 0:
            return empty
        tag = np.asarray(group["tag"], dtype=np.int64)
        node = np.asarray(group["node"], dtype=np.int64)
        lab = tag == 0
        lnode = node[lab]
        lcomp = np.asarray(group["component"], dtype=np.int64)[lab]
        lorder = np.argsort(lnode)
        lnode, lcomp = lnode[lorder], lcomp[lorder]
        dnode = node[~lab]
        if not len(lnode) or not len(dnode):
            return empty
        pos = np.clip(np.searchsorted(lnode, dnode), 0, len(lnode) - 1)
        hit = lnode[pos] == dnode
        comp_v = lcomp[pos[hit]]
        sh = np.asarray(group["src_h"], dtype=np.int64)[~lab][hit]
        sv = np.asarray(group["src_v"], dtype=np.int64)[~lab][hit]
        ch = np.asarray(group["chars"], dtype=np.int64)[~lab][hit]
        return pa.table({"component": pa.array(comp_v, pa.int64()),
                         "src_h": pa.array(sh, pa.int64()),
                         "src_v": pa.array(sv, pa.int64()),
                         "chars": pa.array(ch, pa.int64()),
                         "node": pa.array(dnode[hit], pa.int64()),
                         "part": pa.array(part_of(comp_v, n_parts),
                                          pa.int64())})

    tagged = labels.map_batches(_lab_rows, batch_format="pyarrow",
                                zero_copy_batch=True).union(
        stream.map_batches(_doc_rows, batch_format="pyarrow",
                           zero_copy_batch=True))
    joined = hash_partition_map(tagged, "part", _join, n_parts)
    return hash_partition_map(joined, "part", _agg, n_parts)
