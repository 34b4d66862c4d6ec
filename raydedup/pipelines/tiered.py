"""Tiered corpus deduplication: exact → MinHash near-dup → substring.

The composed pipeline a webtext training-data run actually executes:
each tier removes what the cheaper previous tier could not, and every
tier runs only over the previous tier's survivors (the reference runs
its stages the same way — CSR build, then ec_scan pair extraction,
then the pair-list Jaccard verify, jaccard.cpp:790-900 — each stage
consuming the previous stage's output).

Tiers:
  1. ``exact``    — byte-identical text (128-bit content hash); keep
                    the min doc_id per group (stages/dedup.exact_dedup
                    physical plan: ONE manual hash exchange).
  2. ``neardup``  — MinHash-LSH + exact-Jaccard-verified clusters over
                    tier-1 survivors; keep the min doc_id per
                    component (pipelines/neardup machinery).
  3. substring    — duplicated ≥min_tokens token windows cut from the
                    kept corpus (stages/substring.substring_dedup);
                    reported as per-doc trim stats, not doc removal.

Scale notes (the 10^12-doc plan):
  * tier 1's tagged corpus is materialized ONCE to the (spillable)
    object store so the downstream consumers (survivor stream, removed
    ids, final filter) don't re-execute the exchange.  At multi-TB
    scale this materialization is exactly the stage checkpoint that
    pipelines/checkpoint.py would write to partitioned parquet instead.
  * removal sets are bounded by the DUP count, not the corpus; the
    disposition table is a UNION of streaming id projections — the
    corpus is never joined against itself.
  * the final corpus filter reuses near_dup_dedup's broadcast /
    partitioned-anti-join gate (NEAR_DEDUP_BROADCAST_MAX_DROPS).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig


class TieredResult(NamedTuple):
    """corpus: surviving docs (original columns); disposition:
    (doc_id, tier) for every input doc, tier ∈ {kept, exact, neardup}."""
    corpus: "ray.data.Dataset"
    disposition: "ray.data.Dataset"


def tiered_dedup(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float | None = ..., counters=None,
                 checkpoint_fn=None,
                 line_min_docs: int | None = None) -> TieredResult:
    """``line_min_docs``: when set, a tier-0 CCNet-style boilerplate
    pass rewrites ``text_col`` in place (lines in ≥ that many distinct
    docs stripped, stages/lines.py) before any dedup tier — so exact
    and near-dup collide on content, not on shared chrome.  No doc is
    dropped by tier 0; the disposition contract is unchanged."""
    import ray

    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map
    from ..stages.dedup import with_text_hash
    from .neardup import (NEAR_DEDUP_BROADCAST_MAX_DROPS,
                          _broadcast_drop_filter, _partitioned_anti_join,
                          near_dup_clusters)

    # ---- tier 0 (optional): line-level boilerplate strip, in place
    if line_min_docs is not None:
        from ..stages.lines import remove_boilerplate_lines

        cleaned = remove_boilerplate_lines(
            docs, cfg, text_col=text_col, min_docs=line_min_docs,
            out_col="__line_clean")

        def _swap(t: pa.Table) -> pa.Table:
            i = t.column_names.index(text_col)
            return t.set_column(i, text_col, t["__line_clean"]) \
                .drop_columns(["__line_clean"])

        docs = cleaned.map_batches(_swap, batch_format="pyarrow",
                                   zero_copy_batch=True)

    n_parts = cfg.resolved_partitions()
    base_schema = docs.schema().base_schema
    out_names = list(base_schema.names)

    # ---- tier 1: exact — one hash exchange, rows marked (not dropped)
    def _tag(t: pa.Table) -> pa.Table:
        h = np.asarray(t["text_hash"], dtype=np.int64)
        part = (np.asarray(splitmix64(h.view(np.uint64)))
                % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    tagged = with_text_hash(docs, text_col).map_batches(
        _tag, batch_format="pyarrow", zero_copy_batch=True)

    marked_schema = base_schema.append(pa.field("exact_kept", pa.bool_()))

    def _mark(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return marked_schema.empty_table()
        h1 = np.asarray(tab["text_hash"], dtype=np.int64)
        h2 = np.asarray(tab["text_hash2"], dtype=np.int64)
        ids = np.asarray(tab[id_col], dtype=np.int64)
        order = np.lexsort((ids, h2, h1))
        h1s, h2s = h1[order], h2[order]
        starts = np.empty(len(order), dtype=bool)
        starts[0] = True
        starts[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        kept = np.zeros(len(tab), dtype=bool)
        kept[order[starts]] = True        # min id per 128-bit-hash group
        return tab.select(out_names).append_column(
            "exact_kept", pa.array(kept))

    marked = hash_partition_map(tagged, "part", _mark, n_parts).materialize()

    def _survivors(t: pa.Table) -> pa.Table:
        return t.filter(t["exact_kept"]).select(out_names)

    def _exact_removed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.invert(t["exact_kept"])).select([id_col])

    survivors = marked.map_batches(_survivors, batch_format="pyarrow",
                                   zero_copy_batch=True)
    exact_removed = marked.map_batches(_exact_removed,
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)

    # ---- tier 2: near-dup clusters over tier-1 survivors
    labels = near_dup_clusters(survivors, cfg, id_col=id_col,
                               text_col=text_col, threshold=threshold,
                               counters=counters,
                               checkpoint_fn=checkpoint_fn).materialize()
    ltabs = [t for t in ray.get(list(labels.to_arrow_refs())) if len(t)]
    n_drop = sum(
        int((np.asarray(t["node"]) != np.asarray(t["component"])).sum())
        for t in ltabs)
    if counters is not None:
        counters.add.remote({"tiered_neardup_dropped": n_drop})

    def _near_removed(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"], dtype=np.int64)
        comp = np.asarray(t["component"], dtype=np.int64)
        return pa.table({id_col: pa.array(node[node != comp], pa.int64())})

    near_removed = labels.map_batches(_near_removed, batch_format="pyarrow")

    if n_drop == 0:
        corpus = survivors
    elif n_drop <= NEAR_DEDUP_BROADCAST_MAX_DROPS:
        drops = np.sort(np.concatenate([
            np.asarray(t["node"], dtype=np.int64)[
                np.asarray(t["node"]) != np.asarray(t["component"])]
            for t in ltabs]))
        corpus = _broadcast_drop_filter(survivors, drops, id_col)
    else:
        corpus = _partitioned_anti_join(survivors, near_removed, cfg, id_col)

    # ---- disposition: a UNION of streaming id projections
    def _with_tier(tier):
        def _f(t: pa.Table) -> pa.Table:
            ids = t[id_col].cast(pa.int64()) if t.schema.field(
                id_col).type != pa.int64() else t[id_col]
            return pa.table({
                id_col: ids,
                "tier": pa.array([tier] * len(t), pa.string()),
            })
        return _f

    disposition = (
        corpus.map_batches(_with_tier("kept"), batch_format="pyarrow")
        .union(exact_removed.map_batches(_with_tier("exact"),
                                         batch_format="pyarrow"))
        .union(near_removed.map_batches(_with_tier("neardup"),
                                        batch_format="pyarrow"))
    )
    return TieredResult(corpus=corpus, disposition=disposition)


def tiered_dedup_stats(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                       id_col: str = "doc_id", text_col: str = "text",
                       threshold: float | None = ..., counters=None):
    """→ Dataset(tier, n_docs): per-tier document counts."""
    res = tiered_dedup(docs, cfg, id_col=id_col, text_col=text_col,
                       threshold=threshold, counters=counters)

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = pa.table([t["tier"]], names=["tier"]).group_by("tier") \
            .aggregate([("tier", "count")])
        return pa.table({"tier": g["tier"],
                         "n_docs": g["tier_count"].cast(pa.int64())})

    partial = res.disposition.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby("tier").sum("n_docs")
    return agg.map_batches(
        lambda t: pa.table({"tier": t["tier"],
                            "n_docs": t["sum(n_docs)"].cast(pa.int64())}),
        batch_format="pyarrow")


def tiered_trim_stats(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                      min_tokens: int = 20, id_col: str = "doc_id",
                      text_col: str = "text",
                      threshold: float | None = ..., counters=None):
    """Tier 3 over the tiered-kept corpus: per-doc duplicated-window
    cut-token counts (docs with ≥1 cut span)."""
    import pyarrow.compute as pc

    from ..stages.substring import substring_dedup

    res = tiered_dedup(docs, cfg, id_col=id_col, text_col=text_col,
                       threshold=threshold, counters=counters)
    out = substring_dedup(res.corpus, cfg, min_tokens=min_tokens,
                          id_col=id_col, text_col=text_col)
    return out.map_batches(
        lambda t: t.select([id_col, "n_cut_tokens"]).filter(
            pc.greater(t["n_cut_tokens"], 0)),
        batch_format="pyarrow")
