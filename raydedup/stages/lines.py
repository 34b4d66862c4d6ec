"""Line-level (paragraph) boilerplate dedup — the CCNet-style pass.

Web corpora repeat LINES far more than whole documents: navigation
chrome, cookie banners, copyright footers appear verbatim across
thousands of pages whose bodies differ.  The standard treatment
(CCNet, Wenzek et al. 2020; also RefinedWeb / Gopher) counts, per
distinct line, the number of distinct documents containing it, and
strips lines above a document-frequency threshold before any
document-level dedup runs.

Reference analogue: the reference's COO set dedup removes duplicate
whole rows (jaccard.cpp coordinate-set semantics); this stage is the
same idea one granularity down — duplicate *lines within the corpus*
rather than duplicate entries within one matrix.

Physical plan (house patterns throughout):

* ``line_doc_counts`` — per-batch combiner (split → Arrow hash
  ``count_distinct`` per line, so one row per distinct line per batch
  travels, never one row per occurrence) → one manual hash exchange on
  the line hash → per-partition sum + threshold filter.  Docs never
  span batches, so summing per-batch distinct-doc counts is exact.
* ``remove_boilerplate_lines`` — the surviving boilerplate set is tiny
  by construction (it is the high-document-frequency tail), so it is
  collected once, shipped via ``ray.put``, and every batch filters with
  one exact vectorized ``pc.is_in`` membership test (no hashing on the
  membership path → no collision class) plus the diff-array offset
  rebuild (same trick as substring.py's span cut).  A set above the
  broadcast gate takes a fully-partitioned path: lines exploded through
  one exchange co-partitioned with the boilerplate slice, reassembled
  by doc, and zipped partition-for-partition back onto the corpus —
  the corpus text moves twice, the driver holds nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.broadcast import bcast_get
from ..functions.hashing import hash_utf8_array
from ..functions.shuffle import hash_partition_map

# Boilerplate sets beyond this many lines take the partitioned path.
LINES_BROADCAST_MAX = 2_000_000

_EMPTY_COUNTS = {"line": pa.array([], pa.string()),
                 "n_docs": pa.array([], pa.int64())}


def _split_lines(t: pa.Table, text_col: str, sep: str = "\n"):
    """→ (list_array of units, flat unit StringArray, per-unit doc row
    index).  Literal ``sep`` split (default '\\n'), matching DuckDB
    ``string_split(text, chr(10))`` (empty text yields one empty unit
    on both engines).  ``sep='\\n\\n'`` gives paragraph granularity."""
    lines_list = pc.split_pattern(pc.fill_null(t[text_col], ""), sep)
    if isinstance(lines_list, pa.ChunkedArray):
        lines_list = lines_list.combine_chunks()
    flat = pc.list_flatten(lines_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(lines_list).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    return lines_list, flat, doc_idx


def line_doc_counts(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                    text_col: str = "text", min_docs: int = 2,
                    sep: str = "\n"):
    """→ Dataset(line:string, n_docs:int64) for every distinct line
    occurring in ≥ ``min_docs`` distinct documents (the boilerplate
    audit table; n_docs counts documents, not occurrences).  ``sep``
    sets the unit: '\\n' lines (default), '\\n\\n' paragraphs."""
    n_parts = cfg.num_partitions

    def _partial(t: pa.Table) -> pa.Table:
        _, flat, doc_idx = _split_lines(t, text_col, sep)
        pairs = pa.table({"line": flat,
                          "doc": pa.array(doc_idx, pa.int64())})
        agg = pairs.group_by("line").aggregate([("doc", "count_distinct")])
        h = hash_utf8_array(agg["line"].combine_chunks())
        return pa.table({
            "line": agg["line"],
            "n_docs": agg["doc_count_distinct"].cast(pa.int64()),
            "_part": pa.array((h % np.uint64(n_parts)).astype(np.int64),
                              pa.int64()),
        })

    def _reduce(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            return pa.table(_EMPTY_COUNTS)
        agg = t.group_by("line").aggregate([("n_docs", "sum")])
        out = pa.table({"line": agg["line"],
                        "n_docs": agg["n_docs_sum"].cast(pa.int64())})
        return out.filter(pc.greater_equal(out["n_docs"], min_docs))

    return hash_partition_map(ds, "_part", _reduce, n_parts,
                              map_fn=_partial,
                              map_chunk_rows=cfg.batch_size)


def remove_boilerplate_lines(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                             text_col: str = "text", min_docs: int = 5,
                             out_col: str = "text_clean",
                             broadcast_max: int = LINES_BROADCAST_MAX,
                             sep: str = "\n"):
    """Strip every line occurring in ≥ ``min_docs`` distinct documents;
    remaining lines keep their order, re-joined with ``sep`` (a doc
    whose every line is boilerplate becomes the empty string, not a
    dropped row — the caller decides whether to filter empties).
    ``sep='\\n\\n'`` runs the same pass at paragraph granularity."""
    import ray

    boiler = line_doc_counts(ds, cfg, text_col=text_col, min_docs=min_docs,
                             sep=sep)
    btabs = [t for t in ray.get(list(boiler.to_arrow_refs())) if len(t)]
    n_boiler = sum(len(t) for t in btabs)
    if n_boiler == 0:
        def _copy(t: pa.Table) -> pa.Table:
            return t.append_column(out_col, pc.fill_null(t[text_col], ""))
        return ds.map_batches(_copy, batch_format="pyarrow",
                              zero_copy_batch=True)
    if n_boiler > broadcast_max:
        return _remove_lines_partitioned(ds, btabs, cfg, text_col=text_col,
                                         out_col=out_col, sep=sep)

    value_set = pa.concat_tables(btabs)["line"].combine_chunks()
    set_ref = ray.put(value_set)

    def _strip(t: pa.Table) -> pa.Table:
        vset = bcast_get(set_ref)
        lines_list, flat, _ = _split_lines(t, text_col, sep)
        drop = pc.is_in(flat, value_set=vset)
        keep = pc.fill_null(pc.invert(drop), True).to_numpy(
            zero_copy_only=False)
        offs = np.asarray(lines_list.offsets, dtype=np.int64)
        offs = offs - offs[0]
        csum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        new_offs = csum[offs]
        kept = flat.filter(pa.array(keep))
        new_list = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), kept)
        joined = pc.binary_join(new_list, sep)
        return t.append_column(out_col, joined)

    return ds.map_batches(_strip, batch_format="pyarrow",
                          zero_copy_batch=True)


_RID = "_lines_rowid"


def _remove_lines_partitioned(ds, btabs, cfg: PipelineConfig, *,
                              text_col: str, out_col: str,
                              sep: str = "\n"):
    """Scale path for an over-broadcast boilerplate set.

    1. Tag stable row ids; explode docs to (rid, ord, line) rows through
       one exchange partitioned by line hash — each reduce partition
       drops its slice of the boilerplate set (exact ``pc.is_in``).
    2. Re-exchange surviving lines by hash(rid), reassemble each doc's
       text in ordinal order.
    3. Zip the reassembled partitions block-for-block with the original
       rows exchanged on the same hash(rid) key (hash_partition_map
       returns blocks in partition order) — searchsorted attach, docs
       that lost every line get ''.
    """
    import ray
    import ray.data as rd

    n_parts = cfg.num_partitions
    boiler = pa.concat_tables(btabs)["line"].combine_chunks()
    bh = (hash_utf8_array(boiler) % np.uint64(n_parts)).astype(np.int64)
    order = np.argsort(bh, kind="stable")
    bsorted = boiler.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(bh[order], np.arange(n_parts + 1))
    part_sets = [ray.put(bsorted.slice(bounds[p], bounds[p + 1] - bounds[p]))
                 for p in range(n_parts)]

    with_id = _with_row_ids(ds, _RID)

    def _explode(t: pa.Table) -> pa.Table:
        lines_list, flat, doc_idx = _split_lines(t, text_col, sep)
        rid = np.asarray(t[_RID], dtype=np.int64)[doc_idx]
        offs = np.asarray(lines_list.offsets, dtype=np.int64)
        offs = offs - offs[0]
        ords = (np.arange(len(flat), dtype=np.int64)
                - np.repeat(offs[:-1], np.diff(offs)))
        h = hash_utf8_array(flat)
        return pa.table({
            _RID: pa.array(rid, pa.int64()),
            "_ord": pa.array(ords, pa.int64()),
            "line": flat,
            "_part": pa.array((h % np.uint64(n_parts)).astype(np.int64),
                              pa.int64()),
        })

    def _drop_boiler(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            return pa.table({_RID: pa.array([], pa.int64()),
                             "_ord": pa.array([], pa.int64()),
                             "line": pa.array([], pa.string())})
        # every row of a reduce partition shares hash(line) % P: read the
        # partition id from the data, not from task order
        p = int(hash_utf8_array(t["line"].combine_chunks().slice(0, 1))[0]
                % np.uint64(n_parts))
        vset = ray.get(part_sets[p])
        drop = pc.fill_null(pc.is_in(t["line"], value_set=vset), False)
        return t.filter(pc.invert(drop))

    kept_lines = hash_partition_map(with_id, "_part", _drop_boiler, n_parts,
                                    map_fn=_explode,
                                    map_chunk_rows=cfg.batch_size)

    def _by_rid(t: pa.Table) -> pa.Table:
        h = (np.asarray(t[_RID], dtype=np.int64).astype(np.uint64)
             % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("_part", pa.array(h, pa.int64()))

    def _reassemble(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            return pa.table({_RID: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.string())})
        rid = np.asarray(t[_RID], dtype=np.int64)
        ords = np.asarray(t["_ord"], dtype=np.int64)
        order = np.lexsort((ords, rid))
        rid_s = rid[order]
        lines = t["line"].combine_chunks().take(pa.array(order, pa.int64()))
        starts = np.concatenate(
            [[0], np.nonzero(rid_s[1:] != rid_s[:-1])[0] + 1])
        offs = np.concatenate([starts, [len(rid_s)]])
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), lines)
        return pa.table({
            _RID: pa.array(rid_s[starts], pa.int64()),
            out_col: pc.binary_join(lst, sep),
        })

    clean_parts = hash_partition_map(kept_lines, "_part", _reassemble,
                                     n_parts, map_fn=_by_rid,
                                     map_chunk_rows=cfg.batch_size)
    doc_parts = hash_partition_map(with_id, "_part", lambda t: t
                                   if t is not None else pa.table({}),
                                   n_parts, map_fn=_by_rid,
                                   map_chunk_rows=cfg.batch_size)

    @ray.remote
    def _attach(docs_tab: pa.Table, clean_tab: pa.Table) -> pa.Table:
        if docs_tab is None or docs_tab.num_columns == 0:
            return pa.table({})
        n = len(docs_tab)
        if clean_tab is None or clean_tab.num_columns == 0 or not len(clean_tab):
            return docs_tab.drop_columns([_RID]).append_column(
                out_col, pa.array([""] * n, pa.string()))
        rids = np.asarray(clean_tab[_RID], dtype=np.int64)
        ro = np.argsort(rids, kind="stable")
        rids = rids[ro]
        txts = clean_tab[out_col].combine_chunks().take(
            pa.array(ro, pa.int64()))
        mine = np.asarray(docs_tab[_RID], dtype=np.int64)
        pos = np.clip(np.searchsorted(rids, mine), 0, len(rids) - 1)
        hit = rids[pos] == mine
        out = pc.if_else(pa.array(hit),
                         txts.take(pa.array(pos, pa.int64())), "")
        return docs_tab.drop_columns([_RID]).append_column(out_col, out)

    d_refs = doc_parts.to_arrow_refs()
    c_refs = clean_parts.to_arrow_refs()
    return rd.from_arrow_refs(
        [_attach.remote(d, c) for d, c in zip(d_refs, c_refs)])


def _with_row_ids(ds, col: str):
    """Stable global row ids via a per-block offset pass (block row
    counts only travel to the driver — P integers, never rows)."""
    import ray
    import ray.data as rd

    blocks = ds.to_arrow_refs()

    @ray.remote
    def _n(t):
        return len(t)

    lens = ray.get([_n.remote(b) for b in blocks])
    offsets = np.concatenate([[0], np.cumsum(lens)])

    @ray.remote
    def _tag(t, off):
        return t.append_column(col, pa.array(
            np.arange(off, off + len(t), dtype=np.int64), pa.int64()))

    return rd.from_arrow_refs(
        [_tag.remote(b, int(offsets[i])) for i, b in enumerate(blocks)])
