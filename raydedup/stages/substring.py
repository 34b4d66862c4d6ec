"""Substring-level deduplication: find and cut duplicated runs of ≥ L
tokens across the corpus (the suffix-array substring-dedup stage of the
training-data-dedup literature, e.g. Lee et al. 2022, recast for Ray).

A run of ≥ L tokens duplicated anywhere in the corpus contains at least
one duplicated length-L token window, and maximal duplicated runs are
exactly the unions of duplicated length-L windows — so instead of a
per-partition suffix array (sequential construction, Python-hostile),
every length-L window is hashed with the same rolling combine used for
shingles, and duplicate windows are found by one hash-partitioned
shuffle.  Collision probability is 2^-64 per window pair — the same
trust level as the shingle pipeline.

Keep-first semantics: for every duplicated window hash, the occurrence
with the smallest (doc_id, pos) is the original; all other occurrences
are marked.  Marked windows are merged per doc into maximal token spans
and cut (an occurrence inside the *same* doc counts too: self-repeats
collapse to their first occurrence).

Shuffle keys: window-hash partition (duplicate detection), doc_id
partition (span merge + text rebuild).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64, window_hash_stream
from ..functions.text import tokenize_arrow


def window_hash_batch(texts: pa.Array, k: int
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All length-k token windows of a batch: (window_hash, doc_local_idx,
    token_pos).  Unlike shingle_batch, positions are kept and windows are
    NOT deduplicated."""
    tok_hashes, tok_offsets = tokenize_arrow(texts)
    n_docs = len(tok_offsets) - 1
    n_tok = tok_offsets[1:] - tok_offsets[:-1]
    m = int(tok_offsets[-1])
    if m < k or n_docs == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    n_win = m - k + 1
    win_hash = window_hash_stream(tok_hashes, k)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
    valid = doc_of[:n_win] == doc_of[k - 1 :]
    gpos = np.flatnonzero(valid)
    docs = doc_of[gpos]
    pos = gpos - tok_offsets[docs]
    return win_hash[valid], docs, pos


def find_duplicate_spans(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                         min_tokens: int = 50, id_col: str = "doc_id",
                         text_col: str = "text"):
    """→ Dataset(doc_id, start_tok, end_tok): maximal token spans whose
    content duplicates an earlier occurrence somewhere in the corpus."""
    n_parts = cfg.resolved_partitions()
    k = min_tokens

    def _emit(batch: pa.Table) -> pa.Table:
        wh, dloc, pos = window_hash_batch(batch[text_col], k)
        ids = np.asarray(batch[id_col], dtype=np.int64)[dloc] \
            if len(dloc) else np.empty(0, np.int64)
        part = (wh % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "whash": pa.array(wh.view(np.int64), pa.int64()),
            id_col: pa.array(ids, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    wins = docs_ds.map_batches(_emit, batch_format="pyarrow",
                               zero_copy_batch=True,
                               batch_size=cfg.batch_size)

    def _dups(group) -> pa.Table:
        if group is None or len(group) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        wh = np.asarray(group["whash"], dtype=np.int64)
        ids = np.asarray(group[id_col], dtype=np.int64)
        pos = np.asarray(group["pos"], dtype=np.int64)
        order = np.lexsort((pos, ids, wh))
        wh, ids, pos = wh[order], ids[order], pos[order]
        starts = np.empty(len(wh), dtype=bool)
        if len(wh) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        starts[0] = True
        starts[1:] = wh[1:] != wh[:-1]
        # every occurrence EXCEPT the first (min doc_id, pos) of each
        # duplicated hash is a duplicate window
        run_id = np.cumsum(starts) - 1
        first_of_run = np.zeros(len(wh), dtype=bool)
        first_of_run[np.flatnonzero(starts)] = True
        dup = ~first_of_run
        return pa.table({id_col: pa.array(ids[dup], pa.int64()),
                         "pos": pa.array(pos[dup], pa.int64())})

    from ..functions.shuffle import hash_partition_map
    dup_wins = hash_partition_map(wins, "part", _dups, n_parts)

    def _part_by_doc(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        part = (splitmix64(ids.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({id_col: t[id_col], "pos": t["pos"],
                         "part": pa.array(part, pa.int64())})

    def _merge_spans(group) -> pa.Table:
        if group is None or len(group) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "start_tok": pa.array([], pa.int64()),
                             "end_tok": pa.array([], pa.int64())})
        ids = np.asarray(group[id_col], dtype=np.int64)
        pos = np.asarray(group["pos"], dtype=np.int64)
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        # merge overlapping/adjacent windows [pos, pos+k) per doc:
        # a new span starts when doc changes or the gap exceeds k
        new_span = np.empty(len(ids), dtype=bool)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "start_tok": pa.array([], pa.int64()),
                             "end_tok": pa.array([], pa.int64())})
        new_span[0] = True
        new_span[1:] = (ids[1:] != ids[:-1]) | (pos[1:] > pos[:-1] + k)
        span_idx = np.flatnonzero(new_span)
        span_end = np.append(span_idx[1:], len(ids)) - 1
        return pa.table({
            id_col: pa.array(ids[span_idx], pa.int64()),
            "start_tok": pa.array(pos[span_idx], pa.int64()),
            "end_tok": pa.array(pos[span_end] + k, pa.int64()),
        })

    parted = dup_wins.map_batches(_part_by_doc, batch_format="pyarrow")
    return hash_partition_map(parted, "part", _merge_spans, n_parts)


def substring_dedup(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                    min_tokens: int = 50, id_col: str = "doc_id",
                    text_col: str = "text"):
    """→ docs with duplicated ≥min_tokens runs cut out: columns
    (id_col, text_col, text_deduped, n_cut_tokens).  Docs without spans
    pass through with text_deduped == text.

    Cut phase physical plan: docs and spans are co-partitioned by
    hash(doc_id) — the span side arrives ALREADY on that key from
    find_duplicate_spans — and each partition cuts vectorized: Arrow
    ``split_pattern`` tokenizes the whole partition, a diff-array over
    span boundaries builds the keep-mask in O(tokens + spans), and
    ``pc.binary_join`` rebuilds the texts.  No span broadcast, no
    per-row Python loop — the span table can exceed any single node.
    """
    import pyarrow.compute as pc

    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()
    spans = find_duplicate_spans(docs_ds, cfg, min_tokens=min_tokens,
                                 id_col=id_col, text_col=text_col)

    def _hashp(ids: np.ndarray) -> np.ndarray:
        return (np.asarray(splitmix64(ids.view(np.uint64)))
                % np.uint64(n_parts)).astype(np.int64)

    def _tag_docs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        return pa.table({
            id_col: t[id_col],
            text_col: t[text_col],
            "start_tok": pa.nulls(len(t), pa.int64()),
            "end_tok": pa.nulls(len(t), pa.int64()),
            "part": pa.array(_hashp(ids), pa.int64()),
            "_isspan": pa.array(np.zeros(len(t), np.int8), pa.int8()),
        })

    def _tag_spans(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        return pa.table({
            id_col: t[id_col],
            text_col: pa.nulls(len(t), pa.string()),
            "start_tok": t["start_tok"],
            "end_tok": t["end_tok"],
            "part": pa.array(_hashp(ids), pa.int64()),
            "_isspan": pa.array(np.ones(len(t), np.int8), pa.int8()),
        })

    def _cut(group: pa.Table | None) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            text_col: pa.array([], pa.string()),
            "text_deduped": pa.array([], pa.string()),
            "n_cut_tokens": pa.array([], pa.int64()),
        })
        if group is None or len(group) == 0:
            return empty
        isspan = np.asarray(group["_isspan"], dtype=np.int8) == 1
        docs = group.filter(pa.array(~isspan))
        if len(docs) == 0:
            return empty
        sp = group.filter(pa.array(isspan))
        ids = np.asarray(docs[id_col], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        docs = docs.take(pa.array(order, pa.int64()))
        ids = ids[order]

        texts = pc.fill_null(docs[text_col], "").combine_chunks()
        lists = pc.split_pattern(texts, pattern=" ")
        offs = np.asarray(lists.offsets, dtype=np.int64)
        offs = offs - offs[0]
        total = int(offs[-1])
        n_tok = offs[1:] - offs[:-1]

        cut_mask = np.zeros(total, dtype=bool)
        if len(sp):
            s_ids = np.asarray(sp[id_col], dtype=np.int64)
            s_start = np.asarray(sp["start_tok"], dtype=np.int64)
            s_end = np.asarray(sp["end_tok"], dtype=np.int64)
            di = np.searchsorted(ids, s_ids)
            di = np.clip(di, 0, max(len(ids) - 1, 0))
            ok = ids[di] == s_ids if len(ids) else np.zeros(len(s_ids), bool)
            di, s_start, s_end = di[ok], s_start[ok], s_end[ok]
            g_start = offs[di] + np.minimum(s_start, n_tok[di])
            g_end = offs[di] + np.minimum(s_end, n_tok[di])
            delta = np.zeros(total + 1, dtype=np.int64)
            np.add.at(delta, g_start, 1)
            np.add.at(delta, g_end, -1)
            cut_mask = np.cumsum(delta[:total]) > 0

        keep = ~cut_mask
        if total:
            # reduceat needs indices < total (trailing empty docs would
            # pass total); empty segments are fixed up right after
            kept_per_doc = np.add.reduceat(
                keep.astype(np.int64), np.minimum(offs[:-1], total - 1))
        else:
            kept_per_doc = np.zeros(len(ids), np.int64)
        kept_per_doc[n_tok == 0] = 0
        new_offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(kept_per_doc, out=new_offs[1:])
        flat = lists.flatten()
        kept_tokens = flat.filter(pa.array(keep)) if total else flat
        if new_offs[-1] < 2**31:
            new_list = pa.ListArray.from_arrays(
                pa.array(new_offs, pa.int32()), kept_tokens)
        else:
            # ListArray offsets are int32 by contract; ≥2^31 tokens per
            # partition needs the large variant (binary_join accepts it)
            new_list = pa.LargeListArray.from_arrays(
                pa.array(new_offs, pa.int64()), kept_tokens)
        deduped = pc.binary_join(new_list, " ")
        return pa.table({
            id_col: docs[id_col],
            text_col: docs[text_col],
            "text_deduped": deduped,
            "n_cut_tokens": pa.array(n_tok - kept_per_doc, pa.int64()),
        })

    tagged = docs_ds.select_columns([id_col, text_col]).map_batches(
        _tag_docs, batch_format="pyarrow").union(
        spans.map_batches(_tag_spans, batch_format="pyarrow"))
    return hash_partition_map(tagged, "part", _cut, n_parts)
