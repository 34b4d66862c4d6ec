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
from ..functions.hashing import combine_rolling, splitmix64
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
    parts = [tok_hashes[j : n_win + j] for j in range(k)]
    win_hash = combine_rolling(parts)
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
    pass through with text_deduped == text."""
    import ray

    spans = find_duplicate_spans(docs_ds, cfg, min_tokens=min_tokens,
                                 id_col=id_col, text_col=text_col)
    span_tab = pa.concat_tables(
        [t for t in (ray.get(r) for r in spans.to_arrow_refs()) if len(t)]
    ) if spans.count() else None
    if span_tab is None or len(span_tab) == 0:
        return docs_ds.map_batches(
            lambda t: t.append_column("text_deduped", t[text_col])
                       .append_column("n_cut_tokens",
                                      pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow",
        )
    # spans are a small fraction of the corpus: broadcast them and cut
    # inside a map (the 10^12-doc path would partition by doc instead)
    sp_ids = np.asarray(span_tab[id_col], dtype=np.int64)
    sp_start = np.asarray(span_tab["start_tok"], dtype=np.int64)
    sp_end = np.asarray(span_tab["end_tok"], dtype=np.int64)
    order = np.lexsort((sp_start, sp_ids))
    ref = ray.put({"ids": sp_ids[order], "start": sp_start[order],
                   "end": sp_end[order]})

    def _cut(batch: pa.Table) -> pa.Table:
        sp = ray.get(ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        texts = batch[text_col].to_pylist()
        lo = np.searchsorted(sp["ids"], ids, side="left")
        hi = np.searchsorted(sp["ids"], ids, side="right")
        out_texts, n_cut = [], []
        for i, t in enumerate(texts):
            if lo[i] == hi[i]:
                out_texts.append(t)
                n_cut.append(0)
                continue
            toks = t.split(" ")
            keep = np.ones(len(toks), dtype=bool)
            for j in range(lo[i], hi[i]):
                keep[sp["start"][j]:sp["end"][j]] = False
            out_texts.append(" ".join(tok for tok, kp in zip(toks, keep) if kp))
            n_cut.append(int((~keep).sum()))
        batch = batch.append_column("text_deduped",
                                    pa.array(out_texts, pa.string()))
        return batch.append_column("n_cut_tokens",
                                   pa.array(n_cut, pa.int64()))

    return docs_ds.map_batches(_cut, batch_format="pyarrow",
                               batch_size=cfg.batch_size)
