"""Fixed-size token-window chunking with overlap — the doc→chunks
split every retrieval index and context-window-bounded training
pipeline runs (RAG passage extraction, long-doc truncation into
overlapping windows before tokenizer packing).  The complement of
stages/packing.py: packing concatenates docs into fixed-length
sequences, chunking splits one doc into fixed-length windows.

Chunk grammar (the SQL-oracle-checked contract):
  tokens   = text split on ' ' (empty tokens preserved — the repo's
             tokenization convention, equal to DuckDB string_split)
  starts   = 0, stride, 2*stride, ... ; the LAST start is the smallest
             multiple of stride with start + chunk_tokens >= n_tokens
             (so no tail chunk is ever fully contained in its
             predecessor); every doc emits >= 1 chunk
  chunk i  = tokens[i*stride : i*stride + chunk_tokens], re-joined
             with ' '

Scale shape: a pure per-doc flat map — zero shuffle, no state.  The
chunk text is BYTE-SLICED out of the original Arrow string buffer (one
numpy gather over the data bytes; token boundaries recovered from the
split token lengths), so no per-token Python objects are built and
multi-space runs round-trip byte-identically: rejoining a window of
''-preserving tokens with single ' ' reproduces the original byte run
exactly, which is what the SQL oracle's array_to_string emits too.

Output is (doc_id, chunk_id, n_tokens, chunk_text) so a downstream
exact/near-dup pass over chunks (dedup.py keyed on the chunk hash) or
an embedding stage can run without re-reading the documents table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _chunk_batch(batch: pa.Table, *, chunk_tokens: int, stride: int,
                 id_col: str, text_col: str) -> pa.Table:
    texts = pc.fill_null(batch[text_col], "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    if n_docs == 0:
        return pa.table({id_col: batch[id_col],
                         "chunk_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.large_string())})

    toks = pc.split_pattern(texts, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lo = np.asarray(toks.offsets, dtype=np.int64)       # doc -> flat token
    flat = toks.values
    fb = flat.buffers()
    f_off_dtype = np.int64 if pa.types.is_large_string(flat.type) \
        else np.int32
    fo = np.frombuffer(fb[1], dtype=f_off_dtype)[
        flat.offset: flat.offset + len(flat) + 1].astype(np.int64)

    # original text buffer: absolute byte start per doc
    tb = texts.buffers()
    t_off_dtype = np.int64 if pa.types.is_large_string(texts.type) \
        else np.int32
    doffs = np.frombuffer(tb[1], dtype=t_off_dtype)[
        texts.offset: texts.offset + n_docs + 1].astype(np.int64)
    data = np.frombuffer(tb[2], dtype=np.uint8) if tb[2] is not None \
        else np.empty(0, np.uint8)

    n_tok = lo[1:] - lo[:-1]                            # >= 1 always
    n_chunks = np.where(
        n_tok <= chunk_tokens, 1,
        1 + (n_tok - chunk_tokens + stride - 1) // stride).astype(np.int64)
    total = int(n_chunks.sum())

    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
    cum = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=cum[1:])
    chunk_id = np.arange(total, dtype=np.int64) - cum[doc_of]

    s_tok = chunk_id * stride                           # token window
    e_tok = np.minimum(s_tok + chunk_tokens, n_tok[doc_of])
    out_n_tokens = e_tok - s_tok

    # flat-token indices of the window, then byte offsets WITHIN the doc:
    # token k of doc d (flat index f = lo[d]+k) starts at byte
    # (fo[f]-fo[lo[d]]) + k  — one separator byte per earlier boundary.
    dfs = lo[doc_of]
    fs, fe = dfs + s_tok, dfs + e_tok
    rel_start = (fo[fs] - fo[dfs]) + s_tok
    rel_end = (fo[fe] - fo[dfs]) + (e_tok - 1)          # end of token fe-1
    abs_start = doffs[doc_of] + rel_start
    lens = rel_end - rel_start

    out_total = int(lens.sum())
    out_offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offsets[1:])
    intra = np.arange(out_total, dtype=np.int64) \
        - np.repeat(out_offsets[:-1], lens)
    gathered = data[np.repeat(abs_start, lens) + intra]

    chunk_text = pa.Array.from_buffers(
        pa.large_string(), total,
        [None, pa.py_buffer(out_offsets), pa.py_buffer(gathered)])
    ids = np.asarray(batch[id_col], dtype=np.int64)
    return pa.table({id_col: pa.array(ids[doc_of], pa.int64()),
                     "chunk_id": pa.array(chunk_id, pa.int64()),
                     "n_tokens": pa.array(out_n_tokens, pa.int64()),
                     "chunk_text": chunk_text})


def chunk_documents(ds, *, chunk_tokens: int = 128, stride: int = 96,
                    id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset(doc_id, chunk_id, n_tokens, chunk_text): overlapping
    fixed-size token windows per document (see module docstring for the
    exact grammar).  ``stride < chunk_tokens`` gives the overlap used
    by retrieval indexes; ``stride == chunk_tokens`` gives disjoint
    windows (training truncation)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would drop tokens")
    import functools
    fn = functools.partial(_chunk_batch, chunk_tokens=chunk_tokens,
                           stride=stride, id_col=id_col, text_col=text_col)
    # batch_size=1024 measured 6x faster than whole-block batches on
    # 32-way workers: the gather's per-batch index/output allocations
    # stay small enough to avoid the cross-process mmap/munmap churn
    # that large transient numpy buffers trigger (tools/chunk_scale.py
    # sweep: 0.53 s at 1024 vs 3.36 s at 8192 for the same input).
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=1024)
