"""Text → shingle-set kernels (vectorized, whole-batch).

The reference operates on pre-built CSR sparse sets; the dedup target
builds those sets from text.  A batch of D documents becomes a CSR-like
pair ``(offsets, values)`` — exactly Arrow's ``list<uint64>`` layout —
holding each document's **sorted unique** shingle hashes.  Sortedness is
the ordering invariant the reference's intersection kernel relies on
("column indices are sorted within each row", jaccard.cpp:353); our
merge-count intersection kernel (functions/setops.py) relies on it the
same way.

Tokenization contract: split on a single space (matching DuckDB's
``string_split(text, ' ')`` so SQL oracles agree exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import combine_rolling, hash_utf8_array, window_hash_stream

# Bump when the window/shingle hash function changes: stamped into
# checkpoint manifests so stale signature/candidate checkpoints from an
# older kernel are recomputed, not reused (batch_size-style config
# invalidation can't see code changes).
SHINGLE_KERNEL_VERSION = 3  # v3 = wordwise token hash (v2 = Rabin-Karp
# window hash over per-byte FNV token hashes)


def tokenize_arrow(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Split a string array on ' ' → (token_hashes, doc_offsets).

    Returns the concatenated per-token uint64 hashes of all docs plus
    int64 offsets (len D+1) delimiting each doc's token run — the CSR
    layout.

    Fully byte-level: token boundaries are found directly in the Arrow
    string buffer (one np.flatnonzero over the bytes) and hashed in
    place (functions/hashing.hash_over_slices, the wordwise kernel —
    the same function hashing string tables, so hash-table probes
    against token hashes stay consistent) — no ``split_pattern``
    token-array materialization, no per-token objects; identical output
    to splitting on a single space (empty tokens preserved, matching
    DuckDB ``string_split``).
    """
    from .hashing import hash_over_slices as fnv1a_over_slices

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n_docs = len(texts)
    off_dtype = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    bufs = texts.buffers()
    doffs = np.frombuffer(bufs[1], dtype=off_dtype)[
        texts.offset: texts.offset + n_docs + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    lo, hi = (doffs[0], doffs[-1]) if n_docs else (0, 0)
    spaces = np.flatnonzero(data[lo:hi] == 32) + lo
    # token boundaries: doc starts ∪ (space+1) / spaces ∪ doc ends —
    # both sorted merges align start/end pairs per token
    starts = np.sort(np.concatenate([doffs[:-1], spaces + 1]), kind="stable")
    ends = np.sort(np.concatenate([spaces, doffs[1:]]), kind="stable")
    lens = (ends - starts).astype(np.int64)
    sp_per_doc = (np.searchsorted(spaces, doffs[1:])
                  - np.searchsorted(spaces, doffs[:-1]))
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sp_per_doc + 1, out=offsets[1:])
    return fnv1a_over_slices(data, starts, lens), offsets


# transient per-row token-hash cache column: list<uint64> of each doc's
# token hashes, attached by a stage that already paid tokenize_arrow so
# downstream zero-shuffle stages skip re-tokenizing the same text
# (tokenize is ~45% of signature-shaped compute).  The column only
# lives INSIDE fused map chains — attach it in the first stage of a
# streaming prefix and drop it before any materialize/exchange so it
# never inflates the object store.
TOKEN_CACHE_COL = "__tok_hashes"


def tokens_to_column(tok_hashes: np.ndarray,
                     offsets: np.ndarray) -> pa.LargeListArray:
    """(CSR token hashes, offsets) → a large_list<uint64> cache column."""
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()),
        pa.array(tok_hashes, pa.uint64()))


def column_to_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """Cache column → (token_hashes, offsets), zero-copy off the Arrow
    buffers (handles sliced/filtered arrays via the offset window)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = np.asarray(col.offsets, dtype=np.int64)
    vals = np.asarray(col.values, dtype=np.uint64)
    return vals[offs[0]:offs[-1]], offs - offs[0]


def batch_tokens(batch: pa.Table, text_col: str
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch tokenization with cache reuse: read the token-hash
    cache column when a previous stage attached it, else tokenize."""
    if TOKEN_CACHE_COL in batch.column_names:
        return column_to_tokens(batch[TOKEN_CACHE_COL])
    return tokenize_arrow(batch[text_col])


def shingle_batch(
    texts: pa.Array, k: int, tok: tuple | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram shingle sets for a batch of texts.

    Returns ``(values, offsets)``: ``values`` is the concatenated sorted
    unique shingle hashes of every doc, ``offsets`` (len D+1) delimits
    each doc's run.  Docs with fewer than k tokens get an empty set.
    ``tok``: precomputed ``(token_hashes, offsets)`` (skips tokenize).
    """
    tok_hashes, tok_offsets = tok if tok is not None \
        else tokenize_arrow(texts)
    n_docs = len(tok_offsets) - 1
    n_tok = tok_offsets[1:] - tok_offsets[:-1]
    m = int(tok_offsets[-1])

    if m < k or n_docs == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs + 1, dtype=np.int64)

    # hash of every length-k window over the concatenated token stream
    n_win = m - k + 1
    win_hash = window_hash_stream(tok_hashes, k)

    # a window starting at i is a real shingle iff it doesn't cross a
    # doc boundary: doc_of[i] == doc_of[i+k-1]
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
    valid = doc_of[:n_win] == doc_of[k - 1 :]
    sh = win_hash[valid]
    sh_doc = doc_of[:n_win][valid]

    # sorted unique per doc: lexsort by (doc, hash) then drop adjacent dups
    order = np.lexsort((sh, sh_doc))
    sh, sh_doc = sh[order], sh_doc[order]
    if len(sh):
        keep = np.empty(len(sh), dtype=bool)
        keep[0] = True
        keep[1:] = (sh[1:] != sh[:-1]) | (sh_doc[1:] != sh_doc[:-1])
        sh, sh_doc = sh[keep], sh_doc[keep]

    counts = np.bincount(sh_doc, minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return sh, offsets


def shingle_stream(texts: pa.Array, k: int, tok: tuple | None = None
                   ) -> tuple[np.ndarray, np.ndarray, int]:
    """Raw k-gram window-hash STREAM for a batch of texts — duplicates
    retained, unsorted.

    Returns ``(win_hash, win_doc, n_docs)``: every in-doc window's hash
    and its doc index, in document order.  This is all OPH banding needs
    (a per-(doc,bin) MIN is unaffected by duplicate shingles), so the
    lexsort + unique that ``shingle_batch`` pays to materialize sorted
    sets — the measured memory-bandwidth hot spot of the signature stage
    — is skipped entirely.  Use ``shingle_batch`` only when the actual
    sets are needed (exact-Jaccard verification, SimHash).
    ``tok``: precomputed ``(token_hashes, offsets)`` (skips tokenize).
    """
    tok_hashes, tok_offsets = tok if tok is not None \
        else tokenize_arrow(texts)
    n_docs = len(tok_offsets) - 1
    n_tok = tok_offsets[1:] - tok_offsets[:-1]
    m = int(tok_offsets[-1])
    if m < k or n_docs == 0:
        return (np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.int64), n_docs)
    n_win = m - k + 1
    win_hash = window_hash_stream(tok_hashes, k)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
    valid = doc_of[:n_win] == doc_of[k - 1:]
    return win_hash[valid], doc_of[:n_win][valid], n_docs


def word_ngram_strings(texts, n: int, sep: str = " "):
    """Adjacent word ``n``-gram STRINGS per text (sep-joined windows
    that never cross rows) → (grams: pa.StringArray, doc: np.int64[]).

    Tokens are the sep-split INCLUDING empties, so the DuckDB list
    oracle (``ws[i] || ' ' || ws[i+1]``) agrees exactly.  Shared by
    vocab.top_k_ngrams and the winnowing md5 oracle path — one
    implementation of the sliced-offsets window-index arithmetic."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(pc.fill_null(texts, ""), sep)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, dtype=np.int64)
    offs = offs - offs[0]          # sliced arrays carry a base offset
    vals = toks.flatten()          # values aligned with adjusted offsets
    lens = offs[1:] - offs[:-1]
    counts = np.maximum(lens - (n - 1), 0)
    g_offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=g_offs[1:])
    total = int(g_offs[-1])
    doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if not total:
        return pa.array([], pa.string()), doc
    idx = (np.repeat(offs[:-1], counts)
           + (np.arange(total, dtype=np.int64)
              - np.repeat(g_offs[:-1], counts)))
    # last argument of binary_join_element_wise is the SEPARATOR
    pieces = [vals.take(pa.array(idx + j, pa.int64())) for j in range(n)]
    return pc.binary_join_element_wise(*pieces, sep), doc


def char_ngram_batch(texts: pa.Array, n: int = 3
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Character (byte) n-gram sets per doc, CSR layout, sorted unique.

    n ≤ 8: the n-gram IS its value (bytes packed big-endian into uint64)
    — no hashing, zero collisions, and byte == character for ASCII so
    the DuckDB ``substr`` oracle agrees exactly.  Operates directly on
    the Arrow string buffers (no per-row Python).
    """
    assert 1 <= n <= 8
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n_docs = len(texts)
    if pa.types.is_large_string(texts.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = texts.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[texts.offset:
                                                   texts.offset + n_docs + 1]
    offs = offs.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    data = data[offs[0]:offs[-1]]
    offs = offs - offs[0]
    m = int(offs[-1])
    if m < n or n_docs == 0:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, np.int64)

    n_win = m - n + 1
    packed = np.zeros(n_win, dtype=np.uint64)
    for j in range(n):
        packed = (packed << np.uint64(8)) | data[j: n_win + j].astype(np.uint64)
    lens = offs[1:] - offs[:-1]
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    valid = doc_of[:n_win] == doc_of[n - 1:]
    grams = packed[valid]
    gdoc = doc_of[:n_win][valid]
    order = np.lexsort((grams, gdoc))
    grams, gdoc = grams[order], gdoc[order]
    if len(grams):
        keep = np.empty(len(grams), dtype=bool)
        keep[0] = True
        keep[1:] = (grams[1:] != grams[:-1]) | (gdoc[1:] != gdoc[:-1])
        grams, gdoc = grams[keep], gdoc[keep]
    counts = np.bincount(gdoc, minlength=n_docs)
    out_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offs[1:])
    return grams, out_offs


def sets_to_arrow(values: np.ndarray, offsets: np.ndarray) -> pa.ListArray:
    """Wrap CSR (values, offsets) as an Arrow list<uint64> column, zero-copy."""
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32())
        if offsets[-1] < 2**31
        else pa.array(offsets, type=pa.int64()),
        pa.array(values, type=pa.uint64()),
    )


def sets_to_binary(values: np.ndarray, offsets: np.ndarray) -> pa.LargeBinaryArray:
    """CSR (values, offsets) → large_binary column: each doc's sorted
    uint64 shingles as little-endian bytes.  Needed because Acero hash
    joins (the physical op behind Dataset.join) accept binary payload
    columns but not list columns; this is the wire format for shingle
    sets crossing a join."""
    byte_offsets = (offsets.astype(np.int64) * 8)
    data = np.ascontiguousarray(values.astype("<u8", copy=False))
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def binary_to_sets(col) -> tuple[np.ndarray, np.ndarray]:
    """large_binary column of uint64-LE blobs → CSR (values, offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type):
        col = col.cast(pa.large_binary())
    buffers = col.buffers()
    off = np.frombuffer(buffers[1], dtype=np.int64)[col.offset : col.offset + len(col) + 1]
    data_buf = buffers[2]
    if data_buf is None:
        return np.empty(0, dtype=np.uint64), np.zeros(len(col) + 1, dtype=np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint64)
    values = data[off[0] // 8 : off[-1] // 8]
    offsets = (off - off[0]) // 8
    return values, offsets.astype(np.int64)


def arrow_to_sets(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list<uint64> column → CSR (values, offsets), zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.LargeListArray) or pa.types.is_large_list(col.type):
        offsets = np.asarray(col.offsets, dtype=np.int64)
    else:
        offsets = np.asarray(col.offsets, dtype=np.int64)
    first = offsets[0]
    values = np.asarray(col.values, dtype=np.uint64)
    if first != 0:
        # sliced array: rebase
        values = values[first : offsets[-1]]
        offsets = offsets - first
    else:
        values = values[: offsets[-1]]
    return values, offsets
