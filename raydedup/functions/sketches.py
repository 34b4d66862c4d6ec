"""MinHash + SimHash sketch kernels (vectorized, whole-batch, segment ops).

Permutation family: ``h_i(x) = splitmix64(x XOR seed_i)`` with seeds
drawn deterministically from the config seed — the actor-pool state of
stages/signatures.py (SURVEY.md §2.3 T3).  The per-document minimum is a
segmented reduction over the batch's concatenated shingle stream, the
same shape as the reference's RowSum segmented reduction over CSR rows
(jaccard.cpp:236-261), with perms processed in chunks to bound memory.

Empty shingle sets get the sentinel signature (all 2**64-1) and SimHash
0 — they can never collide with a real signature in LSH banding because
band hashes mix the band index in.
"""

from __future__ import annotations

import numpy as np

from .hashing import combine_rolling, perm_seeds, splitmix64

_EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_signatures_oph(
    values: np.ndarray,
    offsets: np.ndarray,
    num_bins: int,
    seed_salt: np.uint64,
) -> np.ndarray:
    """One-permutation MinHash with rotation densification
    (Li/Owen/Zhang-style OPH): hash every shingle ONCE, route it to one
    of ``num_bins`` bins by its top bits, keep the per-(doc, bin)
    minimum, and fill empty bins from the next non-empty bin to the
    right (circularly).  Collision probability per bin ≈ Jaccard — the
    same LSH family as k independent permutations at 1/k the cost
    (one O(M) pass + one sort instead of k passes).

    Returns (D, num_bins) uint64; empty docs get the all-sentinel row.
    """
    n_docs = len(offsets) - 1
    sig = np.full((n_docs, num_bins), _EMPTY_SENTINEL, dtype=np.uint64)
    if n_docs == 0 or len(values) == 0:
        return sig

    h = splitmix64(values ^ seed_salt)
    bins = h % np.uint64(num_bins)  # exact-uniform when num_bins is 2^k
    lens = offsets[1:] - offsets[:-1]
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    key = doc_of * num_bins + bins.astype(np.int64)

    order = np.argsort(key, kind="stable")
    sk, sh_ = key[order], h[order]
    starts = np.empty(len(sk), dtype=bool)
    starts[0] = True
    starts[1:] = sk[1:] != sk[:-1]
    start_idx = np.flatnonzero(starts)
    mins = np.minimum.reduceat(sh_, start_idx)
    cells = sk[start_idx]
    sig.ravel()[cells] = mins
    return _densify_rotation(sig, num_bins)


def _densify_rotation(sig: np.ndarray, num_bins: int) -> np.ndarray:
    """Rotation densification: circular forward-fill of empty bins from
    the next filled bin (two passes over the doubled row axis)."""
    n_docs = len(sig)
    filled = sig != _EMPTY_SENTINEL
    any_filled = filled.any(axis=1)
    if (~any_filled).any() or not filled.all():
        dbl = np.concatenate([sig, sig], axis=1)  # (D, 2B)
        fmask = dbl != _EMPTY_SENTINEL
        # backward-fill along axis 1 (borrow from the RIGHT neighbor):
        # reverse, forward-fill, reverse
        rev = fmask[:, ::-1]
        idx = np.where(rev, np.arange(2 * num_bins)[None, :], 0)
        np.maximum.accumulate(idx, axis=1, out=idx)
        filled_rev = dbl[:, ::-1][np.arange(n_docs)[:, None], idx]
        densified = filled_rev[:, ::-1][:, :num_bins]
        sig = np.where(any_filled[:, None], densified, sig)
    return sig


def minhash_oph_stream(
    win_hash: np.ndarray,
    win_doc: np.ndarray,
    n_docs: int,
    num_bins: int,
    seed_salt: np.uint64,
) -> np.ndarray:
    """OPH signatures straight from a raw window-hash STREAM
    (``functions.text.shingle_stream``): duplicates retained, unsorted.

    Bit-identical to ``minhash_signatures_oph`` over the sorted-unique
    sets (a per-(doc,bin) minimum is invariant to duplicates and order),
    but skips the set materialization and replaces the int64 key sort
    with an O(M) radix argsort over the uint8/uint16 bin ids — ``win_doc``
    is already nondecreasing, so a STABLE sort by bin leaves runs sorted
    by (bin, doc).  Measured ~2.5x faster than sorted-set OPH and with a
    far smaller working set (the single-socket DRAM ceiling is the
    scaling bottleneck).
    """
    sig = np.full((n_docs, num_bins), _EMPTY_SENTINEL, dtype=np.uint64)
    if n_docs == 0 or len(win_hash) == 0:
        return sig
    h = splitmix64(win_hash ^ seed_salt)
    bins = h % np.uint64(num_bins)
    if num_bins <= 256:
        bins_small = bins.astype(np.uint8)
    elif num_bins <= 65536:
        bins_small = bins.astype(np.uint16)
    else:
        bins_small = bins.astype(np.int64)
    # radix argsort (numpy 'stable' is radix for ≤16-bit ints)
    order = np.argsort(bins_small, kind="stable")
    sb = bins_small[order]
    sd = win_doc[order]
    sh_ = h[order]
    starts = np.empty(len(sb), dtype=bool)
    starts[0] = True
    starts[1:] = (sb[1:] != sb[:-1]) | (sd[1:] != sd[:-1])
    start_idx = np.flatnonzero(starts)
    mins = np.minimum.reduceat(sh_, start_idx)
    cells = sd[start_idx] * num_bins + sb[start_idx].astype(np.int64)
    sig.ravel()[cells] = mins
    return _densify_rotation(sig, num_bins)


def minhash_signatures(
    values: np.ndarray,
    offsets: np.ndarray,
    seeds: np.ndarray,
    perm_chunk: int = 16,
) -> np.ndarray:
    """(D, num_perms) uint64 signature matrix for D shingle sets in CSR form."""
    n_docs = len(offsets) - 1
    p = len(seeds)
    sig = np.full((n_docs, p), _EMPTY_SENTINEL, dtype=np.uint64)
    if n_docs == 0 or len(values) == 0:
        return sig

    lens = offsets[1:] - offsets[:-1]
    nonempty = lens > 0
    starts = offsets[:-1][nonempty]
    ne_idx = np.flatnonzero(nonempty)

    for c0 in range(0, p, perm_chunk):
        chunk = seeds[c0 : c0 + perm_chunk]
        # (M, chunk) hashed matrix; uint64 wraparound is intended
        hashed = splitmix64(values[:, None] ^ chunk[None, :])
        mins = np.minimum.reduceat(hashed, starts, axis=0)
        # reduceat over starts of nonempty segments: row i of `mins`
        # covers values[starts[i]:starts[i+1]] which may span multiple
        # docs if empty docs sit between — starts only lists nonempty
        # docs so segment i runs to the next nonempty start; that is
        # exactly doc ne_idx[i]'s range because empty docs contribute
        # no values.
        sig[ne_idx, c0 : c0 + len(chunk)] = mins
    return sig


def band_keys(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(D, bands) uint64 LSH band keys: an order-sensitive combine of each
    band's r signature values, salted with the band index so the same
    values in different bands never collide."""
    n_docs, p = sig.shape
    assert bands * rows_per_band == p
    out = np.empty((n_docs, bands), dtype=np.uint64)
    for b in range(bands):
        rows = [sig[:, b * rows_per_band + j] for j in range(rows_per_band)]
        out[:, b] = combine_rolling([np.full(n_docs, b, dtype=np.uint64), *rows])
    return out


def simhash64(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc from its shingle-hash set (unweighted:
    every shingle votes ±1 per bit; ties round up to 1)."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0 or len(values) == 0:
        return out
    # (M, 64) bit matrix; unpackbits works on uint8 view (big-endian per byte)
    bits = np.unpackbits(
        values.view(np.uint64).byteswap().view(np.uint8).reshape(-1, 8), axis=1
    )  # column 0 = MSB
    lens_all = offsets[1:] - offsets[:-1]
    nonempty = lens_all > 0
    starts = offsets[:-1][nonempty]
    ne_idx = np.flatnonzero(nonempty)
    # segmented 1-bit counts, chunked over columns to bound transient memory
    ones = np.zeros((n_docs, 64), dtype=np.int64)
    for c0 in range(0, 64, 16):
        ones[ne_idx, c0 : c0 + 16] = np.add.reduceat(
            bits[:, c0 : c0 + 16].astype(np.int64), starts, axis=0
        )
    lens = lens_all[:, None]
    majority = (ones * 2 >= lens) & (lens > 0)  # (D, 64) bool
    packed = np.packbits(majority.astype(np.uint8), axis=1)  # (D, 8) big-endian
    return packed.view(">u8").astype(np.uint64).reshape(-1)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between two uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via uint8 view + unpackbits-free table
    v = x.view(np.uint64).byteswap().view(np.uint8).reshape(len(x), 8)
    return _POPCNT[v].sum(axis=1).astype(np.int64)


_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard = fraction of agreeing permutations (row-wise
    over two (N, P) signature matrices)."""
    return (sig_a == sig_b).mean(axis=1)
