"""Deterministic, vectorized 64-bit hashing primitives.

Everything downstream (shingles, MinHash, SimHash, LSH band keys) is
built on two deterministic hash families:

* ``hash_strings`` — a stable uint64 hash of arbitrary strings
  (pandas' SipHash-based ``hash_array`` with its fixed default key —
  deterministic across processes and runs).
* ``splitmix64`` — a fixed avalanche mix used to derive per-permutation
  hash functions ``h_i(x) = mix(x XOR seed_i)`` and to combine k token
  hashes into one shingle hash.

All functions operate on whole numpy arrays; no Python per-row loops.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pandas as pd

_U64 = np.uint64

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array.

    Written with in-place ops over ONE scratch buffer: the naive
    expression allocates 7 temporaries per call, and this function sits
    in every hot kernel — on a 32-worker node the signature stage is
    DRAM-bandwidth-bound, so temporary churn directly costs throughput.
    """
    x = x.astype(np.uint64, copy=True)
    x += _SM_GAMMA
    t = x >> _U64(30)
    x ^= t
    x *= _SM_M1
    np.right_shift(x, _U64(27), out=t)
    x ^= t
    x *= _SM_M2
    np.right_shift(x, _U64(31), out=t)
    x ^= t
    return x


def hash_strings(values) -> np.ndarray:
    """Stable uint64 hash of a sequence/array of Python strings."""
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


def md5_lower64_array(arr) -> np.ndarray:
    """uint64 per string = the low 8 bytes of its md5 digest read
    little-endian — chosen because it equals DuckDB 1.0's
    ``md5_number_lower(s)`` exactly (verified incl. '' and non-ASCII),
    which makes any signature derived from it SQL-oracle-checkable.

    This is the ORACLE-LEG hash family: production paths keep the
    buffer-level ``hash_utf8_array`` kernel.  Cost is bounded by
    dictionary-encoding the Arrow array first so md5 runs once per
    DISTINCT token in the batch (crawl text repeats tokens heavily);
    the gather back to token positions is one numpy take.
    """
    import hashlib

    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    enc = arr.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    hv = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[8:16],
                        "little") for u in uniq),
        dtype=np.uint64, count=len(uniq))
    idx = np.asarray(enc.indices, dtype=np.int64)
    return hv[idx]


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_WORD_PRIME = np.uint64(0x9E3779B97F4A7C15)   # odd → (h^w)*P bijective


def hash_utf8_array(arr) -> np.ndarray:
    """Deterministic uint64 hash of an Arrow string array, computed
    directly on the Arrow buffers — no per-token Python objects (the
    object-array path allocates one PyObject per token, which dominates
    tokenization cost and contends the allocator across workers).

    Wordwise multiply-xor chain over ALL bytes of every token, mixed
    with the length, splitmix-finalized (``hash_over_slices``): ~8x
    fewer vector passes than the earlier per-byte FNV-1a loop, which
    was the measured dominant cost of the signature stage.  Collision
    probability between distinct tokens is the generic ~2^-64 — no
    deterministic collision class (the chain is bijective per word;
    for <=8-byte tokens the whole map is a bijection of (bytes, len)).
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset:
                                                   arr.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    starts = offs[:-1].astype(np.int64)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    return hash_over_slices(data, starts, lens)


# low 8r bits set, r in [0, 8] — the final-word mask by remaining bytes
_TAIL_MASK = np.array([(1 << (8 * r)) - 1 for r in range(8)] + [2**64 - 1],
                      dtype=np.uint64)


def hash_over_slices(data: np.ndarray, starts: np.ndarray,
                     lens: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of ``len(starts)`` byte slices of
    ``data`` — the shared core of hash_utf8_array and the byte-level
    tokenizer (so stages that compare token hashes against hashed
    string tables, e.g. LangIdStage, stay consistent by construction).

    Wordwise: each slice is consumed as little-endian 8-byte words
    through a multiply-xor chain ``h = (h ^ w) * P`` (P odd — bijective
    per step), length-mixed and splitmix-finalized.  The FINAL word is
    the 8 bytes ENDING at the slice end (an overlapped read — every
    byte is still covered, no per-position masking); slices under 8
    bytes use one lookup-table-masked word.  ~8x fewer vector passes
    than a per-byte loop, and the vast majority of tokens (<=8 bytes)
    finish in the single unconditionally-vectorized final pass.
    Unaligned u64 gathers come from a 1-byte-stride view of a
    zero-padded copy of ``data`` (one memcpy).
    """
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # pad-copy only the addressed region: ``data`` is often the FULL
    # text buffer of a parent block while starts/lens address one
    # zero-copy chunk slice of it — copying the whole parent per chunk
    # would be quadratic over the block
    lo = int(starts.min())
    hi = int((starts + lens).max())
    if lo > 0 or hi < len(data):
        data = data[lo:hi]
        starts = starts - lo
    padded = np.concatenate([data, np.zeros(8, np.uint8)])
    u64 = np.ndarray(shape=(len(padded) - 7,), dtype=np.uint64,
                     buffer=padded.data, strides=(1,))
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    # final (or only) word of every slice
    fin = np.where(lens >= 8, starts + lens - 8, starts)
    wlast = u64[fin] & _TAIL_MASK[np.minimum(lens, 8)]
    # non-final words, front to back, unmasked; `active` shrinks to the
    # long tail, so pass j costs O(#slices longer than 8(j+1) bytes)
    active = np.flatnonzero(lens > 8)
    j = 0
    while len(active):
        w = u64[starts[active] + np.int64(8 * j)]
        h[active] = (h[active] ^ w) * _WORD_PRIME
        j += 1
        active = active[lens[active] > 8 * (j + 1)]
    h = (h ^ wlast) * _WORD_PRIME
    return splitmix64(h ^ lens.astype(np.uint64))


# kept as the historical name some notes refer to; same kernel
fnv1a_over_slices = hash_over_slices


def hash_int64(values: np.ndarray) -> np.ndarray:
    """Stable uint64 hash of an int64/uint64 array."""
    return splitmix64(np.asarray(values).view(np.uint64)
                      if np.asarray(values).dtype == np.int64
                      else np.asarray(values, dtype=np.uint64))


def perm_seeds(num_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation 64-bit seeds from the config seed.
    Memoized per worker: callers sit inside per-batch map fns (e.g.
    decontam's _match_batch), and PCG64 init per batch is measurable."""
    return _perm_seeds_cached(num_perms, seed)


@_functools.lru_cache(maxsize=16)
def _perm_seeds_cached(num_perms: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = rng.integers(0, 2**64, size=num_perms, dtype=np.uint64)
    out.setflags(write=False)
    return out


def _splitmix64_inplace(x: np.ndarray, t: np.ndarray) -> None:
    """splitmix64 on ``x`` in place, using caller-provided scratch ``t``."""
    x += _SM_GAMMA
    np.right_shift(x, _U64(30), out=t)
    x ^= t
    x *= _SM_M1
    np.right_shift(x, _U64(27), out=t)
    x ^= t
    x *= _SM_M2
    np.right_shift(x, _U64(31), out=t)
    x ^= t


# Rabin-Karp window hashing: B odd → invertible mod 2^64, so every
# window hash is two cumulative passes + O(1) per window instead of the
# k-fold splitmix combine (~6 array passes total vs ~35 at k=5; measured
# 2.7x faster and proportionally less DRAM traffic — the single-socket
# bandwidth ceiling is the scaling bottleneck, BASELINE.md).
_RK_B = np.uint64(0x9E3779B97F4A7C15)
_RK_BINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 2 ** 64))


def window_hash_stream(tok_hashes: np.ndarray, k: int) -> np.ndarray:
    """Hash of every length-k window over a token-hash stream:
    ``W(i) = Σ_j tok[i+j] · B^(k-1-j) mod 2^64`` (Horner), order-
    sensitive like the splitmix fold it replaces.  Tokens are already
    64-bit FNV-1a hashes, so the linear combine's dispersion is
    sufficient for set elements; consumers needing avalanche (OPH bin
    assignment) re-mix with splitmix64 downstream anyway.

    Returns a len ``n-k+1`` uint64 array.
    """
    n = len(tok_hashes)
    n_win = n - k + 1
    if n_win <= 0:
        return np.empty(0, dtype=np.uint64)
    powB = np.empty(n, dtype=np.uint64)
    powB[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _RK_B, np.uint64), out=powB[1:])
    invp = np.empty(n, dtype=np.uint64)
    invp[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _RK_BINV, np.uint64), out=invp[1:])
    pref = np.empty(n + 1, dtype=np.uint64)
    pref[0] = 0
    np.cumsum(tok_hashes * invp, out=pref[1:])
    return (pref[k:] - pref[:-k]) * powB[k - 1:]


def combine_rolling(parts: list[np.ndarray]) -> np.ndarray:
    """Order-sensitive combine of k parallel uint64 arrays into one.

    Used to hash a k-token shingle window: h = mix(h ^ part_j) folded
    left-to-right, so ('a b', 'b a') hash differently.  One accumulator
    + one scratch buffer for the whole fold (k=5 would otherwise
    allocate ~40 temporaries' worth of bandwidth).
    """
    n = len(parts[0]) if parts else 0
    h = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return h
    t = np.empty(n, dtype=np.uint64)
    for p in parts:
        h ^= p
        _splitmix64_inplace(h, t)
    return h
