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

import numpy as np
import pandas as pd

_U64 = np.uint64

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    x = x.astype(np.uint64, copy=True)
    x += _SM_GAMMA
    x = (x ^ (x >> _U64(30))) * _SM_M1
    x = (x ^ (x >> _U64(27))) * _SM_M2
    return x ^ (x >> _U64(31))


def hash_strings(values) -> np.ndarray:
    """Stable uint64 hash of a sequence/array of Python strings."""
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_HASH_FULL_PREFIX = 48  # bytes hashed exactly; longer tokens add length
# + last-8-bytes mix (see below)


def hash_utf8_array(arr) -> np.ndarray:
    """Deterministic uint64 hash of an Arrow string array, computed
    directly on the Arrow buffers — no per-token Python objects (the
    object-array path allocates one PyObject per token, which dominates
    tokenization cost and contends the allocator across workers).

    Byte-exact FNV-1a over the first _HASH_FULL_PREFIX bytes, mixed with
    the length and the last 8 bytes, splitmix-finalized.  Tokens that
    differ anywhere in the first 48 bytes, the last 8 bytes, or in
    length always hash differently.
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

    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    max_j = int(min(lens.max() if n else 0, _HASH_FULL_PREFIX))
    for j in range(max_j):
        m = lens > j
        if not m.any():
            break
        b = data[starts[m] + j].astype(np.uint64)
        h[m] = (h[m] ^ b) * _FNV_PRIME
    # tail mix: length + last 8 bytes (covers long-token suffix changes)
    long = lens > _HASH_FULL_PREFIX
    if long.any():
        tail = np.zeros(int(long.sum()), dtype=np.uint64)
        ends = starts[long] + lens[long]
        for k in range(8):
            tail = (tail << np.uint64(8)) | data[ends - 8 + k].astype(np.uint64)
        h[long] ^= splitmix64(tail)
    return splitmix64(h ^ lens.astype(np.uint64))


def hash_int64(values: np.ndarray) -> np.ndarray:
    """Stable uint64 hash of an int64/uint64 array."""
    return splitmix64(np.asarray(values).view(np.uint64)
                      if np.asarray(values).dtype == np.int64
                      else np.asarray(values, dtype=np.uint64))


def perm_seeds(num_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation 64-bit seeds from the config seed."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=num_perms, dtype=np.uint64)


def combine_rolling(parts: list[np.ndarray]) -> np.ndarray:
    """Order-sensitive combine of k parallel uint64 arrays into one.

    Used to hash a k-token shingle window: h = mix(h ^ part_j) folded
    left-to-right, so ('a b', 'b a') hash differently.
    """
    h = np.zeros(len(parts[0]) if parts else 0, dtype=np.uint64)
    for p in parts:
        h = splitmix64(h ^ p.astype(np.uint64, copy=False))
    return h
