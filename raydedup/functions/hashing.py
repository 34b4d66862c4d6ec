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
