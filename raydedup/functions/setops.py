"""Batched sorted-set intersection + Jaccard — the engine's heart.

The reference computes ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|`` per pair via an
iterate-smaller-row / binary-search-larger-row kernel over sorted CSR
rows (jaccard.cpp:332-367, 473-508, 715-739), with the score formed as
``J = Wi / (Ws − Wi)`` where ``Ws = |A| + |B|`` (jaccard.cpp:614-619,
740-741).  Recast for batch-vectorized Arrow execution: both sides of
every pair are concatenated with a pair index, lexsorted, and the
intersection sizes read off as counts of adjacent duplicates — one
O(n log n) vector pass for the *whole batch* of pairs, no per-pair
Python loop.  Requires the same invariant as the reference: each set is
sorted and duplicate-free (enforced by functions/text.py).
"""

from __future__ import annotations

import numpy as np


def pairwise_intersection_sizes(
    a_values: np.ndarray,
    a_offsets: np.ndarray,
    b_values: np.ndarray,
    b_offsets: np.ndarray,
) -> np.ndarray:
    """Intersection size per pair i of sets A_i and B_i (CSR layout).

    Each A_i / B_i must be duplicate-free (order actually irrelevant for
    this kernel, but upstream guarantees sorted-unique).  Returns int64
    array of len n_pairs.
    """
    n_pairs = len(a_offsets) - 1
    len_a = a_offsets[1:] - a_offsets[:-1]
    len_b = b_offsets[1:] - b_offsets[:-1]

    pid_a = np.repeat(np.arange(n_pairs, dtype=np.int64), len_a)
    pid_b = np.repeat(np.arange(n_pairs, dtype=np.int64), len_b)
    vals = np.concatenate([a_values, b_values])
    pids = np.concatenate([pid_a, pid_b])
    if len(vals) == 0:
        return np.zeros(n_pairs, dtype=np.int64)

    order = np.lexsort((vals, pids))
    sv = vals[order]
    sp = pids[order]
    dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    return np.bincount(sp[1:][dup], minlength=n_pairs).astype(np.int64)


def pairwise_jaccard(
    a_values: np.ndarray,
    a_offsets: np.ndarray,
    b_values: np.ndarray,
    b_offsets: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(intersection, union, jaccard) per pair.  J = Wi / (Ws - Wi) with
    Ws = |A|+|B| — the reference's sum-minus-intersection formula
    (jaccard.cpp:614-619).  Empty-union pairs score 0.0."""
    inter = pairwise_intersection_sizes(a_values, a_offsets, b_values, b_offsets)
    ws = (a_offsets[1:] - a_offsets[:-1]) + (b_offsets[1:] - b_offsets[:-1])
    union = ws - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    return inter, union.astype(np.int64), j


def pairwise_weighted_jaccard(
    a_values: np.ndarray,
    a_offsets: np.ndarray,
    b_values: np.ndarray,
    b_offsets: np.ndarray,
    weight_of: dict | np.ndarray | None = None,
    *,
    lookup=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Weighted variant: Wi = Σ w(x) over shared x; vol(S) = Σ w(x) over S;
    J = Wi / (vol(A)+vol(B) − Wi) — mirrors the reference's weighted path
    (jaccard.cpp:253-256, 346-351, 614-619).

    ``lookup`` maps an element array → weight array (vectorized); default
    weight 1.0 reduces to the unweighted kernel.
    """
    if lookup is None:
        if weight_of is None:
            def lookup(x):
                return np.ones(len(x), dtype=np.float64)
        elif isinstance(weight_of, np.ndarray):
            def lookup(x, _w=weight_of):
                return _w[np.asarray(x, dtype=np.int64)]
        else:
            def lookup(x, _w=weight_of):
                return np.array([_w[v] for v in x], dtype=np.float64)

    n_pairs = len(a_offsets) - 1
    wa = lookup(a_values)
    wb = lookup(b_values)
    # segment sums via cumsum-at-offsets (reduceat mishandles empty segments)
    ca = np.concatenate([[0.0], np.cumsum(wa)])
    cb = np.concatenate([[0.0], np.cumsum(wb)])
    vol_a = ca[a_offsets[1:]] - ca[a_offsets[:-1]]
    vol_b = cb[b_offsets[1:]] - cb[b_offsets[:-1]]

    # shared-element weight: same lexsort trick, summing weights of dups
    len_a = a_offsets[1:] - a_offsets[:-1]
    len_b = b_offsets[1:] - b_offsets[:-1]
    pid = np.concatenate([
        np.repeat(np.arange(n_pairs, dtype=np.int64), len_a),
        np.repeat(np.arange(n_pairs, dtype=np.int64), len_b),
    ])
    vals = np.concatenate([a_values, b_values])
    wts = np.concatenate([wa, wb])
    wi = np.zeros(n_pairs, dtype=np.float64)
    if len(vals):
        order = np.lexsort((vals, pid))
        sv, sp, sw = vals[order], pid[order], wts[order]
        dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
        np.add.at(wi, sp[1:][dup], sw[1:][dup])

    ws = vol_a + vol_b
    wu = ws - wi
    with np.errstate(divide="ignore", invalid="ignore"):
        j = np.where(wu > 0, wi / np.where(wu > 0, wu, 1.0), 0.0)
    return wi, wu, j
