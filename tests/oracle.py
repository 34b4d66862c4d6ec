"""Pure-Python brute-force oracle — the compareCoords analogue.

Independent of the engine's hashed kernels: shingles are literal token
tuples in Python sets, Jaccard is len(A&B)/len(A|B).  Used as the golden
reference for recall/score-tolerance gates (SURVEY.md §5.2), the same
role compareCoords.cpp plays for the SYCL implementations.
"""

from __future__ import annotations


def shingle_set(text: str, k: int) -> set[tuple[str, ...]]:
    toks = text.split(" ")
    if len(toks) < k:
        return set()
    return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def true_dup_pairs(texts: dict[int, str], k: int, threshold: float
                   ) -> dict[tuple[int, int], float]:
    """All-pairs exact Jaccard ≥ threshold (quadratic — small inputs only).

    Exact size-bound prune: J(A,B) ≤ min/max of the set sizes, so pairs
    whose size ratio is below the threshold are skipped unexamined.
    Union size via |A|+|B|−|A∩B| (the reference's Ws−Wi identity).
    """
    sets = {i: shingle_set(t, k) for i, t in texts.items()}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        sa = sets[a]
        la = len(sa)
        if not la:
            continue
        for b in ids[i + 1:]:
            sb = sets[b]
            lb = len(sb)
            if not lb or min(la, lb) < threshold * max(la, lb):
                continue
            inter = len(sa & sb) if la <= lb else len(sb & sa)
            j = inter / (la + lb - inter)
            if j >= threshold:
                out[(a, b)] = j
    return out


def union_find_components(pairs) -> dict[int, int]:
    """Ground-truth connected components (min-id label) over a pair list."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}
