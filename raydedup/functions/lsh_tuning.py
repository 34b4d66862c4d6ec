"""LSH band-geometry tuning: pick (bands, rows) for a target Jaccard
threshold.

The standard S-curve analysis (Leskovec/Rajaraman/Ullman, *Mining of
Massive Datasets* §3.4, public): with b bands of r rows, a pair with
Jaccard s collides with probability ``1 − (1 − s^r)^b``, and the curve's
inflection sits near ``(1/b)^(1/r)``.  The engine's default 32×4 over
128 permutations targets τ=0.8; this module makes the choice a library
surface so callers running at other thresholds (0.5 fuzzy dedup, 0.9
strict) get a principled geometry instead of hand-tuning
``PipelineConfig(bands=, rows=)``.

Pure functions, no Ray — tested directly in tests/test_lsh_tuning.py.
"""

from __future__ import annotations


def collision_probability(s: float, bands: int, rows: int) -> float:
    """P[candidate] for a pair with true Jaccard ``s`` under b×r
    banding: 1 − (1 − s^r)^b."""
    if not 0.0 <= s <= 1.0:
        raise ValueError(f"jaccard s={s} outside [0, 1]")
    return 1.0 - (1.0 - s ** rows) ** bands


def curve_threshold(bands: int, rows: int) -> float:
    """The S-curve's approximate inflection point (1/b)^(1/r) — the
    similarity at which collision probability rises steeply."""
    return (1.0 / bands) ** (1.0 / rows)


def choose_bands(threshold: float, n_perm: int = 128, *,
                 fn_weight: float = 50.0,
                 exact: bool = True) -> tuple[int, int]:
    """→ (bands, rows) minimizing the weighted error
    fn_weight·P[miss at s=threshold] + P[hit at s=threshold/2].

    ``exact=True`` (default) considers only rows dividing n_perm, the
    engine's PipelineConfig invariant (bands·rows_per_band ==
    num_perms); the result drops straight into
    ``cfg.with_(bands=b, rows_per_band=r)``.

    ``fn_weight`` ≫ 1 biases against false negatives — a missed dup
    survives dedup forever, while a false candidate only costs one
    exact verification (the engine always re-verifies, so candidate
    precision is a cost knob, not a correctness knob).  At the default
    weight the chooser recovers the shipped 32×4 geometry for τ=0.8.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold={threshold} outside (0, 1)")
    if n_perm < 2:
        raise ValueError("need at least 2 permutations")
    best, best_cost = None, float("inf")
    for rows in range(1, n_perm + 1):
        if exact and n_perm % rows != 0:
            continue
        bands = n_perm // rows
        if bands < 1:
            break
        p_miss = 1.0 - collision_probability(threshold, bands, rows)
        p_fp = collision_probability(threshold / 2.0, bands, rows)
        cost = fn_weight * p_miss + p_fp
        if cost < best_cost:
            best, best_cost = (bands, rows), cost
    return best
