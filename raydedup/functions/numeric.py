"""Scalar-math helpers shared by oracle-compared outputs.

The engine's integer micro-unit columns (``*_e6``, ``*_cents``) are
produced by rounding a double; DuckDB's ``round()`` rounds halves AWAY
FROM ZERO while both ``np.round`` and pyarrow's default round mode are
half-to-even (banker's rounding).  Every oracle-feeding conversion must
use the away-from-zero form or a value landing exactly on .5 silently
hash-mismatches (ADVICE r4; unobservable on 2-decimal TPC-H data but
latent everywhere a cosine is scaled).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round halves away from zero — DuckDB ``round()`` semantics
    (pyarrow's ``round_mode="half_towards_infinity"``)."""
    return np.copysign(np.floor(np.abs(x) + 0.5), x)
