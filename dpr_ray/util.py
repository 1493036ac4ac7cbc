"""Small shared numeric helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6) -> np.ndarray:
    """Round half AWAY from zero (SQL ROUND semantics; numpy rounds half to
    even — the two disagree exactly on .5 boundaries, which ratio-valued
    columns hit often). Used for every float the DuckDB oracle reproduces."""
    scale = 10.0 ** decimals
    a = np.asarray(x, dtype=np.float64) * scale
    return np.sign(a) * np.floor(np.abs(a) + 0.5) / scale


def to_i6(x) -> np.ndarray:
    """round(x * 1e6) as int64 with SQL ROUND (half-away) semantics."""
    a = np.asarray(x, dtype=np.float64) * 1e6
    return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)
