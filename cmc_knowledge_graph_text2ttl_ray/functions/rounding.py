"""Rounding helpers matching DuckDB's ROUND (half away from zero).

numpy's ``round`` and pyarrow's default round mode are half-to-even; the
correctness oracle runs in DuckDB, so every rounded column the engine emits
uses these helpers to avoid boundary flips."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc

__all__ = ["round_half_away", "pc_round"]


def round_half_away(x, ndigits: int):
    """Vectorized round-half-away-from-zero (DuckDB semantics)."""
    x = np.asarray(x, dtype=np.float64)
    f = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def pc_round(arr, ndigits: int):
    """pyarrow round with DuckDB-compatible mode."""
    return pc.round(arr, ndigits=ndigits, round_mode="half_towards_infinity")
