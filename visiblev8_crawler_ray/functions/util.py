"""Small numeric helpers shared across pipelines."""

from __future__ import annotations

import numpy as np


def round_half_away(x, nd: int):
    """Round half away from zero — DuckDB's round() semantics.

    numpy/pandas round half-to-even, which diverges from the SQL oracles
    exactly on representable boundaries (e.g. 1/32 at 4 decimals).
    """
    m = 10.0 ** nd
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * m + 0.5) / m
