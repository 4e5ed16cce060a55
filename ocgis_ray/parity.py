"""Float-parity helpers shared by engine kernels and oracle SQL.

The driver's correctness gate hash-compares values, so float outputs
must be BIT-identical to what DuckDB computes.  DuckDB's ``round(x, d)``
on DOUBLE is round-half-away-from-zero implemented as
``trunc(x * 10^d + copysign(0.5, x)) / 10^d`` (verified empirically,
exact on 20k random + exact-binary-half samples); numpy's ``np.round``
is banker's (half-to-even) and DIFFERS on exact halves — which clip
areas and char ratios hit routinely (binary-fraction cell sizes).

Every oracle-facing rounding in the engine goes through
:func:`sql_round`.
"""

from __future__ import annotations

import numpy as np


def sql_round(x: np.ndarray | float, digits: int) -> np.ndarray:
    """Bit-exact mirror of DuckDB ``round(x_double, digits)``."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** digits
    scaled = x * p
    return np.trunc(scaled + np.copysign(0.5, scaled)) / p
