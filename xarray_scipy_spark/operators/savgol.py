"""Savitzky–Golay filtering as PURE Catalyst expressions
(``scipy.signal.savgol_filter`` with the default ``mode='interp'``
semantics, including ``deriv``/``delta``).

Savitzky–Golay is linear: every output sample is a fixed dot product
of nearby input samples, with three coefficient sets — the classic
centered taps for interior samples, and per-position edge rows from
fitting a ``polyorder`` polynomial to the FIRST (resp. LAST)
``window_length`` samples and evaluating it (or its ``deriv``-th
derivative) at the edge positions, which is exactly scipy's
``mode='interp'``. All three are tiny driver-side matrices
(``pinv`` of a ``window_length × (polyorder+1)`` Vandermonde); the
runtime plan is a single window exchange with lead/lag dot products
and a position CASE — zero Python, fully codegen'd, the same shape as
``convolve_fir``.

Series shorter than ``window_length`` have no well-defined interp-mode
answer (scipy raises); here their rows are emitted with the same
expressions over zero-defaulted leads/lags — callers filtering such
series should do so upstream (a per-series length check would force a
second aggregate over every series to protect a degenerate case).
"""

from __future__ import annotations

from collections.abc import Sequence
from math import factorial

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["savgol_filter", "savgol_coeff_matrices"]


def savgol_coeff_matrices(
    window_length: int, polyorder: int, deriv: int = 0, delta: float = 1.0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return ``(interior, head, tail)`` coefficient rows.

    ``interior``: length-``window_length`` centered taps (dot with the
    samples at offsets ``-h..h``). ``head[i]``/``tail[i]`` for
    ``i < h``: dot rows over the first/last ``window_length`` samples
    giving output positions ``i`` / ``n-1-i``. Derivative evaluation
    rows follow the polynomial-basis derivative
    ``k!/(k-d)! · t^(k-d)``, scaled by ``delta**-deriv`` (scipy).
    """
    w, m, d = int(window_length), int(polyorder), int(deriv)
    if w < 1 or w % 2 == 0:
        raise ValueError(f"window_length must be a positive odd integer, got {w}")
    if m >= w:
        raise ValueError("polyorder must be less than window_length")
    if d > m:
        raise ValueError("deriv must not exceed polyorder")
    h = w // 2
    scale = float(delta) ** (-d)

    def eval_row(positions: np.ndarray, t: float) -> np.ndarray:
        vand = positions[:, None] ** np.arange(m + 1)[None, :]
        pinv = np.linalg.pinv(vand)  # (m+1, w)
        basis = np.zeros(m + 1)
        for k in range(d, m + 1):
            basis[k] = factorial(k) / factorial(k - d) * t ** (k - d)
        return scale * (basis @ pinv)

    centered = np.arange(w, dtype=float) - h
    first = np.arange(w, dtype=float)
    interior = eval_row(centered, 0.0)
    head = np.stack([eval_row(first, float(i)) for i in range(h)])
    tail = np.stack([eval_row(first, float(w - 1 - i)) for i in range(h)])
    return interior, head, tail


def savgol_filter(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    window_length: int = 7,
    polyorder: int = 2,
    deriv: int = 0,
    delta: float = 1.0,
    out: str = "value_sg",
) -> DataFrame:
    """Savitzky–Golay smooth/derivative along ``dim`` with scipy's
    ``mode='interp'`` edge handling. Adds ``out``; one window exchange,
    everything closed-form Catalyst."""
    interior, head, tail = savgol_coeff_matrices(
        window_length, polyorder, deriv, delta
    )
    w = int(window_length)
    h = w // 2
    by = list(by)
    win = Window.partitionBy(*by).orderBy(dim)
    part = Window.partitionBy(*by)
    x = F.col(value).cast("double")

    def shifted(off: int):
        if off > 0:
            return F.lead(x, off, 0.0).over(win)
        if off < 0:
            return F.lag(x, -off, 0.0).over(win)
        return x

    def dot(pairs) -> F.Column:
        acc = F.lit(0.0)
        for off, c in pairs:
            acc = acc + F.lit(float(c)) * shifted(off)
        return acc

    pos = F.row_number().over(win) - 1
    n = F.count(F.lit(1)).over(part)
    # interior: offsets -h..h around the current row
    expr = dot([(j - h, interior[j]) for j in range(w)])
    # tail rows first so that, on series shorter than 2h+1 where a row
    # is both "head" and "tail", head wins (checked first below)
    for i in range(h):
        # output n-1-i: sample j of the last w sits at offset j-w+1+i
        expr = F.when(
            pos == n - 1 - i, dot([(j - w + 1 + i, tail[i][j]) for j in range(w)])
        ).otherwise(expr)
    for i in range(h):
        # output i: sample j of the first w sits at offset j-i
        expr = F.when(
            pos == i, dot([(j - i, head[i][j]) for j in range(w)])
        ).otherwise(expr)
    return df.withColumn(out, expr)
