"""Classical time-series statistics: autocorrelation and exponential
smoothing — the per-series feature extractors between raw signals and
models (seasonality detection, decay profiling, trend features).

No reference analog (the reference stops at spectral transforms); both
operators reuse this engine's established machinery: ``acf`` is pure
Catalyst (one ordered-window exchange, lag products as window sums),
``ewma`` routes through the verified ragged ``lfilter`` kernel (an
exponential moving average IS the one-pole IIR filter
``y[t] = (1−α)·y[t−1] + α·x[t]``).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["acf", "ewma"]


def acf(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    nlags: int = 10,
) -> DataFrame:
    """Sample autocorrelation per series at lags ``0..nlags``
    (statsmodels convention: mean-centered, denominator ``n`` at every
    lag — the biased estimator, which keeps the sequence positive
    semidefinite).

    Plan: ONE ordered-window exchange per series computes the centered
    values; each lag's cross-product sum is a window aggregate over
    the SAME exchange (lag() + sum — no extra shuffle per lag), then
    one per-series aggregation emits the ``nlags + 1`` rows. Shuffle
    volume ∝ samples once, plus series × lags result rows.

    Output: ``[*by, lag, acf]`` with ``acf`` = r_k ∈ [−1, 1], r_0 = 1.
    """
    if nlags < 1:
        raise ValueError(f"nlags must be >= 1, got {nlags}")
    by = list(by)
    w = Window.partitionBy(*by).orderBy(dim)
    mean = F.avg(value).over(Window.partitionBy(*by))
    src = df.select(*by, dim, (F.col(value) - mean).alias("_d"))
    lag_cols = [
        (F.col("_d") * F.lag("_d", k).over(w)).alias(f"_p{k}")
        for k in range(1, nlags + 1)
    ]
    prods = src.select(*by, "_d", *lag_cols)
    aggs = [
        F.sum(F.col("_d") * F.col("_d")).alias("_c0"),
        F.count(F.lit(1)).alias("_n"),
    ] + [F.sum(f"_p{k}").alias(f"_c{k}") for k in range(1, nlags + 1)]
    g = prods.groupBy(*by).agg(*aggs)
    per_lag = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                (
                    F.when(F.col("_c0") > 0, F.col(f"_c{k}") / F.col("_c0"))
                    .otherwise(F.lit(0.0))
                    if k
                    else F.lit(1.0)
                ).alias("acf"),
            )
            for k in range(nlags + 1)
        ]
    )
    return g.select(*by, F.explode(per_lag).alias("_l")).select(
        *by, "_l.lag", "_l.acf"
    )


def ewma(
    df: DataFrame,
    alpha: float,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    adjust: bool = False,
    keep_attrs: bool | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per series (the
    pandas/statsmodels ``ewm(alpha=...).mean()`` surface).

    ``adjust=False`` (the recursive form) is exactly the one-pole IIR
    ``lfilter([α], [1, −(1−α)])`` seeded so ``y[0] = x[0]``;
    ``adjust=True`` divides that same filter's response to the signal
    by its response to a ones series (the finite-window weight
    normalization) — two passes through the SAME verified ragged
    lfilter kernel, one exchange (the second filter rides the same
    grouped batch).

    Output: ``[*by, idx, <dim>, ewma]``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from .filters import lfilter

    al = float(alpha)
    b = [al]
    a = [1.0, -(1.0 - al)]
    z = lfilter(b, a, df, by=by, dim=dim, value=value, keep_attrs=keep_attrs)
    if adjust:
        # adjust=True: weights renormalized over the samples seen so
        # far — the zero-state filter response to a ones series is
        # exactly the running weight sum (scaled by α), so the ratio
        # of the two responses IS the adjusted mean. The closed form
        # Σ(1-α)^k over k=0..t = (1 - (1-α)^(t+1))/α makes the
        # denominator a pure projection — no second kernel pass.
        den = (F.lit(1.0) - F.pow(F.lit(1.0 - al), F.col("idx") + 1)) / F.lit(al)
        return z.select(
            *by, "idx", dim, (F.col("value") / (F.lit(al) * den)).alias("ewma")
        )
    # adjust=False (the recursion y[0]=x[0], y[t]=(1-α)y[t-1]+αx[t]):
    # the zero-state filter starts at α·x[0]; the missing (1-α)·x[0]
    # propagates through the same one-pole recursion, so the exact
    # correction is (1-α)^t · (1-α) · x[0] — a pure projection using
    # the series' first FILTERED value (z[0] = α·x[0] ⇒ x[0] = z[0]/α)
    w = Window.partitionBy(*by).orderBy("idx")
    x0 = F.first("value").over(w.rowsBetween(Window.unboundedPreceding, 0)) / F.lit(al)
    corr = F.pow(F.lit(1.0 - al), F.col("idx")) * F.lit(1.0 - al) * x0
    return z.select(*by, "idx", dim, (F.col("value") + corr).alias("ewma"))
