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

__all__ = ["acf", "ewma", "seasonal_decompose", "ohlc_bars", "rolling_stats"]


def ohlc_bars(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    bar: int | float = 3600,
    twap: bool = True,
) -> DataFrame:
    """Downsample an irregular series into fixed time buckets with the
    classic bar statistics: open/high/low/close, count, plain mean,
    and (optionally) the TIME-WEIGHTED average — the honest mean for
    irregular sampling, where a value "holds" until the next
    observation (each sample is weighted by its holding time inside
    the bar, the last sample of a bar by the time to the bar's end).

    Plan shape: one ordered window per series for the next-sample
    instant (``lead`` — the only raw-row exchange), then ONE
    map-side-combinable aggregation per (series, bucket). open/close
    are ``min_by``/``max_by`` on the sample instant — aggregate-based,
    no per-bucket ranking window, deterministic because (series, dim)
    pairs are unique in an event stream. At 100 TB this is the
    standard continuous-rollup shape: shuffle ∝ rows once, state ∝
    buckets.

    ``bar`` is in seconds for timestamp dims (else units of ``dim``).
    Output: ``[*by, bar_start, n, open, high, low, close, mean]``
    (+ ``twap``), with ``bar_start`` in epoch seconds (or ``dim``
    units).
    """
    by = list(by)
    if bar <= 0:
        raise ValueError(f"bar must be positive, got {bar}")
    in_dtype = dict(df.dtypes)[dim]
    if in_dtype.startswith("timestamp"):
        from ..functions.timeutil import epoch_us

        t = epoch_us(df, dim).cast("double") / F.lit(1_000_000.0)
    else:
        t = F.col(dim).cast("double")
    v = F.col(value).cast("double")
    src = df.select(*by, t.alias("_t"), v.alias("_v"))
    bucket = F.floor(F.col("_t") / F.lit(float(bar)))
    if twap:
        w = Window.partitionBy(*by).orderBy("_t")
        nxt = F.lead("_t").over(w)
        bar_end = (bucket + 1) * F.lit(float(bar))
        dt = F.least(F.coalesce(nxt, F.col("_t")), bar_end) - F.col("_t")
        src = src.withColumn("_dt", dt)
    src = src.withColumn("_bkt", bucket)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min_by("_v", "_t").alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max_by("_v", "_t").alias("close"),
        F.avg("_v").alias("mean"),
    ]
    if twap:
        aggs += [
            F.sum(F.col("_v") * F.col("_dt")).alias("_vdt"),
            F.sum("_dt").alias("_sdt"),
        ]
    out = src.groupBy(*by, "_bkt").agg(*aggs)
    cols = [
        *by,
        (F.col("_bkt") * F.lit(float(bar))).alias("bar_start"),
        "n",
        "open",
        "high",
        "low",
        "close",
        "mean",
    ]
    if twap:
        # a bar whose only samples sit exactly at its end has zero
        # total holding time — fall back to the plain mean there
        cols.append(
            F.when(F.col("_sdt") > 0, F.col("_vdt") / F.col("_sdt"))
            .otherwise(F.col("mean"))
            .alias("twap")
        )
    return out.select(*cols)


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


def seasonal_decompose(
    df: DataFrame,
    period: int,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    model: str = "additive",
) -> DataFrame:
    """Classical seasonal decomposition (the
    ``statsmodels.tsa.seasonal_decompose`` surface): per series,
    ``x = trend + seasonal + resid`` (additive) or
    ``x = trend · seasonal · resid`` (multiplicative).

    - trend: centered moving average over ``period`` samples (the
      even-period convention: the symmetric filter
      ``[0.5, 1, …, 1, 0.5]/period``); null within ``period//2`` of
      either edge, exactly like the reference implementation;
    - seasonal: per-phase mean of the detrended series, re-centered so
      the seasonal component sums to zero (additive) / averages to one
      (multiplicative) over a cycle, repeated across the series;
    - resid: what remains where the trend is defined.

    Pure Catalyst: the trend is one ordered-window frame average, the
    phase means one aggregation over ``(series, phase)`` joined back
    broadcast-style; total two exchanges, no Python.

    Output: ``[*by, idx, <dim>, <value>, trend, seasonal, resid]``.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if model not in ("additive", "multiplicative"):
        raise ValueError(f"model must be additive|multiplicative, got {model!r}")
    by = list(by)
    w = Window.partitionBy(*by).orderBy(dim)
    half = period // 2
    x = F.col(value).cast("double")
    if period % 2 == 0:
        # even period: [0.5, 1, ..., 1, 0.5] / period over 2·half+1 taps
        inner = F.sum(x).over(w.rowsBetween(-(half - 1), half - 1))
        trend_sum = inner + F.lit(0.5) * (
            F.lag(x, half).over(w) + F.lead(x, half).over(w)
        )
        n_ok = (
            F.count(x).over(w.rowsBetween(-half, half)) == 2 * half + 1
        )
        trend = F.when(n_ok, trend_sum / F.lit(float(period))).otherwise(
            F.lit(None)
        )
    else:
        n_ok = F.count(x).over(w.rowsBetween(-half, half)) == 2 * half + 1
        trend = F.when(
            n_ok, F.avg(x).over(w.rowsBetween(-half, half))
        ).otherwise(F.lit(None))
    idx = F.row_number().over(w) - 1
    base = df.select(*by, dim, x.alias(value)).withColumn("idx", idx).withColumn(
        "_trend", trend
    )
    detr = (
        (F.col(value) - F.col("_trend"))
        if model == "additive"
        else (F.col(value) / F.col("_trend"))
    )
    base = base.withColumn("_detr", detr).withColumn(
        "_phase", F.col("idx") % period
    )
    phase_means = base.groupBy(*by, "_phase").agg(
        F.avg("_detr").alias("_pm")
    )
    centering = phase_means.groupBy(*by).agg(F.avg("_pm").alias("_pc"))
    seasonal = (
        F.col("_pm") - F.col("_pc")
        if model == "additive"
        else F.col("_pm") / F.col("_pc")
    )
    joined = (
        base.join(phase_means, [*by, "_phase"])
        .join(F.broadcast(centering), by)
        .withColumn("seasonal", seasonal)
    )
    resid = (
        (F.col(value) - F.col("_trend") - F.col("seasonal"))
        if model == "additive"
        else (F.col(value) / F.col("_trend") / F.col("seasonal"))
    )
    return joined.select(
        *by,
        "idx",
        dim,
        value,
        F.col("_trend").alias("trend"),
        "seasonal",
        resid.alias("resid"),
    )


def rolling_stats(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    window: int | float = 3600,
    stats: Sequence[str] = ("count", "sum", "mean", "min", "max"),
) -> DataFrame:
    """Trailing time-range rolling statistics per series: for every
    row, aggregates over the events in ``[t − window, t]`` of the SAME
    series — the feature-engineering staple (activity in the last
    hour/day, trailing averages) on IRREGULAR event times, where
    row-count frames are wrong and a time-RANGE frame is the honest
    semantics.

    Plan shape: ONE ordered-window exchange per series; every
    requested statistic rides the same sort as a RANGE-frame window
    aggregate (``rangeBetween`` on the epoch-µs axis), so adding
    statistics is free. At 100 TB this is the canonical
    one-shuffle-per-feature-family shape; Spark's range frame scans
    each partition once with a sliding lower bound, O(n) per series
    amortized.

    ``stats`` may include ``"median"`` (r7): the exact rolling median
    over the time-range frame — the robust smoother for irregular
    series, sharing the same single ordered exchange.

    ``window`` is seconds for timestamp dims (else units of ``dim``).
    Output: ``[*by, t_us (epoch µs or scaled dim), value,
    roll_<stat>...]``, one row per input row.
    """
    by = list(by)
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    allowed = {"count", "sum", "mean", "min", "max", "median"}
    bad = set(stats) - allowed
    if bad:
        raise ValueError(f"unknown stats {sorted(bad)}; allowed: {sorted(allowed)}")
    in_dtype = dict(df.dtypes)[dim]
    if in_dtype.startswith("timestamp"):
        from ..functions.timeutil import epoch_us

        t = epoch_us(df, dim)
        span = int(round(window * 1_000_000))
    else:
        t = (F.col(dim).cast("double") * 1_000_000).cast("long")
        span = int(round(window * 1_000_000))
    v = F.col(value).cast("double")
    src = df.select(*by, t.alias("t_us"), v.alias(value))
    w = (
        Window.partitionBy(*by)
        .orderBy("t_us")
        .rangeBetween(-span, Window.currentRow)
    )
    fns = {
        "count": F.count(F.lit(1)),
        "sum": F.sum(value),
        "mean": F.avg(value),
        "min": F.min(value),
        "max": F.max(value),
        # exact linear-interpolation median as a RANGE-frame window
        # aggregate (r7) — the time-based rolling median medfilt's
        # index-based kernel cannot express on irregular instants
        "median": F.percentile(value, F.lit(0.5)),
    }
    cols = [fns[s_].over(w).alias(f"roll_{s_}") for s_ in stats]
    return src.select(*by, "t_us", value, *cols)
