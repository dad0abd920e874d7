"""Lomb–Scargle periodogram: spectra of IRREGULARLY sampled series.

Every FFT-family operator in this engine assumes an equispaced ``dim``
(the reference inherits the same assumption through `_compute_delta`,
signal.py:16-17). Real event streams are irregular; the two honest
options are regularize first (:func:`~xarray_scipy_spark.operators.
timegrid.gapfill`, which interpolates — fine for dense gaps, biased
for sparse ones) or estimate the spectrum directly on the irregular
samples. Lomb–Scargle (Lomb 1976, Scargle 1982; the
``scipy.signal.lombscargle`` surface) is the standard for the latter.

Plan shape (r7 — the measured story, BASELINE.md "lombscargle"):
the textbook formula needs the per-frequency phase offset ``tau``
BEFORE the data sums, and ``precenter`` naively needs the per-series
mean before them too — two extra shuffles. Both fold away:

- the angle-addition identities collapse tau into pure projection
  trigonometry over per-(series, freq) aggregate sums;
- mean subtraction moves into ALGEBRA: alongside the five trig sums
  the aggregation carries Σcos, Σsin, n, Σy, Σy², and the projection
  centers exactly (Σ(y−μ)cos = Σy·cos − μ·Σcos, Σ(y−μ)² = Σy² − nμ²).

So the whole operator is: explode the literal frequency list (no
join, no shuffle for the expansion), ONE map-side-combinable
aggregation of ten plain sums, projection trig on the tiny 10-sum
rows. No window, no Python, everything whole-stage codegen; shuffle
volume = series × frequencies rows, never sample-proportional.

r7 measured three shapes at the 100× tier (10 M rows × 150 k series,
properly split parquet): this one 1.9 s; an Arrow/numpy partial-sum
``mapInPandas`` variant 4.4 s (the JVM→Python Arrow transfer alone is
3.5 s on this host — a floor no batched-Python design can beat); and
the r6 shape (explode + a precenter WINDOW over every raw row) 9.0 s,
whose cost had been misattributed to JVM trig throughput. The window
was the bottleneck; with it gone the codegen path is within 1.6× of
the single-node oracle and scales embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["lombscargle"]


def lombscargle(
    df: DataFrame,
    freqs: Sequence[float],
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    precenter: bool = False,
    normalize: bool = False,
) -> DataFrame:
    """``scipy.signal.lombscargle(t, y, freqs)`` per series: the
    classical periodogram at the given ANGULAR frequencies (rad per
    unit of ``dim``), defined for arbitrary irregular sample instants.

    ``precenter`` subtracts each series' mean first (recommended —
    the plain formula leaks DC into every frequency; implemented
    exactly via the aggregate algebra above, no second pass);
    ``normalize`` scales by 2/(n·var) so a unit-amplitude sinusoid
    reaches ~n/4 → 1. Timestamp dims are converted to epoch SECONDS
    (frequencies are then rad/s).

    Output: ``[*by, idx, freq, power]`` with ``idx`` the 0-based
    position in ``freqs``.
    """
    freqs = [float(w) for w in freqs]
    if not freqs:
        raise ValueError("freqs must be non-empty")
    if any(w <= 0 for w in freqs):
        raise ValueError("freqs must be positive angular frequencies")
    by = list(by)
    in_dtype = dict(df.dtypes)[dim]
    if in_dtype.startswith("timestamp"):
        from ..functions.timeutil import epoch_us

        t = epoch_us(df, dim).cast("double") / F.lit(1_000_000.0)
    else:
        t = F.col(dim).cast("double")
    y = F.col(value).cast("double")
    from ..pipeline.hashes import spread

    # per-row trig dominates; a small-file scan must not serialize it
    # onto a couple of cores (no-op when the scan already splits wide)
    src = spread(df, *by).select(*by, t.alias("_t"), y.alias("_y"))
    wf = F.array(*[F.lit(w) for w in freqs])
    ex = src.select(*by, "_t", "_y", F.posexplode(wf).alias("idx", "freq"))
    # one sin + one cos per (row, freq), projected before the
    # aggregation; every squared/cross term reuses them
    wt = F.col("freq") * F.col("_t")
    ex = ex.select(
        *by, "idx", "freq", "_y", F.cos(wt).alias("_c"), F.sin(wt).alias("_s")
    )
    c, sn, yv = F.col("_c"), F.col("_s"), F.col("_y")
    sums = ex.groupBy(*by, "idx", "freq").agg(
        F.sum(yv * c).alias("_yc"),
        F.sum(yv * sn).alias("_ys"),
        F.sum(c).alias("_cs"),
        F.sum(sn).alias("_ssum"),
        F.sum(c * c).alias("_cc"),
        F.sum(sn * sn).alias("_ss"),
        F.sum(sn * c).alias("_sc"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(yv).alias("_sy"),
        F.sum(yv * yv).alias("_syy"),
    )
    # centering by algebra: Σ(y−μ)cos = Σy·cos − μ·Σcos (likewise for
    # sin); Σ(y−μ)² = Σy² − nμ². The cc/ss/sc sums have no y term.
    if precenter:
        mu = F.col("_sy") / F.col("_n")
        yc0 = F.col("_yc") - mu * F.col("_cs")
        ys0 = F.col("_ys") - mu * F.col("_ssum")
        yy0 = F.col("_syy") - F.col("_n") * mu * mu
    else:
        yc0 = F.col("_yc")
        ys0 = F.col("_ys")
        yy0 = F.col("_syy")
    # tau from the aggregate identities: sin(2wt) = 2·sc, cos(2wt) =
    # cc − ss; then rotate the sums by wtau via angle addition — the
    # exact scipy recurrence, just reassociated
    wtau = F.lit(0.5) * F.atan2(
        F.lit(2.0) * F.col("_sc"), F.col("_cc") - F.col("_ss")
    )
    cwt, swt = F.cos(wtau), F.sin(wtau)
    yc_tau = cwt * yc0 + swt * ys0
    ys_tau = cwt * ys0 - swt * yc0
    cc_tau = (
        cwt * cwt * F.col("_cc")
        + F.lit(2.0) * cwt * swt * F.col("_sc")
        + swt * swt * F.col("_ss")
    )
    ss_tau = (
        swt * swt * F.col("_cc")
        - F.lit(2.0) * cwt * swt * F.col("_sc")
        + cwt * cwt * F.col("_ss")
    )
    power = F.lit(0.5) * (
        yc_tau * yc_tau / cc_tau + ys_tau * ys_tau / ss_tau
    )
    if normalize:
        # scipy: divide by the (pre-centered) sum of squares / 2 …
        # precisely  P / (sum(y^2)/2)  with y as USED in the sums
        power = power / (F.lit(0.5) * yy0)
    return sums.select(*by, "idx", "freq", power.alias("power"))
