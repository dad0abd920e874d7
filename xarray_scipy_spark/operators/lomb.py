"""Lomb–Scargle periodogram: spectra of IRREGULARLY sampled series.

Every FFT-family operator in this engine assumes an equispaced ``dim``
(the reference inherits the same assumption through `_compute_delta`,
signal.py:16-17). Real event streams are irregular; the two honest
options are regularize first (:func:`~xarray_scipy_spark.operators.
timegrid.gapfill`, which interpolates — fine for dense gaps, biased
for sparse ones) or estimate the spectrum directly on the irregular
samples. Lomb–Scargle (Lomb 1976, Scargle 1982; the
``scipy.signal.lombscargle`` surface) is the standard for the latter.

Plan shape: the textbook formula needs the per-frequency phase offset
``tau`` BEFORE the data sums, which would mean two shuffles. The
angle-addition identities collapse everything into FIVE plain sums per
(series, frequency) — Σy·cos(ωt), Σy·sin(ωt), Σcos²(ωt), Σsin²(ωt),
Σsin(ωt)cos(ωt) — so the whole operator is: explode the literal
frequency list (no join, no shuffle for the expansion), ONE
map-side-combinable aggregation, then pure projection trigonometry on
the 5-sum rows. Shuffle volume = series × frequencies rows, never
sample-proportional.
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
    the plain formula leaks DC into every frequency); ``normalize``
    scales by 2/(n·var) so a unit-amplitude sinusoid reaches ~n/4 →
    1. Timestamp dims are converted to epoch SECONDS (frequencies are
    then rad/s).

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
    if precenter:
        from pyspark.sql import Window

        src = src.withColumn(
            "_y", F.col("_y") - F.avg("_y").over(Window.partitionBy(*by))
        )
    wf = F.array(*[F.lit(w) for w in freqs])
    ex = src.select(
        *by,
        "_t",
        "_y",
        F.posexplode(wf).alias("idx", "freq"),
    )
    # one sin + one cos per row, projected before the aggregation (a
    # wide no-explode variant with 5 sums x freq as separate agg
    # columns measured IDENTICAL at the 100x tier — the cost is raw
    # trig throughput, not row machinery — so the simpler plan stays)
    wt = F.col("freq") * F.col("_t")
    ex = ex.select(
        *by, "idx", "freq", "_y", F.cos(wt).alias("_c"), F.sin(wt).alias("_s")
    )
    c, sn = F.col("_c"), F.col("_s")
    sums = ex.groupBy(*by, "idx", "freq").agg(
        F.sum(F.col("_y") * c).alias("_yc"),
        F.sum(F.col("_y") * sn).alias("_ys"),
        F.sum(c * c).alias("_cc"),
        F.sum(sn * sn).alias("_ss"),
        F.sum(sn * c).alias("_sc"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_y") * F.col("_y")).alias("_yy"),
    )
    # tau from the aggregate identities: sin(2wt) = 2·sc, cos(2wt) =
    # cc − ss; then rotate the sums by wtau via angle addition — the
    # exact scipy recurrence, just reassociated
    wtau = F.lit(0.5) * F.atan2(
        F.lit(2.0) * F.col("_sc"), F.col("_cc") - F.col("_ss")
    )
    cwt, swt = F.cos(wtau), F.sin(wtau)
    yc_tau = cwt * F.col("_yc") + swt * F.col("_ys")
    ys_tau = cwt * F.col("_ys") - swt * F.col("_yc")
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
        power = power / (F.lit(0.5) * F.col("_yy"))
    return sums.select(*by, "idx", "freq", power.alias("power"))
