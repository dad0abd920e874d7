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
Σsin(ωt)cos(ωt) — so the whole operator is: ONE Arrow-batched
``mapInPandas`` pass that reduces every input batch to per-(series,
freq) PARTIAL sums with vectorized numpy trig, ONE plain aggregation
combining the partials, then pure projection trigonometry on the
5-sum rows. Shuffle volume = series × frequencies × tasks partial
rows, never sample-proportional.

The r6 build used explode + JVM codegen trig; it measured a stable
2.26× behind the single-node oracle at the 100× tier (BASELINE.md) —
raw per-row ``Math.sin/cos`` throughput, not plan shape. numpy's
SIMD libm over Arrow batches closes that constant factor while
keeping the map-side-combine property (each batch emits ≤ groups×m
rows regardless of row count).
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
    # Arrow-batched partial reduction: each input batch collapses to
    # (group, freq) partial-sum rows via vectorized numpy trig. The
    # per-batch accumulator is bounded (row chunks sized so the n×m
    # trig workspace stays ~ a few MB), so executor memory is closed
    # over (groups_in_batch × m), never the batch row count.
    import numpy as np
    import pandas as pd

    warr = np.asarray(freqs, dtype=np.float64)
    m = len(freqs)
    chunk = max(1, 262_144 // m)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in src.select(*by).schema.fields
    )
    out_schema = (
        f"{key_fields}, idx int, freq double, _yc double, _ys double, "
        "_cc double, _ss double, _sc double, _n bigint, _yy double"
    )

    def partials(batches):
        for pdf in batches:
            out = []
            for keys, g in pdf.groupby(by, sort=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                t = g["_t"].to_numpy(dtype=np.float64)
                y = g["_y"].to_numpy(dtype=np.float64)
                yc = np.zeros(m)
                ys = np.zeros(m)
                cc = np.zeros(m)
                ss = np.zeros(m)
                sc = np.zeros(m)
                for lo in range(0, len(t), chunk):
                    wt = np.outer(t[lo : lo + chunk], warr)
                    c = np.cos(wt)
                    s = np.sin(wt)
                    yk = y[lo : lo + chunk]
                    yc += yk @ c
                    ys += yk @ s
                    cc += (c * c).sum(axis=0)
                    ss += (s * s).sum(axis=0)
                    sc += (s * c).sum(axis=0)
                row = dict(zip(by, keys))
                out.append(
                    pd.DataFrame(
                        {
                            **{k: [v] * m for k, v in row.items()},
                            "idx": np.arange(m, dtype=np.int32),
                            "freq": warr,
                            "_yc": yc,
                            "_ys": ys,
                            "_cc": cc,
                            "_ss": ss,
                            "_sc": sc,
                            "_n": np.full(m, len(t), dtype=np.int64),
                            "_yy": np.full(m, float(y @ y)),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    part = src.mapInPandas(partials, out_schema)
    sums = part.groupBy(*by, "idx", "freq").agg(
        F.sum("_yc").alias("_yc"),
        F.sum("_ys").alias("_ys"),
        F.sum("_cc").alias("_cc"),
        F.sum("_ss").alias("_ss"),
        F.sum("_sc").alias("_sc"),
        F.sum("_n").alias("_n"),
        F.sum("_yy").alias("_yy"),
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
