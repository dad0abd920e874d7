"""Per-series detrending (``scipy.signal.detrend`` semantics) as PURE
Catalyst expressions — no kernel, no Python, no extra shuffle beyond
the one window exchange.

``constant``: subtract the series mean. ``linear``: subtract the
least-squares line over sample positions, in closed form::

    slope     = (E[p·x] − E[p]·E[x]) / (E[p²] − E[p]²)
    intercept = E[x] − slope·E[p]
    resid     = x − (intercept + slope·p)

All five expectations are window aggregates over the series partition,
evaluated in one pass by Spark's window operator; whole-stage codegen
keeps everything JVM-side. This is the template for any closed-form
per-series regression — no ``applyInPandas`` needed when the math is
expressible as group moments.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["detrend"]


def detrend(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    kind: str = "linear",
    out: str = "value_detrended",
) -> DataFrame:
    """Remove the per-series mean (``kind='constant'``) or least-squares
    linear trend over sample positions (``kind='linear'``). Adds ``out``
    (and keeps every input column); single window exchange on ``by``.
    """
    if kind not in ("constant", "linear"):
        raise ValueError(f"kind must be 'constant' or 'linear', got {kind!r}")
    by = list(by)
    part = Window.partitionBy(*by)
    x = F.col(value)
    if kind == "constant":
        return df.withColumn(out, x - F.avg(x).over(part))
    pos = (F.row_number().over(part.orderBy(dim)) - 1).cast("double")
    work = df.withColumn("__p__", pos)
    p = F.col("__p__")
    ex = F.avg(x).over(part)
    ep = F.avg(p).over(part)
    epx = F.avg(p * x).over(part)
    epp = F.avg(p * p).over(part)
    var = epp - ep * ep
    # single-sample series: var = 0 -> no trend to remove beyond the mean
    slope = F.when(var > 0, (epx - ep * ex) / var).otherwise(F.lit(0.0))
    resid = x - (ex - slope * ep) - slope * p
    return work.withColumn(out, resid).drop("__p__")
