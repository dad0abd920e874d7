"""Sliding-window smoothers as PURE Catalyst expressions: ``medfilt``
(scipy.signal.medfilt semantics) and ``wiener`` (scipy.signal.wiener).

Neither needs a Python kernel: both are local-window statistics, which
Spark's window operator evaluates JVM-side in one exchange per series
partition. At 100 TB the plan is a single hash-partition shuffle on
``by`` followed by a sorted window pass — the same shape as any
``OVER (PARTITION BY ...)`` aggregation, with map-side input pruning
and whole-stage codegen throughout (no Arrow hop at all).

scipy parity notes (public docs/source semantics, not code):

- ``medfilt(x, k)`` (k odd) is the median over a length-k window
  **zero-padded** past the series edges. A shrinking-window median
  would silently diverge at the first/last k//2 samples, so the edge
  zeros are made explicit in closed form: with the m present window
  values sorted ascending and z = k − m implicit zeros, the sorted
  multiset is [negatives…][zeros…][non-negatives…]; the median at
  0-based position p = (k−1)//2 is then a three-way CASE on p against
  the negative count — no array mutation needed.
- ``wiener(x, k)`` with ``noise=None``: local mean and variance over
  the zero-padded window (sum/k, sumsq/k − mean², exactly scipy's
  ``correlate(x, ones(k), 'same') / k`` construction), noise estimated
  as the series-mean of the local variances, and the output
  ``lMean + (x − lMean)·(1 − noise/lVar)`` where ``lVar ≥ noise``,
  else ``lMean``.

The reference (xarray_scipy) stops at the 17 wrapped scipy.signal ops;
these two extend the same per-series family (engine extension, listed
in SURVEY.md §2 as such).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["medfilt", "order_filter", "wiener"]


def _odd(k: int, name: str) -> int:
    k = int(k)
    if k < 1 or k % 2 == 0:
        raise ValueError(f"{name} must be a positive odd integer, got {k}")
    return k


def _ranked_window(
    df: DataFrame,
    by: Sequence[str],
    dim: str,
    value: str,
    k: int,
    p: int,
    out: str,
) -> DataFrame:
    """Shared zero-padded order-statistic machinery: the ``p``-th
    (0-based) smallest of each length-``k`` window's multiset — the m
    present values plus ``k − m`` implicit edge zeros, located by the
    closed-form position CASE against the sorted array's negative
    count."""
    h = k // 2
    w = Window.partitionBy(*by).orderBy(dim).rowsBetween(-h, h)
    arr = F.array_sort(F.collect_list(F.col(value).cast("double")).over(w))
    work = df.withColumn("__a__", arr)
    a = F.col("__a__")
    m = F.size(a)
    z = F.lit(k) - m  # implicit zero-pad count
    neg = F.size(F.filter(a, lambda v: v < F.lit(0.0)))
    sel = (
        F.when(F.lit(p) < neg, F.element_at(a, F.lit(p + 1)))
        .when(F.lit(p) < neg + z, F.lit(0.0))
        .otherwise(F.element_at(a, (F.lit(p + 1) - z).cast("int")))
    )
    return work.withColumn(out, sel).drop("__a__")


def medfilt(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    kernel_size: int = 3,
    out: str = "value_med",
) -> DataFrame:
    """Sliding median along ``dim`` with scipy's zero-padded edges.

    Adds ``out`` next to the input columns; one window exchange on
    ``by``, everything else closed-form Catalyst (array_sort +
    filter-count + CASE), fully codegen'd.
    """
    k = _odd(kernel_size, "kernel_size")
    return _ranked_window(df, list(by), dim, value, k, (k - 1) // 2, out)


def order_filter(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    kernel_size: int = 3,
    rank: int = 0,
    out: str = "value_ord",
) -> DataFrame:
    """Rank-order filter along ``dim`` (``scipy.signal.order_filter``
    with a contiguous 1-D domain): the ``rank``-th smallest value of
    each zero-padded length-``kernel_size`` window. ``rank=0`` is a
    running min, ``kernel_size-1`` a running max, ``(k-1)//2`` the
    median (= :func:`medfilt`). Same single-exchange pure-Catalyst
    plan."""
    k = _odd(kernel_size, "kernel_size")  # centered window needs odd k
    rank = int(rank)
    if not (0 <= rank < k):
        raise ValueError(f"rank must be in [0, {k - 1}], got {rank}")
    return _ranked_window(df, list(by), dim, value, k, rank, out)


def wiener(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    mysize: int = 3,
    noise: float | None = None,
    out: str = "value_wiener",
) -> DataFrame:
    """Adaptive Wiener filter along ``dim`` (scipy.signal.wiener).

    Local mean/variance come from one sliding-window pass; the noise
    estimate (when not supplied) is a second window aggregate over the
    whole series partition — still zero Python, two window operators
    sharing one ``by`` exchange.
    """
    k = _odd(mysize, "mysize")
    h = k // 2
    by = list(by)
    wloc = Window.partitionBy(*by).orderBy(dim).rowsBetween(-h, h)
    x = F.col(value).cast("double")
    lmean = F.sum(x).over(wloc) / F.lit(float(k))
    lvar = F.sum(x * x).over(wloc) / F.lit(float(k)) - lmean * lmean
    work = df.withColumn("__lm__", lmean).withColumn("__lv__", lvar)
    if noise is None:
        nz = F.avg("__lv__").over(Window.partitionBy(*by))
    else:
        nz = F.lit(float(noise))
    lm, lv = F.col("__lm__"), F.col("__lv__")
    res = F.when(lv < nz, lm).otherwise(
        lm + (F.col(value).cast("double") - lm) * (F.lit(1.0) - nz / lv)
    )
    return work.withColumn(out, res).drop("__lm__", "__lv__")
