"""The engine's core primitive: grouped per-series kernel application.

The reference library is one pattern applied seventeen ways —
``xr.apply_ufunc(kernel, input_core_dims=[dim], dask="parallelized",
allow_rechunk=True)`` (``/root/reference/xarray_scipy/signal.py:84, 126,
186, 292, 353, 384, 408, 438``): partition by the broadcast dims, apply a
1-D kernel along the core dim per slice, reassemble, recompute coords.

Spark translation (SURVEY.md §2.1):

- broadcast dims  -> ``groupBy`` keys,
- ``allow_rechunk`` (make the core dim contiguous per worker) -> the
  shuffle that ``groupBy().applyInPandas`` performs,
- the scipy kernel -> a numpy kernel running on Arrow batches inside the
  grouped-map pandas UDF,
- ``output_sizes``/``output_dtypes`` -> the UDF's declared returnType,
- coordinate recomputation -> **native Catalyst expressions** on
  group-constant columns (``n_in``/``offset``/``delta``) that the UDF
  emits for free, so no second shuffle or join is ever needed for
  coordinates.

Scale notes (100 TB design): exactly ONE shuffle per operator, keyed by
the broadcast dims; group size is bounded by one series (the reference
accepts the same bound via ``allow_rechunk`` — a series must fit one
worker). Skewed series lengths are handled by AQE skew splitting on the
exchange; chaining operators with the same ``by`` keys reuses the
exchange (Catalyst sees identical hash partitioning).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["apply_series_kernel", "apply_cogrouped_kernel", "GROUP_ATTR_FIELDS"]

# group-constant columns emitted by every kernel application; used by the
# operator layer to build coordinate expressions natively in SQL
GROUP_ATTR_FIELDS = "n_in bigint, offset double, delta double"


def _ddl_of(df: DataFrame, cols: Sequence[str]) -> str:
    by_field = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{c} {by_field[c]}" for c in cols)


def _sorted_group(pdf: pd.DataFrame, order: Sequence[str]) -> pd.DataFrame:
    return pdf.sort_values(list(order), kind="mergesort")


def _coord_attrs(coords: np.ndarray) -> tuple[int, float, float]:
    """(n, offset, delta) of an equispaced coordinate array.

    delta is the mean of consecutive diffs exactly as the reference's
    ``_compute_delta`` (signal.py:16-17): for a sorted array the mean diff
    telescopes to ``(last - first) / (n - 1)``.
    """
    n = len(coords)
    offset = float(coords[0]) if n else 0.0
    delta = float(coords[-1] - coords[0]) / (n - 1) if n > 1 else 0.0
    return n, offset, abs(delta)


def apply_series_kernel(
    df: DataFrame,
    kernel: Callable[..., dict[str, np.ndarray]],
    *,
    by: Sequence[str],
    order: str | Sequence[str],
    values: Sequence[str],
    out_fields: str,
    emit_idx: bool = True,
) -> DataFrame:
    """Apply a 1-D numpy kernel to each series group.

    Parameters
    ----------
    df : long-form DataFrame (one row per sample).
    kernel : ``kernel(coords, *value_arrays) -> dict[name, np.ndarray]``;
        all returned arrays must share one length (the output series).
    by : broadcast-dim columns (the partitioning key — reference's loop dims).
    order : core-dim coordinate column (+ optional tie-break columns);
        the first entry is the coordinate used for offset/delta.
    values : value columns handed to the kernel as float64 numpy arrays.
    out_fields : DDL for the kernel's output columns,
        e.g. ``"re double, im double"``.
    emit_idx : add ``idx bigint`` = 0..len-1 output position.

    Returns a long-form DataFrame with columns
    ``[*by, idx?, *out_fields, n_in, offset, delta]``.
    """
    order = [order] if isinstance(order, str) else list(order)
    by = list(by)
    idx_field = "idx bigint, " if emit_idx else ""
    schema = f"{_ddl_of(df, by)}, {idx_field}{out_fields}, {GROUP_ATTR_FIELDS}"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _sorted_group(pdf, order)
        coords = pdf[order[0]].to_numpy(dtype=float)
        n, offset, delta = _coord_attrs(coords)
        arrays = [pdf[v].to_numpy(dtype=float) for v in values]
        out = kernel(coords, *arrays)
        m = len(next(iter(out.values()))) if out else 0
        res = pd.DataFrame(out)
        if emit_idx:
            res.insert(0, "idx", np.arange(m, dtype=np.int64))
        for k in reversed(by):
            res.insert(0, k, pdf[k].iloc[0])
        res["n_in"] = np.int64(n)
        res["offset"] = offset
        res["delta"] = delta
        return res

    return df.groupBy(*by).applyInPandas(run, schema=schema)


def apply_cogrouped_kernel(
    df1: DataFrame,
    df2: DataFrame,
    kernel: Callable[..., dict[str, np.ndarray]],
    *,
    by: Sequence[str],
    order1: str | Sequence[str],
    order2: str | Sequence[str],
    values1: Sequence[str],
    values2: Sequence[str],
    out_fields: str,
    emit_idx: bool = True,
) -> DataFrame:
    """Two-input variant (convolution's pair of signals, peak_widths'
    signal ⋈ peak-indices pairing, reference signal.py:84-105, 353-360).

    Both inputs are shuffled once on the same ``by`` keys and co-located
    (``groupBy().cogroup().applyInPandas``). Groups present on only one
    side are skipped (empty result), mirroring an inner alignment.
    ``kernel(coords1, *arrays1, coords2, *arrays2) -> dict``.
    Group attrs (n_in/offset/delta) describe input 1.
    """
    order1 = [order1] if isinstance(order1, str) else list(order1)
    order2 = [order2] if isinstance(order2, str) else list(order2)
    by = list(by)
    # Fresh attribute IDs on the right side: when both inputs share lineage
    # (self-convolution, two filters of one cache), Spark's self-join
    # dedup otherwise prunes the right cogroup input down to the key.
    from pyspark.sql import functions as F

    df2 = df2.select(*[F.col(c).alias(c) for c in df2.columns])
    idx_field = "idx bigint, " if emit_idx else ""
    schema = f"{_ddl_of(df1, by)}, {idx_field}{out_fields}, {GROUP_ATTR_FIELDS}"

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {f.split()[0]: [] for f in schema.split(", ")}
            ).iloc[0:0]
        left = _sorted_group(left, order1)
        right = _sorted_group(right, order2)
        coords1 = left[order1[0]].to_numpy(dtype=float)
        coords2 = right[order2[0]].to_numpy(dtype=float)
        n, offset, delta = _coord_attrs(coords1)
        arrays1 = [left[v].to_numpy(dtype=float) for v in values1]
        arrays2 = [right[v].to_numpy(dtype=float) for v in values2]
        out = kernel(coords1, *arrays1, coords2, *arrays2)
        m = len(next(iter(out.values()))) if out else 0
        res = pd.DataFrame(out)
        if emit_idx:
            res.insert(0, "idx", np.arange(m, dtype=np.int64))
        for k in reversed(by):
            res.insert(0, k, left[k].iloc[0])
        res["n_in"] = np.int64(n)
        res["offset"] = offset
        res["delta"] = delta
        return res

    return (
        df1.groupBy(*by)
        .cogroup(df2.groupBy(*by))
        .applyInPandas(run, schema=schema)
    )
