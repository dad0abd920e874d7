"""Peak width measurement: signal ⋈ peak-indices per group.

Reference: ``peak_widths`` at ``/root/reference/xarray_scipy/signal.py:
330-371`` — marked ``# TODO: BROKEN`` in the reference itself
(signal.py:346); this implementation is designed working and validated
on the reference's own golden binary-track fixtures
(tests/test_signal.py:110-331, re-derived in FIXTURES.md §3).

The two inputs (signal with core dim ``dim``, peak positions with core
dim ``peak``) share the broadcast dims; one cogrouped shuffle co-locates
them exactly like the reference's implicit alignment (signal.py:353-360).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame

from ..core import apply_cogrouped_kernel, resolve_keep_attrs
from ..kernels.peaks import peak_widths as _peak_widths_np

__all__ = ["find_peaks", "peak_widths"]


def peak_widths(
    xdf: DataFrame,
    peaks_df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    peak: str = "peak",
    index: str = "index",
    rel_height: float = 0.5,
    wlen: int | None = None,
    keep_attrs: bool | None = None,
) -> DataFrame:
    """Width of each listed peak at ``rel_height`` of its prominence.

    ``wlen`` bounds the window used for prominence bases (forwarded to
    the kernel — the reference forwards arbitrary ``**kwargs`` to scipy
    at signal.py:330/369; ``rel_height`` and ``wlen`` are the complete
    scipy.signal.peak_widths keyword surface).

    ``xdf``: long-form signal ``[*by, dim, value]``; ``peaks_df``: peak
    positions ``[*by, peak, index]`` (``index`` = sample position of the
    peak along ``dim``). Output one row per peak:
    ``[*by, idx, peak, width, width_height, left_ip, right_ip, ...]`` —
    the four scipy outputs as columns (reference returns four arrays on
    the "peak" core dim, signal.py:362-367).
    """

    def kernel(coords_x, x, coords_p, peak_ids, indices):
        widths, heights, lips, rips = _peak_widths_np(
            x, indices.astype(np.intp), rel_height=rel_height, wlen=wlen
        )
        return {
            "peak": peak_ids.astype(np.int64),
            "width": widths,
            "width_height": heights,
            "left_ip": lips,
            "right_ip": rips,
        }

    return apply_cogrouped_kernel(
        xdf,
        peaks_df,
        kernel,
        by=by,
        order1=dim,
        order2=peak,
        values1=[value],
        values2=[peak, index],
        out_fields="peak bigint, width double, width_height double, "
        "left_ip double, right_ip double",
        keep=resolve_keep_attrs(xdf, keep_attrs),
    )


def find_peaks(
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    height: float | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Detect strict local maxima per series — the upstream producer for
    :func:`peak_widths` (the reference leaves detection to callers, who
    run ``scipy.signal.find_peaks``; an engine user needs it in-engine).

    Pure Catalyst windows, no UDF, one shuffle (the window sort on the
    series key): a sample is a peak when it exceeds BOTH immediate
    neighbors. NOTE this is stricter than ``scipy.signal.find_peaks``,
    which also detects flat-top peaks (plateau midpoints via its
    ``_local_maxima_1d``); here plateaus are intentionally NOT peaks —
    a deliberate divergence kept because the single-lag window plan is
    shuffle-minimal and the testdata series are strictly-varying floats
    where plateaus don't occur. Series edges never qualify (matches
    scipy). Optional scipy-style filters: ``height`` keeps peaks with
    ``value >= height``; ``threshold`` additionally requires
    ``min(value - left, value - right) >= threshold``.

    Output: ``[*by, peak, index, <dim>, <value>]`` with ``peak`` the
    0-based rank of the peak within its series (the ``"peak"`` core dim
    of the reference's contract) and ``index`` its 0-based sample
    position along ``dim`` — exactly the frame :func:`peak_widths`
    consumes.
    """
    from pyspark.sql import Window, functions as F

    by = list(by)
    w = Window.partitionBy(*by).orderBy(dim)
    lagv = F.lag(value, 1).over(w)
    leadv = F.lead(value, 1).over(w)
    cond = (F.col(value) > lagv) & (F.col(value) > leadv)
    if height is not None:
        cond = cond & (F.col(value) >= F.lit(float(height)))
    if threshold is not None:
        cond = cond & (
            F.least(F.col(value) - lagv, F.col(value) - leadv)
            >= F.lit(float(threshold))
        )
    ser = df.withColumn("index", F.row_number().over(w) - 1).withColumn(
        "__is_peak__", cond
    )
    wp = Window.partitionBy(*by).orderBy("index")
    return (
        ser.filter(F.col("__is_peak__"))
        .withColumn("peak", F.row_number().over(wp) - 1)
        .select(*by, "peak", "index", dim, value)
    )
