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

__all__ = ["peak_widths"]


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
