"""Stateful IIR filters: sosfilt / sosfiltfilt.

Reference: ``/root/reference/xarray_scipy/signal.py:403-461``. The
recursion is inherently sequential along the core dim; the reference's
answer is ``allow_rechunk=True`` (signal.py:422, 452) — force the whole
time axis into one block per series. Ours is the same concession made
explicit: one shuffle groups each full series onto one worker, the
cascaded-biquad kernel is numpy-vectorized ACROSS the series sharing a
worker (so many short series cost one Python loop, not many).

Scale path beyond reference parity (SURVEY.md §7 "hard parts"): for a
single series longer than worker memory, overlap-and-discard chunked
filtering with per-chunk ``zi`` handoff, or
``applyInPandasWithState`` under Structured Streaming
(:mod:`xarray_scipy_spark.streaming.stateful`). Batch parity ships here.

The SOS coefficient matrix is tiny (n_sections × 6) and rides into the
UDF closure — the moral equivalent of a broadcast join against every
series (the reference aligns it against every slice the same way,
signal.py:415-418).

``zi``: the reference's ``zi`` pass-through is broken by construction
(scipy returns a (y, zf) tuple that violates the declared single output,
signal.py:417-419 — SURVEY.md §2.2 #16), i.e. effectively unsupported;
we raise explicitly instead of failing downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame

from ..core import apply_series_kernel
from ..functions.coords import linear_coord
from ..kernels.dsp import sosfilt_1d, sosfiltfilt_1d

__all__ = ["sosfilt", "sosfiltfilt", "sos_from_dataframe"]


def sos_from_dataframe(sos_df: DataFrame) -> np.ndarray:
    """Collect a (section, coefficient, value) long-form coefficient table
    (the reference's DataArray with dims ("section","coefficient"),
    signal.py:404-405) into the tiny numpy matrix the kernel needs.
    Coefficient tables are O(sections×6) — driver collection is the
    broadcast, not a bottleneck."""
    rows = sos_df.select("section", "coefficient", "value").collect()
    n_sections = 1 + max(r["section"] for r in rows)
    sos = np.zeros((n_sections, 6))
    for r in rows:
        sos[r["section"], r["coefficient"]] = r["value"]
    return sos


def _as_sos(sos) -> np.ndarray:
    if isinstance(sos, DataFrame):
        sos = sos_from_dataframe(sos)
    sos = np.atleast_2d(np.asarray(sos, dtype=float))
    if sos.shape[1] != 6:
        raise ValueError(f"sos must be (n_sections, 6), got {sos.shape}")
    return sos


def sosfilt(
    sos,
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    zi=None,
) -> DataFrame:
    """Forward IIR filter in second-order-sections form along ``dim``.

    Output ``[*by, idx, value, <dim>, n_in, offset, delta]``, length
    preserved, coordinate passed through as ``offset + idx·delta``.
    """
    if zi is not None:
        raise NotImplementedError(
            "zi is unsupported (reference parity: its zi path violates the "
            "declared single-output contract, signal.py:417-419)"
        )
    sos = _as_sos(sos)

    def kernel(coords, x):
        return {"value": sosfilt_1d(sos, x)}

    res = apply_series_kernel(
        df, kernel, by=by, order=dim, values=[value], out_fields="value double"
    )
    return res.withColumn(dim, linear_coord("idx", "offset", "delta"))


def sosfiltfilt(
    sos,
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    padtype: str = "odd",
    padlen: int | None = None,
) -> DataFrame:
    """Zero-phase forward-backward IIR filter (signal.py:433-461)."""
    if padtype != "odd":
        raise NotImplementedError("only padtype='odd' is supported")
    sos = _as_sos(sos)

    def kernel(coords, x):
        return {"value": sosfiltfilt_1d(sos, x, padlen=padlen)}

    res = apply_series_kernel(
        df, kernel, by=by, order=dim, values=[value], out_fields="value double"
    )
    return res.withColumn(dim, linear_coord("idx", "offset", "delta"))
