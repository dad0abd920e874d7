"""Stateful IIR filters: sosfilt / sosfiltfilt.

Reference: ``/root/reference/xarray_scipy/signal.py:403-461``. The
recursion is inherently sequential along the core dim; the reference's
answer is ``allow_rechunk=True`` (signal.py:422, 452) — force the whole
time axis into one block per series. Ours is the same concession made
explicit — one shuffle co-locates each full series — but batched: many
series share one bucket, the cascaded-biquad kernel runs once per
equal-length block numpy-vectorized ACROSS series, so the per-sample
recursion loop is paid once per block, not once per series
(:func:`xarray_scipy_spark.core.apply_series_kernel`).

Scale path beyond reference parity (SURVEY.md §7 "hard parts"): for a
single series longer than worker memory, overlap-and-discard chunked
filtering with per-chunk ``zi`` handoff (the kernel returns final
state), or ``applyInPandasWithState`` under Structured Streaming
(:mod:`xarray_scipy_spark.streaming.stateful`).

The SOS coefficient matrix is tiny (n_sections × 6) and rides into the
UDF closure — the moral equivalent of a broadcast join against every
series (the reference aligns it against every slice the same way,
signal.py:415-418).

``zi``: the reference's ``zi`` pass-through is broken by construction
(scipy returns a (y, zf) tuple that violates the declared single output,
signal.py:417-419 — SURVEY.md §2.2 #16). Here ``zi`` IS supported: a
``(n_sections, 2)`` initial state applied to every series (the chunked
long-series scale path needs it); the final state is not emitted in the
long-form result (it is per-series, not per-sample — use the kernel
directly for chunk handoff).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame

from ..core import apply_series_kernel, resolve_keep_attrs
from ..functions.coords import linear_coord, restore_coord_dtype
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
    keep_attrs: bool | None = None,
) -> DataFrame:
    """Forward IIR filter in second-order-sections form along ``dim``.

    ``zi``: optional ``(n_sections, 2)`` initial conditions applied to
    each series (scipy's per-series zi shape, broadcast across series).

    Output ``[*by, idx, value, <dim>, n_in, offset, delta]``, length
    preserved, coordinate passed through as ``offset + idx·delta``.
    """
    sos = _as_sos(sos)
    if zi is not None:
        zi = np.asarray(zi, dtype=float)
        if zi.shape != (sos.shape[0], 2):
            raise ValueError(
                f"zi must have shape (n_sections, 2) = {(sos.shape[0], 2)}, "
                f"got {zi.shape}"
            )

    def kernel(x):
        if zi is None:
            return {"value": sosfilt_1d(sos, x)}
        y, _zf = sosfilt_1d(sos, x, zi=zi)
        return {"value": y}

    res = apply_series_kernel(
        df,
        kernel,
        by=by,
        order=dim,
        values=[value],
        out_fields="value double",
        keep=resolve_keep_attrs(df, keep_attrs),
    )
    coord = linear_coord("idx", "offset", "delta")
    return res.withColumn(dim, restore_coord_dtype(df, dim, coord))


def sosfiltfilt(
    sos,
    df: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    padtype: str = "odd",
    padlen: int | None = None,
    keep_attrs: bool | None = None,
) -> DataFrame:
    """Zero-phase forward-backward IIR filter (signal.py:433-461)."""
    if padtype != "odd":
        raise NotImplementedError("only padtype='odd' is supported")
    sos = _as_sos(sos)

    def kernel(x):
        return {"value": sosfiltfilt_1d(sos, x, padlen=padlen)}

    res = apply_series_kernel(
        df,
        kernel,
        by=by,
        order=dim,
        values=[value],
        out_fields="value double",
        keep=resolve_keep_attrs(df, keep_attrs),
    )
    coord = linear_coord("idx", "offset", "delta")
    return res.withColumn(dim, restore_coord_dtype(df, dim, coord))
