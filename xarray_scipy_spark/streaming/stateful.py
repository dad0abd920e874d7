"""Stateful streaming IIR filtering: ``sosfilt`` over an unbounded
stream with per-series filter-state carry.

Why this exists (SURVEY.md §7 "hard parts"): the batch ``sosfilt``
inherits the reference's ``allow_rechunk`` concession (whole series in
one worker's memory, ``/root/reference/xarray_scipy/signal.py:422``).
For a series longer than memory — or one that never ends — the cascaded
biquad recursion must instead run *incrementally*: filter each arriving
chunk with the section states (``zi``) left by the previous chunk. The
kernel already returns its final state (``kernels.dsp.sosfilt_1d``);
this module wires that handoff through Structured Streaming's
``applyInPandasWithState`` so Spark manages state storage, recovery and
group routing. The result is sample-for-sample identical to the batch
operator applied to the fully materialized series (asserted in
``tests/test_streaming.py``), provided each series' rows arrive in
nondecreasing ``dim`` order across micro-batches — the usual
event-time-ordered ingestion contract.

At scale: state per key is O(n_sections × 2) doubles — thousands of
bytes per million-key state store; the per-batch work is the same
vectorized kernel as batch mode. No shuffle beyond the groupBy exchange
each micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..kernels.dsp import sosfilt_1d

__all__ = ["sosfilt_stream", "stft_stream"]


def sosfilt_stream(
    sdf: DataFrame,
    sos,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
) -> DataFrame:
    """Forward IIR filter (second-order sections) over a streaming
    DataFrame, carrying per-series ``zi`` between micro-batches.

    Parameters mirror the batch operator
    (:func:`xarray_scipy_spark.operators.filters.sosfilt`): ``by`` keys
    one series per group, ``dim`` orders samples within it. Output per
    row: ``[*by, <dim>, value, idx]`` where ``idx`` is the cumulative
    sample position since the series began (continuous across batches).

    State: ``(zi flattened, n_seen)`` per key — the exact section
    states scipy's ``sosfilt`` would carry, so restarting from a
    checkpoint resumes the recursion bit-for-bit.
    """
    sos = np.atleast_2d(np.asarray(sos, dtype=float))
    if sos.shape[1] != 6:
        raise ValueError(f"sos must be (n_sections, 6), got {sos.shape}")
    n_sections = sos.shape[0]
    by = list(by)

    by_fields = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_ddl = ", ".join(
        [f"{c} {by_fields[c]}" for c in by]
        + [f"{dim} {by_fields[dim]}", "value double", "idx bigint"]
    )
    state_ddl = "zi array<double>, n_seen bigint"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            zi_flat, n_seen = state.get
            zi = np.asarray(zi_flat, dtype=float).reshape(n_sections, 2)
        else:
            zi = np.zeros((n_sections, 2))
            n_seen = 0
        # Arrow chunks within one micro-batch arrive unordered; the
        # recursion needs the batch's full sample sequence, so gather
        # and sort once (same memory bound as one batch's worth of the
        # series — the incremental point is across batches).
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(dim, kind="mergesort")
        x = pdf[value].to_numpy(dtype=float)
        y, zi = sosfilt_1d(sos, x, zi=zi)
        out = pd.DataFrame({c: pdf[c].to_numpy() for c in by})
        out[dim] = pdf[dim].to_numpy()
        out["value"] = y
        out["idx"] = n_seen + np.arange(len(x), dtype=np.int64)
        state.update((zi.ravel().tolist(), n_seen + len(x)))
        yield out

    return sdf.groupBy(*by).applyInPandasWithState(
        fn,
        outputStructType=out_ddl,
        stateStructType=state_ddl,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stft_stream(
    sdf: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    frame_len: int,
    hop: int | None = None,
    window="hann",
    value: str = "value",
) -> DataFrame:
    """Short-time Fourier transform over a streaming DataFrame,
    carrying the partial trailing frame between micro-batches.

    The batch :func:`~xarray_scipy_spark.operators.spectral.stft`
    needs each whole series co-located; on an unbounded stream that is
    impossible, but STFT state is tiny — the next frame's start is at
    ``frames_emitted·hop``, so only the samples at or past that
    position (< frame_len of them after each emit) must survive the
    batch boundary. State per key: ``(carry values, carry coords,
    frames_emitted)``. Frames are emitted exactly once, with the same
    (frame, bin, re, im) values the batch operator produces — the
    stream-equals-batch test pins that equality.

    Output per row: ``[*by, frame, bin, re, im, frame_time]`` with
    ``frame`` the global frame index since the stream began and
    ``frame_time`` the coordinate of the frame's first sample.
    """
    from ..operators.spectral import window_taps

    hop = frame_len // 2 if hop is None else int(hop)
    if hop < 1 or frame_len < 1:
        raise ValueError("frame_len and hop must be >= 1")
    taps = window_taps(window, frame_len)
    n_bins = frame_len // 2 + 1
    by = list(by)
    by_fields = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_ddl = ", ".join(
        [f"{c} {by_fields[c]}" for c in by]
        + [
            "frame bigint",
            "bin bigint",
            "re double",
            "im double",
            f"frame_time {by_fields[dim]}",
        ]
    )
    state_ddl = "carry array<double>, carry_t array<double>, frames bigint"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cv, ct, frames_emitted = state.get
            carry = np.asarray(cv, dtype=float)
            carry_t = np.asarray(ct, dtype=float)
        else:
            carry = np.zeros(0)
            carry_t = np.zeros(0)
            frames_emitted = 0
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            dim, kind="mergesort"
        )
        a = np.concatenate([carry, pdf[value].to_numpy(dtype=float)])
        at = np.concatenate([carry_t, pdf[dim].to_numpy(dtype=float)])
        n_new = max(0, (len(a) - frame_len) // hop + 1) if len(a) >= frame_len else 0
        if n_new:
            fr = (
                np.lib.stride_tricks.sliding_window_view(a, frame_len)[
                    : (n_new - 1) * hop + 1 : hop
                ]
                * taps
            )
            spec = np.fft.rfft(fr, axis=-1)
            out = pd.DataFrame(
                {
                    "frame": np.repeat(
                        frames_emitted + np.arange(n_new, dtype=np.int64), n_bins
                    ),
                    "bin": np.tile(np.arange(n_bins, dtype=np.int64), n_new),
                    "re": spec.real.ravel(),
                    "im": spec.imag.ravel(),
                    "frame_time": np.repeat(at[: n_new * hop : hop], n_bins),
                }
            )
            for c, v in zip(by, key):
                out.insert(0, c, v)
            keep_from = n_new * hop
            frames_emitted += n_new
        else:
            out = None
            keep_from = 0
        carry = a[keep_from:]
        carry_t = at[keep_from:]
        state.update((carry.tolist(), carry_t.tolist(), frames_emitted))
        if out is not None:
            yield out[by + ["frame", "bin", "re", "im", "frame_time"]]

    return sdf.groupBy(*by).applyInPandasWithState(
        fn,
        outputStructType=out_ddl,
        stateStructType=state_ddl,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def gapfill_stream(
    sdf: DataFrame,
    *,
    by: Sequence[str],
    dim: str,
    value: str = "value",
    dt,
    method: str = "linear",
) -> DataFrame:
    """Streaming regular-grid resampling: the batch
    :func:`~xarray_scipy_spark.operators.timegrid.gapfill` semantics
    over an unbounded stream, emitting each grid instant exactly once
    as soon as its bracketing observation arrives.

    State per key is four scalars — the series' grid anchor (its first
    observed instant), the previous observation ``(t, v)``, and the
    next grid index ``k`` — so state size is O(1) regardless of stream
    length, and grid instants are computed as ``anchor + k·dt`` (k an
    integer counter, mirroring the batch ``sequence`` arithmetic
    exactly; no accumulated float drift). Values reproduce the batch
    operator bit-for-bit: observed instants short-circuit to the
    observed value, interior instants interpolate with the identical
    ``v0 + ((v1 − v0)·(g − t0)) / (t1 − t0)`` op order (or carry
    ``v0`` for ``method="ffill"``). The stream-equals-batch test pins
    the equality.

    ``dim`` must be numeric in stream mode (cast timestamps to epoch
    first — the batch operator does this internally; a stream source
    usually carries the epoch column already).

    Output per row: ``[*by, <dim> double, <value> double]``.
    """
    if method not in ("linear", "ffill"):
        raise ValueError(f"method must be 'linear' or 'ffill', got {method!r}")
    step = float(dt)
    if step <= 0:
        raise ValueError(f"dt must be positive, got {dt!r}")
    by = list(by)
    by_fields = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_ddl = ", ".join(
        [f"{c} {by_fields[c]}" for c in by] + [f"{dim} double", f"{value} double"]
    )
    state_ddl = "anchor double, prev_t double, prev_v double, k bigint"
    linear = method == "linear"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            anchor, prev_t, prev_v, k = state.get
        else:
            anchor = None
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            dim, kind="mergesort"
        )
        ts = pdf[dim].to_numpy(dtype=float)
        vs = pdf[value].to_numpy(dtype=float)
        out_t: list[float] = []
        out_v: list[float] = []
        for t, v in zip(ts, vs):
            if anchor is None:
                anchor, prev_t, prev_v, k = t, t, v, 0
                out_t.append(t)
                out_v.append(v)
                k = 1
                continue
            g = anchor + k * step
            while g <= t:
                if g == prev_t:
                    out_v.append(prev_v)
                elif g == t:
                    out_v.append(v)
                elif linear:
                    out_v.append(prev_v + ((v - prev_v) * (g - prev_t)) / (t - prev_t))
                else:
                    out_v.append(prev_v)
                out_t.append(g)
                k += 1
                g = anchor + k * step
            prev_t, prev_v = t, v
        state.update((anchor, prev_t, prev_v, k))
        if out_t:
            out = pd.DataFrame({dim: out_t, value: out_v})
            for c, kv in zip(by, key):
                out.insert(0, c, kv)
            yield out[by + [dim, value]]

    return sdf.groupBy(*by).applyInPandasWithState(
        fn,
        outputStructType=out_ddl,
        stateStructType=state_ddl,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
