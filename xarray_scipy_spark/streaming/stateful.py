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

__all__ = ["sosfilt_stream"]


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
