"""Stream-stream enrichment joins with bounded state.

The last streaming category the engine needed: joining two UNBOUNDED
streams (events against a concurrently-streaming context side —
calibrations, model versions, rate tables) without unbounded state.
Structured Streaming supports this natively when both sides carry
watermarks and the join condition bounds how far apart matching rows
can be in event time; the state store then keeps only the watermark
horizon of each side.

This module wraps the pattern with the engine's time handling
(TIMESTAMP_NTZ-safe event time) and the state-bound reasoning made
explicit, and the test pins stream-equals-batch over a multi-batch
feed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.timeutil import event_time

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equality keys plus the event-time bound
    ``left_ts − tolerance <= right_ts <= left_ts`` (each left row
    matches the right rows that happened AT OR BEFORE it, within the
    tolerance — the streaming shape of a bounded-lookback enrichment).

    Both sides get ``watermark`` watermarks on their event-time
    columns, which is what lets Spark EVICT join state: a buffered
    right row can be dropped once the left watermark passes
    ``right_ts + tolerance``, so state is O(rate × (watermark +
    tolerance)) per side regardless of stream length. ``how``:
    ``"inner"`` or ``"leftOuter"`` (outer emits the unmatched left row
    once its watermark closes the match window — late output equal to
    the watermark delay, the documented streaming-join tradeoff).

    Event-time columns are normalized through
    :func:`~xarray_scipy_spark.functions.timeutil.event_time`
    (TIMESTAMP_NTZ parquet reads join on the same epoch timeline the
    batch oracle computes on). Output: left columns + right's
    non-key columns (right's event time as ``{right_ts}``).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how!r}")
    on = list(on)
    lt = left.withColumn(left_ts, event_time(left, left_ts)).withWatermark(
        left_ts, watermark
    )
    rt = right.withColumn(right_ts, event_time(right, right_ts)).withWatermark(
        right_ts, watermark
    )
    # avoid key-name collisions by aliasing the right side
    l, r = lt.alias("l"), rt.alias("r")
    cond = None
    for c in on:
        e = F.col(f"l.{c}") == F.col(f"r.{c}")
        cond = e if cond is None else (cond & e)
    cond = (
        cond
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {tolerance}")
        )
    )
    joined = l.join(r, cond, how)
    keep_right = [
        F.col(f"r.{c}") for c in right.columns if c not in (*on, right_ts)
    ] + [F.col(f"r.{right_ts}").alias(right_ts)]
    return joined.select(*[F.col(f"l.{c}") for c in left.columns], *keep_right)
