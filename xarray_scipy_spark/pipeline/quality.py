"""Data-quality profiling and constraint verification.

No reference analog (the reference, /root/reference/xarray_scipy, has
no tabular surface) — this is the Deequ / Great-Expectations layer a
100 TB training-data pipeline runs BEFORE trusting an input table:
profile every column in one pass, then assert the contract the
downstream consumers assume (non-null keys, uniqueness, value
domains, bounds) and fail loudly with the observed violation counts.

Scale shape:

- :func:`data_profile` — per-column count / null-count / min / max /
  mean ride ONE map-side-combinable aggregation over the table (a
  single reduce to one row, unpacked to long format driver-free);
  exact distinct counts are the one genuinely multi-pass statistic —
  Spark plans the multi-column count(DISTINCT) via Expand (rows × k
  before partial aggregation), which is the exact-answer cost at any
  engine. At 100 TB swap exactness for the repo's own mergeable HLL
  (pipeline/sketches.hll_state) per column; the exact form here is
  what the byte-exact oracle can verify.
- :func:`constraint_check` — every declarative constraint compiles to
  a conditional aggregate over the SAME single pass (one violation
  counter per constraint); only ``unique`` adds a distinct-count
  aggregate. Output is one row per constraint with the observed
  violation count, so a scheduler can gate a pipeline on
  ``passed = false`` rows without collecting anything else.
- :func:`frequent_values` — per-column top-k values: one stacked
  (column, value) projection, ONE map-side-combinable count shuffle,
  two-phase per-column top-k (no single-reducer column).

Determinism: counts are exact integers; min/max are order-free;
means quantize to 6 decimals on exact integer-count denominators.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "data_profile",
    "constraint_check",
    "frequent_values",
    "windowed_constraints",
    "missing_windows",
    "key_skew_profile",
]


def data_profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One-pass per-column profile: ``(column, n, n_null, n_distinct,
    min_val, max_val, mean_q)``.

    ``min_val``/``max_val`` are cast to string so every column type
    shares one output schema; ``mean_q`` (6-decimal mean) is null for
    non-numeric columns; ``n_distinct`` counts distinct NON-NULL
    values. Column order in the output follows the request.

    ``exact_distinct=False`` is the 100 TB path: distinct counts come
    from ``approx_count_distinct`` (Spark's HLL++, relative error
    ``rsd``) — they FOLD INTO the single stats aggregate (sketches are
    plain aggregates, no distinct rewrite, no Expand, no second scan)
    and the whole profile is one map-side-combinable pass. The
    estimates are deterministic for a given dataset (the sketch is
    merge-order-free) but are NOT cross-engine reproducible, so the
    byte-exact contract oracle pins the exact form only.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("data_profile needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    # The distinct counts run in their OWN aggregate, crossJoined back
    # (two 1-row frames): mixing k count(DISTINCT)s with the plain
    # stats in one agg makes Spark's RewriteDistinctAggregates drive
    # EVERY aggregate through the (k+1)-way Expand — measured 7.3 s
    # combined vs 0.8 s stats + 1.8 s distincts split, 10× lineitem
    # (r9). Two passes over the scan beat one pass over k+1× the rows.
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), F.lit(1))).alias(f"_null_{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{i}"))
        if c in numeric:
            aggs.append(
                F.round(F.avg(col.cast("double")), 6).alias(f"_mean_{i}")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_mean_{i}"))
    if exact_distinct:
        # ONE single-distinct aggregate per column, crossJoined as
        # 1-row broadcast frames (r17), instead of one k-distinct
        # aggregate: k count(DISTINCT)s in one agg make Spark's
        # RewriteDistinctAggregates drive the scan through a
        # (k+1)-way Expand — k+1 copies of every row feeding one
        # shuffle — while a SINGLE count(DISTINCT c) plans as a plain
        # two-level aggregate (partial distinct per partition, no
        # Expand). Scan bytes are the same either way (each split
        # prunes to its one column, k×1-col ≡ 1×k-col), the shuffles
        # carry the same distinct values, and the Expand row
        # multiplication disappears — measured 1.62 s → 0.85 s on the
        # 5-column lineitem profile at sf0.1 (matched in-session A/B;
        # the stacked (i, value) single-pass alternative measured
        # WORSE, 2.2 s, and stays rejected). Counts are exact integers
        # either way — byte-identical output.
        one = df.agg(*aggs)
        for i, c in enumerate(cols):
            one = one.crossJoin(
                F.broadcast(
                    df.agg(F.count_distinct(F.col(c)).alias(f"_dist_{i}"))
                )
            )
    else:
        # HLL++ sketches are ordinary aggregates — safe to fold into
        # the stats pass (no distinct rewrite fires, no Expand)
        aggs += [
            F.approx_count_distinct(F.col(c), rsd).alias(f"_dist_{i}")
            for i, c in enumerate(cols)
        ]
        one = df.agg(*aggs)
    # unpack the single stats row to long format with a literal
    # column-name axis — stack() is pure projection, no extra pass
    fields = ", ".join(
        f"'{c}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}, _mean_{i}"
        for i, c in enumerate(cols)
    )
    stacked = one.select(
        "_n",
        F.expr(
            f"stack({len(cols)}, {fields}) AS "
            "(column, n_null, n_distinct, min_val, max_val, mean_q)"
        ),
    )
    return stacked.select(
        "column",
        F.col("_n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
        (F.col("mean_q") + F.lit(0.0)).alias("mean_q"),
    )


def _row_counter(spec: Mapping, alias: str):
    """Compile one ROW-PREDICATE constraint spec to ``(name, kind,
    violation-counter aggregate)`` — the shared piece between the batch
    :func:`constraint_check` and the event-time
    :func:`windowed_constraints`. ``unique``/``min_rows`` are handled
    by the callers (they aren't per-row predicates)."""
    kind = spec["kind"]
    if kind == "not_null":
        c = spec["column"]
        return (
            f"not_null({c})",
            kind,
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(alias),
        )
    if kind == "in_set":
        c = spec["column"]
        vals = list(spec["values"])
        return (
            f"in_set({c})",
            kind,
            F.count(
                F.when(F.col(c).isNotNull() & ~F.col(c).isin(vals), F.lit(1))
            ).alias(alias),
        )
    if kind == "between":
        c = spec["column"]
        lo, hi = spec["min"], spec["max"]
        return (
            f"between({c}, {lo}, {hi})",
            kind,
            F.count(
                F.when(
                    F.col(c).isNotNull()
                    & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
                    F.lit(1),
                )
            ).alias(alias),
        )
    if kind == "non_negative":
        c = spec["column"]
        return (
            f"non_negative({c})",
            kind,
            F.count(
                F.when(F.col(c).isNotNull() & (F.col(c) < 0), F.lit(1))
            ).alias(alias),
        )
    return None


def constraint_check(
    df: DataFrame,
    constraints: Sequence[Mapping],
) -> DataFrame:
    """Verify declarative constraints in one aggregation pass:
    ``(constraint, kind, passed, n_violations, n_rows)``.

    Supported kinds (each a mapping with ``kind`` plus its params):

    - ``{"kind": "not_null", "column": c}`` — no null values in c;
    - ``{"kind": "unique", "columns": [c, ...]}`` — no duplicate
      (non-null-treated-as-value) key tuples;
    - ``{"kind": "in_set", "column": c, "values": [...]}`` — every
      non-null value drawn from the set;
    - ``{"kind": "between", "column": c, "min": lo, "max": hi}`` —
      every non-null value inside [lo, hi];
    - ``{"kind": "min_rows", "value": k}`` — table has >= k rows;
    - ``{"kind": "non_negative", "column": c}`` — no negative values.

    All row-predicate constraints compile to conditional counters in
    ONE map-side-combinable aggregate; ``unique`` constraints run
    their count-distinct terms in a SEPARATE aggregate crossJoined
    back (1-row × 1-row) — mixing a count(DISTINCT) with the plain
    counters drives every counter through the distinct-rewrite Expand,
    measured 19.2 s vs ~3 s split at 24M lineitem rows (r9; the same
    pathology as data_profile's).
    ``passed`` is false iff ``n_violations > 0`` (for ``min_rows``:
    the shortfall). Constraint names are ``<kind>(<args>)`` and the
    output preserves request order.
    """
    if not constraints:
        raise ValueError("constraint_check needs at least one constraint")
    aggs = [F.count(F.lit(1)).alias("_n")]
    names: list[tuple[str, str]] = []
    uniques: list[tuple[int, list[str]]] = []
    for i, spec in enumerate(constraints):
        kind = spec["kind"]
        if kind == "unique":
            kc = list(spec["columns"])
            names.append((f"unique({', '.join(kc)})", kind))
            uniques.append((i, kc))
        elif kind == "min_rows":
            names.append((f"min_rows({spec['value']})", kind))
            # violation count computed post-agg from _n
        else:
            compiled = _row_counter(spec, f"_v_{i}")
            if compiled is None:
                raise ValueError(f"unknown constraint kind: {kind!r}")
            name, kind, counter = compiled
            names.append((name, kind))
            aggs.append(counter)
    one = df.agg(*aggs)
    if uniques:
        dist_aggs = [
            F.count_distinct(F.struct(*[F.col(c) for c in kc])).alias(
                f"_d_{i}"
            )
            for i, kc in uniques
        ]
        one = one.crossJoin(F.broadcast(df.agg(*dist_aggs)))
    rows = []
    for i, (spec, (name, kind)) in enumerate(zip(constraints, names)):
        if kind == "unique":
            viol = F.col("_n") - F.col(f"_d_{i}")
        elif kind == "min_rows":
            k = int(spec["value"])
            viol = F.greatest(F.lit(0), F.lit(k) - F.col("_n"))
        else:
            viol = F.col(f"_v_{i}")
        rows.append(
            F.struct(
                F.lit(name).alias("constraint"),
                F.lit(kind).alias("kind"),
                (viol == 0).alias("passed"),
                viol.cast("long").alias("n_violations"),
                F.col("_n").cast("long").alias("n_rows"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("_r")).select("_r.*")


def frequent_values(
    df: DataFrame,
    columns: Sequence[str],
    *,
    k: int = 5,
    buckets: int = 32,
) -> DataFrame:
    """Top-``k`` most frequent values per column: ``(column, value,
    cnt, rank)`` — the value-distribution half of profiling (skew,
    default-value pollution, categorical drift).

    One pass: every requested column stacks into (column, value-as-
    string) rows — a pure projection, no extra scan per column — then
    ONE map-side-combinable count shuffle keyed (column, value), and
    the per-column top-k runs TWO-PHASE (the cap_per_group shape): a
    (column, hash-bucket)-local prune to k — the global top-k is
    always a subset of bucket-local top-ks — then the exact ranking
    over <= buckets·k survivors per column. No column's value
    distribution ever serializes through one reducer. Nulls are
    excluded (they're counted by :func:`data_profile`).

    Determinism: counts are exact; ties rank by value ascending.
    """
    from pyspark.sql import Window

    cols = list(columns)
    if not cols:
        raise ValueError("frequent_values needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if buckets < 1:
        # buckets=0 would make pmod(..., 0) NULL and silently collapse
        # the two-phase prune to one partition per column (correct
        # output, no skew protection) — reject like dup_buckets does
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    fields = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    stacked = df.select(
        F.expr(f"stack({len(cols)}, {fields}) AS (column, value)")
    ).filter(F.col("value").isNotNull())
    cnt = stacked.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bucket = F.pmod(F.xxhash64(F.col("value")), F.lit(buckets))
    pruned = (
        cnt.withColumn("_b", bucket)
        .withColumn(
            "_lr",
            F.row_number().over(
                Window.partitionBy("column", "_b").orderBy(
                    F.col("cnt").desc(), F.col("value").asc()
                )
            ),
        )
        .filter(F.col("_lr") <= k)
        .drop("_b", "_lr")
    )
    final = Window.partitionBy("column").orderBy(
        F.col("cnt").desc(), F.col("value").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("column", "value", "cnt", F.col("rank").cast("long").alias("rank"))
    )


def windowed_constraints(
    sdf: DataFrame,
    *,
    dim: str,
    constraints: Sequence[Mapping],
    window: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed constraint monitoring — the STREAMING shape
    of :func:`constraint_check`: per tumbling window, the violation
    count for each row-predicate constraint, so a pipeline can alarm
    on the window where an upstream feed started emitting nulls or
    out-of-domain values instead of discovering it at the next batch
    audit.

    Works identically on streaming and static frames (the
    ``streaming.windowed_stats`` pattern): one incremental
    ``groupBy(window(...))`` aggregate whose state is one counter row
    per (window, constraint-set); the watermark finalizes and evicts
    old windows, so state is bounded by the watermark horizon at ANY
    stream length. Supported kinds: the row predicates (``not_null``,
    ``in_set``, ``between``, ``non_negative``) plus ``min_rows``
    (a per-WINDOW row floor — the low-volume check). ``unique``
    is rejected: exact cross-window uniqueness needs unbounded state;
    run it in the batch audit.

    ``min_rows`` caveat: a window with ZERO rows produces no group and
    therefore no output row — the floor only evaluates windows that
    received at least one event, so it cannot flag a completely silent
    feed (the true heartbeat-failure case). Total-silence detection is
    :func:`missing_windows`: feed it this output (plus the monitoring
    horizon) and it reports every expected window that never produced
    a row — a grid-sized left-anti join, no event-volume work.

    Output: ``(window_start, constraint, kind, passed, n_violations,
    n_rows)``, one row per (window, constraint).
    """
    from ..functions.timeutil import event_time

    if not constraints:
        raise ValueError("windowed_constraints needs at least one constraint")
    work = sdf.withColumn("__event_time__", event_time(sdf, dim))
    if work.isStreaming:
        work = work.withWatermark("__event_time__", watermark)
    aggs = [F.count(F.lit(1)).alias("_n")]
    names: list[tuple[str, str]] = []
    for i, spec in enumerate(constraints):
        kind = spec["kind"]
        if kind == "unique":
            raise ValueError(
                "windowed_constraints does not support 'unique' (exact "
                "cross-window uniqueness is unbounded state) — use the "
                "batch constraint_check"
            )
        if kind == "min_rows":
            names.append((f"min_rows({spec['value']})", kind))
            continue
        compiled = _row_counter(spec, f"_v_{i}")
        if compiled is None:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        name, kind, counter = compiled
        names.append((name, kind))
        aggs.append(counter)
    agg = work.groupBy(F.window("__event_time__", window).alias("w")).agg(
        *aggs
    )
    rows = []
    for i, (spec, (name, kind)) in enumerate(zip(constraints, names)):
        if kind == "min_rows":
            k = int(spec["value"])
            viol = F.greatest(F.lit(0), F.lit(k) - F.col("_n"))
        else:
            viol = F.col(f"_v_{i}")
        rows.append(
            F.struct(
                F.lit(name).alias("constraint"),
                F.lit(kind).alias("kind"),
                (viol == 0).alias("passed"),
                viol.cast("long").alias("n_violations"),
                F.col("_n").cast("long").alias("n_rows"),
            )
        )
    return agg.select(
        F.col("w.start").cast("long").alias("window_start"),
        F.explode(F.array(*rows)).alias("_r"),
    ).select("window_start", "_r.*")


def missing_windows(
    observed: DataFrame,
    *,
    window_start_col: str = "window_start",
    window_seconds: int,
    range_start=None,
    range_end=None,
) -> DataFrame:
    """Total-silence (heartbeat-failure) detection — the downstream
    half :func:`windowed_constraints` documents: a window with ZERO
    events produces no aggregate row at all, so the only way to see a
    dead feed is to generate the EXPECTED window grid and subtract the
    windows that reported.

    ``observed`` is any frame with epoch-second window starts in
    ``window_start_col`` (``windowed_constraints``' output works
    as-is). The expected grid spans ``[range_start, range_end)``
    epoch seconds — pass the monitoring horizon explicitly for a live
    monitor; left as None they default to the observed min/max, which
    detects interior gaps only (a feed that died and never came back
    has no observed right edge to learn from, which is exactly why a
    real monitor pins ``range_end`` to the wall clock).

    Plan: the grid is ONE ``sequence()`` projection — O(windows) rows,
    a calendar property, never event volume — and the subtraction is a
    left-anti join on the window start: grid-sized, broadcastable. The
    input pays exactly ONE scan: the distinct-windows frame (map-side
    partials collapse the exchange to per-partition-unique windows) is
    lazily checkpointed and the unpinned horizon bounds are read from
    THAT tiny frame, not from a second scan of ``observed`` — the r12
    tier decomposition caught the old bounds aggregate re-scanning the
    full input (2.11 s -> one-scan at the 1000x events tier; the
    pinned path still scans nothing for bounds, ADVICE r10 #2).
    Output: ``(window_start,)`` one row per silent window, ascending.
    """
    if window_seconds <= 0:
        raise ValueError(
            f"window_seconds must be positive, got {window_seconds}"
        )
    spark = observed.sparkSession
    w = F.col(window_start_col).cast("long")
    per = int(window_seconds)
    seen = observed.select(w.alias("window_start")).distinct()
    if range_start is not None and range_end is not None:
        # pinned horizon (the live-monitor configuration): no need to
        # scan `observed` for bounds at all (ADVICE r10 #2)
        lo, hi = int(range_start), int(range_end)
    else:
        # windows-sized frame: materialize it once, read the bounds
        # from it, reuse it in the anti-join — never a second pass
        # over the event-volume input
        seen = seen.localCheckpoint(eager=False)
        bounds = seen.agg(
            F.min("window_start").alias("_lo"),
            F.max("window_start").alias("_hi"),
        ).first()
        lo = int(range_start) if range_start is not None else bounds["_lo"]
        hi = int(range_end) if range_end is not None else (
            None if bounds["_hi"] is None else bounds["_hi"] + per
        )
    if lo is None or hi is None or hi <= lo:
        return spark.range(0).select(
            F.col("id").cast("long").alias("window_start")
        )
    # align the grid to the same epoch buckets window() produces
    first = (lo // per) * per
    grid = spark.range(first, hi, per).select(
        F.col("id").cast("long").alias("window_start")
    )
    return grid.join(seen, "window_start", "left_anti").orderBy(
        "window_start"
    )


def key_skew_profile(
    df: DataFrame,
    *,
    key_col: str,
) -> DataFrame:
    """Per-key volume distribution as a log2-bucketed histogram — the
    DETECT half of skew handling (``operators/joins.skew_join`` is the
    fix): before shuffling 100 TB on a key, this says whether the key
    is salting-worthy and how bad the head is.

    One row per occupied bucket ``b`` (keys appearing in
    ``[2^b, 2^(b+1))`` rows): ``(log2_bucket, n_keys, n_rows,
    max_count)``, ascending. A healthy uniform key produces one or two
    adjacent buckets; a power-law key paints a long bucket tail whose
    top rows name the salt-or-broadcast decision. NULL keys count as a
    key (they hash to one reducer like any other value — the classic
    accidental-skew source).

    Plan: ONE map-side-combinable ``groupBy(key).count()`` shuffle —
    the same exchange any downstream join would pay — then a second
    aggregation over the (keys)-sized count frame. The bucket index is
    integer bit-length arithmetic (``length(bin(c)) - 1``), not
    float ``log2``: exact at power-of-two boundaries on every engine,
    so the DuckDB oracle reproduces it byte-for-byte.
    """
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    bucket = (
        F.length(F.conv(F.col("_c").cast("string"), 10, 2)) - 1
    ).cast("bigint")
    return (
        counts.groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("_c").alias("n_rows"),
            F.max("_c").alias("max_count"),
        )
        .orderBy("log2_bucket")
    )
