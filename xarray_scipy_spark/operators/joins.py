"""Temporal joins Spark lacks as built-ins: the as-of join.

An as-of join pairs every left row with the nearest right row at or
before (``direction="backward"``) / at or after (``"forward"``) its
timestamp, per key — the standard alignment primitive for time-series
enrichment (quotes→trades, sensor→calibration, events→model-version).

Scale design: the naive formulation is a range join (cartesian per key
+ filter + argmax) that explodes quadratically on hot keys. This
implementation instead UNIONS both sides into one stream, shuffles ONCE
on the key, and runs ``last(value, ignorenulls=True)`` over an ordered
window — O(n log n) per partition, no join node at all, no build side
to skew. The physical plan is Exchange → Sort → Window → Filter, the
shape that survives a 1000-executor scale-up; AQE's skew handling
applies to the single exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join", "interval_join", "skew_join", "bloom_semijoin"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_values: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the matched
    ``right`` row's ``right_values`` (null when no match exists).

    ``direction="backward"`` matches the greatest ``right_ts <=
    left_ts``; ``"forward"`` the least ``right_ts >= left_ts``;
    ``"nearest"`` (r7, the pandas ``merge_asof`` surface) whichever of
    the two is closer in time, ties going backward. Ties (equal
    timestamps) match. ``tolerance`` (r7) nulls out matches farther
    than the given distance — in the units of the timestamp columns
    (numeric difference; for timestamp dtypes, SECONDS). The matched
    right timestamp is emitted as ``{right_ts}{suffix}``.

    Plan shape is unchanged by either option: ``nearest`` rides TWO
    window passes over the SAME single exchange (one ascending, one
    descending sort — no join node, no second shuffle), and
    ``tolerance`` is a pure projection on the matched columns.

    Matched columns keep their name unless it collides with a left
    column, in which case ``suffix`` is appended.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    on = list(on)
    right_ts = right_ts or left_ts
    if right_values is None:
        right_values = [c for c in right.columns if c not in (*on, right_ts)]
    right_values = list(right_values)

    out_names = {
        c: c + suffix if c in left.columns else c for c in (right_ts, *right_values)
    }

    # one unified stream: left rows carry their payload, right rows carry
    # the columns to propagate; __side__ breaks timestamp ties so the
    # right row at an equal timestamp is visible to the left row
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__t__"),
        F.lit(1).alias("__side__"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__rv_{c}") for c in (right_ts, *right_values)],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c not in on else F.col(c) for c in left.columns],
        F.col(right_ts).alias("__t__"),
        F.lit(0).alias("__side__"),
        *[F.col(c).alias(f"__rv_{c}") for c in (right_ts, *right_values)],
    )
    both = l_tagged.unionByName(r_tagged)

    def w_for(dirn):
        # side asc puts the right row first at an equal timestamp in
        # EITHER scan direction, so exact-timestamp matches always land
        t_order = F.col("__t__").asc() if dirn == "backward" else F.col("__t__").desc()
        return (
            Window.partitionBy(*on)
            .orderBy(t_order, F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    def dist(match_ts_col):
        # timestamps cast to epoch SECONDS as double; numeric dims
        # compare in their own units
        return F.abs(
            F.col("__t__").cast("double") - match_ts_col.cast("double")
        )

    if direction in ("backward", "forward"):
        w = w_for(direction)
        matched = both.select(
            *left.columns,
            "__t__",
            "__side__",
            *[
                F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(out_names[c])
                for c in (right_ts, *right_values)
            ],
        )
    else:  # nearest: both passes over the same exchange, pick the closer
        wb, wf = w_for("backward"), w_for("forward")
        cols = []
        for c in (right_ts, *right_values):
            cols.append(
                F.last(f"__rv_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            )
            cols.append(
                F.last(f"__rv_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            )
        staged = both.select(*left.columns, "__t__", "__side__", *cols)
        bt, ft = F.col(f"__b_{right_ts}"), F.col(f"__f_{right_ts}")
        use_b = F.when(
            bt.isNull(), F.lit(False)
        ).otherwise(ft.isNull() | (dist(bt) <= dist(ft)))
        matched = staged.select(
            *left.columns,
            "__t__",
            "__side__",
            *[
                F.when(use_b, F.col(f"__b_{c}"))
                .otherwise(F.col(f"__f_{c}"))
                .alias(out_names[c])
                for c in (right_ts, *right_values)
            ],
        )
    if tolerance is not None:
        mt = F.col(out_names[right_ts])
        ok = mt.isNotNull() & (dist(mt) <= F.lit(float(tolerance)))
        matched = matched.select(
            *left.columns,
            "__side__",
            *[
                F.when(ok, F.col(out_names[c])).alias(out_names[c])
                for c in (right_ts, *right_values)
            ],
        )
    else:
        matched = matched.drop("__t__")
    return matched.filter(F.col("__side__") == 1).drop("__side__")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    granularity: int | float = None,
) -> DataFrame:
    """Inner join of points to the closed intervals containing them
    (``start <= point <= end``), without a cartesian/nested-loop plan.

    Without an equi-key, Spark plans a range predicate as
    BroadcastNestedLoopJoin (every point × every interval). Here the
    range axis is chunked at ``granularity``: each interval explodes
    into the chunks it covers, each point maps to exactly ONE chunk, and
    the join is an equi hash join on ``(chunk, *on)`` followed by the
    precise containment filter. No duplicate elimination is needed —
    a point matches an interval only in the point's own chunk.

    Cost model: interval explosion factor = interval length /
    granularity (choose granularity near the typical interval length so
    the factor is small); the hash join shuffles on chunk keys, so long
    intervals spread across many chunks instead of hot-spotting one
    task, and AQE's skew split covers residual hot chunks. All columns
    must be numeric (cast timestamps to epoch first).

    Output: all point columns + all interval columns (``on`` keys once).
    """
    if granularity is None or granularity <= 0:
        raise ValueError("granularity must be a positive number")
    on = list(on)
    # integer-div chunking (exact — float division loses low digits at
    # epoch magnitudes). trunc-toward-zero is monotone, so start<=p<=end
    # always implies chunk(start) <= chunk(p) <= chunk(end).
    g = int(granularity)
    if g != granularity or g < 1:
        # int() truncation would make 0.5 -> 0 (div-0 -> NULL chunks ->
        # silently empty join) and 2.7 -> 2 (silent re-bucketing)
        raise ValueError(
            f"granularity must be a whole number >= 1, got {granularity!r}"
        )
    p_chunk = F.expr(f"CAST(`{point_col}` AS BIGINT) div {g}")
    i_chunks = F.sequence(
        F.expr(f"CAST(`{start_col}` AS BIGINT) div {g}"),
        F.expr(f"CAST(`{end_col}` AS BIGINT) div {g}"),
    )
    pts = points.withColumn("__chunk__", p_chunk)
    ivs = intervals.withColumn("__chunk__", F.explode(i_chunks))
    joined = pts.join(ivs, on=["__chunk__", *on], how="inner").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__chunk__")


def skew_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_id: str,
    how: str = "inner",
    salt: int = 16,
    hot_keys: DataFrame | None = None,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Equi-join that survives hot keys: ``left ⋈ right`` on ``on``
    with the skewed keys SALTED so no single task owns a hot key's
    whole partition.

    The classic failure at scale: a handful of keys carry 100-1000x
    the median row count (the null-ish sentinel user, the default
    domain, the empty-string hash), and a plain shuffle join stalls on
    the straggler tasks holding them — AQE's skew split helps the SORT
    side but cannot split a single grouped hash bucket mid-join. The
    standard fix is salting, done here only where it pays:

    - hot keys are found with ONE aggregation on the left side (keys
      with ``count >= hot_threshold``), or supplied via ``hot_keys``
      (a DataFrame of key columns) when the caller already knows them
      — e.g. from a :func:`~xarray_scipy_spark.pipeline.sketches.
      countmin_sketch` maintained by an upstream pass;
    - the hot-key frame is tiny by construction and is BROADCAST to
      tag both sides — the big sides never reshuffle for detection;
    - ``right`` rows under hot keys replicate ``salt`` ways (explode;
      extra shuffle volume = salt x hot right rows only), ``left``
      rows under hot keys pick ONE deterministic salt from
      ``md5(left_id)`` — every matched pair meets in exactly one
      bucket, so the result is row-for-row the plain join, just
      diffused across ``salt`` tasks per hot key;
    - cold keys pass through with salt 0 on both sides — zero
      replication, identical plan to the unsalted join.

    ``how``: ``"inner"`` or ``"left"``. ``left_id`` names a left
    column whose values decide the salt bucket (any column works;
    a high-cardinality id spreads best, and determinism makes reruns
    and retries produce identical assignments).

    Output: the joined frame (key columns once, salt bookkeeping
    dropped).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")
    on = list(on)
    if hot_keys is None:
        hot_keys = (
            left.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= hot_threshold)
            .select(*on)
        )
    hot = F.broadcast(hot_keys.select(*on).distinct().withColumn("_hot", F.lit(True)))

    from ..pipeline.hashes import h60

    lsalt = F.when(
        F.col("_hot").isNotNull(),
        h60(F.concat_ws("|", F.lit("skewsalt"), F.col(left_id).cast("string")))
        % F.lit(salt),
    ).otherwise(F.lit(0))
    lt = (
        left.join(hot, on, "left")
        .withColumn("_salt", lsalt.cast("int"))
        .drop("_hot")
    )
    rsalts = F.sequence(
        F.lit(0),
        F.when(F.col("_hot").isNotNull(), F.lit(salt - 1)).otherwise(F.lit(0)),
    )
    rt = (
        right.join(hot, on, "left")
        .withColumn("_salts", rsalts)
        .withColumn("_salt", F.explode("_salts"))
        .drop("_hot", "_salts")
    )
    return lt.join(rt, on=[*on, "_salt"], how=how).drop("_salt")


def bloom_semijoin(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    m_bits: int = 1 << 20,
    k: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Selective equi-join with a Bloom-filter probe-side reduction:
    ``left ⋈ right`` on ``on`` where ``left`` is huge and ``right``'s
    key set is selective — the explicit form of the runtime filter
    engines inject for star-schema joins.

    The 100 TB lever: a plain shuffle join moves EVERY left row to the
    exchange even when only a few percent survive. Here ``right``'s
    distinct key fingerprints (``k`` md5-derived positions in
    ``[0, m_bits)``) are bit_or-PACKED into 64-bit words map-side —
    ≤ ``m_bits/64`` rows shuffle regardless of build-side size — and
    the ≤ 128 KiB bitmap returns to the driver as an array literal
    (the kmeans-centroids collect pattern: closed over ``m_bits``,
    never rows). The probe is then a PURE whole-stage-codegen
    projection — ``getbit(element_at(bitmap, pos/64), pos%64)`` for
    all ``k`` positions — zero joins, zero shuffle, zero Python
    before the final exact join. An earlier draft probed via k
    broadcast LEFT-SEMI joins; it re-materialized the bits subtree
    per probe and measured 2.1 s where this projection form is
    scan-bound (BASELINE.md r7).

    False positives only admit extra rows into the final exact join,
    which drops them — with ``exact=True`` (default) the result is
    row-for-row the plain inner join, with the join shuffle shrunk to
    (true matches + fp rate). ``exact=False`` returns the filtered
    ``left`` itself (approximate semi-join, NO false negatives) for
    pipelines that tolerate over-admission.

    Inner-join semantics only: pruning the probe side is unsound for
    outer joins. Null join keys never match in SQL and are dropped by
    the final join either way.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if m_bits < 64:
        raise ValueError(f"m_bits must be >= 64, got {m_bits}")
    on = list(on)

    # xxhash64, not the md5-based h60: the filter's hash choice is
    # invisible to correctness (false positives die in the exact join,
    # and the oracle is the PLAIN join), so the probe can use the
    # cheapest codegen hash — md5 on every probe row measured ~3 s of
    # pure hashing at the 10× tier. Seeded per probe index via a
    # leading literal. Key dtypes must match across sides (typed
    # values hash, no string cast).
    def positions(side: DataFrame):
        return [
            F.pmod(
                F.xxhash64(F.lit(f"bsj{i}"), *[side[c] for c in on]),
                F.lit(m_bits),
            )
            for i in range(k)
        ]

    n_words = (m_bits + 63) // 64
    words = (
        right.select(F.explode(F.array(*positions(right))).alias("pos"))
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("bv"),
        )
        .groupBy("w")
        .agg(F.bit_or("bv").alias("bits"))
    )

    if n_words <= 4096:
        # small filter: the packed words densify into ONE array row
        # inside the aggregate (the per-slot map lookup runs once, on a
        # single row) and ride to the probe as a broadcast — the build
        # scan is scheduled inside the main job instead of an eager
        # collect() barrier at plan-build time (guide §5: the driver
        # does no data work; r16). Probing stays an O(1) array index
        # inside whole-stage codegen, exactly as the literal form.
        # working-column names must not collide with the caller's frame
        # (ADVICE r16 low): suffix until absent from left.columns
        bmc = "_bsj_bm"
        while bmc in left.columns:
            bmc += "_"
        bmrow = words.agg(
            F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias(
                "_m"
            )
        ).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.try_element_at(F.col("_m"), i), F.lit(0).cast("long")
                ),
            ).alias(bmc)
        )
        bm = F.col(bmc)
        cond = None
        for pos in positions(left):
            word = F.element_at(bm, (F.floor(pos / 64) + 1).cast("int"))
            hit = F.getbit(word, F.pmod(pos, F.lit(64)).cast("int")) == 1
            cond = hit if cond is None else (cond & hit)
        probe = (
            left.crossJoin(F.broadcast(bmrow)).filter(cond).drop(bmc)
        )
    else:
        # large filter (big build-side key sets): a multi-MB literal
        # would bloat the plan, so the packed words stay a DataFrame —
        # materialized ONCE (lazy localCheckpoint: the first broadcast
        # build triggers it inside the main job, no plan-build barrier;
        # r16) and BROADCAST into k word-lookup hash joins + getbit
        # filters. Still zero probe-side shuffle; an absent word means
        # no bits set, so the inner join itself drops those rows.
        # Executor-local blocks (r17 note): the checkpointed words
        # frame is at most m_bits/64 rows (bounded by construction),
        # but an executor loss mid-query fails the query instead of
        # recomputing it — use reliable checkpoint() on lossy clusters.
        wdf = words.localCheckpoint(eager=False)
        probe = left
        for i, pos in enumerate(positions(left)):
            wcol, bcol = f"_bsw{i}", f"_bsb{i}"
            # same collision guard as the small path's bitmap column
            while wcol in left.columns:
                wcol += "_"
            while bcol in left.columns:
                bcol += "_"
            probe = (
                probe.join(
                    F.broadcast(
                        wdf.select(
                            F.col("w").alias(wcol), F.col("bits").alias(bcol)
                        )
                    ),
                    F.floor(pos / 64).cast("int") == F.col(wcol),
                    "inner",
                )
                .filter(F.getbit(F.col(bcol), F.pmod(pos, F.lit(64)).cast("int")) == 1)
                .drop(wcol, bcol)
            )
    if not exact:
        return probe
    return probe.join(right, on, "inner")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    granularity: int | float = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join of OVERLAPPING closed intervals (``a.start <= b.end
    AND b.start <= a.end``) without a nested-loop plan — the
    interval×interval sibling of :func:`range_join`'s point-in-interval.

    Scale shape: both sides explode into the ``granularity``-sized
    chunks they cover and meet in an equi hash join on ``(chunk,
    *on)``. A pair of overlapping intervals co-occurs in EVERY chunk
    their overlap spans, so naive chunking needs a distinct (a second
    full shuffle of the matches); instead each pair is emitted EXACTLY
    ONCE — at the chunk containing ``max(a.start, b.start)``, which
    every overlapping pair has and no pair has twice. No dedup
    shuffle, no CartesianProduct. Choose ``granularity`` near the
    typical interval length (explosion factor = length/granularity);
    AQE's skew split covers hot chunks. Numeric columns only (cast
    timestamps to epoch first).

    Output: all left columns + right columns (``on`` once; colliding
    names get ``suffix``).
    """
    if granularity is None or granularity <= 0:
        raise ValueError("granularity must be a positive number")
    g = int(granularity)
    if g != granularity or g < 1:
        # int() truncation would make 0.5 -> 0 (div-0 -> NULL chunks ->
        # silently empty join) and 2.7 -> 2 (silent re-bucketing)
        raise ValueError(
            f"granularity must be a whole number >= 1, got {granularity!r}"
        )
    on = list(on)

    def chunks(start_col, end_col):
        return F.sequence(
            F.expr(f"CAST(`{start_col}` AS BIGINT) div {g}"),
            F.expr(f"CAST(`{end_col}` AS BIGINT) div {g}"),
        )

    lt = left.withColumn("__chunk__", F.explode(chunks(left_start, left_end)))
    renames = {
        c: c + suffix if c in left.columns and c not in on else c
        for c in right.columns
    }
    rt = right.select(
        *[F.col(c).alias(renames[c]) for c in right.columns]
    ).withColumn(
        "__chunk__",
        F.explode(chunks(renames[right_start], renames[right_end])),
    )
    rs, re_ = renames[right_start], renames[right_end]
    joined = lt.join(rt, on=["__chunk__", *on], how="inner").filter(
        (F.col(left_start) <= F.col(re_)) & (F.col(rs) <= F.col(left_end))
    )
    # exactly-once: the pair belongs to the chunk holding the LATER
    # start (integer div — float division loses low digits at epoch
    # magnitudes, the range_join lesson)
    later_chunk = F.expr(
        f"greatest(CAST(`{left_start}` AS BIGINT), CAST(`{rs}` AS BIGINT)) div {g}"
    )
    return joined.filter(F.col("__chunk__") == later_chunk).drop("__chunk__")
