"""Mergeable probabilistic sketches with engine-portable determinism.

At 100 TB, exact answers to "how many distinct tokens", "how often does
this n-gram appear", and "is this shingle in the eval suite" stop being
free: exact distinct is a full shuffle of every distinct value, exact
frequency tables don't fit an executor, and an exact decontamination
set can be gigabytes of strings where a Bloom filter is kilobytes.
These sketches bound that cost: each one is a FIXED-size state computed
with one map-side-combinable aggregation (partial aggregation does the
compression on the mappers; the shuffle moves at most
``registers × groups`` rows, never data-proportional rows), and states
from disjoint partitions/days/shards merge associatively — the property
that makes them incremental at scale.

Determinism design (same trick as :mod:`.hashes`): every hash is "first
15 hex chars of md5, base-16" and every state value is kept in BIGINT
arithmetic, so the identical state is reproducible in DuckDB and the
contract oracle compares sketch states BYTE-exactly — no "approximately
equal" hand-waving in the correctness gate. Floating point appears only
in the final estimate formula, computed from the integer state.

No reference analog (the reference has no aggregates at all,
SURVEY.md §2.3); public-knowledge constructions: HyperLogLog (Flajolet,
Fusy, Gandouet, Meunier 2007), count-min (Cormode, Muthukrishnan 2005),
Bloom (1970).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .hashes import _c, spread, tokens, word_shingles

__all__ = [
    "hll_state",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_distinct",
    "countmin_sketch",
    "histogram_sketch",
    "filter_by_quantile",
    "quantile_from_histogram",
    "countmin_lookup",
    "bloom_bits",
    "bloom_decontaminate",
]


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

# 60-bit md5 hash = p low bits of bucket index + (60 - p) high bits of
# rank material. With the default p=12: 4096 registers, ranks 1..49
# (rank 49 = all 48 high bits zero). Register terms are stored as
# 2^(RANK_SCALE - rank) BIGINTs so the sum of 2^-rank over registers is
# EXACT integer arithmetic (associative — safe under any partial-agg
# order, unlike float sums whose rounding is order-dependent).
_RANK_SCALE = 49


def _hll_rank_ladder_sql(p: int, hi_expr: str = "hi") -> str:
    """The rank CASE ladder as SQL TEXT, shared verbatim by the Spark
    plan (``selectExpr``) and the DuckDB oracle.

    rank = leading zeros of the high (60 − p) bits + 1, found with an
    integer comparison ladder — log2() would be libm-dependent and can
    round differently across engines at power-of-two boundaries, which
    would silently desync the oracle. Text construction matters for a
    second reason: 48 nested ``F.when`` calls cost ~1 s of Py4J
    round-trips PER PLAN BUILD (the dedup-simhash lesson); one
    ``CASE`` string is a single call. Average evaluation cost is ~2
    comparisons/row (rank r needs r comparisons, P(rank=r) = 2^-r).
    """
    hi_bits = 60 - p
    cases = " ".join(
        f"WHEN {hi_expr} >= {1 << (hi_bits - r)} THEN {r}"
        for r in range(1, hi_bits + 1)
    )
    return f"CASE {cases} ELSE {hi_bits + 1} END"


def hll_state(
    df: DataFrame,
    col,
    *,
    by: str | Sequence[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """HyperLogLog register state for ``approx distinct(col)`` (per
    ``by`` group when given), as pure BIGINTs.

    Two hash aggregations, both map-side combinable: (1) per
    ``(group, bucket)`` max rank — partial max on the mappers means the
    shuffle carries at most ``groups × 2^p`` rows no matter how many
    input rows there are; (2) per group, fold the ≤2^p register rows
    into the fixed-size state. At 100 TB this is the difference between
    shuffling every distinct value and shuffling a 4096-row state.

    Output per group: ``m`` (register count), ``present`` (non-zero
    registers), ``zeros``, ``register_sum`` = Σ 2^(49 − M_j) over ALL m
    registers (empty registers contribute 2^49) — exact integer, the
    harmonic-mean denominator scaled by 2^49 — and ``rank_checksum`` =
    Σ M_j (a cheap cross-engine state digest).
    """
    if p not in (4, 8, 12):
        # multiples of 4 -> the bucket is a clean hex-char split (see
        # _hll_bucket_rank); p <= 12 keeps register_sum <= 2^(p + 49)
        # < 2^63 (no BIGINT overflow)
        raise ValueError(f"p must be 4, 8, or 12, got {p}")
    m = 1 << p
    keys = [by] if isinstance(by, str) else list(by or [])
    # p a multiple of 4 -> the bucket is EXACTLY the last p/4 hex chars
    # of the 15-char (60-bit) hash window and the rank material the
    # first 15 - p/4 chars: two independent base-16 parses, no division
    # (a 2^60 value does not survive a double-precision divide, and
    # integer-div syntax differs between engines; substring arithmetic
    # is exact and identical in both). A small single-file scan arrives
    # as ONE partition; hashing/the rank ladder would run serial
    # without the spread (no-op at scale).
    regs = hll_registers(df, col, by=by, p=p)
    return _hll_fold(regs, keys, m)


def hll_registers(
    df: DataFrame,
    col,
    *,
    by: str | Sequence[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """The MERGEABLE HyperLogLog representation: one ``(group, bucket,
    mj)`` row per occupied register (max rank per bucket). This is the
    layer a 100 TB pipeline stores and re-aggregates — registers from
    any partitioning of the data (per shard, per day, per source)
    merge by ``max`` into exactly the state a single pass would have
    produced (:func:`hll_merge` — re-aggregation invariance, pinned
    byte-exactly by the contract). ≤ groups × 2^p rows regardless of
    input size."""
    if p not in (4, 8, 12):
        raise ValueError(f"p must be 4, 8, or 12, got {p}")
    keys = [by] if isinstance(by, str) else list(by or [])
    nhex = 15 - p // 4
    src = spread(df, col).select(
        *keys, _c(col).cast("string").alias("_hv")
    )
    return (
        src.selectExpr(
            *keys,
            f"CAST(conv(substring(md5(_hv), {nhex + 1}, {p // 4}), 16, 10) AS BIGINT) AS bucket",
            f"CAST(conv(substring(md5(_hv), 1, {nhex}), 16, 10) AS BIGINT) AS hi",
        )
        .selectExpr(*keys, "bucket", _hll_rank_ladder_sql(p) + " AS rank")
        .groupBy(*keys, "bucket")
        .agg(F.max("rank").alias("mj"))
    )


def hll_merge(
    regs: DataFrame,
    *,
    by: str | Sequence[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Merge register frames down to coarser groups (or one global
    state): ``max(mj)`` per (new group, bucket), then the same integer
    state fold as :func:`hll_state`. Because max is associative and
    commutative, merged-from-any-partitioning equals computed-in-one-
    pass — the property that lets sketches roll up across shards,
    days, and retries without touching raw data again."""
    if p not in (4, 8, 12):
        raise ValueError(f"p must be 4, 8, or 12, got {p}")
    keys = [by] if isinstance(by, str) else list(by or [])
    merged = regs.groupBy(*keys, "bucket").agg(F.max("mj").alias("mj"))
    return _hll_fold(merged, keys, 1 << p)


def _hll_fold(regs: DataFrame, keys, m: int) -> DataFrame:
    # present-register terms + 2^49 for each of the (m - present) empty
    # registers; shiftleft keeps it integer end to end (mj <= 49 <= the
    # BIGINT range for any p >= 4)
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({_RANK_SCALE} - mj AS INT))"
    )
    return regs.groupBy(*keys).agg(
        F.lit(m).alias("m"),
        F.count(F.lit(1)).alias("present"),
        (F.lit(m) - F.count(F.lit(1))).alias("zeros"),
        (
            F.sum(term)
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << _RANK_SCALE)
        ).alias("register_sum"),
        F.sum("mj").alias("rank_checksum"),
    )


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(m: int, zeros: int, register_sum: int) -> float:
    """Distinct-count estimate from one integer state row — the only
    floating-point step, applied AFTER the exact state (Flajolet et al.
    2007 raw estimate + small-range linear counting)."""
    raw = _alpha(m) * m * m * float(1 << _RANK_SCALE) / float(register_sum)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def hll_distinct(
    df: DataFrame,
    col,
    *,
    by: str | Sequence[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """``hll_state`` plus the float ``estimate`` column (computed from
    the state row-locally — no extra pass)."""
    state = hll_state(df, col, by=by, p=p)
    raw = (
        F.lit(_alpha(1 << p) * (1 << p) * (1 << p) * float(1 << _RANK_SCALE))
        / F.col("register_sum").cast("double")
    )
    linear = F.lit(float(1 << p)) * F.log(F.lit(float(1 << p)) / F.col("zeros"))
    est = F.when((raw <= F.lit(2.5 * (1 << p))) & (F.col("zeros") > 0), linear).otherwise(
        raw
    )
    return state.withColumn("estimate", est)


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def _cm_cell(col, j: int, width: int) -> Column:
    """Row-``j`` cell index: h60("cm<j>|" || value) % width."""
    from .hashes import h60

    return h60(F.concat_ws("|", F.lit(f"cm{j}"), _c(col))) % F.lit(width)


def countmin_sketch(
    df: DataFrame,
    col,
    *,
    depth: int = 4,
    width: int = 1024,
    weight=None,
) -> DataFrame:
    """Count-min frequency sketch of ``col``: ``depth`` hash rows ×
    ``width`` counters, as rows ``(j, cell, cnt)``.

    ONE aggregation: each input row expands to ``depth`` (j, cell)
    pairs via an inline array (no shuffle for the expand), then a
    map-side-combinable sum — the shuffle carries at most
    ``depth × width`` cells. States merge by adding cnt cell-wise, so
    per-shard sketches roll up without touching row data again.
    ``weight`` (optional Column) turns it into a weighted frequency
    sketch.
    """
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1, width >= 2")
    w = F.lit(1).cast("bigint") if weight is None else _c(weight).cast("bigint")
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cm_cell(col, j, width).alias("cell"))
            for j in range(depth)
        ]
    )
    return (
        spread(df, col).select(F.explode(pairs).alias("p"), w.alias("w"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
        .agg(F.sum("w").alias("cnt"))
    )


def countmin_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate frequencies for ``probes[probe_col]``: min over
    the ``depth`` rows of each probe's cell counter (the count-min
    upper-bound estimate; never below the true count).

    The sketch side is at most ``depth × width`` rows → broadcast; the
    probe side joins without moving. Output: ``(probe_col, est)``.
    """
    exprs = [
        F.struct(F.lit(j).alias("j"), _cm_cell(probe_col, j, width).alias("cell"))
        for j in range(depth)
    ]
    cells = probes.select(
        _c(probe_col).alias(probe_col), F.explode(F.array(*exprs)).alias("p")
    ).select(probe_col, F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
    joined = cells.join(F.broadcast(sketch), ["j", "cell"], "left").fillna(
        {"cnt": 0}
    )
    return joined.groupBy(probe_col).agg(F.min("cnt").alias("est"))


# ---------------------------------------------------------------------------
# Bloom filter decontamination
# ---------------------------------------------------------------------------


def bloom_bits(
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 18,
    k: int = 3,
    bits: DataFrame | None = None,
) -> DataFrame:
    """The SET bit positions of a Bloom filter over the benchmark's
    distinct word ``n``-grams: each shingle sets ``k`` md5-derived
    positions in ``[0, m_bits)``. Output: distinct ``(pos)`` rows —
    at most ``m_bits`` of them regardless of benchmark size, which is
    what makes the filter broadcastable where the raw shingle set is
    not.
    """
    from .hashes import h60

    sh = (
        benchmark.select(tokens(text_col).alias("toks"))
        .select(F.explode(word_shingles(F.col("toks"), k=n)).alias("sh"))
        .distinct()
    )
    pos = F.array(
        *[
            h60(F.concat_ws("|", F.lit(f"bloom{i}"), F.col("sh"))) % F.lit(m_bits)
            for i in range(k)
        ]
    )
    return sh.select(F.explode(pos).alias("pos")).distinct()


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 3,
    m_bits: int = 1 << 18,
    k: int = 3,
    bits: DataFrame | None = None,
) -> DataFrame:
    """:func:`~xarray_scipy_spark.pipeline.text.decontaminate` with a
    Bloom filter standing in for the exact benchmark shingle set.

    Scale story: exact decontamination broadcasts the benchmark's raw
    shingle STRINGS — fine for one eval suite, but a combined
    many-benchmark guard set can reach gigabytes. The Bloom filter caps
    the broadcast at ``m_bits`` bits (2^18 bits = 32 KiB) with a known
    false-positive rate ≈ (1 − e^(−k·s/m))^k, and NO false negatives:
    every truly contaminated document is flagged (the property the
    guard actually needs — a few clean docs over-dropped is the cheap
    direction). A doc shingle counts as a hit only when ALL ``k`` of
    its positions are set; the k membership probes are k broadcast hash
    joins against the ≤``m_bits``-row position set (no corpus
    repartition, same shuffle shape as the exact path).

    Output: ``(id_col, n_flagged_shingles, contaminated)`` — one row
    per document, zero-filled for clean docs.
    """
    from .hashes import h60

    bench_text_col = text_col if bench_text_col is None else bench_text_col
    if bits is None:
        bits = bloom_bits(
            benchmark, text_col=bench_text_col, n=n, m_bits=m_bits, k=k
        )
    # a prebuilt (and persisted/written) ``bits`` frame is the
    # real-world pattern: build the guard set ONCE from every
    # benchmark, then probe each corpus shard/day without re-reading
    # the benchmarks — pass the frame from bloom_bits (or a parquet
    # round-trip of it) with the SAME (n, m_bits, k).
    doc_sh = (
        spread(docs, id_col)
        .select(F.col(id_col), tokens(text_col).alias("toks"))
        .select(
            F.col(id_col),
            F.explode(word_shingles(F.col("toks"), k=n)).alias("sh"),
        )
    )
    probed = doc_sh
    flag = F.lit(True)
    for i in range(k):
        pcol = f"_p{i}"
        hit = f"_hit{i}"
        probed = probed.withColumn(
            pcol,
            h60(F.concat_ws("|", F.lit(f"bloom{i}"), F.col("sh"))) % F.lit(m_bits),
        ).join(
            F.broadcast(bits.withColumnRenamed("pos", pcol).withColumn(hit, F.lit(True))),
            pcol,
            "left",
        )
        flag = flag & F.col(hit).isNotNull()
    hits = (
        probed.select(F.col(id_col), flag.alias("flagged"))
        .groupBy(id_col)
        .agg(F.sum(F.col("flagged").cast("bigint")).alias("n_flagged_shingles"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_flagged_shingles"), F.lit(0)).alias(
                "n_flagged_shingles"
            ),
            (F.coalesce(F.col("n_flagged_shingles"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# one-pass histogram quantiles
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    col,
    *,
    lo: float,
    hi: float,
    bins: int = 1024,
    by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Fixed-bin histogram of ``col`` over ``[lo, hi)``: one
    map-side-combinable aggregation producing at most ``bins + 2``
    BIGINT rows per group (the two extras catch underflow/overflow, so
    nothing is silently dropped and a bad ``[lo, hi)`` guess is
    visible in the state).

    This is the quantile machinery that works at 100 TB: an exact
    percentile needs a full sort (or a per-group ``percentile`` agg
    whose state grows with distinct values), while the histogram's
    state is FIXED at ``bins`` counters regardless of input size, the
    partial aggregation compresses on the mappers, and per-shard
    histograms merge by adding counts bin-wise. Bin index arithmetic is
    pure integer-from-float flooring, reproduced exactly by the DuckDB
    oracle — the contract compares bin COUNTS, all BIGINT.

    Output per group: ``(bin, cnt)`` with ``bin = -1`` for
    ``x < lo`` and ``bin = bins`` for ``x >= hi``.
    """
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    keys = [by] if isinstance(by, str) else list(by or [])
    # NO spread() here (r10): the histogram is a plain partial-
    # aggregating scan — each scan partition reduces to <= bins+2 rows
    # per group map-side, so a few missing cores on a scan-bound stage
    # cost almost nothing, while spread()'s repartition shuffled the
    # ENTIRE raw input first (measured at the 1000x tier / 100 M rows:
    # 3.65 s with the repartition, 1.1 s without — the extra exchange
    # was 70% of the operator). spread() is for CPU-heavy per-row
    # pipelines (tokenize/hash/decode), not aggregating scans.
    x = _c(col).cast("double")
    # floor((x - lo) * bins / (hi - lo)) with the SAME op order as the
    # oracle; clamp into [-1, bins]
    raw = F.floor(
        (x - F.lit(float(lo))) * F.lit(float(bins)) / F.lit(float(hi - lo))
    )
    b = (
        F.when(raw < 0, F.lit(-1))
        .when(raw > F.lit(bins), F.lit(bins))
        .otherwise(raw)
        .cast("int")
    )
    return (
        df.select(*keys, b.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_from_histogram(
    hist, qs: Sequence = (0.5,), *, lo: float, hi: float, bins: int = 1024
) -> list[float]:
    """Quantile estimates from one group's histogram rows (driver-side;
    the state is <= bins + 2 rows by construction). Each quantile is
    located by cumulative count and linearly interpolated inside its
    bin — error is bounded by one bin width (hi - lo) / bins.
    Underflow/overflow rows clamp to lo / hi."""
    rows = {int(r["bin"]): int(r["cnt"]) for r in hist}
    n = sum(rows.values())
    if n == 0:
        raise ValueError("empty histogram")
    width = (hi - lo) / bins
    out = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
        target = q * n
        acc = 0
        val = hi
        for b in sorted(rows):
            c = rows[b]
            if acc + c >= target:
                if b < 0:
                    val = lo
                elif b >= bins:
                    val = hi
                else:
                    frac = (target - acc) / c if c else 0.0
                    val = lo + (b + frac) * width
                break
            acc += c
        out.append(val)
    return out


def filter_by_quantile(
    df: DataFrame,
    col,
    q: float,
    *,
    lo: float,
    hi: float,
    bins: int = 1024,
    by: str | None = None,
    keep: str = "above",
    threshold_col: str | None = None,
) -> DataFrame:
    """Keep the rows above/below the ``q`` quantile of ``col`` (per
    ``by`` group) — the "drop the bottom 10% by quality score" gate —
    with the threshold taken from the ONE-PASS histogram sketch
    instead of a sort.

    Why this is the 100 TB shape: an exact per-group quantile needs a
    sort or a percentile aggregate whose state grows with distinct
    values; the histogram threshold costs one bounded aggregation
    (≤ bins+2 counters per group), the interpolation error is ≤ one
    bin width of (hi − lo)/bins, and — because the bin arithmetic is
    exact integers and the interpolation a fixed float formula — the
    ENTIRE decision is deterministic and engine-portable, so even the
    kept row set reproduces byte-for-byte in the DuckDB oracle.

    ``keep``: ``"above"`` keeps ``x >= threshold``, ``"below"`` keeps
    ``x < threshold``. ``threshold_col`` optionally emits the group's
    threshold alongside the kept rows (audit trail).
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be above|below, got {keep!r}")
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    keys = [by] if isinstance(by, str) else list(by or [])
    hist = histogram_sketch(df, col, lo=lo, hi=hi, bins=bins, by=by)
    # per-group threshold from the ≤ bins+2 state rows; the rows are
    # tiny by construction, so the per-group fold happens driver-free
    # as a window cumulative — same arithmetic as
    # quantile_from_histogram, expressed in Catalyst
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("bin")
    total = F.sum("cnt").over(Window.partitionBy(*keys))
    cum = F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
    prev = cum - F.col("cnt")
    # epsilon floor so q=0 still selects the first populated bin
    # (prev < 0 is never true); matches quantile_from_histogram's
    # "acc + c >= target" walk
    # the epsilon floor only steers the HIT row selection (q=0 must
    # still pick the first populated bin); the interpolation uses the
    # RAW target so q=0 lands exactly on the bin edge
    raw_target = F.lit(float(q)) * total
    target = F.greatest(raw_target, F.lit(1e-12))
    width = (hi - lo) / bins
    # window expressions must be MATERIALIZED as columns before the
    # hit filter — referencing them after it would re-evaluate the
    # windows over the one-row filtered partitions (prev collapses to
    # 0 and target to q·cnt, silently shifting every threshold)
    ann = hist.select(
        *keys,
        "bin",
        "cnt",
        cum.alias("_cum"),
        prev.alias("_prev"),
        target.alias("_tgt"),
        raw_target.alias("_rawtgt"),
    )
    val = (
        F.when(F.col("bin") < 0, F.lit(float(lo)))
        .when(F.col("bin") >= bins, F.lit(float(hi)))
        .otherwise(
            F.lit(float(lo))
            + (
                F.col("bin")
                + F.when(
                    F.col("cnt") > 0,
                    F.greatest(
                        (F.col("_rawtgt") - F.col("_prev")) / F.col("cnt"),
                        F.lit(0.0),
                    ),
                ).otherwise(F.lit(0.0))
            )
            * F.lit(float(width))
        )
    )
    thr = ann.filter(
        (F.col("_cum") >= F.col("_tgt")) & (F.col("_prev") < F.col("_tgt"))
    ).select(*keys, val.alias("_thr"))
    x = _c(col).cast("double")
    probe = spread(df, col)  # the probe scan must not run single-core
    joined = (
        probe.join(F.broadcast(thr), keys)
        if keys
        else probe.crossJoin(F.broadcast(thr))
    )
    cond = x >= F.col("_thr") if keep == "above" else x < F.col("_thr")
    res = joined.filter(cond)
    if threshold_col is not None:
        return res.withColumnRenamed("_thr", threshold_col)
    return res.drop("_thr")
