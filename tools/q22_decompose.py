"""tpch_q22 floor decomposition (VERDICT r10 #6).

q22's standing 9.58x @100x is suspicious by the sketch_histogram
precedent (that "floor" turned out to be a real spread() defect), so
decompose before adjudicating. The plan has exactly three costed
pieces:

1. ``avg_job``   — the exact decimal avg over customer (one 1-row
                   aggregate job; Spark pays a full job launch);
2. ``anti_job``  — rich-filter (avg inlined as a LITERAL, no first
                   job) -> LEFT ANTI against the date-pruned orders
                   scan -> grouped agg;
3. ``full``      — the shipped two-job plan (1 + 2 chained through a
                   1-row broadcast).

If full ~= avg_job + anti_job and anti_job tracks the orders scan
while avg_job is a constant ~0.2-0.5 s job-launch floor, the ratio is
Spark's fixed two-job launch cost over a cache-resident DuckDB
customer scan — a floor, not a plan defect. If full >> the sum, there
IS glue to fix.

The probe side (customer) does not grow with the relational tier
(build_tpch replicates orders/lineitem only), so the orders tier is
the only axis: pass --reps to measure on .bench_rel/tpch{R}x.

Usage: python tools/q22_decompose.py [--reps 100]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.relational_tier_ab import build_tpch  # noqa: E402


def _median5(fn) -> tuple[float, list[float]]:
    ts = []
    for i in range(6):
        t0 = time.time()
        fn()
        if i > 0:
            ts.append(round(time.time() - t0, 3))
    return statistics.median(ts), ts


def main() -> int:
    from pyspark.sql import functions as F

    from xarray_scipy_spark import contract as C
    from xarray_scipy_spark.session import get_spark
    from xarray_scipy_spark.sources.tables import load_table

    reps = 100
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("q22-decompose")
    tier = build_tpch(spark, reps)

    cust = load_table(spark, "customer", tier).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )

    def avg_df():
        return cust.filter(F.col("c_acctbal") > 0).agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )

    avg_val = float(avg_df().first()[0])

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def anti_df():
        recent = load_table(spark, "orders", tier).filter(
            F.col("o_orderdate") >= F.lit(C._Q22_CUT).cast("timestamp_ntz")
        ).select("o_custkey")
        rich = cust.filter(F.col("c_acctbal") > F.lit(avg_val))
        dormant = rich.join(
            recent, rich.c_custkey == recent.o_custkey, "left_anti"
        )
        return dormant.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )

    def orders_scan_df():
        # the anti join's probe input alone: date-pruned orders scan
        return load_table(spark, "orders", tier).filter(
            F.col("o_orderdate") >= F.lit(C._Q22_CUT).cast("timestamp_ntz")
        ).select("o_custkey")

    def anti_inverted_df():
        # r13 candidate plan: the keep side (rich customers) is small
        # and does NOT grow with the orders tier, so INVERT the anti
        # join — semi-reduce the huge probe side through a broadcast
        # semi join (orders never exchange), distinct the matching
        # custkeys (map-side partials bound the exchange by #rich per
        # partition, not #orders), then anti-join rich against that
        # TINY set (AQE plans it as a broadcast anti). The shipped
        # plan exchanges the full date-pruned orders projection on
        # o_custkey instead — the named 2 GB constant at 1000x.
        recent = orders_scan_df()
        rich = cust.filter(F.col("c_acctbal") > F.lit(avg_val))
        rich_keys = F.broadcast(rich.select("c_custkey"))
        matched = (
            recent.join(
                rich_keys, recent.o_custkey == rich_keys.c_custkey, "left_semi"
            )
            .select("o_custkey")
            .distinct()
        )
        dormant = rich.join(
            matched, rich.c_custkey == matched.o_custkey, "left_anti"
        )
        return dormant.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )

    out = {"reps": reps, "loadavg": [round(x, 2) for x in os.getloadavg()[:2]]}
    # value parity first: the inverted plan must produce the shipped
    # plan's exact rows before its timing means anything
    a = sorted(map(tuple, anti_df().collect()))
    b = sorted(map(tuple, anti_inverted_df().collect()))
    out["inverted_matches"] = a == b
    for tag, fn in (
        ("avg_job", lambda: noop(avg_df())),
        ("orders_scan", lambda: noop(orders_scan_df())),
        ("anti_job", lambda: noop(anti_df())),
        ("anti_inverted", lambda: noop(anti_inverted_df())),
        ("full", lambda: noop(C.q_tpch_q22(spark, tier))),
    ):
        med, runs = _median5(fn)
        out[tag] = {"median": round(med, 3), "samples": runs}
        print(f"# {tag}: {med:.3f}s {runs}", file=sys.stderr)
    out["sum_parts"] = round(out["avg_job"]["median"] + out["anti_job"]["median"], 3)
    out["glue_overhead"] = round(
        out["full"]["median"] - out["sum_parts"], 3
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
