"""tpch_q7 / tpch_q8 bucketed-layout A/B at the far tier (VERDICT r12
#3 and #6).

Both queries' remaining >2x constant is the ONE fact-fact exchange
(lineitem ⋈ orders, ~12 GB at 1000x): every other edge is a broadcast
and the post-join aggregate is pre-reduced. The untried structural
lever is the LAYOUT: maintain the two fact tables bucketed + sorted on
their orderkeys (sources/write.py ``write_bucketed``), and the
sort-merge join reads co-located buckets with NO exchange and NO sort
on either side. That is exactly the 100 TB deployment story — fact
tables are written once, joined many times — so the A/B measures the
plan a production pipeline would actually run.

Phases (both idempotent):

- build: write bucketed twins of the tpch1000x facts into
  ``.bench_rel/q7_bucketed/`` — 64 buckets on the join key, sorted,
  ONE file per bucket (repartition(64, key) before bucketBy, so the
  reader gets sorted-scan eligibility; multi-file buckets lose the
  no-sort property).
- measure (run in a FRESH process after the build — the playbook's
  block-manager-warmth rule): re-register the bucketed dirs as
  external CLUSTERED BY tables, verify the bucketed plans drop the
  fact Exchange, then interleave warmup+median-of-5 over {plain q7,
  bucketed q7, plain q8, bucketed q8} and the DuckDB oracles on the
  SAME raw parquet.

Usage: python tools/q7_bucketed_ab.py [--reps 1000] [--buckets 64]
Prints one JSON line; build dir is gitignored with .bench_rel/.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure import duck_median, median5  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, ".bench_rel")

_FACTS = (("lineitem", "l_orderkey"), ("orders", "o_orderkey"))


def _bucket_dir(reps: int, buckets: int) -> str:
    return os.path.join(DST, f"q7_bucketed_{reps}x_{buckets}b")


def build(spark, reps: int, buckets: int) -> str:
    from pyspark.sql import functions as F

    from tools.relational_tier_ab import build_tpch

    src = build_tpch(spark, reps)
    out = _bucket_dir(reps, buckets)
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    from xarray_scipy_spark.sources.write import write_bucketed

    for name, key in _FACTS:
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        # one writer task per bucket -> one file per bucket -> the
        # scan advertises sorted output and the SMJ skips its sorts
        write_bucketed(
            df.repartition(buckets, F.col(key)),
            f"{name}_b{buckets}",
            bucket_by=[key],
            n_buckets=buckets,
            sort_by=[key],
            path=os.path.join(out, name),
            mode="overwrite",
        )
    open(os.path.join(out, "_OK"), "w").close()
    return out


def register_bucketed(spark, out: str, buckets: int) -> None:
    """External CLUSTERED BY tables over the built dirs (the catalog
    entry from the build session does not survive the process) — the
    library's read-side half, sources.write.register_bucketed."""
    from xarray_scipy_spark.sources.write import register_bucketed as _reg

    for name, key in _FACTS:
        _reg(
            spark,
            f"{name}_b",
            os.path.join(out, name),
            bucket_by=[key],
            n_buckets=buckets,
            sort_by=[key],
            replace=True,
        )


def q7_bucketed(spark, sf_dir):
    """contract.q_tpch_q7's exact plan (contract.py q_tpch_q7) with the
    two fact scans swapped to the bucketed tables."""
    from pyspark.sql import functions as F

    from xarray_scipy_spark.contract import _Q7_D1, _Q7_D2
    from xarray_scipy_spark.sources.tables import load_table

    li = (
        spark.table("lineitem_b")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q7_D1).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(_Q7_D2).cast("timestamp_ntz"))
        )
        .select(
            "l_suppkey",
            "l_orderkey",
            F.year("l_shipdate").alias("l_year"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .cast("decimal(22,4)")
            .alias("vol"),
        )
    )
    orders = spark.table("orders_b").select("o_orderkey", "o_custkey")
    pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey", "o_custkey", "l_year")
        .agg(F.sum("vol").alias("vol"), F.count(F.lit(1)).alias("cnt"))
    )
    nation = F.broadcast(
        load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    )
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    j = (
        pair.join(sup, pair.l_suppkey == sup.s_suppkey)
        .join(cust, pair.o_custkey == cust.c_custkey)
        .join(nation.alias("n1"), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(nation.alias("n2"), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            "l_year",
            "vol",
            "cnt",
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.sum("vol").cast("double").alias("revenue"),
        F.sum("cnt").alias("n_rows"),
    )


def q8_bucketed(spark, sf_dir):
    """contract.q_tpch_q8's exact plan with bucketed fact scans (the
    broadcast dimension joins preserve the bucketed distribution and
    ordering, so the fact-fact SMJ still reads co-located buckets)."""
    from pyspark.sql import functions as F

    from xarray_scipy_spark.contract import (
        _Q8_D1,
        _Q8_D2,
        _Q8_NATION,
        _Q8_REGION,
        _Q8_TYPE,
    )
    from xarray_scipy_spark.sources.tables import load_table

    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .filter(F.col("r_name") == _Q8_REGION)
        .select(F.col("n_nationkey").alias("_asia_nk"))
    )
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    orders = (
        spark.table("orders_b")
        .filter(
            (F.col("o_orderdate") >= F.lit(_Q8_D1).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(_Q8_D2).cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(asia_nations, F.col("c_nationkey") == F.col("_asia_nk"))
        .select("o_orderkey", "o_year")
    )
    li = spark.table("lineitem_b").select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        .cast("decimal(22,4)")
        .alias("vol"),
    )
    pre = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_year", "s_nationkey")
        .agg(F.sum("vol").alias("vol"), F.count(F.lit(1)).alias("cnt"))
    )
    named = pre.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        pre.s_nationkey == F.col("n_nationkey"),
    )
    agg = named.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("n_name") == _Q8_NATION, F.col("vol")).otherwise(
                F.lit(0).cast("decimal(22,4)")
            )
        ).alias("_nat"),
        F.sum("vol").alias("_tot"),
        F.sum("cnt").alias("n_rows"),
    )
    return agg.select(
        "o_year",
        (F.col("_nat").cast("double") / F.col("_tot").cast("double")).alias(
            "mkt_share"
        ),
        F.col("_tot").cast("double").alias("total_vol"),
        "n_rows",
    )


def main() -> int:
    reps, buckets, build_only = 1000, 64, False
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--buckets":
            buckets = int(args[i + 1])
            i += 2
        elif args[i] == "--build-only":
            build_only = True
            i += 1
        else:
            print(f"unknown flag {args[i]!r}", file=sys.stderr)
            return 2

    from xarray_scipy_spark import contract as C
    from xarray_scipy_spark.session import get_spark

    spark = get_spark("q7-bucketed-ab")
    out = build(spark, reps, buckets)
    if build_only:
        print(json.dumps({"built": out}))
        return 0
    tdir = os.path.join(DST, f"tpch{reps}x")
    register_bucketed(spark, out, buckets)

    res: dict = {"reps": reps, "buckets": buckets, "loadavg": list(os.getloadavg()[:2])}
    # plan audit first: the bucketed fact join must carry FEWER
    # exchanges than the plain one (the whole point)
    for tag, fn in (
        ("q7_plain", lambda: C.q_tpch_q7(spark, tdir)),
        ("q7_bucketed", lambda: q7_bucketed(spark, tdir)),
        ("q8_plain", lambda: C.q_tpch_q8(spark, tdir)),
        ("q8_bucketed", lambda: q8_bucketed(spark, tdir)),
    ):
        plan = fn()._jdf.queryExecution().executedPlan().toString()
        res[f"{tag}_exchanges"] = plan.count("Exchange")
        res[f"{tag}_sorts"] = plan.count("Sort ")

    # interleaved measurement: A,B,A,B removes slow-drift bias
    for tag, fn in (
        ("q7_plain", lambda: C.q_tpch_q7(spark, tdir)),
        ("q7_bucketed", lambda: q7_bucketed(spark, tdir)),
        ("q8_plain", lambda: C.q_tpch_q8(spark, tdir)),
        ("q8_bucketed", lambda: q8_bucketed(spark, tdir)),
    ):
        med, samples = median5(
            lambda fn=fn: fn().write.format("noop").mode("overwrite").save()
        )
        res[tag] = {"median": round(med, 3), "samples": samples}

    views = [
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tdir}/{t}.parquet"
        + ("/*.parquet" if os.path.isdir(os.path.join(tdir, t + ".parquet")) else "")
        + "')"
        for t in ("orders", "lineitem", "customer", "supplier", "part", "nation", "region")
    ]
    # plain oracle builders, not ORACLES[...]: the r14 rotation folded
    # q7/q8 into variant-tag unions (q8's name retired), and this tool
    # must keep measuring the SAME single-query oracle across rotations
    res["q7_duck"] = duck_median(views, C._tpch_q7_oracle())
    res["q8_duck"] = duck_median(views, C._tpch_q8_oracle())
    for q in ("q7", "q8"):
        res[f"{q}_ratio_plain"] = round(res[f"{q}_plain"]["median"] / res[f"{q}_duck"], 2)
        res[f"{q}_ratio_bucketed"] = round(
            res[f"{q}_bucketed"]["median"] / res[f"{q}_duck"], 2
        )
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
