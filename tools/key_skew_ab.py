"""key_skew_profile partial-agg A/B + stage table (VERDICT r12 #5).

The 6.9x @1000x row's suspected floor is "one count exchange vs a
cache-resident grouped count". Before adjudicating, measure the three
stages and the one candidate fix:

- ``scan``       — the o_custkey projection scan alone (noop sink);
- ``grouped``    — groupBy(key).count() (scan + map-side partial +
                   exchange + final), the operator's only shuffle;
- ``full``       — the shipped contract query (adds the keys-sized
                   second aggregate);
- ``two_level``  — the candidate: an EXPLICIT salt level
                   (groupBy(key, partition_id % S).count ->
                   groupBy(key).sum) in case the builtin partial agg
                   leaves reducer-side imbalance on hot keys;
- ``duck``       — the DuckDB oracle on the same parquet.

If grouped ~= scan + a small constant and two_level is not faster,
the ratio is the exchange-class floor: Spark's partial agg already
map-side-combines, and the remaining gap is launch + exchange
write-out over DuckDB's in-process grouped scan.

Usage: python tools/key_skew_ab.py [--reps 1000] [--salts 16]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure import duck_median, median5  # noqa: E402


def main() -> int:
    from pyspark.sql import functions as F

    from xarray_scipy_spark import contract as C
    from xarray_scipy_spark.session import get_spark
    from xarray_scipy_spark.sources.tables import load_table

    reps, salts = 1000, 16
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--salts" in sys.argv:
        salts = int(sys.argv[sys.argv.index("--salts") + 1])
    spark = get_spark("key-skew-ab")
    from tools.relational_tier_ab import build_tpch

    tier = build_tpch(spark, reps)

    orders = load_table(spark, "orders", tier).select("o_custkey")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def grouped_df():
        return orders.groupBy("o_custkey").count()

    def two_level_df():
        lvl1 = orders.groupBy(
            "o_custkey", (F.spark_partition_id() % salts).alias("_s")
        ).agg(F.count(F.lit(1)).alias("_c"))
        counts = lvl1.groupBy(F.col("o_custkey").alias("_k")).agg(
            F.sum("_c").alias("_c")
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

    out = {"reps": reps, "salts": salts,
           "loadavg": [round(x, 2) for x in os.getloadavg()[:2]]}
    # parity: the two-level rewrite must reproduce the shipped rows
    a = sorted(map(tuple, C.q_key_skew_profile(spark, tier).collect()))
    b = sorted(map(tuple, two_level_df().collect()))
    out["two_level_matches"] = a == b
    for tag, fn in (
        ("scan", lambda: noop(orders)),
        ("grouped", lambda: noop(grouped_df())),
        ("full", lambda: noop(C.q_key_skew_profile(spark, tier))),
        ("two_level", lambda: noop(two_level_df())),
    ):
        med, runs = median5(fn)
        out[tag] = {"median": round(med, 3), "samples": runs}
        print(f"# {tag}: {med:.3f}s {runs}", file=sys.stderr)
    views = [
        "CREATE VIEW orders AS SELECT * FROM read_parquet("
        f"'{tier}/orders.parquet"
        + ("/*.parquet" if os.path.isdir(os.path.join(tier, "orders.parquet")) else "")
        + "')"
    ]
    out["duck"] = duck_median(views, C.ORACLES["key_skew_profile"])
    out["ratio_full"] = round(out["full"]["median"] / out["duck"], 2)
    out["ratio_two_level"] = round(out["two_level"]["median"] / out["duck"], 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
