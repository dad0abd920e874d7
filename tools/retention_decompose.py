"""retention stage decomposition (VERDICT r11 #4).

retention is the last >2x row with neither a knob nor a decomposition
on file (4.03x @1000x post-r10-rewrite, 7.6x faster than r9). The
r10 rewrite made the plan: (1) dedup raw events to distinct
(user, period) pairs — ONE event-volume hash-aggregate exchange with
map-side partials — then (2) per-user first + offset join + final
count, all on the pairs frame (groups x active periods rows, ~70x
smaller than events here). So the costed stages are:

1. ``scan``           — events scan + the epoch-µs period projection
                        (parquet decode floor);
2. ``pairs_distinct`` — scan + the distinct hash aggregate (the one
                        big exchange);
3. ``full``           — the shipped retention_cohorts plan.

DuckDB twins per stage on the same parquet. If pairs_distinct−scan
dominates full−scan and duck's distinct shows the same shape, the
standing ratio is the hash-aggregate exchange constant on 100 M rows
— a named floor (DuckDB's grouped distinct is cache-resident at this
tier; Spark pays exchange serialization). If full−pairs_distinct is
outsized, the small-frame glue is the defect.

Usage: python tools/retention_decompose.py [--replicas 1000]
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
    from xarray_scipy_spark.functions.timeutil import epoch_us
    from xarray_scipy_spark.session import get_spark

    replicas = 1000
    if "--replicas" in sys.argv:
        replicas = int(sys.argv[sys.argv.index("--replicas") + 1])
    import tools.scale_evidence as SE

    SE.REPLICAS = replicas
    SE.DST = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f".bench_sf{replicas // 10}",
    )
    spark = get_spark("retention-decompose")
    SE.build_tier(spark)
    tier = SE.DST

    per_us = C._RET_PERIOD_S * 1_000_000

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def ev_df():
        df = spark.read.parquet(os.path.join(tier, "events.parquet"))
        return df.select(
            F.col("user_id").alias("_g"),
            F.floor(epoch_us(df, "ts") / per_us).cast("bigint").alias("_p"),
        )

    out = {
        "replicas": replicas,
        "loadavg": [round(x, 2) for x in os.getloadavg()[:2]],
    }
    for tag, fn in (
        ("scan", lambda: noop(ev_df())),
        ("pairs_distinct", lambda: noop(ev_df().distinct())),
        ("full", lambda: noop(C.q_retention(spark, tier))),
    ):
        med, runs = median5(fn)
        out[tag] = {"median": round(med, 3), "samples": runs}
        print(f"# {tag}: {med:.3f}s {runs}", file=sys.stderr)
    out["distinct_over_scan"] = round(
        out["pairs_distinct"]["median"] - out["scan"]["median"], 3
    )
    out["small_frame_glue"] = round(
        out["full"]["median"] - out["pairs_distinct"]["median"], 3
    )
    spark.stop()

    views = [
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tier}/events.parquet')"
    ]
    duck_sqls = {
        "scan": (
            f"SELECT count(*), sum(epoch_us(ts) // {per_us}) FROM events"
        ),
        "pairs_distinct": (
            "SELECT count(*) FROM (SELECT DISTINCT user_id, "
            f"epoch_us(ts) // {per_us} AS p FROM events)"
        ),
        "full": C.ORACLES.get("retention") or C._retention_oracle(),
    }

    for tag, sql in duck_sqls.items():
        med = duck_median(views, sql)
        out[f"duck_{tag}"] = med
        print(f"# duck_{tag}: {med:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
