"""tpch_q10 stage decomposition (VERDICT r11 #3).

q10 is the worst standing non-floor ratio (4.64x @1000x, both
engines linear). The q22 playbook: decompose the shipped plan into
its costed stages and name where the constant lives before either
fixing an input-size defect or adjudicating a floor. q10's plan has
exactly four costed pieces:

1. ``li_scan``   — the R-filtered lineitem scan + projection (the
                   fact-scan floor: parquet decode + predicate);
2. ``ord_scan``  — the date-filtered orders scan + projection;
3. ``core_join`` — li ⋈ orders (the r10-adjudicated SMJ) reduced to
                   the per-custkey revenue aggregate: scans + the
                   big orderkey shuffle-sort + partial agg;
4. ``full``      — the shipped plan (core + customer join +
                   broadcast nation + TakeOrdered top-20).

DuckDB twins for the same pieces run on the same parquet (aggregated
outputs so fetch cost is nil). If core_join−scans tracks the known
shuffle-sort cost and full−core_join is small, the 4.64x is the
exchange+sort constant of 150 M joined rows — a named floor; if
either delta is outsized, that stage is the defect to fix.

Usage: python tools/q10_decompose.py [--reps 1000]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure import duck_median, median5  # noqa: E402
from tools.relational_tier_ab import build_tpch  # noqa: E402


def main() -> int:
    from pyspark.sql import functions as F

    from xarray_scipy_spark import contract as C
    from xarray_scipy_spark.session import get_spark
    from xarray_scipy_spark.sources.tables import load_table

    reps = 1000
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("q10-decompose")
    tier = build_tpch(spark, reps)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def li_df():
        return load_table(spark, "lineitem", tier).filter(
            F.col("l_returnflag") == "R"
        ).select("l_orderkey", "l_extendedprice", "l_discount")

    def ord_df():
        return load_table(spark, "orders", tier).filter(
            (F.col("o_orderdate") >= F.lit(C._Q10_D1).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(C._Q10_D2).cast("timestamp_ntz"))
        ).select("o_orderkey", "o_custkey")

    def core_df():
        li, orders = li_df(), ord_df()
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_custkey")
            .agg(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        4,
                    ).cast("decimal(22,4)")
                ).alias("_rev")
            )
        )

    out = {"reps": reps, "loadavg": [round(x, 2) for x in os.getloadavg()[:2]]}
    for tag, fn in (
        ("li_scan", lambda: noop(li_df())),
        ("ord_scan", lambda: noop(ord_df())),
        ("core_join", lambda: noop(core_df())),
        ("full", lambda: noop(C.q_tpch_q10(spark, tier))),
    ):
        med, runs = median5(fn)
        out[tag] = {"median": round(med, 3), "samples": runs}
        print(f"# {tag}: {med:.3f}s {runs}", file=sys.stderr)
    out["scan_sum"] = round(
        out["li_scan"]["median"] + out["ord_scan"]["median"], 3
    )
    out["join_over_scans"] = round(
        out["core_join"]["median"] - out["scan_sum"], 3
    )
    out["dim_glue"] = round(
        out["full"]["median"] - out["core_join"]["median"], 3
    )
    spark.stop()

    # DuckDB twins on the same parquet (aggregated outputs)
    li_glob = (
        f"{tier}/lineitem.parquet/*.parquet"
        if os.path.isdir(os.path.join(tier, "lineitem.parquet"))
        else f"{tier}/lineitem.parquet"
    )
    ord_glob = (
        f"{tier}/orders.parquet/*.parquet"
        if os.path.isdir(os.path.join(tier, "orders.parquet"))
        else f"{tier}/orders.parquet"
    )
    views = [
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{li_glob}')",
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{ord_glob}')",
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{tier}/customer.parquet')",
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{tier}/nation.parquet')",
    ]
    duck_sqls = {
        "li_scan": (
            "SELECT count(*), sum(l_extendedprice) FROM lineitem "
            "WHERE l_returnflag = 'R'"
        ),
        "ord_scan": (
            "SELECT count(*), sum(o_custkey) FROM orders "
            f"WHERE o_orderdate >= TIMESTAMP '{C._Q10_D1}' "
            f"AND o_orderdate < TIMESTAMP '{C._Q10_D2}'"
        ),
        "core_join": (
            "SELECT count(*) FROM (SELECT o_custkey, "
            "sum(CAST(round(l_extendedprice * (1 - l_discount), 4) "
            "AS DECIMAL(22,4))) AS rev FROM lineitem JOIN orders "
            "ON o_orderkey = l_orderkey WHERE l_returnflag = 'R' "
            f"AND o_orderdate >= TIMESTAMP '{C._Q10_D1}' "
            f"AND o_orderdate < TIMESTAMP '{C._Q10_D2}' "
            "GROUP BY o_custkey)"
        ),
        "full": C.ORACLES.get("tpch_q10") or C._tpch_q10_oracle(),
    }

    for tag, sql in duck_sqls.items():
        med = duck_median(views, sql)
        out[f"duck_{tag}"] = med
        print(f"# duck_{tag}: {med:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
