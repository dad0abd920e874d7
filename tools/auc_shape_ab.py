"""A/B the auc_exact job shape (VERDICT r13 #7 adjudication).

The shipped r10+ shape pays THREE jobs, two of them full input
aggregates: guard ``count()`` on the un-checkpointed histogram (input
pass 1), ``localCheckpoint(eager=True)`` (input pass 2 — the
checkpoint re-runs the groupBy), then the windowed identity over the
cached frame. The r14 CANDIDATE shape installs the lazy checkpoint
first so the guard count IS the materializing action: one input pass,
guard and window both read the cache. ADJUDICATED OUTCOME (r14): the
candidate was measured-and-REJECTED — a tie both runs (0.91x/1.04x at
the 135M-row tier; Spark's shuffle-stage reuse makes the guard's
extra jobs effectively free) — so pipeline/features.py KEEPS the
guard-before-eager-checkpoint shape (see the auc_exact comment
there). This tool remains the reproduction harness for that record:
it measures shipped vs candidate on the real contract input shape at
a chosen docs-metadata tier, interleaved same-session, and asserts
the outputs are byte-identical.

Usage: python tools/auc_shape_ab.py [--reps 1000]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.docs_meta_tier import build  # noqa: E402


def main() -> int:
    from pyspark.sql import Window, functions as F

    from xarray_scipy_spark import pipeline as pl
    from xarray_scipy_spark.session import get_spark

    reps = 1000
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("auc-shape-ab")
    tier = build(spark, reps)

    def docs():
        return spark.read.parquet(os.path.join(tier, "documents.parquet"))

    def inp():
        return docs().select(
            "n_chars", (F.col("lang") == "en").cast("int").alias("is_en")
        )

    def new_shape():
        return pl.auc_exact(inp(), score_col="n_chars", label_col="is_en")

    def old_shape():
        # the r10-r13 shape, inlined verbatim: count the raw histogram,
        # then eager-checkpoint it (second input aggregate)
        d = inp()
        hist = d.select(
            F.col("n_chars").cast("bigint").alias("_s"),
            F.col("is_en").cast("int").alias("_y"),
        ).groupBy("_s").agg(
            F.sum("_y").cast("bigint").alias("_pos"),
            F.sum(1 - F.col("_y")).cast("bigint").alias("_neg"),
        )
        nds = hist.count()
        assert nds <= 4_000_000
        hist = hist.localCheckpoint(eager=True)
        w = Window.orderBy(F.col("_s").asc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        contrib = hist.select(
            "_pos",
            "_neg",
            (
                F.col("_pos")
                * (
                    2 * F.coalesce(F.sum("_neg").over(w), F.lit(0))
                    + F.col("_neg")
                )
            ).alias("_c2"),
        )
        agg = contrib.agg(
            F.sum("_pos").alias("n_pos"),
            F.sum("_neg").alias("n_neg"),
            F.sum("_c2").alias("_num2"),
        )
        return agg.select(
            "n_pos",
            "n_neg",
            (
                F.round(
                    F.col("_num2").cast("double")
                    / (
                        2.0
                        * F.col("n_pos").cast("double")
                        * F.col("n_neg").cast("double")
                    ),
                    6,
                )
            ).alias("auc_q"),
        )

    assert sorted(map(tuple, old_shape().collect())) == sorted(
        map(tuple, new_shape().collect())
    ), "shapes disagree — A/B void"

    def run(mk):
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run(old_shape)
    run(new_shape)
    a, b = [], []
    for _ in range(5):
        a.append(run(old_shape))
        b.append(run(new_shape))
    out = {
        "reps": reps,
        "loadavg": [round(x, 2) for x in os.getloadavg()[:2]],
        "old_3job": a,
        "old_med": statistics.median(a),
        "new_1pass": b,
        "new_med": statistics.median(b),
        "speedup": round(statistics.median(a) / statistics.median(b), 2),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
