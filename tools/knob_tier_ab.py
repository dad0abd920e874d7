"""In-situ A/B of the hash-engine knob on the real floor queries
(VERDICT r11 #2 follow-through).

tools/hash_floor_ab.py proved the swap on a synthetic
split_assign-shaped plan; this measures the knob on the ACTUAL
contract query shapes that carry the md5 floor — kfold_weights
(kfold_assign + class_weights summary) and dataset_temperature_mix —
at the docs-metadata tier, interleaved same-session. auc_eval is
deliberately absent: auc_exact computes no hash (its ratio is the
integer-exact histogram machinery + multi-job launch, see the r10
BASELINE row), so the knob cannot apply to it.

The xxhash64 variants produce DIFFERENT (but equally valid) fold/keep
decisions — the A/B measures identical WORK SHAPE, not identical
output; correctness of the md5 default stays pinned by the oracle
gate and tests/test_pipeline.py.

Usage: python tools/knob_tier_ab.py [--reps 1000]
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
    from pyspark.sql import functions as F

    from xarray_scipy_spark import contract as C
    from xarray_scipy_spark import pipeline as pl
    from xarray_scipy_spark.session import get_spark

    reps = 1000
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("knob-tier-ab")
    tier = build(spark, reps)

    def docs():
        return spark.read.parquet(os.path.join(tier, "documents.parquet"))

    def kfold_shape(engine):
        d = docs().select("doc_id", "lang")
        folded = pl.kfold_assign(d, k=C._KF_K, engine=engine)
        w = pl.class_weights(d, label_col="lang")
        j = folded.join(
            F.broadcast(w.select(F.col("label").alias("lang"), "weight")),
            "lang",
        )
        return j.groupBy("fold", "lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max("doc_id").cast("long").alias("max_id"),
            F.sum("doc_id").cast("long").alias("sum_id"),
            C._q3_col(F.first("weight") * 1000).alias("w_mille_q"),
        )

    def tmix_shape(engine):
        return pl.temperature_mix(
            docs(),
            source_col="source",
            alpha=C._TMIX_ALPHA,
            budget_frac=C._TMIX_BUDGET,
            salt="tmix",
            engine=engine,
        )

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out = {"reps": reps, "loadavg": [round(x, 2) for x in os.getloadavg()[:2]]}
    for name, shape in (("kfold_weights", kfold_shape),
                        ("dataset_temperature_mix", tmix_shape)):
        run(shape("md5"))
        run(shape("xxhash64"))
        a, b = [], []
        for _ in range(5):
            a.append(run(shape("md5")))
            b.append(run(shape("xxhash64")))
        out[name] = {
            "md5": a, "md5_med": statistics.median(a),
            "xxhash64": b, "xxhash64_med": statistics.median(b),
            "speedup": round(statistics.median(a) / statistics.median(b), 2),
        }
        print(f"# {name}: md5 {out[name]['md5_med']}s "
              f"xxhash64 {out[name]['xxhash64_med']}s "
              f"({out[name]['speedup']}x)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
