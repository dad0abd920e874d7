"""bloom_semijoin shuffle-BYTES A/B (VERDICT r7 task 3).

The r7 wall-time A/B (BASELINE.md) recorded an honest LOSS on
local[32] — a local shuffle is an in-memory copy, so the operator's
design win (moving ~(1 − selectivity) fewer probe bytes through the
exchange) cannot show up as time on this host. But Spark's own stage
metrics CAN show it locally: shuffle write bytes are identical whether
the "wire" is a network or a memcpy.

Shapes (all ~1 % probe selectivity, broadcast disabled to model a
non-broadcastable build side; per variant: wall seconds median-of-3 +
total shuffle WRITE bytes summed over the variant's completed stages
via the Spark UI REST API — served from the scheduler's live
StageData, no extra instrumentation). The bloom totals INCLUDE the
bitmap-build aggregation shuffle — the honest all-in number.

- ``r7shape`` — the r7 wall-time A/B's 10 M × 3 M (build : probe =
  30 %). This is a WORST CASE for a runtime filter, kept for
  continuity: the word-aggregation's partial rows are the same order
  as the build side itself, and m=2^23 under 3 M keys runs at ~28 %
  false positives, so bytes barely drop.
- ``star`` — 50 M × 500 k (build : probe = 1 %), m=2^23 (~0.4 % fp),
  word-lookup path: the star-schema fact × filtered-dim shape runtime
  filters exist for.
- ``literal`` — 50 M × 20 k, m=2^18 = exactly 4096 words → the
  array-literal whole-stage-codegen probe path (the decontaminate
  scale), ~1.5 % fp.

Usage: python tools/bloom_shuffle_ab.py
Prints one JSON line; record it in BASELINE.md next to the wall-time
loss.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # name -> (n_probe, n_build, m_bits)
    "r7shape": (10_000_000, 3_000_000, 1 << 23),
    "star": (50_000_000, 500_000, 1 << 23),
    "literal": (50_000_000, 20_000, 1 << 18),
}
SELECTIVITY = 0.01


def _stages(spark):
    """All completed stages' (id, attempt, shuffle write bytes, shuffle
    read bytes) via the UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        data = json.load(r)
    return {
        (s["stageId"], s["attemptId"]): (
            s.get("shuffleWriteBytes", 0),
            s.get("shuffleReadBytes", 0),
        )
        for s in data
        if s["status"] == "COMPLETE"
    }


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from xarray_scipy_spark.operators import bloom_semijoin

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bloom_shuffle_ab")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")  # the metrics source
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )

    def run(make):
        # warmup + median of 3 wall; bytes measured on the last run via
        # stage-set difference (per-run bytes are identical plans)
        make().write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(3):
            before = set(_stages(spark))
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            after = _stages(spark)
        new = {k: v for k, v in after.items() if k not in before}
        return {
            "wall_sec": round(statistics.median(walls), 3),
            "shuffle_write_bytes": sum(v[0] for v in new.values()),
            "stages": len(new),
        }

    res = {"broadcast": "disabled", "selectivity": SELECTIVITY, "shapes": {}}
    for name, (n_probe, n_build, m_bits) in SHAPES.items():
        key_space = int(n_build / SELECTIVITY)
        stride = key_space // n_build
        # probe keys hash-uniform over the key space; build keys = the
        # stride lattice covering SELECTIVITY of it
        probe = spark.range(n_probe).select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(key_space)).alias("k"),
            F.col("id").alias("payload"),
        )
        build = spark.range(n_build).select((F.col("id") * stride).alias("k"))
        shape = {
            "n_probe": n_probe,
            "n_build": n_build,
            "m_bits": m_bits,
            "plain": run(lambda: probe.join(build, "k", "inner")),
            "bloom": run(
                lambda: bloom_semijoin(probe, build, on=["k"], m_bits=m_bits)
            ),
        }
        pw = shape["plain"]["shuffle_write_bytes"]
        bw = shape["bloom"]["shuffle_write_bytes"]
        shape["byte_reduction"] = round(pw / bw, 2) if bw else float("inf")
        res["shapes"][name] = shape
        print(f"# {name}: {json.dumps(shape)}", file=sys.stderr)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
