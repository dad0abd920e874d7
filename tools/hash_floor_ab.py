"""A/B: seeded-md5 h60 uniform vs xxhash64 uniform — the md5-floor
family's 100 TB knob (VERDICT r10 #5).

The r10 decomposition proved the remaining >2x ratios of
kfold_weights / dataset_temperature_mix / dataset_split are entirely
the seeded-md5 reproducibility hash (DuckDB's vectorized md5 is ~4x
faster per row; both engines are otherwise flat). The docstrings in
pipeline/sample.py promise deployments that don't need CROSS-ENGINE
verification swap ``hash_uniform`` for an xxhash64 uniform. This tool
measures that swap at a synthetic 10000x-class tier (hash work
dominates; no parquet needed — the input is ``spark.range``):

- ``md5``      : conv(substring(md5(salt|id),1,15),16,10)/16.0^15 —
                 the shipped cross-engine construction;
- ``xxhash64`` : xxhash64(salt, id)/2^64 + 0.5 (the signed 64-bit
                 hash shifted into [0, 1)) — same determinism and
                 salt-independence properties, JVM codegen, no hex
                 round-trip;
- ``baseline`` : the identical plan with a constant in place of the
                 uniform — the scan+split+aggregate floor.

Each variant drives the SAME split_assign-shaped plan (uniform ->
cumulative-weight CASE -> per-split count aggregate) so the delta is
the hash alone. Protocol: warmup + median of 5 (bench.py's).

Usage: python tools/hash_floor_ab.py [n_rows]   (default 100M)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from xarray_scipy_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark("hash-floor-ab")
    base = spark.range(n).withColumnRenamed("id", "doc_id")

    span = float(16**15)
    seeded = F.concat_ws("|", F.lit("split"), F.col("doc_id").cast("string"))
    u_md5 = F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("bigint") / F.lit(span)
    # xxhash64 takes the salt as an extra column — same seeded-rerun
    # property; shift the signed 64-bit hash into [0, 1)
    h = F.xxhash64(F.lit("split"), F.col("doc_id"))
    u_xx = (h / F.lit(float(2**64))) + F.lit(0.5)
    u_const = F.lit(0.5)

    def split_plan(u):
        s = (
            F.when(u < 0.98, F.lit("train"))
            .when(u < 0.99, F.lit("val"))
            .otherwise(F.lit("test"))
        )
        return base.select(s.alias("split")).groupBy("split").count()

    def measure(df) -> list[float]:
        samples = []
        for i in range(6):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            if i > 0:
                samples.append(round(time.time() - t0, 3))
        return samples

    out = {"n_rows": n}
    for tag, u in (("baseline", u_const), ("xxhash64", u_xx), ("md5", u_md5)):
        samples = measure(split_plan(u))
        med = statistics.median(samples)
        out[tag] = {"median": round(med, 3), "samples": samples}
        print(f"# {tag}: {med:.3f}s {samples}", file=sys.stderr)
    md5_t = out["md5"]["median"]
    xx_t = out["xxhash64"]["median"]
    base_t = out["baseline"]["median"]
    out["md5_over_xxhash64"] = round(md5_t / xx_t, 2)
    out["xxhash64_over_baseline"] = round(xx_t / base_t, 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
