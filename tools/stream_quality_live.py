"""LIVE streaming cost for windowed_constraints (VERDICT r9 #6).

The batch-identical plan is measured in BASELINE.md; this records the
streaming-honesty rows, the stream_window_stats_live protocol:

- one-shot: ALL input files in one AvailableNow trigger — the
  state-commit floor a user pays running a stream over bounded
  history with zero amortization;
- multi-batch: maxFilesPerTrigger=1 over N input files — the
  amortized steady-state shape (per-batch cost = what an unbounded
  stream pays per micro-batch; watermark evicts finalized windows so
  state stays bounded).

Input: the 100x events tier (.bench_sf10/events.parquet) if present,
else $SPARK_GRAFT_SF_DIR/events.parquet. Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from xarray_scipy_spark.pipeline import windowed_constraints
    from xarray_scipy_spark.session import get_spark

    spark = get_spark("stream-quality-live")
    base100 = os.path.join(ROOT, ".bench_sf10", "events.parquet")
    base = base100 if os.path.exists(base100) else os.path.join(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "events.parquet",
    )
    # FileStreamSource needs a DIRECTORY of files; re-write the tier as
    # 16 parquet files so maxFilesPerTrigger=1 yields 16 micro-batches
    src = os.path.join(ROOT, ".bench_stream_src", "events16")
    if not os.path.isdir(src):
        spark.read.parquet(base).repartition(16).write.mode(
            "overwrite"
        ).parquet(src)
    n_files = len(glob.glob(os.path.join(src, "*.parquet")))
    schema = spark.read.parquet(src).schema
    constraints = [
        {"kind": "not_null", "column": "user_id"},
        {"kind": "between", "column": "value", "min": -1e6, "max": 1e6},
        {"kind": "min_rows", "value": 1},
    ]

    def run(label: str, **reader_opts) -> dict:
        t0 = time.time()
        sdf = (
            spark.readStream.schema(schema)
            .options(**{k: str(v) for k, v in reader_opts.items()})
            .parquet(src)
        )
        out = windowed_constraints(
            sdf, dim="ts", constraints=constraints,
            window="1 hour", watermark="2 hours",
        )
        q = (
            out.writeStream.format("noop")
            .outputMode("update")
            .option(
                "checkpointLocation",
                os.path.join(ROOT, ".bench_stream_ckpt", label, str(t0)),
            )
            .trigger(availableNow=True)
            .start()
        )
        n_batches = 0
        while q.isActive:
            q.awaitTermination(1)
            p = q.lastProgress
            if p is not None:
                n_batches = max(n_batches, p.get("batchId", 0) + 1)
        wall = time.time() - t0
        return {"wall": round(wall, 2), "n_batches": n_batches,
                "per_batch": round(wall / max(1, n_batches), 3)}

    # batch-parity reference (warm, median of 3)
    bt = []
    for i in range(4):
        t0 = time.time()
        windowed_constraints(
            spark.read.parquet(src), dim="ts", constraints=constraints,
            window="1 hour", watermark="2 hours",
        ).write.format("noop").mode("overwrite").save()
        if i > 0:
            bt.append(time.time() - t0)
    res = {
        "src": src,
        "n_files": n_files,
        "batch_plan": round(statistics.median(bt), 3),
        "one_shot": run("oneshot"),
        "multi_batch": run("multibatch", maxFilesPerTrigger=1),
        "loadavg": [round(x, 2) for x in os.getloadavg()[:2]],
    }
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
