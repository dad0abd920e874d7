"""SparkSession factory with the engine's recommended configuration.

Local testing runs ``local[N]``; on a real cluster only the master and
memory settings change — the SQL/AQE/Arrow configuration below is what
the operators are designed against and holds at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xarray_scipy_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime partition coalescing + skew-join splitting, which is
      what keeps the grouped-series shuffles healthy when series lengths
      are skewed at the 100 TB tier.
    - Arrow on: every kernel crosses JVM->Python as Arrow batches.
    - UTC session timezone: required for DuckDB-oracle comparability.
    - shuffle partitions default to local core count; on a cluster pass
      ~2-3x total executor cores (AQE coalesces the excess).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    # Pin BLAS/OpenMP pools inside python workers to one thread each: a
    # worker owns exactly one task core, and N workers x M-thread BLAS
    # oversubscribes the host N*M-fold (measured 10-20x wall-clock blowup
    # on 32-core hosts once every grouped-map task spun its own OpenBLAS
    # pool). Kernels batch across series instead — parallelism comes from
    # partitions, the design that holds on a real cluster where executors
    # share nodes. spark.executorEnv.* reaches python workers in both
    # local and cluster mode.
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        builder = builder.config(f"spark.executorEnv.{var}", "1")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
