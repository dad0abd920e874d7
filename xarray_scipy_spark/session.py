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
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
