"""Parquet sources for the driver's synthetic tables (TESTDATA.md).

The reference has no storage layer at all (SURVEY.md §2.3 "scans:
absent" — it receives in-memory arrays); sources are where our engine
starts. Plain ``spark.read.parquet`` keeps Catalyst's pushdown/pruning:
filters and column selections written against these DataFrames reach
the parquet scan (check ``PushedFilters``/``ReadSchema`` in
``.explain("formatted")``).

At the 100 TB tier the same loaders apply unchanged — parquet scans
split by row-group; pair with partitioned layouts
(``df.write.partitionBy(...)``) or bucketed tables
(``bucketBy(n, keys)``) when a downstream groupBy/join key is known,
which removes the per-operator shuffle entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    # TESTDATA parquet stores time columns as timestamp[us], which Spark
    # reads as TIMESTAMP_NTZ (no zone). DuckDB reads the same bytes as a
    # naive timestamp, so wall-clock comparisons agree byte-for-byte;
    # queries doing EPOCH ARITHMETIC must go through
    # functions.timeutil.epoch_us, whose NTZ subtraction matches DuckDB's
    # epoch_us() independently of the session timezone.
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Expose every table as a temp view so the SQL API (spark.sql) can
    be used interchangeably with the DataFrame API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
