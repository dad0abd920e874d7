"""JSONL (newline-delimited JSON) source/sink — the interchange format
of web-crawl and LLM-training corpora (.jsonl / .jsonl.gz shards).

Spark's native json reader handles both plain and gzip-compressed
shards transparently (``.gz`` files are decompressed per-file; they are
NOT splittable, so at scale keep shards ~100-500 MB — one task per
shard is the right granularity anyway). ALWAYS pass an explicit
schema: without one Spark runs a full inference scan (double read) and
silently widens mixed-type columns; with one the read is single-pass
and malformed rows are quarantined instead of poisoning the corpus.

Corrupt-record policy (``mode``):
- ``PERMISSIVE`` (default): malformed rows land with nulls + the raw
  line in ``_corrupt_record`` — the curation pipeline's choice, since
  dropping silently loses the denominator for quality stats;
- ``DROPMALFORMED`` / ``FAILFAST``: the strict variants, forwarded.

Note (applies to every PERMISSIVE source in this package): Spark
refuses queries that reference ONLY ``_corrupt_record`` from a raw
parse — cache/persist first, or select data columns alongside it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = ["read_jsonl", "write_jsonl", "DOCUMENTS_JSONL_SCHEMA"]

# the documents table's interchange schema; _corrupt_record captures
# malformed lines under PERMISSIVE mode
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL shards (plain or .gz) with an explicit schema.

    Column pruning still reaches the scan (Jackson parses only the
    requested fields), and partition-directory pruning applies when
    ``path`` is a partitioned layout — check ``ReadSchema`` in
    ``.explain("formatted")``.
    """
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write JSONL shards, one file per partition (gzip by default —
    the corpus interchange convention). ``partition_by`` produces the
    ``key=value/`` directory layout downstream readers partition-prune
    on."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
