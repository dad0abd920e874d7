"""CSV source/sink — the tabular interchange format for metadata
sidecars (label files, manifest tables, ingest drops from spreadsheets
and DB exports).

Same discipline as the JSONL source: ALWAYS pass an explicit schema
(inference is a second full scan that silently widens types), quarantine
malformed rows under ``PERMISSIVE`` instead of dropping them, and keep
``.gz`` shards ~100-500 MB since gzip is not splittable. CSV-specific
sharp edges handled here:

- ``header``: written and expected by default (the interchange
  convention); the reader still takes types from YOUR schema, never
  from the header row;
- ``multiLine`` stays OFF by default — quoted embedded newlines make
  files unsplittable and parsing stateful; corpora with newline-bearing
  text belong in JSONL/parquet, and that tradeoff should be explicit,
  not silent;
- quoting/escaping follow RFC 4180 (quote ``"``, escaped by doubling),
  which is what DuckDB/pandas/Excel emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_csv", "write_csv"]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
    multi_line: bool = False,
) -> DataFrame:
    """Read CSV shards (plain or .gz) with an explicit schema.

    Malformed rows land with nulls + the raw line in
    ``_corrupt_record`` when the schema declares that column (same
    quarantine contract as ``read_jsonl``). Column pruning reaches the
    scan; partition-directory pruning applies to ``key=value/``
    layouts.
    """
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", mode)
        .option("multiLine", multi_line)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    delimiter: str = ",",
    compression: str | None = "gzip",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write CSV shards, one file per partition. ``partition_by``
    produces the ``key=value/`` layout downstream readers
    partition-prune on."""
    w = df.write.mode("overwrite").option("header", header).option("sep", delimiter)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)
