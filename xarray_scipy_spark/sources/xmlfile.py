"""XML source/sink — the feed/sitemap/dump interchange format
(Wikipedia dumps, arXiv/PubMed metadata, RSS/Atom crawls are all XML
row streams), built on the XML data source Spark 4 merged into core.

Same discipline as the jsonl/csv sources: ALWAYS pass an explicit
schema (inference runs a full extra parse scan and silently widens
mixed content), and malformed records quarantine under PERMISSIVE
mode instead of poisoning the corpus.

Scale notes:

* A file splits across tasks on ``rowTag`` boundaries for PLAIN
  files; ``.gz`` shards decompress whole-file-per-task (the jsonl.py
  rule: keep compressed shards ~100-500 MB, one task per shard).
* XML parsing is the expensive scan of the source family (tag soup
  vs Jackson/Arrow) — land XML ONCE, convert to parquet, and point
  the pipeline at the parquet; these helpers are the landing step,
  not a query-time format.
* Column pruning still applies (only requested fields are
  materialized from the parse), and ``key=value`` partition layouts
  prune directories exactly as for jsonl/csv.
* Attributes surface with the ``_`` prefix (``<doc id="7">`` →
  column ``_id``); element text beside attributes lands in
  ``_VALUE``. Declare them in the schema like any other field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_xml", "stream_xml", "write_xml"]


def read_xml(
    spark: SparkSession,
    path: str,
    schema,
    *,
    row_tag: str = "row",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read XML shards (plain or .gz) with an explicit schema: one
    DataFrame row per ``row_tag`` element. Malformed elements land
    with nulls + the raw fragment in ``_corrupt_record`` under the
    default PERMISSIVE mode (declare that column in ``schema``, the
    jsonl.py convention); DROPMALFORMED / FAILFAST forward. Note
    Spark refuses queries that reference ONLY ``_corrupt_record``
    from a raw parse (a from-scratch internal-row restriction) —
    cache or persist first, or select data columns alongside it."""
    return (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .format("xml")
        .load(path)
    )


def stream_xml(
    spark: SparkSession,
    path: str,
    schema,
    *,
    row_tag: str = "row",
    mode: str = "PERMISSIVE",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_xml` — continuous
    landing for a directory that XML shards keep arriving in (the
    RSS/Atom-crawl and rolling-dump shape). Same explicit-schema +
    quarantine discipline; the checkpointed file log makes landing
    exactly-once per shard, ``max_files_per_trigger`` bounds
    per-micro-batch parse memory. Stream-equals-batch pinned in
    tests/test_pipeline.py."""
    reader = (
        spark.readStream.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    return reader.format("xml").load(path)


def write_xml(
    df: DataFrame,
    path: str,
    *,
    row_tag: str = "row",
    root_tag: str = "rows",
    compression: str | None = "gzip",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write XML shards (one ``root_tag`` document per file, one
    ``row_tag`` element per row; gzip by default — the dump
    interchange convention). ``partition_by`` produces the
    ``key=value/`` layout downstream readers partition-prune on."""
    w = (
        df.write.mode("overwrite")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
    )
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format("xml").save(path)
