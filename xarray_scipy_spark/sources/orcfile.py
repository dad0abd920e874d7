"""ORC source/sink — the second columnar interchange format.

Parquet is this engine's native layout (TESTDATA.md), but warehouse
exports and Hive-era pipelines arrive as ORC, and Spark carries a
first-class vectorized ORC reader/writer. The scan behaves like the
parquet one where it matters at 100 TB: column pruning and predicate
pushdown reach the file (ORC row-group/stripe statistics), files split
by stripe so a large shard parallelizes, and ``key=value/`` directory
layouts partition-prune.

Discipline mirrors the CSV/JSONL sources: explicit schema always —
ORC files carry their own schema, but accepting it silently is how a
producer-side type change (int→bigint, timestamp flavor) walks into a
downstream job unnoticed; here the file schema must CONTAIN the
declared columns with compatible types or the read fails loudly at
plan time (select after read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_orc", "write_orc"]


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read ORC shards. With ``schema`` given, the frame is projected
    and cast to exactly those columns/types (missing columns fail at
    plan time — loud, not silent); without it, the file schema is
    accepted as-is (discouraged for production corpora)."""
    df = spark.read.orc(path)
    if schema is not None:
        from pyspark.sql import functions as F

        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return df


def write_orc(
    df: DataFrame,
    path: str,
    *,
    compression: str = "zstd",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ORC shards (zstd by default — the modern ratio/speed
    point; snappy/zlib accepted). ``partition_by`` produces the
    ``key=value/`` layout downstream readers partition-prune on."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
