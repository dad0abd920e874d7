"""Long/tidy ⇄ series/nested encodings of labeled series data.

SURVEY.md §1.5: a reference ``DataArray`` maps to two interchangeable
DataFrame encodings — (a) long form: one row per element, dim coords as
columns; (b) series form: one row per 1-D series, the core dim as an
``array<double>`` column. Long form is the public/SQL interchange form;
series form is what chained kernels prefer (one shuffle to build, then
every subsequent per-series op is a scalar expression or pandas UDF with
NO further shuffle).

Both codecs are pure JVM (``collect_list``/``posexplode``) — no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["to_series", "to_long"]


def to_series(
    df: DataFrame,
    *,
    by: Sequence[str],
    order: str,
    values: Sequence[str] = ("value",),
) -> DataFrame:
    """Long -> series: one row per group with coordinate + value arrays,
    sorted by the coordinate. ``array_sort`` on (coord, values...) structs
    gives a deterministic in-array order without a sort exchange."""
    by = list(by)
    packed = F.array_sort(
        F.collect_list(F.struct(F.col(order).alias("c"), *[F.col(v).alias(v) for v in values]))
    )
    out = df.groupBy(*by).agg(packed.alias("_s"))
    cols = [F.col("_s.c").alias(order)] + [F.col(f"_s.{v}").alias(v) for v in values]
    return out.select(*by, *cols)


def to_long(
    df: DataFrame,
    *,
    by: Sequence[str],
    arrays: Sequence[str],
    pos: str = "idx",
) -> DataFrame:
    """Series -> long: explode parallel array columns positionally."""
    by = list(by)
    arrays = list(arrays)
    zipped = F.posexplode(F.arrays_zip(*[F.col(a) for a in arrays]))
    out = df.select(*by, zipped.alias(pos, "_z"))
    return out.select(*by, pos, *[F.col(f"_z.{a}").alias(a) for a in arrays])
