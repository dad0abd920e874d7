"""End-to-end corpus curation: the pipeline ops composed the way a
training-data job actually runs them.

One pass over the documents decides a per-document verdict with a
deterministic precedence any engine can reproduce:

1. ``dropped_quality`` — heuristic quality score below threshold;
2. ``dropped_exact``   — byte-identical to a lower-id document;
3. ``dropped_neardup`` — the higher-id member of a MinHash-LSH
   near-duplicate pair (one-pass policy: membership in ANY pair as the
   larger id drops the document, independent of the partner's own
   verdict — no transitive chasing, which keeps the decision local and
   cheap; run :func:`..dedup.duplicate_clusters` when cluster-level
   canonicalization is needed);
4. ``kept`` otherwise.

Each stage reuses the already-verified primitives (quality_score,
exact_duplicates, minhash_pairs), so the report's plan inherits their
scale shapes: one hash aggregate, one reused-exchange LSH self-join,
broadcast of the tiny pair/dup sets back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import exact_duplicates, minhash_pairs
from .text import quality_score

__all__ = ["curation_report"]


def curation_report(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    minhash_threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Per-document curation verdict: ``(id_col, status, quality)``.

    ``status`` ∈ {kept, dropped_quality, dropped_exact,
    dropped_neardup} with the precedence documented in the module
    docstring.
    """
    q = quality_score(df, id_col=id_col, text_col=text_col).select(
        id_col, "quality"
    )
    exact = exact_duplicates(df, id_col=id_col, text_col=text_col)
    # ids that are NOT their content group's keeper
    exact_dropped = (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .join(F.broadcast(exact.select("content_hash", "keep_id")), "content_hash")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col).alias("__exact_drop__"))
    )
    near = minhash_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=minhash_threshold,
    ).select(F.col("b_id").alias("__near_drop__")).distinct()

    out = (
        q.join(
            F.broadcast(exact_dropped),
            q[id_col] == F.col("__exact_drop__"),
            "left",
        )
        .join(F.broadcast(near), q[id_col] == F.col("__near_drop__"), "left")
        .select(
            id_col,
            "quality",
            F.when(F.col("quality") < min_quality, "dropped_quality")
            .when(F.col("__exact_drop__").isNotNull(), "dropped_exact")
            .when(F.col("__near_drop__").isNotNull(), "dropped_neardup")
            .otherwise("kept")
            .alias("status"),
        )
    )
    return out
