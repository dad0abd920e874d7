"""Multimodal columns: opaque binary payloads with typed metadata and
Arrow-batched decode plumbing.

Design (north-star scope; no reference analog): media rides in a
``binary`` column next to a typed metadata struct. Decode / feature
extraction runs in ``mapInPandas`` — one Arrow batch of payloads per
invocation, so the Python decode cost is amortized across the batch
and the operator composes with any upstream filter/projection (Catalyst
prunes the payload column until the decode actually needs it).

The container has no image/audio libraries, so the *real* decoders are
stubbed behind clearly-marked ``NotImplementedError`` gates; the
deterministic fallback decoder (md5-derived features) keeps the whole
Spark-side contract — schema, batching, partitioning — real and
testable, and is reproducible in SQL for the correctness oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .hashes import spread

__all__ = ["with_binary", "decode_features", "fake_decoder", "image_decoder"]


def with_binary(
    df: DataFrame,
    *,
    source_col: str = "text",
    bin_col: str = "payload",
    media_type: str = "text/plain",
) -> DataFrame:
    """Attach an opaque binary payload column + metadata struct.

    In production the payload arrives from the storage layer (parquet
    binary column / object-store pointer); here it is synthesized from
    a text column so the downstream plumbing is exercised end-to-end.
    """
    return df.withColumn(bin_col, F.encode(F.col(source_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col(bin_col)).alias("n_bytes"),
            F.md5(F.col(bin_col)).alias("digest"),
        ),
    )


def fake_decoder(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in feature extractor: byte ``i`` of the md5
    digest as a float. Reproducible in SQL
    (``('0x' || substr(md5(payload), 2i+1, 2))::INT``), which lets the
    DuckDB oracle hash-verify the whole mapInPandas path."""
    digest = hashlib.md5(payload).digest()
    return [float(digest[i % 16]) for i in range(n_features)]


def image_decoder(payload: bytes, n_features: int) -> list[float]:
    """Real image decode/resize/feature path — requires an imaging
    library this container does not ship. STUB."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/cv2) not present "
        "in this environment; use fake_decoder for plumbing tests"
    )


def decode_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    n_features: int = 4,
    decoder: Callable[[bytes, int], list[float]] = fake_decoder,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Extract a fixed-width feature vector from each binary payload via
    ``mapInPandas`` (Arrow-batched; the iterator sees whole column
    batches, so ``decoder`` amortizes per-batch setup).

    Output: ``(id_col, n_bytes, f0..f{n-1})``. The declared schema is
    the Spark analog of the reference's ``output_dtypes`` contract
    (``/root/reference/xarray_scipy/signal.py:148``).
    """
    feature_fields = ", ".join(f"f{i} double" for i in range(n_features))
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, n_bytes int, {feature_fields}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            feats = [decoder(p, n_features) for p in payloads]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [len(p) for p in payloads],
                }
            )
            for i in range(n_features):
                out[f"f{i}"] = [f[i] for f in feats]
            yield out

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(run, schema=schema)
