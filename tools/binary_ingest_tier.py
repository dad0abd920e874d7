"""Measured evidence for the r15 raw-media ingest source.

Builds a many-small-files media tree (the shape binaryFile is FOR —
one file per row, non-splittable, listing cost dominated by file
count) once into .bench_media/ (gitignored), then measures, Spark vs
DuckDB over the SAME tree (bench protocol: warmup + median of 3,
fresh work per rep, noop consumption):

  listing   — metadata-only pass (path+length, content pruned):
              Spark selects path/length from the binaryFile scan;
              DuckDB aggregates over read_blob (it has no
              content-free stat path for blobs, which is itself the
              point: the pruned projection is a Spark capability).
  ingest    — full read + magic-byte format routing + count by
              format: Spark = read_binary_files |> sniff_media_format
              (codegen CASE); DuckDB = read_blob + the same CASE on
              blob prefixes.

Payload mix mirrors the sniffer dispatch: PNG/BMP/GIF/JPEG from the
repo's own encoders + a gzip and an unknown shard, ~2-6 KB each.

Usage: python tools/binary_ingest_tier.py [--files 5000] [--reps 3]
Prints one JSON line; record goes in BASELINE.md.
"""

from __future__ import annotations

import argparse
import gzip as _gzip
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
TREE = os.path.join(REPO, ".bench_media")

# DuckDB twin of sources/binaryfile.py sniff_media_format. DuckDB
# 1.0 has no blob substring/slice, so the CASE runs over the
# uppercase hex expansion (column h below); RIFF fourcc
# disambiguation identical (hex offset 17 = byte offset 9).
DUCK_SNIFF = """
CASE
  WHEN substr(h, 1, 4) = '5036' THEN 'ppm'
  WHEN substr(h, 1, 4) = '424D' THEN 'bmp'
  WHEN substr(h, 1, 16) = '89504E470D0A1A0A' THEN 'png'
  WHEN substr(h, 1, 4) = 'FFD8' THEN 'jpeg'
  WHEN substr(h, 1, 12) IN ('474946383761', '474946383961') THEN 'gif'
  WHEN substr(h, 1, 8) = '52494646'
       AND substr(h, 17, 8) = '57454250' THEN 'webp'
  WHEN substr(h, 1, 8) = '52494646'
       AND substr(h, 17, 8) = '57415645' THEN 'wav'
  WHEN substr(h, 1, 8) = '52494646'
       AND substr(h, 17, 8) = '41564920' THEN 'avi'
  WHEN substr(h, 1, 4) = '1F8B' THEN 'gzip'
  ELSE 'unknown'
END
"""


def build_tree(n_files: int) -> None:
    import numpy as np

    from xarray_scipy_spark.pipeline.jpeg import encode_jpeg
    from xarray_scipy_spark.pipeline.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
    )

    marker = os.path.join(TREE, f".built_{n_files}")
    if os.path.exists(marker):
        return
    rng = np.random.RandomState(42)
    os.makedirs(TREE, exist_ok=True)
    t0 = time.time()
    for i in range(n_files):
        px = rng.randint(0, 256, size=(24, 24, 3)).astype("uint8")
        kind = i % 6
        sub = os.path.join(TREE, f"shard={i % 16:02d}")
        os.makedirs(sub, exist_ok=True)
        if kind == 0:
            payload, ext = encode_png(px), "png"
        elif kind == 1:
            payload, ext = encode_bmp(px), "bmp"
        elif kind == 2:
            payload, ext = encode_gif(px[:, :, 0]), "gif"
        elif kind == 3:
            payload, ext = encode_jpeg(px[:, :, 0]), "jpg"
        elif kind == 4:
            payload, ext = _gzip.compress(px.tobytes()), "gz"
        else:
            payload, ext = b"\x00" + px.tobytes()[:256], "bin"
        with open(os.path.join(sub, f"f{i:06d}.{ext}"), "wb") as f:
            f.write(payload)
    open(marker, "w").write(f"{time.time() - t0:.1f}s")


def median3(fn, reps: int) -> float:
    fn()  # warmup
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return statistics.median(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=5000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    build_tree(args.files)

    import duckdb

    from xarray_scipy_spark.session import get_spark
    from xarray_scipy_spark.sources import (
        read_binary_files,
        sniff_media_format,
    )
    from pyspark.sql import functions as F

    spark = get_spark("binary-ingest-tier")
    glob_sql = f"{TREE}/shard=*/f*"

    def spark_listing():
        df = read_binary_files(spark, TREE, recursive=True).select(
            "path", "length"
        )
        return df.agg(F.count("*"), F.sum("length")).collect()

    def duck_listing():
        return duckdb.sql(
            f"SELECT count(*), sum(octet_length(content)) "
            f"FROM read_blob('{glob_sql}')"
        ).fetchall()

    def spark_ingest():
        df = read_binary_files(spark, TREE, recursive=True).withColumn(
            "fmt", sniff_media_format("content")
        )
        return sorted(
            df.groupBy("fmt").count().collect(), key=lambda r: r["fmt"]
        )

    def duck_ingest():
        return duckdb.sql(
            f"SELECT {DUCK_SNIFF} AS fmt, count(*) FROM ("
            f"  SELECT hex(content) AS h FROM read_blob('{glob_sql}')"
            f") GROUP BY 1 ORDER BY 1"
        ).fetchall()

    # cross-engine parity before timing anything
    sp = {r["fmt"]: r["count"] for r in spark_ingest()}
    du = dict(duck_ingest())
    assert sp == du, (sp, du)

    out = {
        "metric": "binary_ingest_tier",
        "files": args.files,
        "parity": "format-count equal",
        "spark_listing_s": round(median3(spark_listing, args.reps), 3),
        "duck_listing_s": round(median3(duck_listing, args.reps), 3),
        "spark_ingest_s": round(median3(spark_ingest, args.reps), 3),
        "duck_ingest_s": round(median3(duck_ingest, args.reps), 3),
        "formats": sp,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
