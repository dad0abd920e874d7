"""Raw media-file ingestion: the step BEFORE the multimodal parquet.

Every multimodal contract query reads opaque ``binary`` payload
columns out of parquet (pipeline/multimodal.py) — this module is how
those columns get there from a directory/object-store tree of raw
image/audio/video files. Spark's built-in ``binaryFile`` source maps
one file to one row ``(path, modificationTime, length, content)``;
the wrapper here pins the scale-relevant handling and the sniffer
routes payloads by container format without leaving Catalyst.

100 TB notes (why the knobs below exist):

* ``binaryFile`` is NOT splittable — one file is one task's row, read
  whole. Media corpora are many small-to-medium files, which is the
  good case; a handful of multi-GB files become stragglers AND
  driver-memory risk (a row must fit in one task). ``max_bytes``
  guards that with a ``length <= max_bytes`` predicate, which the
  source PUSHES DOWN: oversize files are skipped from their file
  STATUS alone, content never read (the plan's PushedFilters shows
  it; tests/test_sources_binary.py pins it).
* Filters on ``length`` / ``modificationTime`` push down; ``path``
  predicates do NOT — prune paths with ``glob``
  (``pathGlobFilter``, applied at file listing) and directory
  layout instead.
* Column pruning is real here: selecting only
  ``path``/``length``/``modificationTime`` never opens the files, so
  a listing/audit pass over a 100 TB tree is metadata-only.
* Ingest pattern: ``read_binary_files(...)`` →
  :func:`sniff_media_format` → repartition to target parquet file
  sizing → write the (doc_id, format, content) table the multimodal
  pipeline reads. Keeping the sniff in Catalyst means the routing
  filter (e.g. dropping ``unknown`` payloads, partitioning by
  format) happens before any Python/Arrow boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = [
    "read_binary_files",
    "stream_binary_files",
    "sniff_media_format",
    "MEDIA_FORMATS",
]


def read_binary_files(
    spark,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
):
    """One row per file under ``path``: (path, modificationTime,
    length, content). ``glob`` applies Spark's ``pathGlobFilter`` at
    listing time (e.g. ``"*.png"``); ``recursive`` turns on
    ``recursiveFileLookup``; ``max_bytes`` adds a pushed-down
    ``length <= max_bytes`` guard so oversize files are skipped
    without being read (see the module docstring's scale notes)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= int(max_bytes))
    return df


def stream_binary_files(
    spark,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Structured-Streaming twin of :func:`read_binary_files` — the
    continuous-ingest shape for a landing zone that media files keep
    arriving in (``binaryFile`` is a supported file-stream source
    whose schema is FIXED, declared below because the streaming
    reader refuses schema inference). The
    checkpointed file log makes ingest exactly-once per file;
    ``max_files_per_trigger`` bounds per-micro-batch memory the same
    way ``max_bytes`` bounds per-file memory. Stream-equals-batch is
    pinned in tests/test_sources_binary.py per the repo's streaming
    discipline (every operator's streaming twin must reproduce the
    batch result)."""
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, "
        "length long, content binary"
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= int(max_bytes))
    return df


# Container formats the sniffer distinguishes — exactly the dispatch
# set of the pure-python decoders (pipeline/multimodal.py:660
# image_decoder, :703 decode_wav, :811 decode_avi_mjpeg, plus the
# gzip text-payload path), so a 'png' row is guaranteed to take
# decode_png and an 'unknown' row is guaranteed to raise the
# NotImplementedError gate.
MEDIA_FORMATS = (
    "ppm bmp png jpeg gif webp wav avi gzip unknown".split()
)


def _is(col, off: int, magic: bytes):
    return F.substring(col, off, len(magic)) == F.lit(magic)


def sniff_media_format(col):
    """Pure-Catalyst container-format sniff over a binary column —
    the same magic-byte dispatch as pipeline/multimodal.py's
    ``image_decoder`` (:660) / ``decode_wav`` (:703) /
    ``decode_avi_mjpeg`` (:811), kept JVM-side so format routing,
    partitioning, and the drop-``unknown`` filter all run inside
    codegen before any Arrow batch is built. RIFF containers
    disambiguate on the fourcc at offset 9 (WEBP/WAVE/``AVI ``)."""
    col = F.col(col) if isinstance(col, str) else col
    return (
        F.when(_is(col, 1, b"P6"), "ppm")
        .when(_is(col, 1, b"BM"), "bmp")
        .when(_is(col, 1, b"\x89PNG\r\n\x1a\n"), "png")
        .when(_is(col, 1, b"\xff\xd8"), "jpeg")
        .when(
            _is(col, 1, b"GIF87a") | _is(col, 1, b"GIF89a"), "gif"
        )
        .when(_is(col, 1, b"RIFF") & _is(col, 9, b"WEBP"), "webp")
        .when(_is(col, 1, b"RIFF") & _is(col, 9, b"WAVE"), "wav")
        .when(_is(col, 1, b"RIFF") & _is(col, 9, b"AVI "), "avi")
        .when(_is(col, 1, b"\x1f\x8b"), "gzip")
        .otherwise("unknown")
    )
