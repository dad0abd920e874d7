"""Coordinate algebra as native Catalyst expressions.

The reference computes output coordinates eagerly on the driver with
numpy (``np.fft.fftfreq``/``rfftfreq`` at signal.py:206-221,
``assign_coords`` at signal.py:226). Here the same formulas are Spark
Column expressions over the group-constant ``n_in``/``offset``/``delta``
columns every kernel emits — lazily evaluated, whole-stage-codegen'd,
and never touching Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["fft_coord", "rfft_coord", "linear_coord", "restore_coord_dtype"]


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def fft_coord(k="idx", n="n_in", delta="delta") -> Column:
    """``np.fft.fftfreq(n, delta)[k]``: bin k maps to ``k/(n*delta)`` for
    ``k <= (n-1)//2`` else ``(k-n)/(n*delta)``.

    Note: we implement the *intended standard* spacing ``1/(n*delta)``;
    the reference divides delta by n once more before calling fftfreq
    (signal.py:221), a double-normalization quirk its own test never
    catches (SURVEY.md §2.2 #5, test_signal.py:335-337).
    """
    k, n, delta = _c(k), _c(n), _c(delta)
    signed = F.when(k <= F.floor((n - 1) / 2), k).otherwise(k - n)
    return signed.cast("double") / (n.cast("double") * delta)


def rfft_coord(k="idx", n="n_in", delta="delta") -> Column:
    """``np.fft.rfftfreq(n, delta)[k] = k / (n * delta)``."""
    k, n, delta = _c(k), _c(n), _c(delta)
    return k.cast("double") / (n.cast("double") * delta)


def linear_coord(k="idx", offset="offset", delta="delta") -> Column:
    """Equispaced coordinate reconstruction ``offset + k * delta``
    (the engine's (offset, delta) contract, README.md:25-29)."""
    k, offset, delta = _c(k), _c(offset), _c(delta)
    return offset + k.cast("double") * delta


def restore_coord_dtype(df, dim: str, coord: Column) -> Column:
    """Restore a recomputed coordinate to the INPUT column's dtype.

    Coordinates are numeric internally — datetime order columns enter the
    kernel as epoch-nanosecond floats (``core._coord_floats``, mirroring
    the reference's datetime-safe linspace at signal.py:316-321). On the
    way out, if the input ``dim`` column was a timestamp, the epoch-ns
    expression is cast back to a timestamp (microsecond precision —
    Spark's native resolution); otherwise the numeric expression passes
    through unchanged.

    Precision bound: epoch-ns magnitudes (~1.7e18) exceed a double's
    53-bit mantissa, so the float coordinate carries ~2^8 ns of
    representation error — the restored microsecond is exact for
    microsecond-aligned inputs and within 1 µs otherwise.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    dtype = df.schema[dim].dataType
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        micros = F.round(coord / F.lit(1000.0)).cast("bigint")
        return F.timestamp_micros(micros).cast(dtype)
    return coord
