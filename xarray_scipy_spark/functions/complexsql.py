"""Complex-number helpers over the twin re/im column encoding.

Spark has no complex dtype; the engine carries ``complex128`` as twin
``re``/``im`` double columns (SURVEY.md §1.5) so downstream math stays
in native SQL — e.g. the Hilbert envelope (reference returns a complex
DataArray and leaves ``abs`` to xarray) is ``magnitude()`` here.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["magnitude", "phase", "power"]


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def magnitude(re="re", im="im") -> Column:
    """|z| = sqrt(re² + im²)."""
    re, im = _c(re), _c(im)
    return F.sqrt(re * re + im * im)


def power(re="re", im="im") -> Column:
    """|z|² (cheaper than magnitude when only energy is needed)."""
    re, im = _c(re), _c(im)
    return re * re + im * im


def phase(re="re", im="im") -> Column:
    """arg(z) = atan2(im, re)."""
    return F.atan2(_c(im), _c(re))
