"""Peak prominence / width measurement in pure numpy.

Re-implements the published ``scipy.signal.peak_prominences`` /
``peak_widths`` algorithms (the reference wraps the latter at
``/root/reference/xarray_scipy/signal.py:330-371`` and marks its own
wrapper ``# TODO: BROKEN`` at signal.py:346 — ours is designed working,
validated against the reference's golden binary-track fixtures,
``tests/test_signal.py:110-331``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["peak_prominences", "peak_widths"]


def peak_prominences(x: np.ndarray, peaks: np.ndarray, wlen: int | None = None):
    """Prominence of each peak: height above the higher of the two lowest
    contour points reached before a higher peak (or signal edge) on each
    side. Returns (prominences, left_bases, right_bases)."""
    x = np.asarray(x, dtype=float)
    peaks = np.asarray(peaks, dtype=np.intp)
    n = len(x)
    prominences = np.empty(len(peaks))
    left_bases = np.empty(len(peaks), dtype=np.intp)
    right_bases = np.empty(len(peaks), dtype=np.intp)
    for j, peak in enumerate(peaks):
        if not 0 <= peak < n:
            raise ValueError(f"peak {peak} outside signal of length {n}")
        i_min, i_max = 0, n - 1
        if wlen is not None and wlen >= 2:
            half = wlen // 2
            i_min = max(peak - half, i_min)
            i_max = min(peak + half, i_max)
        # walk left
        i = peak
        left_min = x[peak]
        left_bases[j] = peak
        while i_min <= i and x[i] <= x[peak]:
            if x[i] < left_min:
                left_min = x[i]
                left_bases[j] = i
            i -= 1
        # walk right
        i = peak
        right_min = x[peak]
        right_bases[j] = peak
        while i <= i_max and x[i] <= x[peak]:
            if x[i] < right_min:
                right_min = x[i]
                right_bases[j] = i
            i += 1
        prominences[j] = x[peak] - max(left_min, right_min)
    return prominences, left_bases, right_bases


def peak_widths(
    x: np.ndarray,
    peaks: np.ndarray,
    rel_height: float = 0.5,
    wlen: int | None = None,
):
    """Width of each peak at ``rel_height`` of its prominence below the
    peak height. Returns (widths, width_heights, left_ips, right_ips)
    with interpolated crossing positions, matching the scipy contract
    the reference re-exports (signal.py:330-371)."""
    if rel_height < 0:
        raise ValueError("rel_height must be >= 0")
    x = np.asarray(x, dtype=float)
    peaks = np.asarray(peaks, dtype=np.intp)
    prominences, left_bases, right_bases = peak_prominences(x, peaks, wlen)
    widths = np.empty(len(peaks))
    width_heights = np.empty(len(peaks))
    left_ips = np.empty(len(peaks))
    right_ips = np.empty(len(peaks))
    for j, peak in enumerate(peaks):
        height = x[peak] - prominences[j] * rel_height
        width_heights[j] = height
        # walk left until the signal drops below the evaluation height,
        # then linearly interpolate the crossing position
        i = peak
        while left_bases[j] < i and height < x[i]:
            i -= 1
        left_ip = float(i)
        if x[i] < height:
            left_ip += (height - x[i]) / (x[i + 1] - x[i])
        # walk right, same scheme
        i = peak
        while i < right_bases[j] and height < x[i]:
            i += 1
        right_ip = float(i)
        if x[i] < height:
            right_ip -= (height - x[i]) / (x[i - 1] - x[i])
        left_ips[j] = left_ip
        right_ips[j] = right_ip
        widths[j] = right_ip - left_ip
    return widths, width_heights, left_ips, right_ips
