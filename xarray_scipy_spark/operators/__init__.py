"""Operator inventory — one public entry per reference operator
(SURVEY.md §2.2 #1-17) plus engine-native fast paths."""

from .convolve import (
    convolve,
    convolve_fir,
    correlate,
    deconvolve,
    fftconvolve,
    fftconvolve_nd,
)
from .cwt import cwt_ricker, ricker_taps
from .detrend import detrend
from .fft import fft, fftshift, hfft, ifft, ifftshift, ihfft, irfft, rfft
from .filters import filtfilt, lfilter, sos_from_dataframe, sosfilt, sosfilt_chunked, sosfiltfilt
from .hilbert import envelope, hilbert
from .events import funnel_counts, funnel_times, retention_cohorts
from .joins import asof_join, bloom_semijoin, interval_join, range_join, skew_join
from .lomb import lombscargle
from .timegrid import gapfill, gapfill_variants, interp_to
from .tsstats import acf, ewma, ohlc_bars, rolling_stats, seasonal_decompose
from .peaks import find_peaks, peak_prominences, peak_widths
from .resample import decimate, resample, resample_poly, upfirdn
from .savgol import savgol_filter
from .smooth import medfilt, order_filter, wiener
from .spectral import coherence, csd, istft, periodogram, spectral_apply, stft, welch

__all__ = [
    "convolve",
    "correlate",
    "fftconvolve",
    "gapfill",
    "gapfill_variants",
    "interp_to",
    "lombscargle",
    "acf",
    "ewma",
    "seasonal_decompose",
    "skew_join",
    "bloom_semijoin",
    "ohlc_bars",
    "funnel_times",
    "funnel_counts",
    "retention_cohorts",
    "rolling_stats",
    "fftconvolve_nd",
    "convolve_fir",
    "decimate",
    "fft",
    "ifft",
    "rfft",
    "irfft",
    "hfft",
    "ihfft",
    "fftshift",
    "ifftshift",
    "hilbert",
    "envelope",
    "find_peaks",
    "peak_prominences",
    "peak_widths",
    "resample",
    "sosfilt",
    "sosfiltfilt",
    "sosfilt_chunked",
    "sos_from_dataframe",
    "istft",
    "spectral_apply",
    "stft",
    "welch",
    "asof_join",
    "range_join",
    "interval_join",
    "detrend",
    "csd",
    "coherence",
    "medfilt",
    "order_filter",
    "wiener",
    "lfilter",
    "filtfilt",
    "savgol_filter",
    "periodogram",
    "resample_poly",
    "upfirdn",
    "cwt_ricker",
    "ricker_taps",
    "deconvolve",
]
