"""Structured Streaming extensions.

The reference is batch-only (SURVEY.md §2.3 "streaming: absent"); this
package is the engine's scale path for *unbounded* series — the same
kernels, applied incrementally with explicit carried state.
"""

from .joins import stream_interval_join
from .stateful import gapfill_stream, sosfilt_stream, stft_stream
from .windows import countmin_stream, hll_stream, latest_stream, ohlc_stream, session_stats, stream_distinct, windowed_stats

__all__ = ["countmin_stream", "stream_interval_join", "gapfill_stream", "hll_stream", "sosfilt_stream", "stft_stream", "latest_stream", "ohlc_stream", "session_stats", "stream_distinct", "windowed_stats"]
