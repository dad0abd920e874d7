"""Measure the self-defined BASELINE (BASELINE.md protocol).

Two comparator classes, both complete single-node programs (parquet
load INCLUDED in the timed region — Spark pays the scan per query, so
the oracle must too):

- DSP ops: pandas + the repo's own numpy kernels (the same math scipy
  would run — scipy itself is unavailable here), per-group loop over
  the same grouping keys the Spark operators use.
- pipeline/relational ops: DuckDB running the exact ``oracle_sql()``
  text from the driver contract over the same parquet files.

Data: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Metric:
wall-clock sec/op, median of 3 runs, after one warmup.

Prints one JSON object with per-op medians; paste into BASELINE.md and
freeze.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_scipy_spark.kernels.dsp import (  # noqa: E402
    decimate_1d,
    fftconvolve_1d,
    hilbert_1d,
    sosfiltfilt_1d,
)
from xarray_scipy_spark.kernels.filter_design import butter_sos  # noqa: E402
from xarray_scipy_spark.kernels.peaks import peak_widths  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def load_events() -> list[np.ndarray]:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.sort_values(["user_id", "ts"], kind="mergesort")
    return [g["value"].to_numpy(dtype=float) for _, g in ev.groupby("user_id")]


# pipeline / relational queries timed via their exact contract oracle SQL
DUCKDB_OPS = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_cosine_topk_ivf",
    "text_token_stats",
    "text_quality",
    "tpch_q1",
    "sessionize",
    "asof_join",
    "range_join",
    "stream_window_stats",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sos = butter_sos(4, 0.25)

    def flagship():
        for x in load_events():
            sp = np.fft.rfft(x)
            mag = np.abs(sp[1:])
            int(np.argmax(mag)) + 1

    def op_rfft():
        for x in load_events():
            np.fft.rfft(x)

    def op_fftconvolve():
        for x in load_events():
            fftconvolve_1d(x, x, mode="full")

    def op_decimate():
        for x in load_events():
            decimate_1d(x, 4)

    def op_hilbert():
        for x in load_events():
            np.abs(hilbert_1d(x))

    def op_sosfiltfilt():
        for x in load_events():
            sosfiltfilt_1d(sos, x)

    def op_peak_widths():
        for x in load_events():
            interior = np.flatnonzero(
                (x[1:-1] > x[:-2]) & (x[1:-1] > x[2:])
            ) + 1
            if len(interior):
                peak_widths(x, interior.astype(np.intp))

    def op_stft():
        for x in load_events():
            if len(x) >= 16:
                fr = np.lib.stride_tricks.sliding_window_view(x, 16)[::8]
                np.fft.rfft(fr, axis=-1)

    def op_welch():
        taps = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(16) / 16)
        u = float(np.sum(taps**2))
        fold = np.r_[1.0, np.full(7, 2.0), 1.0]
        for x in load_events():
            if len(x) >= 16:
                fr = np.lib.stride_tricks.sliding_window_view(x, 16)[::8] * taps
                sp = np.fft.rfft(fr, axis=-1)
                (sp.real**2 + sp.imag**2).mean(axis=0) * (fold / u)

    ops = {
        "dominant_frequency": flagship,
        "rfft": op_rfft,
        "fftconvolve": op_fftconvolve,
        "decimate_iir": op_decimate,
        "hilbert_envelope": op_hilbert,
        "sosfiltfilt": op_sosfiltfilt,
        "peak_widths": op_peak_widths,
        "stft": op_stft,
        "welch": op_welch,
    }

    import duckdb

    from xarray_scipy_spark.contract import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name in DUCKDB_OPS:
        sql = ORACLES[name]
        ops[name] = lambda sql=sql: con.sql(sql).fetchall()

    out: dict[str, float] = {}
    for name, fn in ops.items():
        fn()  # warmup
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        out[name] = round(float(np.median(samples)), 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)

    ev_series = load_events()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_series": len(ev_series),
                "n_samples_total": sum(len(s) for s in ev_series),
                "runs": RUNS,
                "oracle_sec": out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
