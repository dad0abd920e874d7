#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE SHORT JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "sf": 0.1, "n_queries": K, "loadavg": [...],
     "detail": "BENCH_DETAIL.json"}

The full per-query timing dict goes to ``BENCH_DETAIL.json`` next to
this script (committed per round). Rationale: the driver captures only
the last ~2000 chars of stdout, and the single-line format with ~105
per-query floats outgrew that in r8 (BENCH_r08 ``parsed: null``, the
first ~21 timings lost from the official record — VERDICT r8 #1). The
stdout line stays machine-parsable and small; the artifact carries the
complete record.

Per-query time = wall-clock of building the plan + a full noop-sink
write (``format("noop")``): every output column is materialized, so
pure-projection plans (windows, regex, array algebra) are actually
executed — ``count()`` lets Catalyst prune a projection-only query
down to a parquet row count, which r6 measurement showed timing
nothing for the pure-Catalyst operators. Kernel/shuffle queries are
unaffected (a grouped-map UDF can change cardinality, so count()
already ran them); their numbers shift only by the output
materialization cost. No driver-side collect of the payload. A warmup
action runs first so JVM/Arrow startup is excluded, matching
BASELINE.md's protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: flagship + one representative per SURVEY §2 family +
# the four pipeline components (BASELINE.md protocol)
HEADLINE = [
    "dominant_frequency",
    "rfft",
    "fftconvolve",
    "decimate_fir",
    "decimate_iir",
    "hilbert_envelope",
    "sosfilt",
    "sosfiltfilt",
    "peak_widths",
    "fftshift",
    "resample",
    "stft",
    "welch",
    "asof_join",
    "range_join",
    "stream_window_stats",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_cosine_topk_ivf",
    "text_token_stats",
    "text_quality",
    "tpch_q1",
    "tpch_q5",
    "sessionize",
    "session_window_stats",
    "convolve_valid",
    "istft_roundtrip",
    "dataset_split",
    "decontaminate",
    "multimodal_real_decode",
    "text_vocab",
    "multimodal_gzip_decode",
    "multimodal_jpeg_decode",
    # round-6 second wave: smoothers, (b, a) filters, polyphase, CWT
    "medfilt",
    "wiener",
    "savgol",
    "lfilter",
    "filtfilt",
    "periodogram",
    "resample_poly",
    "cwt_ricker",
    "text_url_stats",
    # round-6 session 3: the r7/r8 registration queue (sketches, grid
    # resampling, skew join) — benched pre-registration via _QUEUED
    "sketch_hll",
    "sketch_countmin",
    "sketch_histogram",
    "bloom_decontaminate",
    "gapfill",
    "skew_join",
    "dedup_ngram_spans",
    "deconvolve",
    "welch_blackman",
    "text_hash_vectors",
    "lombscargle",
    "acf",
    "ewma",
    "seasonal_decompose",
    "cap_per_group",
    "robust_zscore",
    "dedup_minhash_cross",
    "filter_by_quantile",
    "interp_to",
    # round-7 additions
    "ohlc_bars",
    "bloom_semijoin",
    "latest_by_key",
    "sample_negatives",
    "multimodal_video_frames",
    "rolling_stats",
    "sketch_hll_merge",
    "group_quantiles",
    "url_canonical_dedup",
    "winsorize",
    "clean_text",
    "audio_spectral",
    "char_entropy",
    "ngram_counts",
    "quantile_normalize",
    "rolling_median",
    "kfold_weights",
    # round-8 additions
    "pagerank",
    "zorder_curve",
    "funnel",
    "retention",
    # r13 slate (session 2): relational + pipeline additions
    "tpch_q4",
    "tpch_q18",
    "grouped_ols",
    "triangle_count",
    "sequence_pack",
    "text_postings",
    # r14 slate (session 2): retrieval, typo-dedup, checklist seams
    "edit_distance_join",
    "bm25_scores",
    "event_pivot",
    "orders_unshipped",
    "json_props_stats",
    # r15 slate (session 2): CDC, analytics windows, set ops, recall,
    # weighted sampling
    "cdc_apply",
    "window_analytics",
    "active_user_setops",
    "ann_recall_eval",
    "weighted_sample",
    # r16 slate (session 3): TPC-H relational sweep
    "tpch_q7",
    "tpch_q10",
    "tpch_q14",
    "tpch_q15",
    "tpch_q22",
    # round-9 additions: TPC-H completion + the r18/r19 slates, so
    # every registered/queued query carries a per-round sf0.1 record
    # (VERDICT r8 #9: birth measurements only is not enough)
    "tpch_q8",
    "tpch_q9",
    "tpch_q13",
    "tpch_q17",
    "tpch_q19",
    "bpe_encode",
    "text_sparse_knn",
    "dedup_recall_eval",
    "embedding_outliers",
    "dataset_temperature_mix",
    "naive_bayes_lang",
    "auc_eval",
    "token_mi",
    "target_encoding",
    "event_transitions",
    "interval_join",
    # r9 session-2 additions: the data-quality layer
    "data_profile",
    "constraint_check",
    "frequent_values",
    "windowed_constraints",
]


def main() -> int:
    import __spark_entry__ as e
    from xarray_scipy_spark.session import get_spark
    from xarray_scipy_spark.sources.tables import load_table

    spark = get_spark("bench")
    qs = e.queries()

    # warmup: JVM + Arrow + python-worker pool spin-up, excluded from
    # timing (BASELINE.md protocol: cold session excluded). The grouped-
    # map no-op matters: without it the first UDF query absorbs the
    # Python worker pool startup.
    ev = load_table(spark, "events", SF_DIR).limit(256)
    ev.groupBy("user_id").applyInPandas(
        lambda p: p[["user_id"]].head(1), "user_id bigint"
    ).count()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    total = 0.0
    from xarray_scipy_spark import contract as C
    from xarray_scipy_spark.contract import _QUEUED

    # Plan-continuity overrides: the r8/r9 rotations folded these names
    # into variant-tag unions under their base registrations, but each
    # BENCH/BASELINE row must keep measuring the SAME plan round over
    # round — so the bench resolves them to the plain single-variant
    # functions (the unions are literal unionAll's of these, so no
    # plan goes unmeasured and headline_total stays comparable).
    plain = {
        "fftshift": C.q_fftshift,
        "medfilt": C.q_medfilt,
        "wiener": C.q_wiener,
        "savgol": C.q_savgol,
        "text_token_stats": C.q_text_token_stats,
        "text_quality": C.q_text_quality,
        "stream_window_stats": C.q_stream_window_stats,
        "session_window_stats": C.q_session_window_stats,
        "multimodal_jpeg_decode": C.q_multimodal_jpeg_decode,
        # r9 rotation (13 merges): bases keep their plain plans, the
        # absorbed variants resolve to their kept plain functions
        "welch": C.q_welch,
        "welch_blackman": C.q_welch_blackman,
        "rfft": C.q_rfft_merged,
        "peak_widths": C.q_peak_widths,
        "asof_join": C.q_asof_join,
        "range_join": C.q_range_join,
        "dedup_minhash": C.q_dedup_minhash,
        "dedup_simhash": C.q_dedup_simhash,
        "ann_cosine_topk_ivf": C.q_ann_cosine_topk_ivf,
        "tpch_q1": C.q_tpch_q1,
        "tpch_q5": C.q_tpch_q5,
        "decontaminate": C.q_decontaminate,
        "bloom_decontaminate": C.q_bloom_decontaminate,
        "sketch_hll": C.q_sketch_hll,
        "sketch_countmin": C.q_sketch_countmin,
    }

    for name in HEADLINE:
        # queue entries bench exactly like registered ones (the
        # driver's BENCH_r{N} then carries their sf0.1 numbers a round
        # before their CORRECTNESS row exists)
        fn = (
            plain.get(name)
            or qs.get(name)
            or (_QUEUED[name][0] if name in _QUEUED else None)
        )
        if fn is None:
            continue
        # one warmup run (compiles the plan's whole-stage-codegen
        # methods — seconds for wide plans) then MEDIAN OF 5 timed
        # runs, matching BASELINE.md's own measurement protocol.
        # best-of-2 (rounds 1-3) produced 2-3x round-over-round swings
        # on identical code (VERDICT r3); r6's host showed multi-second
        # steal spikes on single runs of pure-JVM queries (tpch_q5:
        # 0.9/1.9/5.9 s for identical plans), so the median is taken
        # over 5 runs — robust to two hiccups. All runs stay visible in
        # stderr.
        samples = []
        try:
            for i in range(6):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt_i = time.time() - t0
                if i > 0:  # drop the warmup
                    samples.append(dt_i)
        except Exception as ex:  # a failing query must not kill the bench
            print(f"# bench error {name}: {ex}", file=sys.stderr)
            times[name] = -1.0
            continue
        dt = round(sorted(samples)[len(samples) // 2], 3)
        times[name] = dt
        total += dt
        print(
            f"# {name}: {dt}s (runs: {', '.join(f'{s:.3f}' for s in samples)})",
            file=sys.stderr,
        )

    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # host-load context (BASELINE.md r7 protocol note): same-plan
    # swings within the documented steal band are machine noise —
    # read deltas against these
    loadavg = [round(load1, 2), round(load5, 2)]
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
                "loadavg": loadavg,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(times),
                "loadavg": loadavg,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
