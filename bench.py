#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE SHORT JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "sf": 0.1, "n_queries": K, "loadavg": [...],
     "loadavg_end": [...], "load_gate": "ok",
     "detail": "BENCH_DETAIL.json"}

``loadavg`` is the GATED ambient sample at battery start (the battery
waits up to ~8 min for BOTH load1 and load5 < 4 before starting —
VERDICT r12 #2 + the r13 load5 blind spot); ``loadavg_end`` includes
the battery's own load and is context only. A second, battery-level
defense catches what the gate can't (VERDICT r13 #1): a UNIFORM
~1.2-1.5x host smear inflates every row a little and trips no per-row
flag — so if the comparable-row total reads >15% over the prior
committed battery with ZERO per-row flags, the whole battery reruns
once in a fresh session and the smaller total is official
(``total_sanity`` in both artifacts records the adjudication).

COMMIT POLICY (VERDICT r13 #2, made mechanical at r15 per VERDICT r14
#1): the round's committed BENCH_DETAIL.json is the BUILDER's
settled-window battery, and ONLY a run with
``SPARK_GRAFT_DETAIL_COMMIT=1`` writes that file. Every other
invocation — the driver's own per-round battery included — writes the
gitignored ``BENCH_DETAIL*.run.json`` scratch twin instead (full
artifact preserved on disk for audit, recorded by name in the stdout
line), so the tree is clean at round close by construction and no
round-open ``git checkout`` step is needed. Bands only ever ratchet
down, so the committed builder battery remains the stricter anchor;
the prior-band/prior-total READ always targets the committed record.

The full per-query timing dict goes to ``BENCH_DETAIL.json`` next to
this script (committed per round). Rationale: the driver captures only
the last ~2000 chars of stdout, and the single-line format with ~105
per-query floats outgrew that in r8 (BENCH_r08 ``parsed: null``, the
first ~21 timings lost from the official record — VERDICT r8 #1). The
stdout line stays machine-parsable and small; the artifact carries the
complete record.

Self-adjudication (VERDICT r9 #1 — two consecutive rounds of
environment-corrupted official numbers: r8 truncation, r9 steal
inflating 8 rows 2-16x): BENCH_DETAIL.json now persists, per query,
ALL 5 timed samples, min, median, and a wall-clock timestamp, plus a
carried-forward per-query BAND = the running minimum of every official
value ever recorded for that name (loaded from the committed
BENCH_DETAIL.json of the prior round; steal only ever inflates, so the
monotone min is the robust anchor). After the battery, any row whose
median exceeds 2.5x its own min (intra-battery steal) or 2x its band
(cross-round inflation) is RE-RUN once in isolation order (fresh
warmup + 5 samples); the official value is the smaller of the two
medians and the row carries a machine-readable ``flag`` recording
which check fired and what the rerun showed. A row that stays >2x its
band after the rerun is flagged ``confirmed-slow`` — a real
regression, not steal.

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
    # r11 additions: total-silence detection (oracle row added r11),
    # dedup cluster resolution, skew-detection histogram
    "missing_windows",
    "dedup_keep_best",
    "key_skew_profile",
    "dataset_split_safe",
    # r13 addition: DSIR importance weighting (queued for r15)
    "dsir_weights",
]


def plain_overrides() -> dict:
    """Plan-continuity overrides: rotations fold names into variant-tag
    unions under their base registrations, but each BENCH/BASELINE row
    must keep measuring the SAME plan round over round — so the bench
    (and tools/sentinel.py's fresh-session reruns) resolve these names
    to the plain single-variant functions. The unions are literal
    unionAll's of these, so no plan goes unmeasured."""
    from xarray_scipy_spark import contract as C

    return {
        "fftshift": C.q_fftshift,
        "medfilt": C.q_medfilt,
        "wiener": C.q_wiener,
        "savgol": C.q_savgol,
        "text_token_stats": C.q_text_token_stats,
        "text_quality": C.q_text_quality,
        "stream_window_stats": C.q_stream_window_stats,
        "session_window_stats": C.q_session_window_stats,
        "multimodal_jpeg_decode": C.q_multimodal_jpeg_decode,
        # r9 rotation (13 merges)
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
        # r10 rotation (11 merges)
        "fftconvolve": C.q_fftconvolve,
        "istft_roundtrip": C.q_istft_roundtrip,
        "lfilter": C.q_lfilter,
        "filtfilt": C.q_filtfilt,
        "dataset_split": C.q_dataset_split,
        "ann_cosine_topk": C.q_ann_cosine_topk,
        "cwt_ricker": C.q_cwt_ricker,
        "periodogram": C.q_periodogram,
        "acf": C.q_acf,
        "ewma": C.q_ewma,
        "seasonal_decompose": C.q_seasonal_decompose,
        "text_vocab": C.q_text_vocab,
        "skew_join": C.q_skew_join,
        "bloom_semijoin": C.q_bloom_semijoin,
        "text_url_stats": C.q_text_url_stats,
        # r11 rotation (10 merges)
        "sosfilt": C.q_sosfilt,
        # sosfiltfilt's plain plan is the r7 padtype union — the same
        # function its BENCH row has measured since r7
        "sosfiltfilt": C.q_sosfiltfilt_merged,
        # convolve_valid's BENCH row has measured the r9 valid-mode
        # union since r9 — keep that exact plan
        "convolve_valid": C.q_convolve_merged,
        "deconvolve": C.q_deconvolve,
        "multimodal_real_decode": C.q_multimodal_real_decode,
        "multimodal_video_frames": C.q_multimodal_video_frames,
        "gapfill": C.q_gapfill,
        "interp_to": C.q_interp_to,
        "dedup_minhash_cross": C.q_dedup_minhash_cross,
        "sketch_hll_merge": C.q_sketch_hll_merge,
        "clean_text": C.q_clean_text,
        "url_canonical_dedup": C.q_url_canonical_dedup,
        "cap_per_group": C.q_cap_per_group,
        "filter_by_quantile": C.q_filter_by_quantile,
        # r12 rotation (12 merges): names retired from the registry
        # keep their historical plans here, and the merged BASE names
        # that carry a HEADLINE row keep their plain single-variant
        # plans (the r11 sosfilt/fftconvolve precedent — without
        # these the r12 unions inflate the base rows ~40% and flag
        # vs band, measured at the r12 open). decimate_iir's BENCH
        # row has measured the r7 iir-family union since r7 — keep
        # that exact plan.
        "resample": C.q_resample,
        "dedup_exact": C.q_dedup_exact,
        "funnel": C.q_funnel,
        "tpch_q4": C.q_tpch_q4,
        "rolling_stats": C.q_rolling_stats,
        "decimate_fir": C.q_decimate_fir,
        "lombscargle": C.q_lombscargle,
        "dominant_frequency": C.q_dominant_frequency,
        "hilbert_envelope": C.q_hilbert_envelope,
        "decimate_iir": C.q_decimate_iir_merged,
        "resample_poly": C.q_resample_poly,
        "dedup_ngram_spans": C.q_dedup_ngram_spans,
        "quantile_normalize": C.q_quantile_normalize,
        "rolling_median": C.q_rolling_median,
        "retention": C.q_retention,
        "tpch_q18": C.q_tpch_q18,
        # r13 rotation (7 merges): HEADLINE names touched — the
        # merged BASES keep their plain single-variant plans, the
        # RETIRED names keep their historical plans (names not in
        # HEADLINE — multimodal_audio_decode, fftconvolve_2d,
        # sosfilt_stream and their absorbed twins except
        # multimodal_gzip_decode — need no row here).
        "stft": C.q_stft,
        "sessionize": C.q_sessionize,
        "group_quantiles": C.q_group_quantiles,
        "text_postings": C.q_text_postings,
        "winsorize": C.q_winsorize,
        "bm25_scores": C.q_bm25_scores,
        "multimodal_gzip_decode": C.q_multimodal_gzip_decode,
        # r14 rotation (2 merges, executed): the merged bases q7/q14
        # and the retired q8/q9/q19 keep their plain single-variant
        # plans under their BENCH rows (entries pre-staged at r13 and
        # asserted identical then, so the rotation changed no measured
        # plan's identity).
        "tpch_q7": C.q_tpch_q7,
        "tpch_q8": C.q_tpch_q8,
        "tpch_q9": C.q_tpch_q9,
        "tpch_q14": C.q_tpch_q14,
        "tpch_q19": C.q_tpch_q19,
        # r16 staged merge (dry-run built r15, VERDICT r14 #3):
        # entries PRE-staged while plain == registered (identical
        # today, so no measured plan changes identity when the
        # event_pivot -> window_analytics@merged rotation executes).
        "window_analytics": C.q_window_analytics,
        "event_pivot": C.q_event_pivot,
        # r16+ staged rule-c merges (dry-runs built r15): the eval
        # twins keep their plain composition plans under their BENCH
        # rows when they fold into their bases (ann_cosine_topk_ivf /
        # dedup_minhash already carry plain entries above). Identical
        # to the registered functions today, so no measured plan
        # changes identity at the eval-twin rotations.
        "ann_recall_eval": C.q_ann_recall_eval,
        "dedup_recall_eval": C.q_dedup_recall_eval,
    }


# Ambient-load gate (VERDICT r12 #2): BENCH_r12 was captured at
# loadavg 5.6 while same-HEAD adjudicated batteries bracketed r11 —
# the official artifact overstated the round by a uniform host-steal
# smear. The battery now refuses to START hot: it samples load1
# BEFORE any Spark work and waits for the host to settle below the
# bound (BASELINE.md's clean-host criterion, "loadavg < 4"). If the
# host never settles, the run proceeds but the artifact self-reports
# load_gate=EXCEEDED so a reader never mistakes it for a clean record.
LOAD_GATE = 4.0
_LOAD_WAIT_S = 30
_LOAD_TRIES = 16


def _await_quiet_host() -> tuple[list[float], str]:
    """Block until ambient load1 AND load5 < LOAD_GATE (up to ~8 min).
    Returns (loadavg_start, gate_status) — the START sample is the
    recorded headline loadavg (the END sample includes the battery's
    own load, which is not what the gate is about).

    Both averages gate (VERDICT r13 #1): the r13 battery started at
    load1 2.51 but load5 5.91 — the host had JUST been busy and stayed
    noisy, smearing every row ~1.2-1.5x with zero per-row flags. load5
    decays with a 5-min time constant, so the wait budget is ~8 min.
    """
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        return [-1.0, -1.0], "unavailable"
    tries = 0
    while max(load1, load5) >= LOAD_GATE and tries < _LOAD_TRIES:
        print(
            f"# load gate: ambient load1 {load1:.2f} / load5 {load5:.2f}"
            f" >= {LOAD_GATE} — waiting {_LOAD_WAIT_S}s"
            f" ({tries + 1}/{_LOAD_TRIES})",
            file=sys.stderr,
        )
        time.sleep(_LOAD_WAIT_S)
        try:
            load1, load5, _ = os.getloadavg()
        except OSError:
            # transient sampling failure mid-wait (ADVICE r13 #3):
            # degrade to the last good sample instead of crashing the
            # whole battery
            break
        tries += 1
    status = "ok" if max(load1, load5) < LOAD_GATE else "EXCEEDED"
    return [round(load1, 2), round(load5, 2)], status


def main() -> int:
    import __spark_entry__ as e
    from xarray_scipy_spark.session import get_spark
    from xarray_scipy_spark.sources.tables import load_table

    loadavg_start, load_gate = _await_quiet_host()
    spark = get_spark("bench")
    qs = e.queries()

    # warmup: JVM + Arrow + python-worker pool spin-up, excluded from
    # timing (BASELINE.md protocol: cold session excluded). The grouped-
    # map no-op matters: without it the first UDF query absorbs the
    # Python worker pool startup. A closure so the battery-total
    # sanity rerun warms its fresh session the same way.
    def warmup():
        ev = load_table(spark, "events", SF_DIR).limit(256)
        ev.groupBy("user_id").applyInPandas(
            lambda p: p[["user_id"]].head(1), "user_id bigint"
        ).count()

    warmup()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = 0.0
    from xarray_scipy_spark import contract as C
    from xarray_scipy_spark.contract import _QUEUED

    plain = plain_overrides()

    # self-adjudication bands: running per-query minimum of every
    # official value ever recorded, carried forward through the
    # committed BENCH_DETAIL.json (the file on disk at run time is the
    # prior round's — the driver commits it per round). Steal only
    # inflates, so the monotone min is robust to corrupted rounds.
    # Band hygiene: bands are only meaningful WITHIN one scale factor —
    # an ad-hoc sf0.01 verify run must neither inherit the sf0.1 bands
    # (everything would read as 10x-fast) nor overwrite the committed
    # sf0.1 record (future official runs would flag vs sf0.01 minima).
    # Non-default-sf runs read/write a suffixed artifact instead.
    sf_tag = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    detail_name = (
        "BENCH_DETAIL.json" if sf_tag == "0.1" else f"BENCH_DETAIL_sf{sf_tag}.json"
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    # WRITE side (VERDICT r14 #1, the clean-tree invariant): the
    # committed BENCH_DETAIL.json is the builder's settled battery,
    # written ONLY when SPARK_GRAFT_DETAIL_COMMIT=1 (the builder's
    # official settled run). Every other invocation — the driver's
    # per-round battery included — writes the gitignored
    # *.run.json scratch twin, so a battery run never dirties the
    # committed record and `git status` stays clean at round close.
    # Bands/prior-total are always READ from the committed record.
    commit_detail = os.environ.get(
        "SPARK_GRAFT_DETAIL_COMMIT", ""
    ).lower() in ("1", "true", "yes")
    # Non-commit scratch artifacts get a start-time+pid suffix so a
    # later battery never clobbers an earlier one's audit evidence
    # (ADVICE r15 — the r16 baseline battery's detail was lost to
    # exactly this). r17 (VERDICT r16 #2): the copy to the fixed
    # ``BENCH_DETAIL.run.json`` name is GONE — it re-created the
    # clobbering the suffix was added to stop (the driver's official
    # c32 detail was shadowed by its later c8 scaling run, blanking
    # PERF_r16's per_query/scaling). The per-invocation detail file is
    # named in the stdout line's ``detail`` field; nothing ever
    # overwrites it. Matches the BENCH_DETAIL*.run.json gitignore glob.
    written_name = (
        detail_name
        if commit_detail
        else detail_name[: -len(".json")]
        + time.strftime(".%Y%m%dT%H%M%S")
        + f"-{os.getpid()}.run.json"
    )
    written_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), written_name
    )
    bands: dict[str, float] = {}
    prior_queries: dict[str, float] = {}
    try:
        with open(detail_path) as fh:
            prior = json.load(fh)
        # matching-sf records only; sf-less legacy records are
        # accepted ONLY at the historical default tier (0.1, where all
        # pre-sf-field files were written) — merging them into every
        # tier's minima is exactly the cross-sf poisoning this guard
        # exists to prevent (ADVICE r11 #3, r12 #3)
        prior_sf = str(prior.get("sf"))
        if prior_sf == sf_tag or (prior_sf == "None" and sf_tag == "0.1"):
            bands.update(prior.get("bands", {}))
            for k, v in prior.get("queries", {}).items():
                if isinstance(v, (int, float)) and v > 0:
                    bands[k] = min(bands.get(k, v), v)
                    prior_queries[k] = v
    except (OSError, ValueError):
        pass

    def measure(fn) -> list[float]:
        # one warmup run (compiles the plan's whole-stage-codegen
        # methods — seconds for wide plans) then 5 timed runs; the
        # MEDIAN is the official statistic, matching BASELINE.md's
        # protocol. best-of-2 (rounds 1-3) produced 2-3x swings on
        # identical code (VERDICT r3); r6's host showed multi-second
        # steal spikes on single runs of pure-JVM queries.
        samples = []
        for i in range(6):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt_i = time.time() - t0
            if i > 0:  # drop the warmup
                samples.append(round(dt_i, 3))
        return samples

    def resolve(name):
        # queue entries bench exactly like registered ones (the
        # driver's BENCH_r{N} then carries their sf0.1 numbers a round
        # before their CORRECTNESS row exists)
        return (
            plain.get(name)
            or qs.get(name)
            or (_QUEUED[name][0] if name in _QUEUED else None)
        )

    def run_battery() -> tuple[dict, dict, list]:
        nonlocal spark
        times: dict[str, float] = {}
        detail: dict[str, dict] = {}
        suspects: list[str] = []
        for name in HEADLINE:
            fn = resolve(name)
            if fn is None:
                continue
            ts = time.strftime("%H:%M:%S")
            try:
                samples = measure(fn)
            except Exception as ex:  # a failing query must not kill the bench
                print(f"# bench error {name}: {ex}", file=sys.stderr)
                times[name] = -1.0
                detail[name] = {"error": str(ex)[:300], "ts": ts}
                continue
            med = sorted(samples)[len(samples) // 2]
            lo = min(samples)
            row = {"samples": samples, "median": med, "min": lo, "ts": ts}
            band = bands.get(name)
            flags = []
            if med > 2.5 * lo:
                flags.append("median>2.5x-min")
            if band is not None and med > 2.0 * band:
                flags.append("median>2x-band")
            if flags:
                row["flag"] = "+".join(flags)
                suspects.append(name)
            detail[name] = row
            times[name] = med
            print(
                f"# {name}: {med}s (runs: {', '.join(f'{s:.3f}' for s in samples)})"
                + (f" FLAG {row.get('flag')}" if flags else ""),
                file=sys.stderr,
            )

        # adjudication pass: re-run every steal-suspect row once, after
        # the battery, in a FRESH Spark session (subprocess via
        # tools/sentinel.py — VERDICT r9 #1 + the r10 finding that a
        # 125-query session accumulates state that inflates late rows and
        # follows an in-session rerun; a fresh session separates
        # "session-state slow" from "genuinely slow"). The battery session
        # STOPS first so the rerun JVM doesn't contend with its 128 GB
        # heap (the first protocol run's rerun measured 6x slow purely
        # from that contention). Falls back to a new in-process session if
        # the subprocess fails. The official value is the smaller median;
        # both measurements stay on record.
        import subprocess

        sentinel = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools", "sentinel.py"
        )
        if suspects:
            spark.stop()
            spark = None
        for name in suspects:
            row = detail[name]
            rerun = None
            try:
                r = subprocess.run(
                    [sys.executable, sentinel, name],
                    capture_output=True, text=True, timeout=900,
                )
                payload = json.loads(r.stdout)
                srow = payload["rows"][0]
                if "samples" in srow:
                    rerun = srow["samples"]
                    row["rerun_mode"] = "fresh-session"
            except Exception as ex:
                row["rerun_subprocess_error"] = str(ex)[:200]
            if rerun is None:
                try:
                    if spark is None:
                        spark = get_spark("bench-rerun")
                    rerun = measure(resolve(name))
                    row["rerun_mode"] = "fallback-session"
                except Exception as ex:
                    row["rerun_error"] = str(ex)[:300]
                    continue
            rmed = sorted(rerun)[len(rerun) // 2]
            row["rerun_samples"] = rerun
            row["rerun_median"] = rmed
            row["rerun_ts"] = time.strftime("%H:%M:%S")
            if rmed < row["median"]:
                row["adjudication"] = "steal-confirmed-rerun-faster"
                times[name] = rmed
            else:
                row["adjudication"] = "rerun-no-faster"
            band = bands.get(name)
            if band is not None and times[name] > 2.0 * band:
                row["adjudication"] = "confirmed-slow-vs-band"
            print(
                f"# rerun {name}: {rmed}s (battery {row['median']}s) ->"
                f" {row['adjudication']}",
                file=sys.stderr,
            )
        return times, detail, suspects

    times, detail, suspects = run_battery()

    # battery-TOTAL sanity (VERDICT r13 #1): a UNIFORM host smear
    # (~1.2-1.5x on every row) never trips the per-row 2x-band flags by
    # construction, so two rounds running shipped official numbers that
    # were pure steal artifacts. Compare the comparable-row sum against
    # the prior committed battery (same sf, names present in both): if
    # it reads >15% hot with ZERO per-row flags, the whole battery is
    # suspect — rerun it ONCE in a fresh session and take the smaller
    # comparable total as official. Both totals stay on record, and
    # the LOSING battery's full per-row dict is stashed under
    # total_sanity["losing_detail"] (ADVICE r14 #2: the aggregate
    # alone is too thin for the adjudication protocol's audit trail).
    total_sanity: dict = {"status": "ok"}
    comparable = sorted(
        n for n, v in times.items() if v > 0 and n in prior_queries
    )
    if comparable:
        cur_sum = round(sum(times[n] for n in comparable), 3)
        pri_sum = round(sum(prior_queries[n] for n in comparable), 3)
        total_sanity.update(
            {"comparable_rows": len(comparable), "first_total": cur_sum,
             "prior_total": pri_sum}
        )
        if not suspects and pri_sum > 0 and cur_sum > 1.15 * pri_sum:
            print(
                f"# battery-total sanity: {cur_sum}s > 1.15x prior "
                f"{pri_sum}s with zero per-row flags — uniform-smear "
                "signature, rerunning the battery once in a fresh "
                "session",
                file=sys.stderr,
            )
            if spark is not None:
                spark.stop()
            spark = get_spark("bench-sanity-rerun")
            warmup()
            times2, detail2, suspects2 = run_battery()
            both = [
                n for n in comparable
                if isinstance(times2.get(n), (int, float)) and times2[n] > 0
            ]
            cur_sum2 = round(sum(times2[n] for n in both), 3)
            total_sanity.update(
                {"status": "rerun-triggered", "rerun_total": cur_sum2}
            )
            if cur_sum2 < sum(times[n] for n in both):
                # the first battery loses: keep its per-row evidence
                # (times + detail) in the artifact before replacing it
                total_sanity["losing_detail"] = {
                    "which": "first", "queries": times, "detail": detail,
                    "flagged": suspects,
                }
                times, detail, suspects = times2, detail2, suspects2
                total_sanity["picked"] = "rerun"
            else:
                total_sanity["losing_detail"] = {
                    "which": "rerun", "queries": times2, "detail": detail2,
                    "flagged": suspects2,
                }
                total_sanity["picked"] = "first"

    for name, v in times.items():
        if v > 0:
            total += v
            bands[name] = round(min(bands.get(name, v), v), 3)

    # sentinel-normalized total (VERDICT r15 #3, overdue two rounds):
    # the three drift anchors (never optimized, pinned plans — the
    # BASELINE.md sentinel triple) scale with host steal exactly like
    # the battery-wide median, so total / sentinel-triple-sum is the
    # host-drift-corrected figure readers should compare across rounds
    # (r15 record 82.53/2.338 = 35.3; the r16 same-host batteries read
    # 35.2/36.5 against raw totals 111-134 s). Emitted in BOTH the
    # artifact and the stdout line; additions-only.
    _SENTINELS = ("audio_spectral", "dedup_ngram_spans", "sosfiltfilt")
    sent_sum = sum(times[n] for n in _SENTINELS if times.get(n, 0) > 0)
    norm_total = round(total / sent_sum, 2) if sent_sum > 0 else None
    # the normalization is only meaningful when the anchors themselves
    # ran clean: a steal-hit sentinel inflates the denominator and the
    # figure lies in the FAST direction (or, flagged-and-confirmed,
    # the slow one). norm_ok=false tells the reader to fall back to
    # the per-query medians in the detail artifact.
    norm_ok = not any(n in suspects for n in _SENTINELS)

    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # host-load context (BASELINE.md r7 protocol note): same-plan
    # swings within the documented steal band are machine noise —
    # read deltas against these. The headline `loadavg` is the GATED
    # ambient START sample; the END sample (which includes the
    # battery's own 32-thread stages) rides along as loadavg_end.
    loadavg = loadavg_start
    loadavg_end = [round(load1, 2), round(load5, 2)]
    with open(written_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "norm_total": norm_total,
                "norm_ok": norm_ok,
                "sentinel_sum": round(sent_sum, 3),
                "queries": times,
                "detail": detail,
                "bands": bands,
                "n_flagged": len(suspects),
                "flagged": suspects,
                "date": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "sf": sf_val,
                "loadavg": loadavg,
                "loadavg_end": loadavg_end,
                "load_gate": load_gate,
                "total_sanity": total_sanity,
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
                "norm_total": norm_total,
                "norm_ok": norm_ok,
                "sf": sf_val,
                "n_queries": len(times),
                "n_flagged": len(suspects),
                "loadavg": loadavg,
                "loadavg_end": loadavg_end,
                "load_gate": load_gate,
                "total_sanity": total_sanity.get("status"),
                "detail": written_name,
            }
        )
    )
    if spark is not None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
