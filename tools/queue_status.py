"""Print the contract registration queue and the rotation math.

The driver checks the first 50 registered queries per round; the
registry is capped at 100 under the two-round freshness bar, so new
queries wait in ``contract._QUEUED`` (CI-verified byte-exactly every
pytest run) until variant-pair merges free head slots. This tool shows
the current ledger so a round-opening session can sanity-check the
plan in one command.

Usage: python tools/queue_status.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# r9 executed: THIRTEEN merges (welch+blackman, csd+spectrogram,
# tpch_q1+q6, peak_widths+find_peaks, dedup pair-emitter trio, ANN
# cell pair, multimodal transform trio, tpch_q3+q5, asof+range join,
# fft+rfft-pair, decontaminate+bloom, sketch hll+countmin, text-wide
# trio) — every constituent r9-due, so 16 head slots freed; 17
# registrations landed (r9 slate + FULL r10 slate + 5 of r11 +
# bpe_encode pulled from r18, retiring bpe_vocab's rows-only row).
# N stays 99, queue 112 -> 82 (44 real + 38 staged merges). The istft
# merge was deferred to r10 (both constituents checked r8 — merging
# at r9 would have COST a head slot; at r10 it frees one).
ROUND_PLAN = {
    # Merge levers at r10 (all constituents in the r10-due pool = the
    # r8-head names now in __spark_entry__._CHECK_LAST): istft(+1),
    # lfilter+filtfilt(+1), dataset_split+stratified(+1),
    # ann_cosine_topk+lsh(+1), convolve-family trio(+2),
    # cwt+periodogram(+1), savgol+detrend(+1), tsstats trio(+2),
    # text_logprob+vocab(+1), skew_join+bloom_semijoin(+1),
    # text_surface(+1: absorbs due text_url_stats; text_redact rides
    # free from the r10 tail) = 13 freed + 1 spare from N=99 < 100.
    # ORACLE-READ WARNING for the r10 executor: popping istft_native
    # breaks _inverse_transform_merged_oracle (ifft@merged) and
    # popping bloom_semijoin breaks _join_strategy_merged_oracle
    # (skew_join@merged is being EXECUTED so that one resolves
    # itself, but ifft@merged STAYS queued) — snapshot
    # ORACLES["istft_native"] into a module variable before the pop
    # and point the builder at it, or execute ifft@merged in the same
    # round.
    "r10": [
        "interval_join",
        "funnel",
        "retention",
        "audio_spectral",
        "char_entropy",
        "ngram_counts",
        "quantile_normalize",
        "rolling_median",
        "kfold_weights",
        "tpch_q4",
        "tpch_q18",
        "grouped_ols",
        "triangle_count",
        "sequence_pack",
    ],
    "r11": [
        "text_postings",
        "edit_distance_join",
        "bm25_scores",
        "event_pivot",
        "orders_unshipped",
        "json_props_stats",
        "cdc_apply",
        "window_analytics",
    ],
    "r12": [
        "active_user_setops",
        "ann_recall_eval",
        "weighted_sample",
        "tpch_q7",
        "tpch_q10",
        "tpch_q14",
        "tpch_q15",
        "tpch_q22",
    ],
    "r13": [
        "tpch_q8",
        "tpch_q9",
        "tpch_q13",
        "tpch_q17",
        "tpch_q19",
        "text_sparse_knn",
        "dedup_recall_eval",
    ],
    "r14": [
        "embedding_outliers",
        "dataset_temperature_mix",
        "naive_bayes_lang",
        "auc_eval",
        "token_mi",
    ],
    "r15": [
        "target_encoding",
        "event_transitions",
        "data_profile",
        "constraint_check",
        "frequent_values",
        "windowed_constraints",
    ],
}


def main() -> int:
    import importlib.util

    from xarray_scipy_spark.contract import ORACLES, QUERIES, _QUEUED

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tail = [n for n in mod._CHECK_LAST if n in QUERIES]
    head = len(QUERIES) - len(tail)
    print(f"registered: {len(QUERIES)} (head {head}, tail {len(tail)}; "
          f"{len(QUERIES) - len(ORACLES)} rows-only)")
    print(f"queued:     {len(_QUEUED)}")
    planned = set()
    for rnd, names in ROUND_PLAN.items():
        missing = [n for n in names if n not in _QUEUED]
        status = "" if not missing else f"  MISSING FROM _QUEUED: {missing}"
        print(f"  {rnd}: {len(names)} new -> {', '.join(names)}{status}")
        planned.update(names)
    merges = [n for n in _QUEUED if n.endswith("@merged")]
    if merges:
        print(f"  merges ready: {', '.join(sorted(merges))}")
    unplanned = sorted(set(_QUEUED) - planned - set(merges))
    if unplanned:
        print(f"  UNPLANNED queue entries: {unplanned}")
    no_oracle = sorted(n for n, (_, o) in _QUEUED.items() if o is None)
    print(f"  rows-only queue entries: {no_oracle}")
    ok = not unplanned and all(
        n in _QUEUED for names in ROUND_PLAN.values() for n in names
    )
    print("plan status:", "CONSISTENT" if ok else "INCONSISTENT — fix the ledger")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
