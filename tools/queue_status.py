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

# r10 executed: ELEVEN merges (istft pair, lfilter+filtfilt,
# dataset_split+stratified, ann exact+lsh, convolve-family trio,
# cwt+periodogram, savgol+detrend, tsstats trio, text_logprob+vocab,
# skew_join+bloom_semijoin, text-surface trio) — 13 r10-due
# constituents absorbed + text_redact riding free; the FULL r10 slate
# (14 names) registered. N stays 99. The staged convolve@merged /
# correlate@merged entries were DROPPED (constituents retired into
# the fftconvolve family — one family per constituent). Live counts:
# run this tool; static counts in comments went stale once (ADVICE
# r9 #1) and are not repeated here.
ROUND_PLAN = {
    # Merge levers at r11 (verify against CORRECTNESS_r10.json at
    # round open — static due-ness claims rot). TEN +1 levers are
    # staged and CI-byte-exact (see the r11 RECIPE comment in
    # contract.py above _QUEUED): sosfilt@merged(+1 net),
    # fftconvolve@merged(+1 net), multimodal_real_decode@merged,
    # gapfill@merged, dedup_minhash@merged, sketch_hll@merged,
    # tpch_q1@merged, clean_text@merged, welch@merged,
    # dataset_mix@merged (extended: +filter_by_quantile). Head math:
    # 49 due − 12 absorbed + 2 dragged + 11 new = 50 → the FULL
    # 8-name r11 slate plus THREE r12 pull-forwards is fundable.
    # Net-0 retirement levers (shrink N, no head slot) remain:
    # hilbert/resample/embedding_quantize/lombscargle/dedup_exact/
    # sessionize/sosfilt_stream @merged.
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
