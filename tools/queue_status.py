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

# r8 executed: SEVEN merges (multimodal decode union, savgol pair,
# tumbling+session windows, fft-family 4-way, fftshift trio,
# medfilt+wiener, token_stats+quality) freed 11 slots; registered the
# 5 r8-bound entries + the full r9 slate pulled forward + robust_zscore
# (11 new; N stays 99, queue 35 -> 21).
ROUND_PLAN = {
    # Merge levers: ALL remaining rounds are fully funded by staged
    # @merged entries (see the r10-r12 merge-staging section in
    # contract.py for the slot math — r10: 7/7, r11: 8/8, r12: 6/6;
    # the sketch_hll+sketch_countmin shape objection was resolved by
    # the tpch_q1q6 generic-column -1-padding pattern). The queue's
    # real entries drain to ZERO at r12.
    # new-per-round = 1 + merges executed (head = 49 - merged_in_tail
    # + new = 50).
    "r9": [
        "dedup_minhash_cross",
        "cube_revenue",
        "filter_by_quantile",
        "interp_to",
    ],
    "r10": [
        "ohlc_bars",
        "latest_by_key",
        "multimodal_video_frames",
        "sample_negatives",
        "rolling_stats",
        "pagerank",
        "zorder_curve",
    ],
    "r11": [
        "sketch_hll_merge",
        "group_quantiles",
        "url_canonical_dedup",
        "winsorize",
        "clean_text",
        "interval_join",
        "funnel",
        "retention",
    ],
    "r12": [
        "audio_spectral",
        "char_entropy",
        "ngram_counts",
        "quantile_normalize",
        "rolling_median",
        "kfold_weights",
    ],
    "r13": [
        "tpch_q4",
        "tpch_q18",
        "grouped_ols",
        "triangle_count",
        "sequence_pack",
        "text_postings",
    ],
    "r14": [
        "edit_distance_join",
        "bm25_scores",
        "event_pivot",
        "orders_unshipped",
        "json_props_stats",
    ],
    "r15": [
        "cdc_apply",
        "window_analytics",
        "active_user_setops",
        "ann_recall_eval",
        "weighted_sample",
    ],
    "r16": [
        "tpch_q7",
        "tpch_q10",
        "tpch_q14",
        "tpch_q15",
        "tpch_q22",
    ],
    "r17": [
        "tpch_q8",
        "tpch_q9",
        "tpch_q13",
        "tpch_q17",
        "tpch_q19",
    ],
    "r18": [
        "bpe_encode",
        "text_sparse_knn",
        "dedup_recall_eval",
        "embedding_outliers",
        "dataset_temperature_mix",
    ],
    "r19": [
        "naive_bayes_lang",
        "auc_eval",
        "token_mi",
        "target_encoding",
        "event_transitions",
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
