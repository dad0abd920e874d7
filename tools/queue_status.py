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

# r12 executed: TWELVE merges (six clean +1: resample+poly,
# dedup_exact+ngram_jaccard, ifft+fftshift, funnel+retention,
# tpch_q4+q18, rolling_stats+rolling_median+quantile_normalize
# dragging its base; six net-0: hilbert+envelope,
# decimate_fir+decimate_iir, lombscargle+dominant_frequency,
# lineitem_rollup+cube_revenue, embedding_quantize+embedding_pca,
# curation_report+the clean_text hygiene union) — 7 due constituents
# absorbed + 8 free retirements; the FULL 10-name r12 slate
# registered. N = 91. Live counts: run this tool; static counts in
# comments went stale once (ADVICE r9 #1) and are not repeated here.
ROUND_PLAN = {
    # Merge levers at r13 (REDO the due-ness math against
    # CORRECTNESS_r12.json at round open — static due-ness claims
    # rot). Staged and CI-byte-exact: multimodal_audio_decode@merged
    # (absorbs multimodal_gzip_decode), sessionize@merged (absorbs
    # stream_dedup), stft@merged (absorbs coherence),
    # fftconvolve_2d@merged (absorbs fftconvolve_complex),
    # sosfilt_stream@merged (absorbs stream_window_stats_live),
    # group_quantiles@merged (absorbs winsorize), text_postings@
    # merged, tpch_q7@merged, tpch_q14@merged.
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
