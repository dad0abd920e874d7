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

# r13 executed: SEVEN merges (two clean +1: group_quantiles+winsorize,
# text_postings+bm25_scores; five net-0:
# multimodal_audio_decode+gzip, sessionize+stream_dedup,
# stft+coherence, fftconvolve_2d+fftconvolve_complex,
# sosfilt_stream+stream_window_stats_live) — 2 due constituents
# absorbed + 5 free retirements; the 7-name r13 slate + 4 r14
# pull-forwards (embedding_outliers, dataset_temperature_mix,
# naive_bayes_lang, auc_eval) registered. N = 95. Live counts: run
# this tool; static counts in comments went stale once (ADVICE r9 #1)
# and are not repeated here.
ROUND_PLAN = {
    # Merge levers at r14 (REDO the due-ness math against
    # CORRECTNESS_r13.json at round open — static due-ness claims
    # rot). Staged and CI-byte-exact: tpch_q7@merged (absorbs
    # tpch_q8 + tpch_q9, both r13-head -> retire free),
    # tpch_q14@merged (absorbs tpch_q19, r13-head -> free). Head
    # math at r14: 45 due + K new = 50 -> K = 5 EXACTLY, so the
    # data-quality layer pulls forward next to token_mi. r15 head
    # math: 47 due (50 r13-head minus the 3 retired) + 3 remaining
    # queue = 50 exactly (dsir_weights, added to the queue at r13,
    # fills the hole the original lookahead flagged). N at r15 = 100,
    # AT the cap: r16+ needs retirement-first merges.
    "r14": [
        "token_mi",
        "data_profile",
        "constraint_check",
        "frequent_values",
        "windowed_constraints",
    ],
    "r15": [
        "target_encoding",
        "event_transitions",
        "dsir_weights",
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
