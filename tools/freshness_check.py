"""Rotation/freshness invariant checker (the judge's per-round audit,
operationalized).

Verifies, against the most recent committed CORRECTNESS_r{N}.json:

1. head size is exactly 50 (the driver checks the first 50
   ``queries()`` entries);
2. every tail name was green in the latest driver head (the two-round
   freshness bar: a name is checked by the driver at least every
   other round), and the tail preserves that file's key order;
3. N <= 100 (the bar's capacity), with the live head/tail/queue
   counts;
4. zero rows-only registrations (every query has an oracle).

Exit 0 = all invariants hold. Run at round open after executing a
rotation, and before committing it.

Usage: python tools/freshness_check.py
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    from xarray_scipy_spark.contract import ORACLES, QUERIES

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    files = sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not files:
        print("no CORRECTNESS_r*.json found")
        return 1
    latest = files[-1]
    with open(latest) as fh:
        data = json.load(fh)
    prior_head = list(data.get("queries", data))

    tail = [n for n in mod._CHECK_LAST if n in QUERIES]
    head = [n for n in QUERIES if n not in set(tail)]
    ok = True

    if len(head) != 50:
        print(f"FAIL head size {len(head)} != 50")
        ok = False
    if len(QUERIES) > 100:
        print(f"FAIL N={len(QUERIES)} > 100 (freshness bar capacity)")
        ok = False

    stale = [n for n in tail if n not in set(prior_head)]
    if stale:
        print(
            f"FAIL tail names NOT in the latest driver head "
            f"({os.path.basename(latest)}) — older than the two-round "
            f"bar: {stale}"
        )
        ok = False
    order = [n for n in prior_head if n in set(tail)]
    if order != list(tail):
        # the zip mismatch can be empty when `order` is a strict
        # prefix of the tail (a stale-tail name fell out of the
        # intersection) — report the length delta in that case
        mismatch = next(
            ((a, b) for a, b in zip(order, tail) if a != b),
            f"length {len(order)} vs {len(tail)}",
        )
        print(
            "FAIL tail order deviates from the latest CORRECTNESS key "
            f"order (first mismatch: {mismatch})"
        )
        ok = False

    rows_only = sorted(set(QUERIES) - set(ORACLES))
    if rows_only:
        print(f"FAIL rows-only registrations: {rows_only}")
        ok = False

    print(
        f"registered {len(QUERIES)} = head {len(head)} + tail {len(tail)}; "
        f"latest head file {os.path.basename(latest)} ({len(prior_head)} rows); "
        f"rows-only {len(rows_only)}"
    )
    print("freshness:", "OK" if ok else "VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
