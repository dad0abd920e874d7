"""Shared measurement harness for the decomposition tools.

One protocol for every stage decomposition (q22/q10/retention/...):
warmup + median of 5 on the Spark side, warmup + median of 5 on the
DuckDB side with views rebuilt per run — so a protocol change (reps,
warmup policy) lands in ONE place and the decompositions stay
comparable across rounds.
"""

from __future__ import annotations

import statistics
import time

import duckdb


def median5(fn) -> tuple[float, list[float]]:
    """Warmup + 5 timed runs; returns (median, samples)."""
    ts = []
    for i in range(6):
        t0 = time.time()
        fn()
        if i > 0:
            ts.append(round(time.time() - t0, 3))
    return statistics.median(ts), ts


def duck_median(views: list[str], sql: str, runs: int = 5) -> float:
    """Warmup + median of `runs` on a fresh connection per run."""

    def once() -> float:
        con = duckdb.connect()
        for s in views:
            con.execute(s)
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        con.close()
        return dt

    once()
    return round(statistics.median(once() for _ in range(runs)), 3)
