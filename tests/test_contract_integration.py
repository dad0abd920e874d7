"""Integration smoke against the driver's real parquet (TESTDATA.md).

Round 2 shipped three queries that planned fine on synthetic bigint
fixtures but threw AnalysisException on the actual testdata, whose time
columns are timestamp[us] → TIMESTAMP_NTZ (VERDICT r3 "What's wrong").
This module closes that gap: every contract query must at least PLAN
AND EXECUTE against the real tables at the smallest scale factor. No
oracle here — value correctness is the driver's DuckDB gate
(tools/check_correctness.py locally); this is the cheap local tripwire
for schema/type drift between the engine and its inputs.

Skipped wholesale if the testdata directory is absent (e.g. running the
suite outside the driver container).
"""

from __future__ import annotations

import os

import pytest

from xarray_scipy_spark.contract import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata not present at {SF_DIR}"
)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_on_driver_parquet(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    # a full count (not just planning) so runtime type errors inside
    # UDFs/streaming sinks surface too
    assert df.count() >= 0
    assert df.columns, f"{name} returned no columns"


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_registry_capped_at_100():
    """VERDICT r14 #8: with a 50-slot driver head, the two-round
    freshness bar holds only while N <= 100 — and N sits AT that cap
    since the r15 rotation. A 101st registration would silently break
    the bar (some name would go >2 rounds unchecked), so it fails
    here with the policy pointer instead."""
    from xarray_scipy_spark.contract import _QUEUED

    assert len(QUERIES) <= 100, (
        f"{len(QUERIES)} registered queries exceeds the two-round "
        "freshness cap of 100. The registry is FULL: a new "
        "registration must be paired with a retirement-first merge "
        "in the SAME rotation block (fold a redundant variant into a "
        "union under a surviving base with a merged oracle, a "
        "_MERGED_UNIONS plan lock, and bench plain_overrides "
        "continuity) — see the r16+ RETIREMENT-FIRST POLICY section "
        "in xarray_scipy_spark/contract.py."
    )
    # queued names count against future capacity: flag a queue that
    # could not register even with zero due-slack.
    assert len(QUERIES) + len(_QUEUED) <= 100 or len(_QUEUED) == 0, (
        f"queue of {len(_QUEUED)} cannot register at N={len(QUERIES)} "
        "without retirements — ledger the merges first (r16+ policy)."
    )


def test_driver_head_is_exactly_50():
    """The driver's correctness gate checks the FIRST 50 queries()
    entries. Registering a query without a matching _CHECK_LAST update
    would silently push another query out of the checked window — this
    pins head size to exactly 50 so the rotation stays deliberate."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = list(mod.queries())
    tail = [n for n in mod._CHECK_LAST if n in qs]
    assert len(qs) - len(tail) == 50, (
        f"driver head is {len(qs) - len(tail)} (registered {len(qs)}, "
        f"tail {len(tail)}) — update _CHECK_LAST to keep the head at 50"
    )
    # every tail name must actually be registered (a typo would silently
    # shrink the tail and push a stale query into the unchecked zone)
    assert set(mod._CHECK_LAST) <= set(qs)
    # and the tail must be EXACTLY N−50 distinct names (VERDICT r13 #9:
    # a duplicate in _CHECK_LAST would inflate len(tail) and let a
    # silent tail drop pass the head==50 check above)
    assert len(set(mod._CHECK_LAST)) == len(mod._CHECK_LAST) == len(qs) - 50, (
        f"_CHECK_LAST must be {len(qs) - 50} distinct names "
        f"(got {len(mod._CHECK_LAST)}, {len(set(mod._CHECK_LAST))} distinct)"
    )


def test_freshness_checker_both_phases():
    """tools/freshness_check.py must hold at BOTH points of a round
    (VERDICT r12 #2 — the single-latest-file version false-FAILed at
    round close): round open (tail == the latest head's surviving
    keys) and round close (the driver has written the NEW head file;
    the tail now lives in the second-latest file). And it must still
    FAIL on a genuinely stale tail name and on an order violation."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from freshness_check import tail_freshness

    tail = ["a", "b", "c"]
    # round open: one head file, tail is its key order
    assert tail_freshness(tail, {"r12": ["a", "b", "c", "x"]}) == []
    # round close: the new head file (r13) holds OTHER names; the tail
    # is still fresh via the second-latest (r12) — must pass
    assert (
        tail_freshness(tail, {"r12": ["a", "b", "c"], "r13": ["x", "y"]})
        == []
    )
    # genuinely stale: "c" in neither head
    msgs = tail_freshness(tail, {"r12": ["a", "b"], "r13": ["x"]})
    assert any("older than the two-round bar" in m and "'c'" in m for m in msgs)
    # order violation vs the file that contains the names
    msgs = tail_freshness(["b", "a"], {"r12": ["a", "b"], "r13": ["x"]})
    assert any("order deviates" in m for m in msgs)


def _tail_names():
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return [n for n in mod._CHECK_LAST if n in ORACLES]


@pytest.mark.parametrize("name", _tail_names())
def test_tail_queries_match_oracle(spark, name):
    """Queries rotated out of the driver's 50-slot oracle window keep
    VALUE-level verification here: Spark result vs DuckDB oracle at
    sf0.001, byte-exact after the same normalization the local
    check_correctness tool applies (sorted columns, sorted rows,
    widened numeric dtypes)."""
    import duckdb
    import numpy as np

    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    odf = con.sql(ORACLES[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            k = df[c].dtype.kind
            if k in "iu":
                df[c] = df[c].astype("int64")
            elif k == "f":
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    a, b = norm(sdf), norm(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert av.tobytes() == bv.tobytes(), (
                f"{name}.{c}: max_abs_diff="
                f"{float(np.nanmax(np.abs(av - bv))) if len(av) else 0}"
            )
        else:
            assert (av == bv).all(), f"{name}.{c} differs"


def test_entry_smoke(spark):
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.entry(spark)
    assert out.count() >= 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_time_queries_are_session_timezone_independent(spark):
    """The driver runs the contract on ITS OWN session, whose timezone
    we don't control. Every epoch conversion goes through
    functions.timeutil (pure NTZ arithmetic), so results must be
    byte-identical under any session timezone — this runs the
    time-arithmetic queries under a hostile zone and compares to the
    UTC run."""
    from xarray_scipy_spark import contract as C

    # q_session_window_stats by plain function: its registration merged
    # into stream_window_stats' variant union at the r8 rotation (the
    # registered union is covered via QUERIES["stream_window_stats"])
    # range_join by plain function: its registration merged into
    # asof_join's temporal-join union at the r9 rotation (the
    # registered union is covered via QUERIES["asof_join"])
    fns = {
        "sessionize": C.QUERIES["sessionize"],
        "session_window_stats": C.q_session_window_stats,
        "asof_join": C.QUERIES["asof_join"],
        "range_join": C.q_range_join,
        "stream_window_stats": C.QUERIES["stream_window_stats"],
    }
    names = list(fns)
    old = spark.conf.get("spark.sql.session.timeZone")

    def run_all():
        return {
            n: sorted(map(tuple, fns[n](spark, SF_DIR).collect()))
            for n in names
        }

    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = run_all()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = run_all()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    for n in names:
        assert utc[n] == ny[n], f"{n} drifted with the session timezone"


def test_bench_headline_names_all_resolve():
    """Rotation guard: bench.py silently skips a HEADLINE name whose
    resolver returns None (plain_overrides -> registry -> queue), so a
    rotation that retires a name without adding a plain override would
    silently drop its BENCH row instead of failing. Every HEADLINE
    name must resolve to a callable."""
    import bench
    from xarray_scipy_spark.contract import QUERIES, _QUEUED

    plain = bench.plain_overrides()
    missing = [
        n
        for n in bench.HEADLINE
        if plain.get(n) is None
        and n not in QUERIES
        and n not in _QUEUED
    ]
    assert not missing, (
        f"HEADLINE names with no resolvable plan (add a plain override "
        f"or registry entry): {missing}"
    )


def test_bench_load_gate_both_paths(monkeypatch):
    """bench._await_quiet_host (VERDICT r12 #2 + the r13 load5 blind
    spot): returns 'ok' only when BOTH load1 and load5 are under the
    gate; waits on either being hot; returns 'EXCEEDED' when the host
    never settles; degrades (not crashes) on a mid-wait getloadavg
    failure — all without real sleeping."""
    import bench

    # quiet host: immediate ok, no sleep
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.5, 2.0, 2.5))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    la, status = bench._await_quiet_host()
    assert status == "ok" and la == [1.5, 2.0] and slept == []

    # the r13 blind spot: load1 settled but load5 still hot — the old
    # gate passed this and shipped a uniformly smeared battery
    seq = iter([(2.5, 5.9, 5.0), (2.2, 4.5, 4.8), (2.0, 3.1, 4.0)])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(seq))
    la, status = bench._await_quiet_host()
    assert status == "ok" and la == [2.0, 3.1] and len(slept) == 2

    # hot host that never settles: EXCEEDED after the bounded tries
    slept.clear()
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    la, status = bench._await_quiet_host()
    assert status == "EXCEEDED" and la[0] == 9.9
    assert len(slept) == bench._LOAD_TRIES

    # transient getloadavg failure mid-wait (ADVICE r13 #3): keep the
    # last good sample and stop waiting instead of crashing
    slept.clear()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            return (9.0, 9.0, 9.0)
        raise OSError("loadavg unavailable")

    monkeypatch.setattr(bench.os, "getloadavg", flaky)
    la, status = bench._await_quiet_host()
    assert status == "EXCEEDED" and la == [9.0, 9.0] and len(slept) == 1
