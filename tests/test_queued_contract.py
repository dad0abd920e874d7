"""The r7 registration queue stays verified while it waits.

The driver's correctness gate checks the first 50 registered queries
per round, which caps the registry at 100 names under the two-round
freshness bar (__spark_entry__.py). Queries built AFTER the round's
head froze are therefore held in ``contract._QUEUED`` — fully
implemented, with their DuckDB oracles — and this module runs every
(query, oracle) pair byte-exactly at sf0.001 on each pytest run, the
same check the tail rotation gets in test_contract_integration.py. A
queued query is thus never "done but unverified": it has continuous
CI value-verification from the day it lands until the driver's own
row replaces this check at registration.
"""

from __future__ import annotations

import os

import pytest

from xarray_scipy_spark.contract import _QUEUED

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata not present at {SF_DIR}"
)


# Staged retirement-first merges (VERDICT r14 #3): with the registry
# AT the N=100 cap since r15, a future registration must fold a
# redundant name into a variant-tag union under a surviving base in
# the same rotation. Each candidate union is built and byte-verified
# here a round BEFORE it can be needed, so the first forced merge is
# never the first attempt. Values are (builder_name, oracle_builder
# _name) resolved lazily from contract — the pair graduates out of
# this dict into a registration + a _MERGED_UNIONS plan-lock entry
# when its rotation executes.
_STAGED_MERGES = {
    # r16 candidate (policy rule b): event_pivot retires under the
    # window_analytics base. See the dry-run comment in contract.py.
    "event_widefam_merged": (
        "q_event_widefam_merged",
        "_event_widefam_merged_oracle",
    ),
    # r16+ candidates (policy rule c, staged r15): the eval/report
    # twins retire under the bases of the operators they evaluate.
    # See the rule-c dry-run comment in contract.py.
    "ann_evalfam_merged": (
        "q_ann_evalfam_merged",
        "_ann_evalfam_merged_oracle",
    ),
    "dedup_evalfam_merged": (
        "q_dedup_evalfam_merged",
        "_dedup_evalfam_merged_oracle",
    ),
}


def _resolve(name):
    if name in _QUEUED:
        return _QUEUED[name]
    from xarray_scipy_spark import contract as C

    fn_name, oracle_name = _STAGED_MERGES[name]
    return getattr(C, fn_name), getattr(C, oracle_name)()


@pytest.mark.parametrize("name", sorted(_QUEUED) + sorted(_STAGED_MERGES))
def test_queued_query_matches_oracle(spark, name):
    import duckdb
    import numpy as np

    fn, oracle = _resolve(name)
    sdf = fn(spark, SF_DIR).toPandas()
    if oracle is None:
        # rows-only queue entries (iterative algorithms with no SQL
        # twin) get their value verification elsewhere — e.g. the BPE
        # reference-parity test — and a non-empty smoke here
        assert len(sdf) > 0
        return
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    odf = con.sql(oracle).df()
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
            assert (av == bv).all(), f"{name}.{c}: value mismatch"
