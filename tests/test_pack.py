"""pipeline/pack.py pack_documents — concat-and-chunk layout parity
against a serial reference, conservation invariants, and edge gates.
The two-level prefix-sum must agree with a single serial cumsum for
any bucket count (buckets only changes the plan, never the answer)."""

from __future__ import annotations

import random

import pytest

from xarray_scipy_spark.pipeline import pack_documents


def _serial(rows, L):
    cum = 0
    exp = {}
    for i, n in sorted(rows):
        sb, so = cum // L, cum % L
        eb = (cum + n - 1) // L if n > 0 else cum // L
        exp[i] = (n, sb, so, eb, eb - sb + 1 if n > 0 else 0)
        cum += n
    return exp, cum


@pytest.mark.parametrize("buckets", [1, 7, 64])
def test_pack_documents_matches_serial_reference(spark, buckets):
    rng = random.Random(23)
    # sparse, non-contiguous ids; zero-length docs mixed in
    rows = [(i * 17 + 5, rng.randrange(0, 40)) for i in range(400)]
    rows[3] = (rows[3][0], 0)
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: (
            r["n_tok"], r["start_bin"], r["start_off"], r["end_bin"], r["n_bins"]
        )
        for r in pack_documents(
            df, size_col="n", seq_len=64, buckets=buckets
        ).collect()
    }
    exp, total = _serial(rows, 64)
    assert got == exp


def test_pack_documents_spans_and_conservation(spark):
    rows = [(0, 100), (1, 50), (2, 200), (3, 0), (4, 7)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {r["doc_id"]: r for r in
           pack_documents(df, size_col="n", seq_len=64).collect()}
    # doc 0 fills bin 0 and spills into bin 1
    assert (got[0]["start_bin"], got[0]["end_bin"], got[0]["n_bins"]) == (0, 1, 2)
    # doc 1 starts where doc 0 ended: position 100 = bin 1 offset 36
    assert (got[1]["start_bin"], got[1]["start_off"]) == (1, 36)
    # zero-length doc occupies nothing
    assert got[3]["n_bins"] == 0
    # total positions consumed = sum of sizes
    last = got[4]
    assert last["end_bin"] * 64 + (357 - 1) % 64 + 1 == 357


def test_pack_documents_gates_and_empty(spark):
    df = spark.createDataFrame([(0, 5)], "doc_id long, n long")
    with pytest.raises(ValueError, match="seq_len"):
        pack_documents(df, size_col="n", seq_len=0)
    with pytest.raises(ValueError, match="buckets"):
        pack_documents(df, size_col="n", seq_len=8, buckets=0)
    empty = spark.createDataFrame([], "doc_id long, n long")
    assert pack_documents(empty, size_col="n", seq_len=8).count() == 0
