"""Feature-hashed TF-IDF document vectors (pipeline/text.py
hashed_tfidf_vectors): shape/norm guarantees, similarity behavior, and
determinism — the model-free text -> embedding bridge."""

from __future__ import annotations

import pytest

import xarray_scipy_spark.pipeline as pl

def test_hashed_vectors_shape_and_norm(spark):
    import numpy as np

    docs = spark.createDataFrame(
        [(0, "red fox jumps"), (1, "red red red"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: list(r["vec"]) for r in
            pl.hashed_tfidf_vectors(docs, dim=32).collect()}
    assert set(rows) == {0, 1, 2}
    assert all(len(v) == 32 for v in rows.values())
    assert abs(np.linalg.norm(rows[0]) - 1.0) < 1e-12
    assert abs(np.linalg.norm(rows[1]) - 1.0) < 1e-12
    assert np.linalg.norm(rows[2]) == 0.0  # empty doc -> zero vector


def test_hashed_vectors_cosine_reflects_overlap(spark):
    import numpy as np

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "entirely different vocabulary about spark engines"),
        ],
        "doc_id long, text string",
    )
    v = {r["doc_id"]: np.array(r["vec"]) for r in
         pl.hashed_tfidf_vectors(docs, dim=256).collect()}
    sim_near = float(v[0] @ v[1])
    sim_far = float(v[0] @ v[2])
    assert sim_near > 0.5 > sim_far


def test_hashed_vectors_deterministic_and_unnormalized(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} shared") for i in range(20)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: tuple(r["vec"]) for r in
         pl.hashed_tfidf_vectors(docs.coalesce(1), dim=64).collect()}
    b = {r["doc_id"]: tuple(r["vec"]) for r in
         pl.hashed_tfidf_vectors(docs.repartition(8), dim=64).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-15)
    raw = pl.hashed_tfidf_vectors(docs, dim=64, normalize=False).collect()
    import numpy as np
    assert any(abs(np.linalg.norm(r["vec"]) - 1.0) > 1e-6 for r in raw)
    with pytest.raises(ValueError, match="dim"):
        pl.hashed_tfidf_vectors(docs, dim=1)


# --- postings (inverted-index build) ---------------------------------------


def test_postings_matches_brute_force(spark):
    docs = [
        (3, "a b a c a"),
        (7, "a a b"),
        (9, "c  c d"),  # double space -> empty token dropped
        (11, "d"),
        (12, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["token"]: r for r in pl.postings(df, min_df=1).collect()}
    # brute force
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for did, text in docs:
        for t in text.split(" "):
            if t:
                per[t][did] += 1
    assert set(got) == set(per)
    for tok, cnt in per.items():
        r = got[tok]
        assert r["df"] == len(cnt)
        assert r["tf_total"] == sum(cnt.values())
        assert r["max_tf"] == max(cnt.values())
        # highest tf, smallest doc id on ties
        assert r["top_doc"] == min(
            (d for d, c in cnt.items() if c == max(cnt.values()))
        )
        assert r["postings_sum"] == sum(d * c for d, c in cnt.items())


def test_postings_min_df_filters(spark):
    df = spark.createDataFrame(
        [(0, "x y"), (1, "x z")], "doc_id long, text string"
    )
    toks = {r["token"] for r in pl.postings(df, min_df=2).collect()}
    assert toks == {"x"}


def test_naive_bayes_lang_rejects_null_and_backtick_labels(spark):
    """ADVICE r11 #2: the wide model's driver-side label collect must
    reject NULL labels (sorted() would TypeError on None/str mixes)
    and backtick labels (quoted pivot-column resolution breaks) with
    clear errors instead."""
    import pytest

    from xarray_scipy_spark.pipeline.text import naive_bayes_lang

    nulls = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour monde", None)],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="NULL label"):
        naive_bayes_lang(nulls)
    ticks = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour monde", "f`r")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="backtick"):
        naive_bayes_lang(ticks)


def test_dsir_weights_semantics(spark):
    """DSIR importance weights (pipeline/text.py dsir_weights): docs
    made of target-LM tokens score POSITIVE, docs of raw-only tokens
    score NEGATIVE, the weight is a per-token sum (n_tokens scales
    it), and smoothing must be > 0. Exact values are pinned by the
    DuckDB oracle (tests/test_queued_contract.py); this test pins the
    SEMANTICS a selection pass relies on."""
    import pytest
    from pyspark.sql import functions as F

    from xarray_scipy_spark.pipeline.text import dsir_weights

    rows = [
        # target docs: pure "english-ish" tokens
        (1, "alpha beta alpha beta", "en"),
        (2, "alpha beta gamma", "en"),
        # raw-only docs: disjoint vocabulary
        (3, "zeta eta zeta eta", "xx"),
        (4, "zeta eta theta", "xx"),
        # mixed doc: should land between the extremes
        (5, "alpha zeta", "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    }
    assert got[1]["n_tokens"] == 4 and got[5]["n_tokens"] == 2
    # target-looking docs positive, raw-only docs negative
    assert got[1]["weight"] > 0 and got[2]["weight"] > 0
    assert got[3]["weight"] < 0 and got[4]["weight"] < 0
    # the mixed doc sits strictly between the pure cases (per-token)
    per_tok = {k: v["weight"] / v["n_tokens"] for k, v in got.items()}
    assert per_tok[3] < per_tok[5] < per_tok[1]
    # string target column works like the Column form
    df2 = df.withColumn("is_en", F.col("lang") == "en")
    got2 = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(df2, "is_en").collect()
    }
    assert got2 == {k: v["weight"] for k, v in got.items()}
    with pytest.raises(ValueError, match="smoothing"):
        dsir_weights(df, F.col("lang") == "en", smoothing=0.0)
