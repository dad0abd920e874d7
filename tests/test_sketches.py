"""Probabilistic sketches (pipeline/sketches.py): accuracy bounds,
the exactness guarantees each construction makes, and the merge /
partitioning-independence properties that justify them at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import xarray_scipy_spark.pipeline as pl


@pytest.fixture(scope="module")
def ids50k(spark):
    # 50k distinct string ids — enough cardinality that the HLL raw
    # estimator (not the linear-counting fallback) is exercised
    return spark.range(50_000).select(
        F.concat(F.lit("id-"), F.col("id")).alias("v"),
        (F.col("id") % 10).alias("g"),
    )


def test_hll_estimate_within_expected_error(spark, ids50k):
    row = pl.hll_distinct(ids50k, "v", p=12).collect()[0].asDict()
    # p=12 -> sigma ~ 1.04/sqrt(4096) = 1.6%; 3 sigma ~ 5%
    assert abs(row["estimate"] - 50_000) / 50_000 < 0.05
    assert row["m"] == 4096
    assert row["present"] + row["zeros"] == 4096
    est_py = pl.hll_estimate(row["m"], row["zeros"], row["register_sum"])
    assert abs(est_py - row["estimate"]) < 1e-9


def test_hll_small_range_uses_linear_counting(spark):
    df = spark.range(30).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    row = pl.hll_distinct(df, "v", p=12).collect()[0].asDict()
    # 30 distinct into 4096 registers: every register distinct whp ->
    # linear counting is near-exact
    assert abs(row["estimate"] - 30) < 2


def test_hll_grouped_and_duplication_invariant(spark, ids50k):
    # the sketch sees VALUES, not rows: duplicating every row must not
    # change any register (state identical), and per-group states are
    # independent
    doubled = ids50k.unionAll(ids50k)
    a = {
        r["g"]: r.asDict()
        for r in pl.hll_state(ids50k, "v", by="g", p=8).collect()
    }
    b = {
        r["g"]: r.asDict()
        for r in pl.hll_state(doubled, "v", by="g", p=8).collect()
    }
    assert a == b
    assert len(a) == 10


def test_hll_partitioning_independent(spark, ids50k):
    one = pl.hll_state(ids50k.coalesce(1), "v", p=8).collect()[0].asDict()
    many = pl.hll_state(ids50k.repartition(32), "v", p=8).collect()[0].asDict()
    assert one == many


def test_hll_rejects_bad_precision(spark, ids50k):
    with pytest.raises(ValueError, match="p must be"):
        pl.hll_state(ids50k, "v", p=10)


def test_countmin_never_underestimates_and_exact_when_wide(spark):
    # 100 keys with known frequencies 1..100
    rows = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("tok"),
        (F.col("id") + 1).alias("w"),
    )
    stream = rows.select(
        F.explode(F.sequence(F.lit(1), F.col("w"))).alias("_"),
        F.col("tok"),
    ).select("tok")
    truth = {f"k{i}": i + 1 for i in range(100)}
    # wide sketch (width >> keys): no collisions -> exact
    sk = pl.countmin_sketch(stream, "tok", depth=4, width=4096)
    probes = rows.select("tok")
    est = {
        r["tok"]: r["est"]
        for r in pl.countmin_lookup(
            sk, probes, "tok", depth=4, width=4096
        ).collect()
    }
    assert est == truth
    # narrow sketch: collisions happen, but never an underestimate
    sk2 = pl.countmin_sketch(stream, "tok", depth=4, width=64)
    est2 = {
        r["tok"]: r["est"]
        for r in pl.countmin_lookup(
            sk2, probes, "tok", depth=4, width=64
        ).collect()
    }
    assert all(est2[k] >= truth[k] for k in truth)
    assert sum(est2.values()) > sum(truth.values())  # some collision occurred


def test_countmin_weighted_sketch_equals_occurrence_fed(spark):
    # VERDICT r16 #7: q_sketch_countmin builds its sketch from the
    # exact-count aggregate with weight=exact_cnt instead of the raw
    # occurrence rows (guide §2.3). Pin the integer-arithmetic
    # equivalence — sum(exact_cnt) per cell == sum(1) per occurrence —
    # counter-for-counter on a salted fixture narrow enough (width 32
    # << 97 keys) that real cell collisions occur.
    occ = spark.range(2000).select(
        F.concat(F.lit("s"), F.pmod(F.xxhash64("id"), F.lit(97))).alias("tok")
    )
    agg = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    sk_occ = pl.countmin_sketch(occ, "tok", depth=4, width=32)
    sk_wgt = pl.countmin_sketch(agg, "tok", depth=4, width=32, weight=F.col("c"))
    cells_occ = {(r["j"], r["cell"]): r["cnt"] for r in sk_occ.collect()}
    cells_wgt = {(r["j"], r["cell"]): r["cnt"] for r in sk_wgt.collect()}
    assert cells_occ == cells_wgt
    assert len(cells_occ) <= 4 * 32 and len(cells_occ) > 0


def test_countmin_weighted_and_mergeable(spark):
    rows = spark.range(50).select(
        F.concat(F.lit("k"), F.col("id") % 7).alias("tok"),
        F.lit(3).alias("w"),
    )
    sk = pl.countmin_sketch(rows, "tok", depth=2, width=256, weight="w")
    est = {
        r["tok"]: r["est"]
        for r in pl.countmin_lookup(
            sk,
            rows.select("tok").distinct(),
            "tok",
            depth=2,
            width=256,
        ).collect()
    }
    exact = {
        r["tok"]: 3 * r["c"]
        for r in rows.groupBy("tok").agg(F.count("*").alias("c")).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    # mergeability: sketch(A) + sketch(B) cell-wise == sketch(A union B)
    a, b = rows.filter(F.col("id") < 25), rows.filter(F.col("id") >= 25)
    ska = pl.countmin_sketch(a, "tok", depth=2, width=256, weight="w")
    skb = pl.countmin_sketch(b, "tok", depth=2, width=256, weight="w")
    merged = (
        ska.unionAll(skb)
        .groupBy("j", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = pl.countmin_sketch(rows, "tok", depth=2, width=256, weight="w")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_countmin_validates_shape(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("t"))
    with pytest.raises(ValueError):
        pl.countmin_sketch(df, "t", depth=0)
    with pytest.raises(ValueError):
        pl.countmin_sketch(df, "t", width=1)


@pytest.fixture(scope="module")
def decon_docs(spark):
    # 40 docs of synthetic text; every 10th is "benchmark"
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(12)))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_no_false_negatives(spark, decon_docs):
    bench = decon_docs.filter(F.col("doc_id") % 10 == 0)
    corpus = decon_docs.filter(F.col("doc_id") % 10 != 0)
    exact = {
        r["doc_id"]
        for r in pl.decontaminate(corpus, bench).filter("contaminated").collect()
    }
    bloom = {
        r["doc_id"]
        for r in pl.bloom_decontaminate(corpus, bench)
        .filter("contaminated")
        .collect()
    }
    # Bloom may over-flag (false positives) but NEVER under-flag
    assert exact <= bloom


def test_bloom_bits_bounded_and_flag_counts_bounded(spark, decon_docs):
    bench = decon_docs.filter(F.col("doc_id") % 10 == 0)
    corpus = decon_docs.filter(F.col("doc_id") % 10 != 0)
    m_bits = 1 << 12
    bits = pl.bloom_bits(bench, m_bits=m_bits, k=3)
    n_bits = bits.count()
    assert n_bits <= m_bits
    assert bits.agg(F.min("pos"), F.max("pos")).collect()[0][1] < m_bits
    res = pl.bloom_decontaminate(corpus, bench, m_bits=m_bits, k=3)
    # per-doc flagged-shingle count can never exceed the doc's distinct
    # shingle count (12-token docs -> 10 shingles)
    assert res.filter(F.col("n_flagged_shingles") > 10).count() == 0
    # one row per corpus doc, zero-filled
    assert res.count() == corpus.count()


def test_bloom_disjoint_corpus_mostly_clean(spark):
    # corpus shares NO vocabulary with the benchmark: any flag is a
    # false positive; with 32 KiB filter and tiny benchmark the FP rate
    # must be ~0 at this scale
    bench = spark.createDataFrame(
        [(0, "red orange yellow green blue indigo violet")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3} w{i + 4}") for i in range(1, 60)],
        "doc_id long, text string",
    )
    res = pl.bloom_decontaminate(corpus, bench)
    assert res.filter("contaminated").count() == 0


def test_histogram_counts_and_overflow_bins(spark):
    df = spark.createDataFrame(
        [(float(x),) for x in [-5, 0, 0.5, 1, 2.5, 9.99, 10, 42]], "x double"
    )
    rows = {
        r["bin"]: r["cnt"]
        for r in pl.histogram_sketch(df, "x", lo=0.0, hi=10.0, bins=10).collect()
    }
    # -5 underflows; 10 and 42 overflow; 0/0.5 -> bin 0; 1 -> 1;
    # 2.5 -> 2; 9.99 -> 9
    assert rows == {-1: 1, 0: 2, 1: 1, 2: 1, 9: 1, 10: 2}


def test_histogram_quantiles_within_bin_width(spark):
    import numpy as np

    vals = np.linspace(0.0, 100.0, 10_001)  # uniform grid
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    hist = pl.histogram_sketch(df, "x", lo=0.0, hi=100.0, bins=200).collect()
    got = pl.quantile_from_histogram(
        hist, (0.1, 0.5, 0.9), lo=0.0, hi=100.0, bins=200
    )
    for g, expect in zip(got, (10.0, 50.0, 90.0)):
        assert abs(g - expect) <= 100.0 / 200  # one bin width


def test_histogram_mergeable_and_partitioning_independent(spark):
    import numpy as np

    rng_vals = [float(v) for v in np.arange(1000) * 0.37 % 50]
    df = spark.createDataFrame([(v,) for v in rng_vals], "x double")
    a = sorted(
        map(
            tuple,
            pl.histogram_sketch(df.coalesce(1), "x", lo=0.0, hi=50.0, bins=64).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pl.histogram_sketch(
                df.repartition(16), "x", lo=0.0, hi=50.0, bins=64
            ).collect(),
        )
    )
    assert a == b
    # shard merge: hist(A) + hist(B) bin-wise == hist(A union B)
    h1 = pl.histogram_sketch(df.limit(500), "x", lo=0.0, hi=50.0, bins=64)
    h2 = pl.histogram_sketch(
        df.subtract(df.limit(500)), "x", lo=0.0, hi=50.0, bins=64
    )
    merged = sorted(
        map(
            tuple,
            h1.unionAll(h2).groupBy("bin").agg(F.sum("cnt").alias("cnt")).collect(),
        )
    )
    # subtract() dedups; rebuild the whole from the same dedup'd frame
    whole = sorted(
        map(
            tuple,
            pl.histogram_sketch(
                df.limit(500).unionAll(df.subtract(df.limit(500))),
                "x",
                lo=0.0,
                hi=50.0,
                bins=64,
            ).collect(),
        )
    )
    assert merged == whole


def test_histogram_validates(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="lo < hi"):
        pl.histogram_sketch(df, "x", lo=1.0, hi=1.0)
    with pytest.raises(ValueError, match="bins"):
        pl.histogram_sketch(df, "x", lo=0.0, hi=1.0, bins=1)
    with pytest.raises(ValueError, match="empty"):
        pl.quantile_from_histogram([], (0.5,), lo=0.0, hi=1.0)
    hist = pl.histogram_sketch(df, "x", lo=0.0, hi=2.0).collect()
    with pytest.raises(ValueError, match="quantile"):
        pl.quantile_from_histogram(hist, (1.5,), lo=0.0, hi=2.0)


def test_multi_column_grouping(spark):
    df = spark.range(1000).select(
        (F.col("id") % 2).alias("g1"),
        (F.col("id") % 3).alias("g2"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 50).cast("double").alias("x"),
    )
    st = pl.hll_state(df, "v", by=["g1", "g2"], p=8).collect()
    assert len(st) == 6
    assert all(r["present"] + r["zeros"] == 256 for r in st)
    hg = pl.histogram_sketch(df, "x", lo=0.0, hi=50.0, bins=10, by=["g1", "g2"])
    assert {tuple(r)[:2] for r in hg.select("g1", "g2").distinct().collect()} == {
        (a, b) for a in (0, 1) for b in (0, 1, 2)
    }


def test_bloom_prebuilt_bits_reusable(spark, decon_docs, tmp_path):
    bench = decon_docs.filter(F.col("doc_id") % 10 == 0)
    corpus = decon_docs.filter(F.col("doc_id") % 10 != 0)
    bits = pl.bloom_bits(bench, m_bits=1 << 12, k=3)
    p = str(tmp_path / "bits.parquet")
    bits.write.parquet(p)  # the build-once / probe-many pattern
    reloaded = spark.read.parquet(p)
    a = sorted(
        map(
            tuple,
            pl.bloom_decontaminate(
                corpus, bench, m_bits=1 << 12, k=3
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pl.bloom_decontaminate(
                corpus, bench, m_bits=1 << 12, k=3, bits=reloaded
            ).collect(),
        )
    )
    assert a == b


def test_filter_by_quantile_threshold_matches_driver_fold(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    vals = rng.uniform(0, 100, size=2000)
    df = spark.createDataFrame(
        [(int(i % 3), float(v)) for i, v in enumerate(vals)],
        "g int, x double",
    )
    q, lo, hi, bins = 0.9, 0.0, 100.0, 200
    kept = pl.filter_by_quantile(
        df, "x", q, lo=lo, hi=hi, bins=bins, by="g", threshold_col="thr"
    )
    rows = kept.collect()
    # the in-plan threshold equals the driver-side fold from the same
    # histogram state, per group
    for g in (0, 1, 2):
        hist = pl.histogram_sketch(
            df.filter(F.col("g") == g), "x", lo=lo, hi=hi, bins=bins
        ).collect()
        (expect_thr,) = pl.quantile_from_histogram(
            hist, (q,), lo=lo, hi=hi, bins=bins
        )
        grp = [r for r in rows if r["g"] == g]
        assert grp, g
        assert all(r["thr"] == pytest.approx(expect_thr, abs=1e-9) for r in grp)
        assert all(r["x"] >= r["thr"] for r in grp)
        # ~10% of the group's rows survive, within histogram error
        n_g = sum(1 for i, _ in enumerate(vals) if i % 3 == g)
        assert abs(len(grp) / n_g - (1 - q)) < 0.03
    # keep="below" is the complement
    below = pl.filter_by_quantile(
        df, "x", q, lo=lo, hi=hi, bins=bins, by="g", keep="below"
    )
    assert below.count() + len(rows) == 2000


def test_filter_by_quantile_edges_and_validation(spark):
    df = spark.createDataFrame([(float(v),) for v in range(10)], "x double")
    # q=0 keeps everything (threshold at the first populated bin edge)
    assert (
        pl.filter_by_quantile(df, "x", 0.0, lo=0.0, hi=10.0, bins=10).count()
        == 10
    )
    with pytest.raises(ValueError, match="keep"):
        pl.filter_by_quantile(df, "x", 0.5, lo=0.0, hi=10.0, keep="between")
    with pytest.raises(ValueError, match="q must"):
        pl.filter_by_quantile(df, "x", 1.5, lo=0.0, hi=10.0)
