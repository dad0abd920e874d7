"""skew_join (operators/joins.py): result equality with the plain
join under hot keys, salting actually diffuses the hot key, and the
cold path stays replication-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_scipy_spark.operators import skew_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 is hot: 2000 rows; keys 1..20 carry ~10 rows each
    left = spark.range(2200).select(
        F.col("id").alias("left_id"),
        F.when(F.col("id") < 2000, 0)
        .otherwise((F.col("id") % 20) + 1)
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    right = spark.range(40).select(
        (F.col("id") % 21).alias("k"),
        F.concat(F.lit("r"), F.col("id")).alias("attr"),
    )
    return left, right


def _key(rows):
    # None-safe canonical ordering for set-equality comparisons
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_inner_equals_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "inner")
    salted = skew_join(
        left, right, on=["k"], left_id="left_id", salt=8, hot_threshold=100
    )
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = sorted(plain.columns)
    assert _key(salted.select(cols).collect()) == _key(plain.select(cols).collect())


def test_left_join_keeps_unmatched_rows(spark, skewed):
    left, right = skewed
    # keys 1..20 all match; drop right key 0 so the ENTIRE hot key is
    # unmatched — the null-extension path under salting
    r2 = right.filter("k <> 0")
    plain = left.join(r2, "k", "left")
    salted = skew_join(
        left, r2, on=["k"], left_id="left_id", how="left", salt=8, hot_threshold=100
    )
    cols = sorted(plain.columns)
    assert _key(salted.select(cols).collect()) == _key(plain.select(cols).collect())


def test_explicit_hot_keys_and_determinism(spark, skewed):
    left, right = skewed
    hot = spark.createDataFrame([(0,)], "k long")
    a = skew_join(left, right, on=["k"], left_id="left_id", hot_keys=hot, salt=4)
    b = skew_join(
        left.repartition(32),
        right.coalesce(1),
        on=["k"],
        left_id="left_id",
        hot_keys=hot,
        salt=4,
    )
    cols = sorted(a.columns)
    assert _key(a.select(cols).collect()) == _key(b.select(cols).collect())


def test_salt_diffuses_hot_key_and_spares_cold(spark, skewed):
    left, right = skewed
    from xarray_scipy_spark.pipeline.hashes import h60

    salt = 8
    buckets = (
        left.filter("k = 0")
        .select(
            (
                h60(
                    F.concat_ws(
                        "|", F.lit("skewsalt"), F.col("left_id").cast("string")
                    )
                )
                % salt
            ).alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    # the hot key's 2000 rows spread over every salt bucket, no bucket
    # holding more than ~2x the fair share
    assert len(buckets) == salt
    assert max(r["count"] for r in buckets) < 2 * (2000 / salt)
    # cold keys: right side must NOT replicate (output rows for cold
    # keys == plain join's)
    plain_cold = left.join(right, "k").filter("k <> 0").count()
    salted_cold = (
        skew_join(left, right, on=["k"], left_id="left_id", salt=salt, hot_threshold=100)
        .filter("k <> 0")
        .count()
    )
    assert plain_cold == salted_cold


def test_validates_args(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="how"):
        skew_join(left, right, on=["k"], left_id="left_id", how="outer")
    with pytest.raises(ValueError, match="salt"):
        skew_join(left, right, on=["k"], left_id="left_id", salt=1)
