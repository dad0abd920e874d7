"""Ridge regression (pipeline/linear.py) vs numpy closed forms."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import xarray_scipy_spark.pipeline as pl


@pytest.fixture(scope="module")
def lin_data(spark):
    rng = np.random.default_rng(21)
    n, d = 400, 3
    X = rng.standard_normal((n, d)) * [1.0, 3.0, 0.5] + [0, 2, -1]
    beta_true = np.array([2.0, -1.0, 0.5])
    y = X @ beta_true + 4.0 + 0.05 * rng.standard_normal(n)
    rows = [
        (float(a), float(b), float(c), float(v))
        for (a, b, c), v in zip(X, y)
    ]
    df = spark.createDataFrame(rows, "f0 double, f1 double, f2 double, y double")
    return df, X, y


def ref_ridge(X, y, l2, fit_intercept=True):
    n, d = X.shape
    if fit_intercept:
        mx, my = X.mean(axis=0), y.mean()
        Xc, yc = X - mx, y - my
        b = np.linalg.solve(Xc.T @ Xc + l2 * np.eye(d), Xc.T @ yc)
        return b, float(my - mx @ b)
    b = np.linalg.solve(X.T @ X + l2 * np.eye(d), X.T @ y)
    return b, 0.0


def test_fit_matches_numpy_and_recovers_coefficients(spark, lin_data):
    df, X, y = lin_data
    for l2, fi in ((1e-6, True), (10.0, True), (1e-6, False)):
        beta, b0 = pl.fit_ridge(
            df, ["f0", "f1", "f2"], "y", l2=l2, fit_intercept=fi
        )
        rb, rb0 = ref_ridge(X, y, l2, fi)
        np.testing.assert_allclose(beta, rb, rtol=1e-9)
        assert b0 == pytest.approx(rb0, abs=1e-9)
    beta, b0 = pl.fit_ridge(df, ["f0", "f1", "f2"], "y")
    np.testing.assert_allclose(beta, [2.0, -1.0, 0.5], atol=0.02)
    assert b0 == pytest.approx(4.0, abs=0.02)


def test_fit_partitioning_independent(spark, lin_data):
    df, _, _ = lin_data
    b1, i1 = pl.fit_ridge(df.coalesce(1), ["f0", "f1", "f2"], "y")
    b2, i2 = pl.fit_ridge(df.repartition(16), ["f0", "f1", "f2"], "y")
    np.testing.assert_allclose(b1, b2, rtol=1e-12)
    assert i1 == pytest.approx(i2, abs=1e-12)


def test_predict_is_pure_projection(spark, lin_data):
    df, X, y = lin_data
    beta, b0 = pl.fit_ridge(df, ["f0", "f1", "f2"], "y")
    scored = pl.predict_linear(df, beta, b0, feature_cols=["f0", "f1", "f2"])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # scoring never leaves the JVM
    got = scored.agg(
        F.avg((F.col("score") - F.col("y")) ** 2).alias("mse")
    ).collect()[0]["mse"]
    assert got < 0.01  # the noise floor


def test_validates(spark, lin_data):
    df, _, _ = lin_data
    with pytest.raises(ValueError, match="feature"):
        pl.fit_ridge(df, [], "y")
    with pytest.raises(ValueError, match="l2"):
        pl.fit_ridge(df, ["f0"], "y", l2=-1)
    with pytest.raises(ValueError, match="beta"):
        pl.predict_linear(df, [1.0], feature_cols=["f0", "f1"])


def ref_logistic(X, y, l2, fit_intercept=True, max_iter=25, tol=1e-10):
    n, d = X.shape
    if fit_intercept:
        X = np.hstack([X, np.ones((n, 1))])
    da = X.shape[1]
    reg = np.eye(da)
    if fit_intercept:
        reg[d, d] = 0.0
    beta = np.zeros(da)
    last = -np.inf
    for _ in range(max_iter):
        eta = np.clip(X @ beta, -35, 35)
        p = 1 / (1 + np.exp(-eta))
        w = p * (1 - p)
        h = (X * w[:, None]).T @ X
        g = X.T @ (y - p)
        ll = float(np.sum(y * eta - np.logaddexp(0, eta))) - 0.5 * l2 * float(
            beta[:d] @ beta[:d]
        )
        beta = beta + np.linalg.solve(
            h + l2 * reg + 1e-12 * np.eye(da), g - l2 * (reg @ beta)
        )
        if abs(ll - last) < tol * (1 + abs(ll)):
            break
        last = ll
    return (beta[:d], float(beta[d])) if fit_intercept else (beta, 0.0)


def test_logistic_matches_reference_and_separates(spark):
    rng = np.random.default_rng(31)
    n = 600
    X = rng.standard_normal((n, 2))
    true_b = np.array([2.5, -1.5])
    p = 1 / (1 + np.exp(-(X @ true_b + 0.5)))
    y = (rng.uniform(size=n) < p).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(v)) for (a, b), v in zip(X, y)],
        "f0 double, f1 double, y double",
    )
    beta, b0 = pl.fit_logistic(df, ["f0", "f1"], "y", l2=1e-3)
    rb, rb0 = ref_logistic(X, y, 1e-3)
    np.testing.assert_allclose(beta, rb, rtol=1e-6)
    assert b0 == pytest.approx(rb0, rel=1e-6)
    # sign/scale sanity vs the generating model
    assert beta[0] > 1.0 and beta[1] < -0.5 and 0.0 < b0 < 1.5
    # scored probabilities classify the training set well
    scored = pl.predict_linear(df, beta, b0, feature_cols=["f0", "f1"])
    acc = scored.select(
        ((F.col("score") > 0).cast("double") == F.col("y")).cast("double").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert acc > 0.8


# --- grouped_ols -----------------------------------------------------------


def test_grouped_ols_matches_polyfit(spark):
    rng = np.random.default_rng(5)
    rows = []
    gens = [(2.0, 1.0), (-0.75, 3.0), (0.0, 7.0)]
    for gid, (a, b) in enumerate(gens):
        xs = rng.uniform(0, 30, 40)
        ys = a * xs + b + rng.normal(0, 0.2, 40)
        rows += [(gid, float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g long, x double, y double")
    got = {
        r["g"]: r
        for r in pl.grouped_ols(
            df, group_cols=["g"], x_col="x", y_col="y"
        ).collect()
    }
    for gid in range(len(gens)):
        xs = [r[1] for r in rows if r[0] == gid]
        ys = [r[2] for r in rows if r[0] == gid]
        sl, ic = np.polyfit(xs, ys, 1)
        assert got[gid]["n"] == 40
        assert got[gid]["slope"] == pytest.approx(sl, abs=1e-9)
        assert got[gid]["intercept"] == pytest.approx(ic, abs=1e-9)
        r2 = np.corrcoef(xs, ys)[0, 1] ** 2
        assert got[gid]["r2"] == pytest.approx(r2, abs=1e-9)


def test_grouped_ols_degenerate_groups_are_null(spark):
    df = spark.createDataFrame(
        [
            (0, 1.0, 5.0),  # single point
            (1, 2.0, 3.0), (1, 2.0, 9.0),  # zero x-variance
            (2, 1.0, 4.0), (2, 3.0, 4.0),  # constant y -> r2 NULL
        ],
        "g long, x double, y double",
    )
    got = {
        r["g"]: r
        for r in pl.grouped_ols(
            df, group_cols=["g"], x_col="x", y_col="y"
        ).collect()
    }
    assert got[0]["slope"] is None and got[0]["r2"] is None
    assert got[1]["slope"] is None
    assert got[2]["slope"] == pytest.approx(0.0)
    assert got[2]["intercept"] == pytest.approx(4.0)
    assert got[2]["r2"] is None
