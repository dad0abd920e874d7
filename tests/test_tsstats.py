"""acf / ewma (operators/tsstats.py) vs numpy/pandas references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from xarray_scipy_spark.operators import acf, ewma


def ref_acf(x, nlags):
    x = np.asarray(x, float)
    d = x - x.mean()
    c0 = np.sum(d * d)
    return [1.0] + [
        float(np.sum(d[k:] * d[:-k]) / c0) for k in range(1, nlags + 1)
    ]


@pytest.fixture(scope="module")
def two_series(spark):
    rng = np.random.default_rng(9)
    rows = []
    data = {}
    for ch in range(2):
        t = np.arange(80)
        x = np.sin(2 * np.pi * t / 16) + 0.3 * rng.standard_normal(80) + ch
        data[ch] = x
        rows += [(ch, int(tt), float(v)) for tt, v in zip(t, x)]
    return spark.createDataFrame(rows, "ch int, t long, value double"), data


def test_acf_matches_reference(spark, two_series):
    df, data = two_series
    res = acf(df, by=["ch"], dim="t", nlags=12)
    got = {(r["ch"], r["lag"]): r["acf"] for r in res.collect()}
    for ch, x in data.items():
        expect = ref_acf(x, 12)
        for k in range(13):
            assert got[(ch, k)] == pytest.approx(expect[k], abs=1e-12), (ch, k)
    # periodic signal: strong positive correlation at the period
    assert got[(0, 12)] < got[(0, 1)]


def test_acf_properties_and_validation(spark, two_series):
    df, _ = two_series
    res = acf(df, by=["ch"], dim="t", nlags=5).collect()
    assert all(-1.0 - 1e-12 <= r["acf"] <= 1.0 + 1e-12 for r in res)
    assert all(r["acf"] == 1.0 for r in res if r["lag"] == 0)
    with pytest.raises(ValueError, match="nlags"):
        acf(df, by=["ch"], dim="t", nlags=0)


def test_ewma_matches_pandas_both_adjust_modes(spark, two_series):
    df, data = two_series
    for adjust in (False, True):
        res = ewma(df, 0.3, by=["ch"], dim="t", adjust=adjust)
        got = {}
        for r in res.collect():
            got.setdefault(r["ch"], {})[r["idx"]] = r["ewma"]
        for ch, x in data.items():
            expect = pd.Series(x).ewm(alpha=0.3, adjust=adjust).mean().to_numpy()
            ours = np.array([got[ch][i] for i in range(len(x))])
            np.testing.assert_allclose(ours, expect, rtol=1e-10, atol=1e-12)


def test_ewma_validates(spark, two_series):
    df, _ = two_series
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, 0.0, by=["ch"], dim="t")
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, 1.5, by=["ch"], dim="t")


def ref_decompose(x, period, model="additive"):
    x = np.asarray(x, float)
    n = len(x)
    half = period // 2
    trend = np.full(n, np.nan)
    if period % 2 == 0:
        w = np.r_[0.5, np.ones(period - 1), 0.5] / period
    else:
        w = np.ones(period) / period
    m = len(w) // 2
    for i in range(m, n - m):
        trend[i] = np.dot(w, x[i - m : i + m + 1])
    detr = x - trend if model == "additive" else x / trend
    pm = np.array(
        [np.nanmean(detr[p::period]) for p in range(period)]
    )
    pm = pm - pm.mean() if model == "additive" else pm / pm.mean()
    seasonal = np.array([pm[i % period] for i in range(n)])
    resid = (
        x - trend - seasonal if model == "additive" else x / trend / seasonal
    )
    return trend, seasonal, resid


def test_seasonal_decompose_matches_reference(spark):
    from xarray_scipy_spark.operators import seasonal_decompose

    rng = np.random.default_rng(3)
    n = 96
    t = np.arange(n)
    for period, model in ((12, "additive"), (7, "additive"), (12, "multiplicative")):
        season = 1.0 + 0.3 * np.sin(2 * np.pi * t / period)
        trend_true = 5 + 0.05 * t
        noise = 1.0 + 0.02 * rng.standard_normal(n)
        x = (
            trend_true + 3 * (season - 1) + (noise - 1)
            if model == "additive"
            else trend_true * season * noise
        )
        df = spark.createDataFrame(
            [(0, int(i), float(v)) for i, v in zip(t, x)],
            "ch int, t long, value double",
        )
        res = seasonal_decompose(
            df, period, by=["ch"], dim="t", model=model
        ).orderBy("idx")
        got = res.collect()
        rt, rs, rr = ref_decompose(x, period, model)
        for r in got:
            i = r["idx"]
            if np.isnan(rt[i]):
                assert r["trend"] is None, i
                assert r["resid"] is None or np.isnan(r["resid"])
            else:
                assert r["trend"] == pytest.approx(rt[i], abs=1e-10)
                assert r["resid"] == pytest.approx(rr[i], abs=1e-10)
            assert r["seasonal"] == pytest.approx(rs[i], abs=1e-10)


def test_seasonal_decompose_validates(spark):
    from xarray_scipy_spark.operators import seasonal_decompose

    df = spark.createDataFrame([(0, 0, 1.0)], "ch int, t long, value double")
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, 1, by=["ch"], dim="t")
    with pytest.raises(ValueError, match="model"):
        seasonal_decompose(df, 4, by=["ch"], dim="t", model="robust")
