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
