"""Lomb-Scargle periodogram (operators/lomb.py) vs a pure-numpy
reference of the textbook formula (scipy absent from the container),
on regular AND irregular sampling."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from xarray_scipy_spark.operators import lombscargle


def ref_lomb(t, y, freqs, precenter=False, normalize=False):
    t = np.asarray(t, float)
    y = np.asarray(y, float)
    if precenter:
        y = y - y.mean()
    out = []
    for w in freqs:
        tau = np.arctan2(np.sum(np.sin(2 * w * t)), np.sum(np.cos(2 * w * t))) / (
            2 * w
        )
        cwt = np.cos(w * (t - tau))
        swt = np.sin(w * (t - tau))
        p = 0.5 * (
            np.sum(y * cwt) ** 2 / np.sum(cwt**2)
            + np.sum(y * swt) ** 2 / np.sum(swt**2)
        )
        if normalize:
            p *= 2.0 / np.dot(y, y)
        out.append(p)
    return np.array(out)


@pytest.fixture(scope="module")
def irregular_sine(spark):
    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 50, size=120))
    w0 = 2.0
    y = 1.5 * np.sin(w0 * t) + 0.1 * rng.standard_normal(len(t))
    rows = [(0, float(tt), float(vv)) for tt, vv in zip(t, y)]
    df = spark.createDataFrame(rows, "ch int, t double, value double")
    return df, t, y, w0


def test_matches_reference_on_irregular_samples(spark, irregular_sine):
    df, t, y, w0 = irregular_sine
    freqs = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 4.0]
    for pc, nm in ((False, False), (True, False), (True, True)):
        res = lombscargle(
            df, freqs, by=["ch"], dim="t", precenter=pc, normalize=nm
        )
        got = {r["idx"]: r["power"] for r in res.collect()}
        expect = ref_lomb(t, y, freqs, precenter=pc, normalize=nm)
        for i in range(len(freqs)):
            assert got[i] == pytest.approx(expect[i], rel=1e-9), (pc, nm, i)


def test_peak_at_true_frequency(spark, irregular_sine):
    df, _, _, w0 = irregular_sine
    freqs = np.linspace(0.5, 4.0, 36)
    res = lombscargle(df, list(freqs), by=["ch"], dim="t", precenter=True)
    rows = sorted(res.collect(), key=lambda r: -r["power"])
    assert abs(rows[0]["freq"] - w0) < 0.15
    # normalized: a clean sinusoid saturates toward 1
    resn = lombscargle(
        df, [w0], by=["ch"], dim="t", precenter=True, normalize=True
    ).collect()
    assert 0.8 < resn[0]["power"] <= 1.0


def test_timestamp_dim_uses_epoch_seconds(spark):
    base = dt.datetime(2024, 1, 1)
    w0 = 2 * np.pi / 60.0  # one cycle per minute (rad/s)
    rng = np.random.default_rng(7)
    secs = np.sort(rng.uniform(0, 600, 150))
    rows = [
        (0, base + dt.timedelta(seconds=float(s)), float(np.sin(w0 * s)))
        for s in secs
    ]
    df = spark.createDataFrame(rows, "ch int, ts timestamp, value double")
    res = lombscargle(
        df, [w0 / 2, w0, w0 * 2], by=["ch"], dim="ts", precenter=True,
        normalize=True,
    )
    got = {r["idx"]: r["power"] for r in res.collect()}
    assert got[1] > 0.8 and got[1] > 5 * max(got[0], got[2])


def test_validates(spark, irregular_sine):
    df = irregular_sine[0]
    with pytest.raises(ValueError, match="non-empty"):
        lombscargle(df, [], by=["ch"], dim="t")
    with pytest.raises(ValueError, match="positive"):
        lombscargle(df, [1.0, -2.0], by=["ch"], dim="t")


def test_regular_grid_equals_dft_periodogram(spark):
    """Cross-operator invariant: on a REGULAR grid at exact Fourier
    frequencies, the (precentered, unnormalized) Lomb-Scargle power
    equals |DFT|^2 / n from this engine's own rfft — two independent
    implementations meeting on the classical identity."""
    from xarray_scipy_spark.operators import rfft

    n = 64
    rng = np.random.default_rng(12)
    x = rng.standard_normal(n)
    rows = [(0, t, float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "ch int, t long, value double")
    ks = [3, 7, 12]
    freqs = [2 * np.pi * k / n for k in ks]
    ls = {
        r["idx"]: r["power"]
        for r in lombscargle(
            df, freqs, by=["ch"], dim="t", precenter=True
        ).collect()
    }
    spec = rfft(df, by=["ch"], dim="t")
    got = {r["idx"]: complex(r["re"], r["im"]) for r in spec.collect()}
    xc = x - x.mean()
    for i, k in enumerate(ks):
        dft = np.sum(xc * np.exp(-2j * np.pi * k * np.arange(n) / n))
        assert ls[i] == pytest.approx(abs(dft) ** 2 / n, rel=1e-9)
        # and the engine's rfft agrees with that DFT on the raw series
        raw_dft = np.sum(x * np.exp(-2j * np.pi * k * np.arange(n) / n))
        assert got[k] == pytest.approx(raw_dft, rel=1e-9)
