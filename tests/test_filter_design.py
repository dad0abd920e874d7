"""Filter-design introspection kernels (freqz / sosfreqz /
group_delay): closed-form identities and cross-checks against the
numerical phase derivative — no scipy in the container, so every
expectation is analytic."""

from __future__ import annotations

import numpy as np

# --- frequency-response introspection (freqz / sosfreqz / group_delay) -----


def test_freqz_identity_and_pure_delay():
    from xarray_scipy_spark.kernels import freqz

    w, h = freqz([1.0], worN=64)
    assert np.allclose(h, 1.0)
    # z^-2 delay: unit magnitude, group delay 2 -> phase = -2w
    w, h = freqz([0.0, 0.0, 1.0], worN=64)
    assert np.allclose(np.abs(h), 1.0)
    assert np.allclose(h, np.exp(-2j * w), atol=1e-12)


def test_freqz_moving_average_closed_form():
    from xarray_scipy_spark.kernels import freqz

    w, h = freqz([0.5, 0.5], worN=128)
    assert np.allclose(np.abs(h), np.abs(np.cos(w / 2)), atol=1e-12)


def test_sosfreqz_matches_tf_form_and_butter_cutoff():
    from xarray_scipy_spark.kernels import butter_sos, freqz, sos2tf, sosfreqz

    sos = butter_sos(4, 0.25)
    w, h_sos = sosfreqz(sos, worN=256)
    b, a = sos2tf(sos)
    _, h_tf = freqz(b, a, worN=256)
    assert np.allclose(h_sos, h_tf, atol=1e-8)
    # butterworth: |H(0)| = 1, |H(wc)| = 1/sqrt(2), monotone to ~0
    assert abs(abs(h_sos[0]) - 1.0) < 1e-9
    wc_idx = int(round(0.25 * 256))
    assert abs(abs(h_sos[wc_idx]) - 1 / np.sqrt(2)) < 1e-3
    assert abs(h_sos[-1]) < 0.05


def test_group_delay_linear_phase_fir_is_constant():
    from xarray_scipy_spark.kernels import firwin, group_delay

    taps = firwin(31, 0.3)  # symmetric -> linear phase, gd = 15
    w, gd = group_delay(taps, worN=128)
    assert np.allclose(gd, 15.0, atol=1e-6)


def test_group_delay_matches_phase_derivative_for_iir():
    from xarray_scipy_spark.kernels import butter_sos, freqz, group_delay, sos2tf

    b, a = sos2tf(butter_sos(4, 0.2))
    n = 4096
    w, h = freqz(b, a, worN=n)
    gd_num = -np.gradient(np.unwrap(np.angle(h)), w)
    _, gd = group_delay(b, a, worN=n)
    # compare away from the band edge where the numerical gradient is poor
    sl = slice(10, n // 2)
    assert np.allclose(gd[sl], gd_num[sl], atol=5e-2)


def test_freqz_validates():
    import pytest

    from xarray_scipy_spark.kernels import freqz, sosfreqz

    with pytest.raises(ValueError, match="worN"):
        freqz([1.0], worN=0)
    with pytest.raises(ValueError, match="sos"):
        sosfreqz(np.ones((2, 5)))
