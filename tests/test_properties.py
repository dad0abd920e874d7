"""Property-based kernel invariants (hypothesis).

The reference tests fixed sizes only (tests/test_signal.py sweeps
n ∈ {None,99,100,101,102}); these generate arbitrary lengths/values so
off-by-one slicing (mode crops, DFT defaults, padding) is probed across
the whole small-size lattice instead of five points. Kernels only — no
Spark session, so the module runs in seconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from xarray_scipy_spark.kernels.dsp import (
    decimate_1d,
    fftconvolve_1d,
    hilbert_1d,
    resample_fourier,
    sosfilt_1d,
)
from xarray_scipy_spark.kernels.filter_design import butter_sos, sosfilt_zi

_f64 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)


def _arr(min_size: int, max_size: int = 64):
    return st.lists(_f64, min_size=min_size, max_size=max_size).map(
        lambda v: np.asarray(v, dtype=float)
    )


@settings(max_examples=80, deadline=None)
@given(x=_arr(1), y=_arr(1))
def test_fftconvolve_matches_numpy_all_modes(x, y):
    # FFT round-off is relative to the largest PRODUCT magnitude, not
    # the output element (cancellation can leave a tiny value with
    # absolute error ~eps·max|x|·max|y|·n)
    atol = 1e-9 * (
        1.0 + float(np.abs(x).max(initial=0.0) * np.abs(y).max(initial=0.0)) * len(x)
    )
    np.testing.assert_allclose(
        fftconvolve_1d(x, y, "full"), np.convolve(x, y, "full"), atol=atol
    )
    np.testing.assert_allclose(
        fftconvolve_1d(x, y, "same"),
        # numpy 'same' returns max(M,N); scipy (the reference's kernel)
        # returns len(in1) — emulate scipy by cropping the full output
        # centered on x
        np.convolve(x, y, "full")[(len(y) - 1) // 2 : (len(y) - 1) // 2 + len(x)],
        atol=atol,
    )
    np.testing.assert_allclose(
        fftconvolve_1d(x, y, "valid"), np.convolve(x, y, "valid"), atol=atol
    )


@settings(max_examples=60, deadline=None)
@given(xr=_arr(1, 48), xi=_arr(1, 48), yr=_arr(1, 48), yi=_arr(1, 48))
def test_fftconvolve_complex_matches_numpy(xr, xi, yr, yi):
    """Complex inputs pass through (no silent float cast): the fft/ifft
    branch must equal numpy's complex convolve on every mode, and a
    complex-vs-real mix must work too."""
    n = min(len(xr), len(xi))
    m = min(len(yr), len(yi))
    x = xr[:n] + 1j * xi[:n]
    y = yr[:m] + 1j * yi[:m]
    atol = 1e-9 * (
        1.0 + float(np.abs(x).max(initial=0.0) * np.abs(y).max(initial=0.0)) * n
    )
    for mode in ("full", "valid"):
        got = fftconvolve_1d(x, y, mode)
        assert np.iscomplexobj(got)
        np.testing.assert_allclose(got, np.convolve(x, y, mode), atol=atol)
    np.testing.assert_allclose(
        fftconvolve_1d(x, y, "same"),
        np.convolve(x, y, "full")[(m - 1) // 2 : (m - 1) // 2 + n],
        atol=atol,
    )
    # mixed complex x, real y (full-length yr: its own tolerance)
    atol_mixed = 1e-9 * (
        1.0 + float(np.abs(x).max(initial=0.0) * np.abs(yr).max(initial=0.0)) * n
    )
    np.testing.assert_allclose(
        fftconvolve_1d(x, yr, "full"), np.convolve(x, yr, "full"), atol=atol_mixed
    )


@settings(max_examples=60, deadline=None)
@given(x=_arr(1, 128), n=st.integers(1, 160))
def test_hilbert_real_part_and_length(x, n):
    out = hilbert_1d(x, n=n)
    assert out.shape[-1] == n
    # real part of the analytic signal is the (padded/truncated) input
    padded = np.zeros(n)
    take = min(n, len(x))
    padded[:take] = x[:take]
    np.testing.assert_allclose(np.real(out), padded, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(x=_arr(2, 128))
def test_resample_identity_and_length(x):
    # resampling to the same length is the identity (Fourier method)
    np.testing.assert_allclose(resample_fourier(x, len(x)), x, atol=1e-6)
    # any target length is honored exactly
    num = max(1, len(x) // 2)
    assert resample_fourier(x, num).shape[-1] == num


@settings(max_examples=40, deadline=None)
@given(x=_arr(8, 256), q=st.integers(2, 8))
def test_decimate_length_rule(x, q):
    # reference invariant: len//q (ceil division in scipy is n//q when
    # slicing [::q] from 0), tested at arbitrary (n, q)
    out = decimate_1d(x, q, ftype="fir")
    assert out.shape[-1] == int(np.ceil(len(x) / q))


@settings(max_examples=40, deadline=None)
@given(x=_arr(4, 128), a=_f64, data=st.data())
def test_sosfilt_linearity_and_state_composition(x, a, data):
    sos = butter_sos(4, 0.3)
    # linearity: filter(a·x) == a·filter(x) from zero state
    y1 = sosfilt_1d(sos, x)
    y2 = sosfilt_1d(sos, a * x)
    np.testing.assert_allclose(y2, a * y1, atol=max(1.0, abs(a)) * 1e-6)
    # state composition: filtering in two chunks with zi handoff equals
    # one pass (the exact property sosfilt_chunked/sosfilt_stream rely on)
    split = data.draw(st.integers(1, len(x) - 1))
    ya, zf = sosfilt_1d(sos, x[:split], zi=sosfilt_zi(sos) * 0.0)
    yb, _ = sosfilt_1d(sos, x[split:], zi=zf)
    np.testing.assert_allclose(np.concatenate([ya, yb]), y1, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(x=_arr(60, 128), data=st.data())
def test_sosfiltfilt_padtype_invariants(x, data):
    """For every padtype: constant input passes through unchanged (the
    extension of a constant is the constant under odd/even/constant
    alike), and batched-vs-1D stay sample-exact on arbitrary input."""
    from xarray_scipy_spark.kernels.dsp import sosfiltfilt_1d, sosfiltfilt_ragged

    sos = butter_sos(4, 0.3)
    padtype = data.draw(st.sampled_from(["odd", "even", "constant", None]))
    c = data.draw(_f64)
    const = np.full(len(x), c)
    y = sosfiltfilt_1d(sos, const, padtype=padtype)
    np.testing.assert_allclose(y, c, atol=1e-8 * max(1.0, abs(c)) + 1e-8)
    ragged = sosfiltfilt_ragged(
        sos, x[None, :], np.array([len(x)]), padtype=padtype
    )
    np.testing.assert_allclose(
        ragged[0], sosfiltfilt_1d(sos, x, padtype=padtype), atol=1e-9
    )


@settings(max_examples=60, deadline=None)
@given(x=_arr(8, 96), num=st.integers(4, 200))
def test_resample_freq_agrees_with_time_domain(x, num):
    """domain='freq' on fft(x) == domain='time' on x, for every (n, num)
    combination — and the output is complex with ~0 imaginary part."""
    from xarray_scipy_spark.kernels.dsp import resample_fourier, resample_fourier_freq

    yt = resample_fourier(x, num)
    yf = resample_fourier_freq(np.fft.fft(x), num)
    assert yf.shape[-1] == num
    scale = max(1.0, np.abs(x).max())
    np.testing.assert_allclose(yf.real, yt, atol=1e-9 * scale)
    np.testing.assert_allclose(yf.imag, 0.0, atol=1e-9 * scale)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_error_bound(h, w, seed):
    """Baseline JPEG with the all-ones quantization table: for ANY
    uint8 grayscale image (any dims — including non-multiples of 8),
    decode(encode(x)) differs from x by at most 3 per pixel: the only
    loss is coefficient quantization rounding (|e_uv| <= 0.5 per
    coefficient, and |IDCT(E)| <= 0.5·(sum_u |a(u)cos|)^2 ≈ 3 in the
    worst case); huffman/entropy/dequant are lossless. Probes MCU
    padding, odd crops, and multi-category DC diffs across the whole
    small-size lattice."""
    from xarray_scipy_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    dec, ww, hh = decode_jpeg(encode_jpeg(img))
    assert (ww, hh) == (w, h)
    assert dec.shape == (h, w)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


@settings(max_examples=60, deadline=None)
@given(x=_arr(1, 48), y=_arr(1, 48))
def test_correlate_kernel_equals_numpy(x, y):
    """correlate(x, y) == convolve(x, y[::-1]) == np.correlate across
    arbitrary lengths (both operand orders, all from the same
    fftconvolve kernel the operator wraps)."""
    got = fftconvolve_1d(x, y[::-1], mode="full")
    ref = np.correlate(x, y, mode="full")
    scale = max(1.0, np.abs(x).max() * np.abs(y).max() * len(x))
    np.testing.assert_allclose(got, ref, atol=1e-9 * scale)


def test_round6_operator_invariants(spark):
    """Cheap structural invariants for the second-wave operators."""
    import numpy as np
    import pandas as pd

    import xarray_scipy_spark as xss
    from xarray_scipy_spark.kernels.dsp import resample_poly_ragged

    rng = np.random.default_rng(23)
    x = rng.standard_normal(64)
    df = spark.createDataFrame(
        pd.DataFrame({"ch": "a", "t": np.arange(64.0), "value": x})
    )
    # resample_poly with up == down is the identity (gcd reduction)
    y, ol = resample_poly_ragged(x[None, :], np.array([64]), 6, 6)
    np.testing.assert_array_equal(y[0, : ol[0]], x)
    # medfilt is idempotent on a constant series and preserves it
    cdf = spark.createDataFrame(
        pd.DataFrame({"ch": "a", "t": np.arange(20.0), "value": 3.25})
    )
    med = (
        xss.operators.medfilt(cdf, by=["ch"], dim="t", kernel_size=3)
        .orderBy("t")
        .toPandas()["value_med"]
        .to_numpy()
    )
    # interior stays constant; zero-padded edges see the implicit zeros
    assert (med[1:-1] == 3.25).all() and med[0] == 3.25 and med[-1] == 3.25
    # wiener with an explicit huge noise floor returns the local mean
    w = (
        xss.operators.wiener(cdf, by=["ch"], dim="t", mysize=3, noise=1e9)
        .orderBy("t")
        .toPandas()["value_wiener"]
        .to_numpy()
    )
    np.testing.assert_allclose(w[1:-1], 3.25, atol=1e-12)
    # savgol deriv=1 of any constant series is identically zero
    sg = (
        xss.operators.savgol_filter(
            cdf, by=["ch"], dim="t", window_length=5, polyorder=2, deriv=1
        )
        .orderBy("t")
        .toPandas()["value_sg"]
        .to_numpy()
    )
    np.testing.assert_allclose(sg, 0.0, atol=1e-9)
    # lfilter with b=[1], a=[1] is the identity
    ident = (
        xss.operators.lfilter([1.0], [1.0], df, by=["ch"], dim="t")
        .orderBy("idx")
        .toPandas()["value"]
        .to_numpy()
    )
    np.testing.assert_allclose(ident, x, atol=1e-12)


@settings(max_examples=60, deadline=None)
@given(
    refl=st.lists(st.floats(-0.95, 0.95), min_size=1, max_size=4),
    taps=st.lists(st.floats(-2, 2), min_size=1, max_size=5),
    data=st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        min_size=40,
        max_size=80,
    ),
)
def test_lfilter_family_properties(refl, taps, data):
    """Random STABLE filters (poles from reflection coefficients via
    the Levinson recursion, so |poles| < 1 by construction):
    superposition, impulse-response convolution identity, and the
    filtfilt forward==backward symmetry."""
    import numpy as np

    from xarray_scipy_spark.kernels import lfilter_1d
    from xarray_scipy_spark.kernels.dsp import filtfilt_ragged

    # reflection -> AR polynomial (Levinson step-up): always minimum phase
    a = np.array([1.0])
    for kk in refl:
        a = np.concatenate([a, [0.0]]) + kk * np.concatenate([[0.0], a[::-1]])
    b = np.asarray(taps, dtype=float)
    x = np.asarray(data, dtype=float)
    n = len(x)
    # superposition: L(x + 2y) == L(x) + 2 L(y)
    y2 = x[::-1].copy()
    lhs = lfilter_1d(b, a, x + 2 * y2)
    rhs = lfilter_1d(b, a, x) + 2 * lfilter_1d(b, a, y2)
    scale = max(1.0, np.abs(lhs).max())
    np.testing.assert_allclose(lhs / scale, rhs / scale, rtol=0, atol=1e-9)
    # causal LTI == conv with impulse response (zero state)
    imp = np.zeros(n)
    imp[0] = 1.0
    h = lfilter_1d(b, a, imp)
    want = np.array([np.dot(h[: j + 1][::-1], x[: j + 1]) for j in range(n)])
    got = lfilter_1d(b, a, x)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=1e-7)
    # filtfilt of a constant is exactly const·(DC gain)² from sample 0:
    # the steady-state zi seeding puts both passes in equilibrium, so no
    # transient ever appears (the property scipy's zi construction exists
    # to guarantee)
    pad = min(3 * max(len(a), len(b)), n - 1)
    c = 2.5
    dc = b.sum() / a.sum()
    ffc = filtfilt_ragged(b, a, np.full((1, n), c), np.array([n]), padlen=pad)[0]
    scale = max(1.0, abs(c * dc * dc))
    np.testing.assert_allclose(
        ffc / scale, np.full(n, c * dc * dc) / scale, rtol=0, atol=1e-8
    )


# --- sketch + introspection invariants (driver-side pure functions) --------


@settings(max_examples=120, deadline=None)
@given(
    counts=st.lists(
        st.tuples(st.integers(-1, 16), st.integers(1, 10_000)),
        min_size=1,
        max_size=40,
    ),
    q=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_quantile_from_histogram_bounds_and_monotone(counts, q):
    from xarray_scipy_spark.pipeline.sketches import quantile_from_histogram

    bins, lo, hi = 16, 0.0, 32.0
    hist = [{"bin": b, "cnt": c} for b, c in counts]
    # dedupe bins (dict rows mimic Spark Row access by key)
    merged: dict[int, int] = {}
    for b, c in counts:
        merged[b] = merged.get(b, 0) + c
    hist = [{"bin": b, "cnt": c} for b, c in merged.items()]
    (v,) = quantile_from_histogram(hist, (q,), lo=lo, hi=hi, bins=bins)
    assert lo <= v <= hi
    # monotone in q
    (v2,) = quantile_from_histogram(
        hist, (min(1.0, q + 0.25),), lo=lo, hi=hi, bins=bins
    )
    assert v2 >= v - 1e-12


@settings(max_examples=80, deadline=None)
@given(
    m_exp=st.sampled_from([4, 8, 12]),
    ranks=st.lists(st.integers(1, 45), min_size=1, max_size=64),
)
def test_hll_estimate_positive_and_scales_with_ranks(m_exp, ranks):
    from xarray_scipy_spark.pipeline.sketches import _RANK_SCALE, hll_estimate

    m = 1 << m_exp
    ranks = ranks[: m - 1]  # leave at least one zero register
    zeros = m - len(ranks)
    rsum = sum(1 << (_RANK_SCALE - r) for r in ranks) + zeros * (1 << _RANK_SCALE)
    est = hll_estimate(m, zeros, rsum)
    assert est > 0
    # raising every rank by 1 (halving each register term) must not
    # decrease the estimate
    rsum_hi = sum(1 << (_RANK_SCALE - (r + 1)) for r in ranks) + zeros * (
        1 << _RANK_SCALE
    )
    assert hll_estimate(m, zeros, rsum_hi) >= est - 1e-9


@settings(max_examples=60, deadline=None)
@given(taps=_arr(1, 24))
def test_freqz_dc_equals_tap_sum(taps):
    from xarray_scipy_spark.kernels import freqz

    _, h = freqz(taps, worN=4)
    # H(0) = sum of FIR taps, exactly
    np.testing.assert_allclose(
        h[0], np.sum(taps), rtol=1e-12, atol=1e-9 * max(1.0, np.abs(taps).sum())
    )
