"""Lossless WebP (VP8L) codec tests — the GIF/PNG test strategy:
random-raster byte-lossless round-trips per decoder feature, edge
geometries, header/gate errors, and the image_decoder integration."""

from __future__ import annotations

import numpy as np
import pytest

from xarray_scipy_spark.pipeline.webp import (
    _BitReader,
    _BitWriter,
    _PrefixCode,
    _prefix_value,
    _write_prefix_code,
    decode_webp,
    encode_webp_lossless,
)

rng = np.random.default_rng(20260814)


def _roundtrip(px, **kw):
    dec, w, h = decode_webp(encode_webp_lossless(px, **kw))
    assert dec.shape == px.shape
    assert (dec == px).all()
    assert (w, h) == (px.shape[1], px.shape[0])


def test_plain_rgb_roundtrip():
    _roundtrip(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8))


def test_rgba_roundtrip_and_alpha_hint():
    px = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    dec, _, _ = decode_webp(encode_webp_lossless(px))
    assert dec.shape[2] == 4  # alpha hint set -> RGBA out
    _roundtrip(px)


def test_subtract_green_transform():
    _roundtrip(
        rng.integers(0, 256, (6, 5, 3), dtype=np.uint8), subtract_green=True
    )


def test_predictor_transform_left_mode():
    _roundtrip(rng.integers(0, 256, (19, 23, 3), dtype=np.uint8), predictor=True)


@pytest.mark.parametrize("elem", [(16, 8, 4), (240, 200, 130), (255, 1, 128)])
def test_color_transform_signed_deltas(elem):
    _roundtrip(
        rng.integers(0, 256, (7, 9, 3), dtype=np.uint8), color_transform=elem
    )


def test_color_cache_hits():
    base = rng.integers(0, 4, (8, 8, 3), dtype=np.uint8) * 60
    _roundtrip(base, cache_bits=4)


def test_lz77_runs():
    px = np.tile(rng.integers(0, 256, (1, 3, 3), dtype=np.uint8), (8, 5, 1))
    _roundtrip(px, lz77=True)


@pytest.mark.parametrize("ncolors", [2, 4, 16, 200])
def test_palette_with_bundling(ncolors):
    idx = rng.integers(0, ncolors, (9, 13), dtype=np.int64)
    colors = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    _roundtrip(colors[idx], palette=True)


def test_stacked_transforms_roundtrip():
    _roundtrip(
        rng.integers(0, 256, (17, 19, 3), dtype=np.uint8),
        predictor=True,
        color_transform=(16, 8, 4),
        subtract_green=True,
    )


def test_cache_plus_lz77_plus_subtract_green():
    px = np.tile(rng.integers(0, 5, (2, 4, 3), dtype=np.uint8) * 50, (5, 3, 1))
    _roundtrip(px, subtract_green=True, cache_bits=3, lz77=True)


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (1, 40, 3), (40, 1, 3), (2, 2, 3)]
)
def test_edge_geometries(shape):
    _roundtrip(rng.integers(0, 256, shape, dtype=np.uint8))


def test_gray_2d_input_promotes_to_rgb():
    g = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    dec, _, _ = decode_webp(encode_webp_lossless(g))
    assert dec.shape == (5, 6, 3)
    assert (dec == g[:, :, None]).all()


def test_bad_container_and_signature():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp(b"NOPE" + b"\x00" * 20)
    good = encode_webp_lossless(np.zeros((2, 2, 3), np.uint8))
    bad = good[:20] + b"\x00" + good[21:]  # clobber the 0x2f signature
    with pytest.raises(ValueError, match="signature"):
        decode_webp(bad)


def test_lossy_vp8_gates_loudly():
    body = b"\x00" * 10
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    payload = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(payload)


def test_plane_code_table_structure():
    """The §4.2.2 table transcription: 120 distinct bytes decoding to
    120 distinct CAUSAL (dx, dy) pairs (already-decoded pixels only),
    dy in [0, 7], dx in [-7, 8], ordered by non-decreasing distance² —
    the spec lists the nearest neighbors first."""
    from xarray_scipy_spark.pipeline.webp import (
        _CODE_TO_PLANE,
        _plane_code_to_distance,
    )

    assert len(_CODE_TO_PLANE) == 120 == len(set(_CODE_TO_PLANE))
    pairs = [(8 - (b & 0xF), b >> 4) for b in _CODE_TO_PLANE]
    assert len(set(pairs)) == 120
    assert all(0 <= dy <= 7 and -7 <= dx <= 8 for dx, dy in pairs)
    assert all(dy > 0 or dx > 0 for dx, dy in pairs)
    d2 = [dx * dx + dy * dy for dx, dy in pairs]
    assert all(a <= b for a, b in zip(d2, d2[1:]))
    # spot values: code 1 = one row up, code 2 = one pixel left, and
    # the >= 1 clamp for narrow images
    assert _plane_code_to_distance(9, 1) == 9
    assert _plane_code_to_distance(9, 2) == 1
    assert _plane_code_to_distance(2, 4) == 1  # (-1, 1) on w=2 -> 1


def test_short_distance_roundtrip_vertical_runs():
    """short_dist=True emits vertical runs through 2D-neighborhood
    aliases; the decoder maps them back via the table. The alias
    stream must be smaller AND byte-lossless."""
    base = rng.integers(0, 256, (1, 9, 3), dtype=np.uint8)
    px = np.tile(base, (12, 1, 1))
    enc_plain = encode_webp_lossless(px, lz77=True)
    enc_short = encode_webp_lossless(px, lz77=True, short_dist=True)
    assert enc_short != enc_plain and len(enc_short) < len(enc_plain)
    dec, w, h = decode_webp(enc_short)
    assert (w, h) == (9, 12) and (dec == px).all()


def test_short_distance_with_stacked_features():
    """Alias emission composes with cache/transform knobs and the
    horizontal dist=1 alias (plane code 2)."""
    mix = np.tile(rng.integers(0, 256, (1, 4, 3), dtype=np.uint8), (3, 6, 1))
    for kw in ({}, {"cache_bits": 3}, {"subtract_green": True}):
        dec, _, _ = decode_webp(
            encode_webp_lossless(mix, lz77=True, short_dist=True, **kw)
        )
        assert (dec == mix).all(), kw


def test_short_distance_before_image_start_rejected():
    """Hand-assemble a stream whose LZ77 copy uses distance code 1
    ((0, 1) = one row up) at pixel 1 of a 2-wide image — the alias
    resolves to distance 2 > pixels decoded, a malformed stream."""
    bw = _BitWriter()
    bw.write(1, 14)  # w-1 -> 2
    bw.write(0, 14)  # h-1 -> 1
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    glens = [0] * 280
    glens[7] = 1
    glens[256] = 1  # length code 0
    g_map = _write_prefix_code(bw, glens)
    one = [0] * 256
    one[9] = 1
    maps = [_write_prefix_code(bw, list(one)) for _ in range(3)]
    dlens = [0] * 40
    dlens[0] = 1  # distance prefix code 0 -> distance code 1 (<= 120)
    d_map = _write_prefix_code(bw, dlens)

    def emit(m, s):
        c, n = m[s]
        for i in range(n - 1, -1, -1):
            bw.write((c >> i) & 1, 1)

    emit(g_map, 7)  # literal pixel
    for m in maps:
        emit(m, 9)
    emit(g_map, 256)  # copy, length 1
    emit(d_map, 0)  # distance code 1 -> neighborhood alias
    stream = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + len(stream).to_bytes(4, "little") + stream
    payload = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
    with pytest.raises(ValueError, match="before image start"):
        decode_webp(payload)


def test_prefix_value_formula_inverts_encoder():
    from xarray_scipy_spark.pipeline.webp import _len_prefix

    for v in list(range(1, 70)) + [121, 500, 4096]:
        code, extra, ebits = _len_prefix(v)
        bw = _BitWriter()
        bw.write(ebits, extra)
        br = _BitReader(bw.getvalue() or b"\x00")
        assert _prefix_value(br, code) == v, v


def test_prefix_code_roundtrip_via_writer():
    """Normal-form code lengths written by the encoder parse back to
    the identical canonical code (incl. gaps and the 18-code tail)."""
    from xarray_scipy_spark.pipeline.webp import _read_prefix_code

    lengths = [0] * 280
    for s, l in {0: 2, 1: 2, 7: 3, 8: 3, 100: 3, 256: 3}.items():
        lengths[s] = l
    bw = _BitWriter()
    code_map = _write_prefix_code(bw, lengths)
    br = _BitReader(bw.getvalue())
    code = _read_prefix_code(br, 280)
    for sym, (c, n) in code_map.items():
        b2 = _BitWriter()
        for i in range(n - 1, -1, -1):
            b2.write((c >> i) & 1, 1)
        assert code.read(_BitReader(b2.getvalue() or b"\x00")) == sym


def test_image_decoder_integration():
    from xarray_scipy_spark.pipeline import image_decoder

    d = 123
    w, h = 4 + d % 5, 3 + d % 4
    px = ((d * 31 + np.arange(3 * w * h) * 7) % 256).astype(np.uint8).reshape(
        h, w, 3
    )
    feats = image_decoder(
        encode_webp_lossless(px, subtract_green=True, cache_bits=4), 5
    )
    exp = [px[:, :, c].mean() for c in range(3)] + [float(w), float(h)]
    assert feats == pytest.approx(exp)


# --- property tests: any raster × any feature combo round-trips -----------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    channels=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
    subtract_green=st.booleans(),
    predictor=st.booleans(),
    cache_bits=st.sampled_from([0, 3]),
    lz77=st.booleans(),
    short_dist=st.booleans(),
)
def test_webp_roundtrip_property(
    h, w, channels, seed, subtract_green, predictor, cache_bits, lz77,
    short_dist,
):
    r = np.random.default_rng(seed)
    # low-cardinality values make both horizontal and vertical runs
    # likely, so the alias path is actually exercised
    px = (r.integers(0, 4, (h, w, channels)) * 80).astype(np.uint8)
    dec, ww, hh = decode_webp(
        encode_webp_lossless(
            px,
            subtract_green=subtract_green,
            predictor=predictor,
            cache_bits=cache_bits,
            lz77=lz77,
            short_dist=short_dist,
        )
    )
    assert (ww, hh) == (w, h)
    assert dec.shape == px.shape
    assert (dec == px).all()


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    ncolors=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_webp_palette_roundtrip_property(h, w, ncolors, seed):
    r = np.random.default_rng(seed)
    colors = r.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = r.integers(0, ncolors, (h, w))
    px = colors[idx]
    dec, _, _ = decode_webp(encode_webp_lossless(px, palette=True))
    assert (dec == px).all()
