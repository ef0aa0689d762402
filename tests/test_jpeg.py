"""Baseline JPEG codec tests (operators/jpeg.py): exact constant-block
contract, independent-IDCT equivalence, lossy roundtrip bounds on the
content classes JPEG is built for, and loud rejection of unsupported
variants."""

from __future__ import annotations

import math

import numpy as np
import pytest

from scalable_etl_spark.operators.jpeg import (
    JPEG_H,
    JPEG_W,
    _dct_matrix,
    decode_jpeg,
    encode_jpeg,
    jpeg_const_value,
    synthetic_jpeg,
)
from scalable_etl_spark.operators.multimodal import decode_image


def test_constant_blocks_decode_exactly():
    """The oracle contract: constant gray with an even offset from 128
    survives the full lossy pipeline bit-exactly (DC-only spectrum,
    q[0,0]=16 divides 8*(val-128)). Every doc_id class covered."""
    for d in range(25):
        img = decode_jpeg(synthetic_jpeg(d))
        assert img.shape == (JPEG_H, JPEG_W)
        assert (img == jpeg_const_value(d)).all()
    # dispatch through the generic entry point too (0xFFD8 magic)
    assert (decode_image(synthetic_jpeg(3)) == jpeg_const_value(3)).all()


def test_idct_matches_direct_formula():
    """The codec's matrix IDCT must equal the T.81 Annex A direct
    cosine-sum definition on random coefficient blocks — an
    implementation-independent check that the transform (not just the
    roundtrip) is right."""
    rng = np.random.default_rng(11)
    M = _dct_matrix()
    for _ in range(5):
        coef = rng.integers(-200, 200, size=(8, 8)).astype(np.float64)
        via_matrix = M.T @ coef @ M
        direct = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = math.sqrt(0.125) if u == 0 else 0.5
                        cv = math.sqrt(0.125) if v == 0 else 0.5
                        s += (
                            cu * cv * coef[u, v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                direct[x, y] = s
        assert np.allclose(via_matrix, direct, atol=1e-9)


def test_roundtrip_error_bounds():
    """Lossy but bounded: smooth gradients (JPEG's design center)
    reconstruct within a few levels; arbitrary noise stays within the
    worst-case quantization envelope. Non-multiple-of-8 dims crop
    correctly."""
    xs = np.linspace(0, 255, 32)
    smooth = np.clip(np.add.outer(xs, xs) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth))
    assert out.shape == smooth.shape
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 8

    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy))
    assert out.shape == (24, 17)
    # worst-case per-pixel bound from the Annex K table: sum of
    # per-coefficient quant errors projected through unit-bounded basis
    assert np.abs(out.astype(int) - noisy.astype(int)).max() <= 130

    color = np.stack([smooth, smooth.T, np.full((32, 32), 100, np.uint8)],
                     axis=2)
    outc = decode_jpeg(encode_jpeg(color))
    assert outc.shape == color.shape
    assert np.abs(outc.astype(int) - color.astype(int)).max() <= 16


def test_bitstream_is_conforming_baseline():
    """Marker-level sanity: SOI/APP0/DQT/SOF0/DHT/SOS/EOI present and
    the entropy stream is byte-stuffed (no bare 0xFF before EOI)."""
    payload = synthetic_jpeg(1)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in payload, marker
    sos = payload.index(b"\xff\xda")
    ln = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    entropy = payload[sos + 2 + ln : -2]
    i = 0
    while i < len(entropy):
        if entropy[i] == 0xFF:
            assert entropy[i + 1] == 0x00, "unstuffed 0xFF in entropy data"
            i += 2
        else:
            i += 1


def test_rejects_unsupported_variants():
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + good[2:])
    # progressive SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(prog)
    # subsampled: patch the SOF component sampling byte (0x11 -> 0x22).
    # SOF0 layout: marker(2) len(2) precision(1) h(2) w(2) ncomp(1)
    # then per-component [id, h/v, tq] -> sampling byte is offset 11.
    sof = good.index(b"\xff\xc0")
    sub = bytearray(good)
    sub[sof + 11] = 0x22
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg(bytes(sub))
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4] + b"\xff\xd9")


def test_png_jpeg_property_roundtrips():
    """Hypothesis sweep: PNG roundtrips BIT-EXACTLY for arbitrary
    shapes/channels; JPEG constant blocks decode exactly for every
    even-offset value; JPEG stays within the quantization envelope on
    random content."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from scalable_etl_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.sampled_from([1, 2, 3, 4]),
        st.integers(0, 2**32 - 1),
    )
    def png_roundtrip(h, w, ch, seed):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        a = a[:, :, 0] if ch == 1 else a
        out = decode_png(encode_png(a))
        assert out.shape == a.shape and (out == a).all()

    @settings(max_examples=15, deadline=None)
    @given(st.integers(-12, 12), st.integers(1, 3), st.integers(1, 3))
    def jpeg_constant_exact(k, bh, bw):
        val = 128 + 2 * k
        img = np.full((bh * 8, bw * 8), val, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert (out == val).all()

    @settings(max_examples=10, deadline=None)
    @given(st.integers(8, 40), st.integers(8, 40), st.integers(0, 2**32 - 1))
    def jpeg_bounded(h, w, seed):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(a))
        assert out.shape == a.shape
        assert np.abs(out.astype(int) - a.astype(int)).max() <= 130

    png_roundtrip()
    jpeg_constant_exact()
    jpeg_bounded()
