"""VP8 (lossy WebP) keyframe decoder tests — RFC 6386 conformance.

Validation strategy, strongest-first:

1. **Bit-exact vs libwebp's reference decoder.** The container ships
   ``libwebp.so.7``; ``operators/webp_native.py`` bridges its simple
   public API over ctypes. The test encodes REAL libwebp lossy
   streams over a grid of sizes (incl. non-multiple-of-16, forcing
   edge macroblocks), qualities 5..99 (forcing segmentation on/off,
   both loop-filter strengths, B_PRED and 16x16 modes), and content
   classes (structured, gradient, noise, flat), then pins
   ``decode_vp8_yuv`` EQUAL to ``WebPDecodeYUV`` on every plane of
   every stream. The in-loop deblocking filter is part of the
   normative output, so exactness covers it too.

2. **A real-world fixture**: CPython's ``python.webp`` (committed at
   tests/data/python.webp; origin: the CPython test suite, PSF
   license) is a libwebp-encoded VP8X + ALPH + 'VP8 ' file — YUV must
   match libwebp bit-exactly, alpha must match WebPDecodeRGBA's alpha
   channel, and the full ``decode_webp`` RGBA path must compose both.

3. **Hermetic regression pins** (run even without libwebp): committed
   payloads encoded by libwebp 1.2.4 with pinned per-plane checksums,
   guarding the two historical decoder bugs — the loop-filter tap
   off-by-one (``_common_adjust`` fed ``idx[1:7]``) and the swapped
   TM_PRED corner convention at frame edges — against regression on
   systems where the oracle library is absent.

Reference parity anchor: the reference engine delegates image decode
to external codecs (its media columns are opaque binaries); this repo
decodes in-process so media queries stay hermetic.
"""

from __future__ import annotations

import base64
import hashlib
import os
import struct

import numpy as np
import pytest

from scalable_etl_spark.operators import webp_native
from scalable_etl_spark.operators.vp8 import decode_vp8_yuv, yuv420_to_rgb
from scalable_etl_spark.operators.vp8l import decode_webp

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "python.webp")

needs_libwebp = pytest.mark.skipif(
    not webp_native.available(), reason="libwebp not loadable"
)


def _chunks(payload: bytes) -> dict[bytes, bytes]:
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    i, out = 12, {}
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        out[tag] = payload[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    return out


def _structured(w: int, h: int) -> np.ndarray:
    rng = np.arange(h * w * 3, dtype=np.int64)
    return ((rng * 7 + (rng // 3) * 13) % 256).astype(np.uint8).reshape(
        h, w, 3
    )


def _gradient(w: int, h: int) -> np.ndarray:
    g = np.clip(
        np.add.outer(np.arange(h) * 2, np.arange(w)), 0, 255
    ).astype(np.uint8)
    return np.ascontiguousarray(g[:, :, None].repeat(3, axis=2))


def _noise(w: int, h: int) -> np.ndarray:
    return np.random.RandomState(7).randint(
        0, 256, (h, w, 3)
    ).astype(np.uint8)


def _flat(w: int, h: int) -> np.ndarray:
    return np.full((h, w, 3), 77, np.uint8)


@needs_libwebp
@pytest.mark.parametrize(
    "w,h",
    [(16, 16), (32, 48), (17, 23), (64, 64), (5, 7), (33, 65)],
)
@pytest.mark.parametrize("q", [5, 30, 75, 95])
def test_bit_exact_vs_libwebp_grid(w, h, q):
    payload = webp_native.encode_rgb(_structured(w, h), q)
    Y, U, V = webp_native.decode_yuv(payload)
    y, u, v = decode_vp8_yuv(_chunks(payload)[b"VP8 "])
    assert np.array_equal(Y, y), (w, h, q, "Y")
    assert np.array_equal(U, u), (w, h, q, "U")
    assert np.array_equal(V, v), (w, h, q, "V")


@needs_libwebp
@pytest.mark.parametrize("mk", [_gradient, _noise, _flat])
@pytest.mark.parametrize("q", [20, 60, 85])
def test_bit_exact_vs_libwebp_content_classes(mk, q):
    payload = webp_native.encode_rgb(mk(40, 24), q)
    Y, U, V = webp_native.decode_yuv(payload)
    y, u, v = decode_vp8_yuv(_chunks(payload)[b"VP8 "])
    assert np.array_equal(Y, y) and np.array_equal(U, u) and (
        np.array_equal(V, v)
    ), (mk.__name__, q)


@needs_libwebp
def test_python_webp_fixture_yuv_and_alpha_bit_exact():
    payload = open(FIXTURE, "rb").read()
    ch = _chunks(payload)
    assert set(ch) == {b"VP8X", b"ALPH", b"VP8 "}
    Y, U, V = webp_native.decode_yuv(payload)
    y, u, v = decode_vp8_yuv(ch[b"VP8 "])
    assert np.array_equal(Y, y) and np.array_equal(U, u) and (
        np.array_equal(V, v)
    )
    rgba_native = webp_native.decode_rgba(payload)
    out = decode_webp(payload)  # full dispatch: VP8 + ALPH compose
    assert out.shape == rgba_native.shape == (16, 16, 4)
    # alpha is losslessly coded -> exact; RGB goes through the repo's
    # yuv420_to_rgb (libwebp uses its own fancy upsampler, so RGB is
    # equivalent-but-not-identical by documented design)
    assert np.array_equal(out[:, :, 3], rgba_native[:, :, 3])
    assert np.array_equal(out[:, :, :3], yuv420_to_rgb(y, u, v))


@needs_libwebp
def test_native_decoder_seam_matches_pure_python_where_exact():
    """native_webp_decoder (the decode_image_stats swap-in) agrees
    with the pure-python path exactly on the LOSSLESS leg; on lossy
    files both must at least agree on shape + alpha (RGB differs only
    by the documented upsampler choice)."""
    native = webp_native.native_webp_decoder()
    assert native is not None
    img = _structured(12, 9)
    lossless = webp_native.encode_lossless_rgb(img)
    assert np.array_equal(native(lossless), decode_webp(lossless))
    assert np.array_equal(decode_webp(lossless), img)
    lossy = webp_native.encode_rgb(img, 80)
    a, b = native(lossy), decode_webp(lossy)
    assert a.shape == b.shape == (9, 12, 3)


# --- hermetic regression pins (no libwebp needed) -------------------
#
# Payloads produced ONCE by libwebp 1.2.4 (WebPEncodeRGB of the
# deterministic content above), committed as base64; expected values
# are sha256 over the concatenated Y|U|V planes, verified bit-exact
# against WebPDecodeYUV at pin time (and continuously by the grid
# tests whenever libwebp is present). q=30 exercises segmentation +
# strong loop filtering (the off-by-one bug's domain); 17x23 and
# (0,1)-style top-row TM_PRED MBs exercise the corner-convention bug.

from tests.vp8_pins import PINS  # generated by tools/gen_vp8_pins.py


@pytest.mark.parametrize("name,b64,sha", PINS, ids=[p[0] for p in PINS])
def test_pinned_payloads_decode_exact(name, b64, sha):
    payload = base64.b64decode(b64)
    y, u, v = decode_vp8_yuv(_chunks(payload)[b"VP8 "])
    digest = hashlib.sha256(
        y.tobytes() + u.tobytes() + v.tobytes()
    ).hexdigest()
    assert digest == sha, name


@needs_libwebp
def test_pinned_payloads_match_libwebp():
    """The committed pins themselves stay bit-exact vs the live
    library — guards against a stale pin masking a real divergence."""
    from tests.vp8_pins import PINS

    for name, b64, sha in PINS:
        payload = base64.b64decode(b64)
        Y, U, V = webp_native.decode_yuv(payload)
        digest = hashlib.sha256(
            Y.tobytes() + U.tobytes() + V.tobytes()
        ).hexdigest()
        assert digest == sha, name
