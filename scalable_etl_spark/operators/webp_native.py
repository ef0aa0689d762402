"""Optional ctypes bridge to the system ``libwebp`` shared library.

Two roles, both OPTIONAL (every caller degrades gracefully when the
library is absent):

1. **Native decode swap-in** for the media operators: the pure-numpy
   codecs in ``vp8.py`` / ``vp8l.py`` are the hermetic default, but at
   real scale a native codec is ~100x faster per byte.
   ``decode_image_stats`` (operators/multimodal.py) accepts a decoder
   callable; ``native_webp_decoder()`` builds one from libwebp when
   loadable. The outputs are asserted identical where both exist
   (tests/test_vp8.py) — libwebp's YUV API reproduces the normative
   VP8 reconstruction this repo's decoder is pinned against, and its
   lossless path is bit-exact by construction.

2. **Test oracle**: tests/test_vp8.py uses ``encode_rgb`` to produce
   REAL libwebp-encoded lossy streams at several sizes / qualities /
   content classes and pins ``operators/vp8.decode_vp8_yuv`` bit-exact
   against ``decode_yuv`` (libwebp's ``WebPDecodeYUV``).

Only the *simple* public API (WebPDecode{YUV,RGBA}, WebPEncodeRGB,
WebPEncodeLosslessRGB, WebPGetInfo, WebPFree) is used — no
ABI-version-sensitive config structs, so this works across libwebp
versions without pinning the decoder ABI number.

Reference parity anchor: the reference engine delegates media decode
to external codec libraries outright; this repo keeps the hermetic
pure-numpy decoders as the default and makes the native library an
optional, output-identical fast path.
"""

from __future__ import annotations

import ctypes
from ctypes import (
    POINTER,
    byref,
    c_char_p,
    c_float,
    c_int,
    c_size_t,
    c_uint8,
)

import numpy as np

_LIB_NAMES = ("libwebp.so.7", "libwebp.so", "libwebp.dylib", "webp")
_lib = None
_lib_tried = False


def load_libwebp():
    """The libwebp CDLL with argtypes configured, or None when no
    system libwebp is loadable (hermetic environments). Cached."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    for name in _LIB_NAMES:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = c_int
            lib.WebPGetInfo.argtypes = [
                c_char_p, c_size_t, POINTER(c_int), POINTER(c_int),
            ]
            lib.WebPDecodeYUV.restype = POINTER(c_uint8)
            lib.WebPDecodeYUV.argtypes = (
                [c_char_p, c_size_t]
                + [POINTER(c_int)] * 2
                + [POINTER(POINTER(c_uint8))] * 2
                + [POINTER(c_int)] * 2
            )
            lib.WebPDecodeRGBA.restype = POINTER(c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                c_char_p, c_size_t, POINTER(c_int), POINTER(c_int),
            ]
            lib.WebPEncodeRGB.restype = c_size_t
            lib.WebPEncodeRGB.argtypes = [
                c_char_p, c_int, c_int, c_int, c_float,
                POINTER(POINTER(c_uint8)),
            ]
            lib.WebPEncodeLosslessRGB.restype = c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                c_char_p, c_int, c_int, c_int,
                POINTER(POINTER(c_uint8)),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue  # a libwebp too old to export the simple API
        _lib = lib
        break
    return _lib


def available() -> bool:
    return load_libwebp() is not None


def decode_yuv(payload: bytes):
    """(Y, U, V) uint8 planes of shapes (h, w) / ((h+1)//2, (w+1)//2)
    via ``WebPDecodeYUV`` — libwebp's normative VP8 reconstruction,
    the oracle ``decode_vp8_yuv`` is pinned bit-exact against."""
    lib = load_libwebp()
    if lib is None:
        raise RuntimeError("libwebp not loadable")
    w, h = c_int(), c_int()
    u, v = POINTER(c_uint8)(), POINTER(c_uint8)()
    stride, uv_stride = c_int(), c_int()
    yp = lib.WebPDecodeYUV(
        payload, len(payload), byref(w), byref(h), byref(u),
        byref(v), byref(stride), byref(uv_stride),
    )
    if not yp:
        raise ValueError("libwebp: WebPDecodeYUV failed")
    try:
        Y = np.ctypeslib.as_array(
            yp, shape=(h.value, stride.value)
        )[:, : w.value].copy()
        cw, ch = (w.value + 1) // 2, (h.value + 1) // 2
        U = np.ctypeslib.as_array(
            u, shape=(ch, uv_stride.value)
        )[:, :cw].copy()
        V = np.ctypeslib.as_array(
            v, shape=(ch, uv_stride.value)
        )[:, :cw].copy()
    finally:
        lib.WebPFree(yp)  # one allocation backs all three planes
    return Y, U, V


def decode_rgba(payload: bytes) -> np.ndarray:
    """(h, w, 4) uint8 RGBA via ``WebPDecodeRGBA`` (lossless path and
    the ALPH alpha plane are exact; the lossy RGB conversion uses
    libwebp's own upsampler — NOT the repo's ``yuv420_to_rgb``)."""
    lib = load_libwebp()
    if lib is None:
        raise RuntimeError("libwebp not loadable")
    w, h = c_int(), c_int()
    ptr = lib.WebPDecodeRGBA(payload, len(payload), byref(w), byref(h))
    if not ptr:
        raise ValueError("libwebp: WebPDecodeRGBA failed")
    try:
        out = np.ctypeslib.as_array(
            ptr, shape=(h.value, w.value, 4)
        ).copy()
    finally:
        lib.WebPFree(ptr)
    return out


def encode_rgb(px: np.ndarray, quality: float) -> bytes:
    """Lossy-encode an (h, w, 3) uint8 RGB array at ``quality``
    (0..100) into a simple 'VP8 ' WebP file. Test-fixture producer."""
    lib = load_libwebp()
    if lib is None:
        raise RuntimeError("libwebp not loadable")
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    out = POINTER(c_uint8)()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(px).tobytes(), w, h, w * 3,
        c_float(quality), byref(out),
    )
    if n == 0:
        raise ValueError("libwebp: WebPEncodeRGB failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def encode_lossless_rgb(px: np.ndarray) -> bytes:
    """Losslessly encode an (h, w, 3) uint8 RGB array into a 'VP8L'
    WebP file. Test-fixture producer."""
    lib = load_libwebp()
    if lib is None:
        raise RuntimeError("libwebp not loadable")
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    out = POINTER(c_uint8)()
    n = lib.WebPEncodeLosslessRGB(
        np.ascontiguousarray(px).tobytes(), w, h, w * 3, byref(out)
    )
    if n == 0:
        raise ValueError("libwebp: WebPEncodeLosslessRGB failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def native_webp_decoder():
    """A ``payload -> (h, w, 3|4) uint8`` WebP decoder backed by
    libwebp, or None when the library is absent. Drop-in for the
    ``decoder=`` seam of ``decode_image_stats``: output matches the
    pure-python ``vp8l.decode_webp`` contract (RGB when fully opaque,
    RGBA otherwise) so the two paths are interchangeable — asserted
    identical for the lossless/alpha parts and YUV-equivalent for the
    lossy part in tests/test_vp8.py."""
    if not available():
        return None

    def _decode(payload: bytes) -> np.ndarray:
        rgba = decode_rgba(bytes(payload))
        if bool((rgba[:, :, 3] == 255).all()):
            return np.ascontiguousarray(rgba[:, :, :3])
        return rgba

    return _decode
