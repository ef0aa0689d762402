"""VP8L (lossless WebP) codec tests — pure-numpy bitstream machinery.

Validation strategy mirrors the PNG/JPEG codecs (fixture round-trips
through the closed-form oracle) PLUS one thing they couldn't have: a
REAL libwebp-encoded VP8L stream. CPython's test suite ships
``python.webp`` (a lossy+alpha file whose ALPH chunk is a headerless
VP8L bitstream produced by libwebp) — decoding it exercises normal
prefix codes, meta prefix codes (entropy image), the color-indexing
transform with sub-byte pixel bundling, and 40 real LZ77
backreferences through the 2D distance mapping. A wrong distance
table, canonical-code ordering, or transform inverse would shred the
plane; instead it must reproduce a clean bimodal logo silhouette.
"""

from __future__ import annotations

import glob

import numpy as np
import pytest

from scalable_etl_spark.operators.vp8l import (
    _DIST_MAP,
    BitReader,
    BitWriter,
    PrefixCode,
    decode_alpha_chunk,
    decode_webp,
    encode_vp8l,
)


def test_bit_io_roundtrip():
    bw = BitWriter()
    vals = [(0b101, 3), (0, 1), (0x3FFF, 14), (7, 3), (1, 1), (200, 8)]
    for v, n in vals:
        bw.write(v, n)
    br = BitReader(bw.tobytes())
    assert [br.read(n) for _, n in vals] == [v for v, _ in vals]


def test_canonical_prefix_code_matches_deflate_ordering():
    # lengths {A:2, B:1, C:3, D:3} -> canonical: B=0, A=10, C=110, D=111
    code = PrefixCode([2, 1, 3, 3])
    assert code.table == {(1, 0): 1, (2, 2): 0, (3, 6): 2, (3, 7): 3}
    bw = BitWriter()
    for sym, (c, ln) in sorted(code.encode_map().items()):
        bw.write_code(c, ln)
    br = BitReader(bw.tobytes())
    assert [code.read(br) for _ in range(4)] == [0, 1, 2, 3]


def test_kraft_violations_rejected():
    with pytest.raises(ValueError):
        PrefixCode([1, 1, 1])  # oversubscribed
    with pytest.raises(ValueError):
        PrefixCode([2, 2, 2])  # incomplete
    assert PrefixCode([0, 5, 0]).read(BitReader(b"")) == 1  # single: 0 bits


def test_dist_map_matches_spec_table():
    # the first rows of the spec's explicit 120-entry table
    assert _DIST_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    # domain bounds (code-review regression: a dy<=8 / |dx|<=8 domain
    # diverges from libwebp's plane_to_code_lut at code 97, which must
    # be (8, 0), not (0, 8)); the dy 0..7 x dx -7..8 domain holds
    # EXACTLY 120 offsets, so the closed form IS the whole table
    assert _DIST_MAP[96] == (8, 0)
    assert max(dy for _, dy in _DIST_MAP) == 7
    assert min(dx for dx, _ in _DIST_MAP) == -7
    assert max(dx for dx, _ in _DIST_MAP) == 8
    assert _DIST_MAP[-1] == (8, 7)


def test_clamp_add_subtract_half_truncates_toward_zero():
    """Predictor mode 13 (code-review regression): C division truncates
    toward zero; Python floor would predict one less for negative odd
    deltas (L=0, T=20, TL=15 -> ave=10, delta=-5 -> 10 + (-2) = 8,
    not 10 + (-3) = 7)."""
    from scalable_etl_spark.operators.vp8l import _predict

    flat = np.zeros(8, dtype=np.uint32)
    w = 4
    flat[0] = 0xFF0F0F0F  # TL: channels 15 (alpha 255)
    flat[1] = 0xFF141414  # T: channels 20
    flat[4] = 0xFF000000  # L: channels 0
    pred = _predict(13, flat, 5, w)
    assert (pred >> 16) & 0xFF == 8
    assert (pred >> 8) & 0xFF == 8
    assert pred & 0xFF == 8


@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("use_lz77", [False, True])
def test_roundtrip_shapes(subtract_green, use_lz77):
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (1, 9), (6, 1), (4, 6), (16, 16)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if use_lz77 and w >= 4:
            img[:, 1:4] = img[:, :1]  # adjacent runs -> real backrefs
        out = decode_webp(
            encode_vp8l(img, subtract_green=subtract_green, use_lz77=use_lz77)
        )
        assert out.shape == (h, w, 3)
        assert (out == img).all(), (subtract_green, use_lz77, h, w)


def test_lz77_stream_actually_contains_backrefs():
    img = np.full((4, 8, 3), 77, dtype=np.uint8)
    with_refs = encode_vp8l(img, use_lz77=True)
    without = encode_vp8l(img, use_lz77=False)
    assert len(with_refs) < len(without)
    assert (decode_webp(with_refs) == img).all()


def _find_real_webp() -> str | None:
    pats = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/**/python.webp",
        recursive=True,
    )
    return pats[0] if pats else None


def test_real_libwebp_alpha_stream_decodes():
    """Compliance fixture: ALPH chunk of CPython's python.webp is a
    genuine libwebp-produced VP8L stream (color-indexing transform,
    meta prefix codes, 40 LZ77 backrefs through the 2D distance map).
    The decoded 16x16 alpha plane must be the logo mask: strongly
    bimodal and structured, not noise."""
    path = _find_real_webp()
    if path is None:
        pytest.skip("no real webp fixture on this system")
    b = open(path, "rb").read()
    assert b[:4] == b"RIFF" and b[8:12] == b"WEBP"
    i, chunks = 12, {}
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        chunks[tag] = b[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    vp8x = chunks[b"VP8X"]
    w = int.from_bytes(vp8x[4:7], "little") + 1
    h = int.from_bytes(vp8x[7:10], "little") + 1
    plane = decode_alpha_chunk(chunks[b"ALPH"], w, h)
    assert plane.shape == (h, w) == (16, 16)
    # bimodal mask: the two extreme values dominate
    frac_extreme = float(np.mean((plane == 0) | (plane == 255)))
    assert frac_extreme > 0.5, frac_extreme
    # structured, not noise: the logo's top edge is transparent at
    # the corners and opaque mid-row (matches the rendered silhouette)
    assert plane[0, 0] == 0 and plane[0, 15] == 0
    assert plane[0, 6] > 128 and plane[0, 8] > 128


def test_lossy_webp_decodes_through_dispatch():
    """Round 10: lossy 'VP8 ' chunks decode natively (operators/vp8.py,
    pinned bit-exact vs libwebp in tests/test_vp8.py) — the full
    VP8X+ALPH+VP8 fixture composes the lossy frame with its VP8L-coded
    alpha plane into RGBA."""
    path = _find_real_webp()
    if path is None:
        pytest.skip("no real webp fixture on this system")
    out = decode_webp(open(path, "rb").read())
    assert out.shape == (16, 16, 4)
    frac_extreme = float(np.mean((out[:, :, 3] == 0) | (out[:, :, 3] == 255)))
    assert frac_extreme > 0.5, frac_extreme


def test_decode_image_dispatches_webp():
    from scalable_etl_spark.operators.multimodal import (
        decode_image,
        synthetic_webp,
    )

    img = decode_image(synthetic_webp(17))
    assert img.shape == (6, 4, 3)
    expect = np.array(
        [
            (17 * 5 + ((j // 3) - (j // 3) % 4) * 17 + (j % 3) * 29) % 256
            for j in range(72)
        ],
        dtype=np.uint8,
    ).reshape(6, 4, 3)
    assert (img == expect).all()


def _stream_header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple_two(bw, s0, s1):
    """Simple prefix code with two symbols (1 bit each, read order)."""
    bw.write(1, 1)
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # first is 8-bit
    bw.write(s0, 8)
    bw.write(s1, 8)


def _simple_one(bw, s):
    bw.write(1, 1)
    bw.write(0, 1)
    if s < 2:
        bw.write(0, 1)
        bw.write(s, 1)
    else:
        bw.write(1, 1)
        bw.write(s, 8)


def _emit_literal_trees(bw, pixels, cache_size=0):
    """Write the five prefix codes for a literal-only pixel list and
    return per-channel encode maps. pixels = list of (a, r, g, b)."""
    from scalable_etl_spark.operators.vp8l import (
        balanced_lengths,
        write_prefix_code,
    )

    chans = list(zip(*pixels))  # a, r, g, b
    g_syms = sorted(set(chans[3 - 1]))  # greens
    enc = {}
    enc["g"] = write_prefix_code(
        bw, balanced_lengths(g_syms, 256 + 24 + cache_size)
    )
    enc["r"] = write_prefix_code(
        bw, balanced_lengths(sorted(set(chans[1])), 256)
    )
    enc["b"] = write_prefix_code(
        bw, balanced_lengths(sorted(set(chans[3])), 256)
    )
    enc["a"] = write_prefix_code(
        bw, balanced_lengths(sorted(set(chans[0])), 256)
    )
    _simple_one(bw, 0)  # distance tree (unused)
    return enc


def _emit_literal_pixels(bw, pixels, enc):
    for a, r, g, b in pixels:
        for ch, v in (("g", g), ("r", r), ("b", b), ("a", a)):
            c, n = enc[ch][v]
            bw.write_code(c, n)


def test_color_cache_stream_handcrafted():
    """Handcrafted VP8L stream exercising the COLOR-CACHE decode path
    (no fixture reaches it): two literal pixels populate a 2-slot
    cache, then a cache-reference symbol must reproduce the pixel
    whose hash landed in the referenced slot."""
    from scalable_etl_spark.operators.vp8l import (
        _cache_key,
        balanced_lengths,
        decode_vp8l_chunk,
        write_prefix_code,
    )

    a_px = (255 << 24) | (10 << 8)   # slot 0
    b_px = (255 << 24) | (21 << 8)   # slot 1
    ka, kb = _cache_key(a_px, 1), _cache_key(b_px, 1)
    assert ka != kb, "pick greens hashing to distinct slots"
    bw = BitWriter()
    _stream_header(bw, 3, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(1, 4)  # cache_bits = 1 -> 2 slots
    bw.write(0, 1)  # no meta
    cache_ref = 280 + ka  # references pixel A's slot
    g_enc = write_prefix_code(
        bw, balanced_lengths(sorted({10, 21, cache_ref}), 282)
    )
    r_enc = write_prefix_code(bw, balanced_lengths([0], 256))
    b_enc = write_prefix_code(bw, balanced_lengths([0], 256))
    a_enc = write_prefix_code(bw, balanced_lengths([255], 256))
    _simple_one(bw, 0)  # distance tree
    for sym in (10, 21, cache_ref):
        c, n = g_enc[sym]
        bw.write_code(c, n)
        if sym < 256:  # literals carry r/b/a; cache refs don't
            for m in (r_enc[0], b_enc[0], a_enc[255]):
                bw.write_code(*m)
    chunk = bytes([0x2F]) + bw.tobytes()
    argb, w, h = decode_vp8l_chunk(chunk)
    assert (w, h) == (3, 1)
    assert list(argb) == [a_px, b_px, a_px]


def test_predictor_transform_stream_handcrafted():
    """Handcrafted stream with the PREDICTOR transform (mode 2 = top,
    one block covering the image): residuals must be reconstructed in
    scan order against the fixed edge rules (corner = opaque black,
    top row = left, left col = top)."""
    from scalable_etl_spark.operators.vp8l import decode_vp8l_chunk

    w, h = 2, 2
    target = [
        0xFF102030, 0xFF112233,  # row 0
        0xFF405060, 0xFF516273,  # row 1
    ]

    def sub(a, b):  # per-channel (a - b) mod 256
        out = 0
        for s in (24, 16, 8, 0):
            out |= ((((a >> s) & 0xFF) - ((b >> s) & 0xFF)) & 0xFF) << s
        return out

    residuals = [
        sub(target[0], 0xFF000000),       # corner: opaque black
        sub(target[1], target[0]),        # top row: left
        sub(target[2], target[0]),        # left col: top
        sub(target[3], target[1]),        # mode 2: top
    ]
    bw = BitWriter()
    _stream_header(bw, w, h)
    bw.write(1, 1)  # a transform follows
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 sub-image
    # sub-image: one pixel, green = mode 2; 0-bit single-symbol trees
    bw.write(0, 1)  # sub-image: no color cache
    _simple_one(bw, 2)  # green = predictor mode 2 (top)
    _simple_one(bw, 0)  # red
    _simple_one(bw, 0)  # blue
    _simple_one(bw, 0)  # alpha
    _simple_one(bw, 0)  # distance
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # main: no color cache
    bw.write(0, 1)  # no meta
    pixels = [
        (
            (p >> 24) & 0xFF,
            (p >> 16) & 0xFF,
            (p >> 8) & 0xFF,
            p & 0xFF,
        )
        for p in residuals
    ]
    enc = _emit_literal_trees(bw, pixels)
    _emit_literal_pixels(bw, pixels, enc)
    chunk = bytes([0x2F]) + bw.tobytes()
    argb, dw, dh = decode_vp8l_chunk(chunk)
    assert (dw, dh) == (w, h)
    assert [int(p) for p in argb] == target


def test_color_transform_stream_handcrafted():
    """Handcrafted stream with the cross-channel COLOR transform: the
    element's channel mapping (blue=green_to_red, green=green_to_blue,
    red=red_to_blue) and the 3.5-bit signed delta must reconstruct the
    original red/blue channels."""
    from scalable_etl_spark.operators.vp8l import (
        _ct_delta,
        decode_vp8l_chunk,
    )

    # pin the signed fixed-point semantics directly first
    assert _ct_delta(np.array([64]), np.array([64]))[0] == (64 * 64) >> 5
    assert _ct_delta(np.array([0xFF]), np.array([2]))[0] == -1 * 2 >> 5

    g2r, g2b, r2b = 64, 32, 16
    w, h = 2, 1
    target = [(255, 100, 50, 200), (255, 7, 129, 9)]  # (a, r, g, b)
    stored = []
    for a, r, g, b in target:
        sr = (r - int(_ct_delta(np.array([g2r]), np.array([g]))[0])) & 0xFF
        sb = (
            b
            - int(_ct_delta(np.array([g2b]), np.array([g]))[0])
            - int(_ct_delta(np.array([r2b]), np.array([r]))[0])
        ) & 0xFF
        stored.append((a, sr, g, sb))
    bw = BitWriter()
    _stream_header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(0, 3)  # size_bits = 2 -> one element for the image
    # element pixel: blue=g2r, green=g2b, red=r2b
    bw.write(0, 1)  # sub-image: no cache
    _simple_one(bw, g2b)  # green channel
    _simple_one(bw, r2b)  # red channel
    _simple_one(bw, g2r)  # blue channel
    _simple_one(bw, 0)  # alpha
    _simple_one(bw, 0)  # distance
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    enc = _emit_literal_trees(bw, stored)
    _emit_literal_pixels(bw, stored, enc)
    chunk = bytes([0x2F]) + bw.tobytes()
    argb, _, _ = decode_vp8l_chunk(chunk)
    got = [
        (
            (int(p) >> 24) & 0xFF,
            (int(p) >> 16) & 0xFF,
            (int(p) >> 8) & 0xFF,
            int(p) & 0xFF,
        )
        for p in argb
    ]
    assert got == target


def test_alpha_filters_and_raw_compression():
    """ALPH decode paths beyond the real fixture: raw (uncompressed)
    alpha with each filtering mode 1-3 must invert the prediction
    chain exactly (horizontal = left, vertical = top, gradient =
    clamp(L + T - TL)), with the spec's edge rules."""
    rng = np.random.default_rng(11)
    h, w = 5, 4
    plane = rng.integers(0, 256, (h, w), dtype=np.uint8)
    for mode in (1, 2, 3):
        # forward-filter the plane the way an encoder would
        stored = np.zeros_like(plane, dtype=np.int32)
        p = plane.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = p[0, x - 1]
                elif x == 0:
                    pred = p[y - 1, 0]
                elif mode == 1:
                    pred = p[y, x - 1]
                elif mode == 2:
                    pred = p[y - 1, x]
                else:
                    pred = int(np.clip(
                        p[y, x - 1] + p[y - 1, x] - p[y - 1, x - 1],
                        0, 255,
                    ))
                stored[y, x] = (p[y, x] - pred) & 0xFF
        header = bytes([(mode << 2) | 0])  # compression=0 (raw)
        alph = header + stored.astype(np.uint8).tobytes()
        out = decode_alpha_chunk(alph, w, h)
        assert (out == plane).all(), mode


def test_vp8x_container_with_vp8l_chunk_and_odd_padding():
    """decode_webp must find the VP8L chunk inside an extended (VP8X)
    container and walk odd-sized chunks with their RIFF padding byte."""
    import struct

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    plain = encode_vp8l(img)
    vp8l_chunk = plain[12:]  # 'VP8L' + size + payload (+pad)
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(4) \
        + (1).to_bytes(3, "little") + (1).to_bytes(3, "little")
    odd = b"XMP " + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    body = b"WEBP" + vp8x + odd + vp8l_chunk
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out = decode_webp(payload)
    assert (out == img).all()
