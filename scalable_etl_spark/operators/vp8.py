"""Pure-Python/numpy VP8 *keyframe* (intra-frame) decoder — the lossy
half of WebP — implemented from RFC 6386 (the public VP8 bitstream
specification; normative constant tables in ``vp8_tables.py``).

Scope: still-image WebP ``VP8 `` chunks, i.e. exactly one keyframe —
the only VP8 content WebP files carry. Inter-frame tools (motion
vectors, reference buffers, probability persistence) are out of scope
by format construction. The decode pipeline is the full normative one:

  boolean arithmetic decoder (RFC §7) → frame/segment/filter/quant
  headers (§9) → keyframe intra-mode decoding with the spec trees
  (§11.2) → token decoding with coefficient-band contexts (§13) →
  dequantization (§14.1) → inverse WHT for the Y2 DC transform (§14.2)
  → inverse bit-exact integer DCT (§14.3) → intra prediction, all 4
  16x16 / 10 4x4 / 4 chroma modes with the spec's 127/129 edge
  conventions (§12) → normal & simple in-loop deblocking filters
  (§15), applied frame-wide in macroblock raster order.

Output is the YUV 4:2:0 reconstruction, BIT-EXACT against libwebp's
reference decoder (``WebPDecodeYUV``) — pinned in tests/test_vp8.py
over real libwebp-encoded streams at several sizes and quality levels
(the in-loop filter, both types, is part of the normative output, so
exactness covers it too). RGB conversion is a separate, documented
step (``yuv420_to_rgb``) because the spec ends at YUV: upsamplers and
YUV→RGB matrices are implementation choices, not bitstream semantics.

Reference parity anchor: the reference engine delegates image decode
to external codec libraries; this repo decodes in-process so media
queries stay hermetic (operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    BMODE_TREE,
    CAT_BASE,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_PROBS_FLAT,
    COEFF_TREE,
    COEFF_UPDATE_PROBS_FLAT,
    DC_QLOOKUP,
    KF_BMODE_PROBS_FLAT,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    KF_YMODE_TREE,
    UV_MODE_TREE,
    ZIGZAG,
)

# Y macroblock modes (16x16): B_PRED (per-4x4 submodes) is index 4.
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# 4x4 submodes 0..9 in the ORDER THE EXTRACTED kBModesProba TABLE IS
# INDEXED BY (libwebp's enum: RD/VR before LD — the RFC's enum lists
# LD first, but the probability table rows here follow the library
# the bytes were extracted from; the TREE below assigns each bit path
# the same geometric mode either way, validated bit-exactly).
B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU = range(10)
# implied submode (for B-mode context) of a non-B_PRED macroblock
_MODE_TO_SUB = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


class BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder (bit-exact transcription
    of the spec's reference algorithm)."""

    __slots__ = ("buf", "pos", "value", "range_", "bit_count")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.value = 0
        self.pos = 0
        for _ in range(2):
            self.value = (self.value << 8) | (
                buf[self.pos] if self.pos < len(buf) else 0
            )
            self.pos += 1
        self.range_ = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range_ -= split
            self.value -= big
        else:
            ret = 0
            self.range_ = split
        while self.range_ < 128:
            self.value <<= 1
            self.range_ <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.buf):
                    self.value |= self.buf[self.pos]
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


def _clamp8(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _c(v: int) -> int:  # signed-char clamp (§15.1)
    return -128 if v < -128 else 127 if v > 127 else v


def _iwht4x4(ip):
    """§14.2 inverse Walsh-Hadamard (Y2 DC transform), bit-exact."""
    op = [0] * 16
    for i in range(4):
        a1 = ip[0 + i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[0 + i] - ip[12 + i]
        op[0 + i] = a1 + b1
        op[4 + i] = c1 + d1
        op[8 + i] = a1 - b1
        op[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = i * 4
        a1 = op[base + 0] + op[base + 3]
        b1 = op[base + 1] + op[base + 2]
        c1 = op[base + 1] - op[base + 2]
        d1 = op[base + 0] - op[base + 3]
        out[base + 0] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


_COS = 20091  # cospi8sqrt2 - 1, Q16 (§14.3)
_SIN = 35468  # sinpi8sqrt2, Q16


def _idct4x4(ip):
    """§14.3 inverse DCT, bit-exact integer transform."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[0 + i] + ip[8 + i]
        b1 = ip[0 + i] - ip[8 + i]
        t1 = (ip[4 + i] * _SIN) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _COS) >> 16)
        t2 = (ip[12 + i] * _SIN) >> 16
        d1 = t1 + t2
        tmp[0 + i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        base = i * 4
        a1 = tmp[base + 0] + tmp[base + 2]
        b1 = tmp[base + 0] - tmp[base + 2]
        t1 = (tmp[base + 1] * _SIN) >> 16
        t2 = tmp[base + 3] + ((tmp[base + 3] * _COS) >> 16)
        c1 = t1 - t2
        t1 = tmp[base + 1] + ((tmp[base + 1] * _COS) >> 16)
        t2 = (tmp[base + 3] * _SIN) >> 16
        d1 = t1 + t2
        out[base + 0] = (a1 + d1 + 4) >> 3
        out[base + 3] = (a1 - d1 + 4) >> 3
        out[base + 1] = (b1 + c1 + 4) >> 3
        out[base + 2] = (b1 - c1 + 4) >> 3
    return out


def _reshape_probs(flat):
    """flat 4*8*3*11 -> [type][band][ctx] -> 11-tuple."""
    out = []
    i = 0
    for _t in range(4):
        bands = []
        for _b in range(8):
            ctxs = []
            for _c2 in range(3):
                ctxs.append(tuple(flat[i:i + 11]))
                i += 11
            bands.append(ctxs)
        out.append(bands)
    return out


_DEFAULT_COEFF_PROBS = _reshape_probs(COEFF_PROBS_FLAT)
_UPDATE_PROBS = _reshape_probs(COEFF_UPDATE_PROBS_FLAT)
_KF_BMODE = [
    [
        tuple(KF_BMODE_PROBS_FLAT[(a * 10 + left) * 9:(a * 10 + left) * 9 + 9])
        for left in range(10)
    ]
    for a in range(10)
]


class _Header:
    pass


def _parse_headers(data: bytes):
    """Frame tag + first-partition headers (§9). Returns (hdr, bd,
    token_partitions)."""
    if len(data) < 10:
        raise ValueError("truncated VP8 chunk (no frame header)")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    h = _Header()
    h.key_frame = not (tag & 1)
    h.version = (tag >> 1) & 7
    h.show = (tag >> 4) & 1
    first_size = tag >> 5
    if not h.key_frame:
        raise NotImplementedError(
            "VP8 inter frame: WebP stills are always keyframes"
        )
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w16 = data[6] | (data[7] << 8)
    h16 = data[8] | (data[9] << 8)
    h.width, h.height = w16 & 0x3FFF, h16 & 0x3FFF
    part0 = data[10:10 + first_size]
    bd = BoolDecoder(part0)
    bd.get(128)  # color space (0 for the profiles WebP emits)
    bd.get(128)  # clamping type
    # --- segmentation (§9.3)
    h.segmentation = bd.get(128)
    h.update_map = 0
    h.seg_tree_probs = [255, 255, 255]
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    if h.segmentation:
        h.update_map = bd.get(128)
        update_data = bd.get(128)
        if update_data:
            h.seg_abs = bd.get(128)
            for i in range(4):
                if bd.get(128):
                    h.seg_quant[i] = bd.signed(7)
            for i in range(4):
                if bd.get(128):
                    h.seg_lf[i] = bd.signed(6)
        if h.update_map:
            for i in range(3):
                if bd.get(128):
                    h.seg_tree_probs[i] = bd.literal(8)
    # --- loop filter (§9.4)
    h.filter_type_simple = bd.get(128)
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta = bd.get(128)
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta and bd.get(128):
        for i in range(4):
            if bd.get(128):
                h.ref_lf_delta[i] = bd.signed(6)
        for i in range(4):
            if bd.get(128):
                h.mode_lf_delta[i] = bd.signed(6)
    # --- token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    rest = data[10 + first_size:]
    sizes = []
    off = 3 * (n_parts - 1)
    for i in range(n_parts - 1):
        sz = rest[i * 3] | (rest[i * 3 + 1] << 8) | (rest[i * 3 + 2] << 16)
        sizes.append(sz)
    parts = []
    for sz in sizes:
        parts.append(BoolDecoder(rest[off:off + sz]))
        off += sz
    parts.append(BoolDecoder(rest[off:]))
    # --- quantizers (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y1dc_d = bd.signed(4) if bd.get(128) else 0
    h.y2dc_d = bd.signed(4) if bd.get(128) else 0
    h.y2ac_d = bd.signed(4) if bd.get(128) else 0
    h.uvdc_d = bd.signed(4) if bd.get(128) else 0
    h.uvac_d = bd.signed(4) if bd.get(128) else 0
    # --- §9.7 refresh entropy (keyframe: single bit)
    bd.get(128)
    # --- coefficient probability updates (§13.4)
    probs = [
        [[list(ctx) for ctx in band] for band in typ]
        for typ in _DEFAULT_COEFF_PROBS
    ]
    for t in range(4):
        for b in range(8):
            for c2 in range(3):
                up = _UPDATE_PROBS[t][b][c2]
                row = probs[t][b][c2]
                for p in range(11):
                    if bd.get(up[p]):
                        row[p] = bd.literal(8)
    h.coeff_probs = probs
    # --- §9.11 mb_no_coeff_skip
    h.no_skip = bd.get(128)
    h.skip_prob = bd.literal(8) if h.no_skip else 0
    return h, bd, parts


def _dequant_factors(h):
    """Per-segment (y1dc,y1ac),(y2dc,y2ac),(uvdc,uvac) — §14.1."""
    out = []
    for seg in range(4):
        if h.segmentation:
            q = (
                h.seg_quant[seg]
                if h.seg_abs
                else h.y_ac_qi + h.seg_quant[seg]
            )
        else:
            q = h.y_ac_qi
        q = _clamp_q(q)
        y1dc = DC_QLOOKUP[_clamp_q(q + h.y1dc_d)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + h.y2dc_d)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + h.y2ac_d)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + h.uvdc_d)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(q + h.uvac_d)]
        out.append(((y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac)))
    return out


_SEG_TREE = (2, 4, -0, -1, -2, -3)


def _decode_coeffs(bd, probs, first, ctx, dq_dc, dq_ac):
    """One 4x4 block's tokens (§13.3) -> (coeffs[16] natural order,
    nonzero?). ``ctx`` is the above+left nonzero context (0..2)."""
    coeffs = [0] * 16
    nonzero = False
    i = first
    start = 0  # 0 = EOB arm allowed; 2 = after a zero token
    while i < 16:
        band = COEFF_BANDS[i]
        p = probs[band][ctx]
        tok = bd.tree(COEFF_TREE, p, start)
        if tok == 11:  # EOB
            break
        if tok == 0:
            ctx = 0
            start = 2
            i += 1
            continue
        start = 0
        if tok <= 4:
            val = tok
        else:
            cat = tok - 5
            val = CAT_BASE[cat]
            extra = 0
            for cp in CAT_PROBS[cat]:
                extra = (extra << 1) | bd.get(cp)
            val += extra
        if bd.get(128):
            val = -val
        ctx = 2 if (val > 1 or val < -1) else 1
        coeffs[ZIGZAG[i]] = val * (dq_dc if i == 0 else dq_ac)
        nonzero = True
        i += 1
    return coeffs, nonzero


# ---------------------------------------------------------------- pred

def _pred16_or_8(plane, y0, x0, n, mode, mb_y, mb_x):
    """16x16 / 8x8 whole-block intra prediction (§12.2) into
    plane[y0:y0+n, x0:x0+n]. Edge conventions: missing above row =
    127, missing left column = 129."""
    up = mb_y > 0
    left = mb_x > 0
    if mode == DC_PRED:
        s = 0
        cnt = 0
        if up:
            s += int(plane[y0 - 1, x0:x0 + n].sum())
            cnt += n
        if left:
            s += int(plane[y0:y0 + n, x0 - 1].astype(np.int64).sum())
            cnt += n
        dc = 128 if cnt == 0 else (s + (cnt >> 1)) // cnt
        plane[y0:y0 + n, x0:x0 + n] = dc
    elif mode == V_PRED:
        row = plane[y0 - 1, x0:x0 + n] if up else np.full(n, 127, np.uint8)
        plane[y0:y0 + n, x0:x0 + n] = row
    elif mode == H_PRED:
        col = (
            plane[y0:y0 + n, x0 - 1]
            if left
            else np.full(n, 129, np.uint8)
        )
        plane[y0:y0 + n, x0:x0 + n] = col[:, None]
    else:  # TM_PRED
        above = (
            plane[y0 - 1, x0:x0 + n].astype(np.int32)
            if up
            else np.full(n, 127, np.int32)
        )
        lcol = (
            plane[y0:y0 + n, x0 - 1].astype(np.int32)
            if left
            else np.full(n, 129, np.int32)
        )
        # corner follows _pred4's border convention: the whole above
        # row (incl. its [-1]) is the 127 top border whenever the MB
        # is in the top row — even with a real left column — and 129
        # (the left border column) when only the left is missing
        corner = int(plane[y0 - 1, x0 - 1]) if (up and left) else (
            127 if not up else 129
        )
        pred = lcol[:, None] + above[None, :] - corner
        plane[y0:y0 + n, x0:x0 + n] = np.clip(pred, 0, 255).astype(
            np.uint8
        )


def _sub_above(plane, y, x, mb_y, mb_x, w, r, c3):
    """Above 8 pixels (4 + above-right 4) for a 4x4 subblock at plane
    coords (y, x) — §12.3's edge rules. ``c3`` = subblock is in the
    MB's rightmost column (above-right then comes from the row above
    the MB, frozen, replicating the frame edge at the last MB)."""
    out = np.empty(8, np.int32)
    if y == 0:
        out[:] = 127
        return out
    row = plane[y - 1]
    out[:4] = row[x:x + 4]
    if c3:
        if mb_y == 0:
            out[4:] = 127  # frozen above-MB row = the 127 top border
        else:
            # the row above the MB, not within it (frozen at MB start)
            ar_row = plane[mb_y * 16 - 1] if r > 0 else row
            src_x = x + 4
            if src_x + 4 <= w:
                out[4:] = ar_row[src_x:src_x + 4]
            else:
                out[4:] = ar_row[w - 1]
    else:
        out[4:] = row[x + 4:x + 8]
    return out


def _pred4(plane, y, x, mode, above8, mb_y_edge, left_avail):
    """4x4 intra prediction (§12.3) into plane[y:y+4, x:x+4] — each
    mode transcribed pixel-for-pixel from the RFC's reference
    predictor. ``above8`` = A0..A3 + above-right AR0..AR3 (edge-
    resolved by the caller); left column and top-left corner follow
    the 127/129 border convention here."""
    A = above8  # int32[8]
    if left_avail:
        L = plane[y:y + 4, x - 1].astype(np.int32)
    else:
        L = np.full(4, 129, np.int32)
    if y == 0:
        P = 127  # whole above row (incl. its [-1]) is the 127 border
    elif not left_avail:
        P = 129  # left border column
    else:
        P = int(plane[y - 1, x - 1])
    # edge vector pp[0..8] = L3 L2 L1 L0 P A0 A1 A2 A3
    pp = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), P,
          int(A[0]), int(A[1]), int(A[2]), int(A[3])]
    a = [int(v) for v in A]
    ll = [int(v) for v in L]
    b = np.empty((4, 4), np.int32)
    if mode == B_DC:
        b[:, :] = (sum(a[:4]) + sum(ll) + 4) >> 3
    elif mode == B_TM:
        b[:, :] = np.clip(
            L[:, None] + A[None, :4] - P, 0, 255
        )
    elif mode == B_VE:
        row = [(P + 2 * a[0] + a[1] + 2) >> 2,
               (a[0] + 2 * a[1] + a[2] + 2) >> 2,
               (a[1] + 2 * a[2] + a[3] + 2) >> 2,
               (a[2] + 2 * a[3] + a[4] + 2) >> 2]
        b[:, :] = np.array(row, np.int32)[None, :]
    elif mode == B_HE:
        col = [(P + 2 * ll[0] + ll[1] + 2) >> 2,
               (ll[0] + 2 * ll[1] + ll[2] + 2) >> 2,
               (ll[1] + 2 * ll[2] + ll[3] + 2) >> 2,
               (ll[2] + 2 * ll[3] + ll[3] + 2) >> 2]
        b[:, :] = np.array(col, np.int32)[:, None]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    b[r, c] = (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2
                else:
                    b[r, c] = (a[6] + 3 * a[7] + 2) >> 2
    elif mode == B_RD:
        for r in range(4):
            for c in range(4):
                i = 3 - r + c  # diag r-c maps to pp window
                b[r, c] = (pp[i] + 2 * pp[i + 1] + pp[i + 2] + 2) >> 2
    elif mode == B_VR:
        v = [(pp[4 + c] + pp[5 + c] + 1) >> 1 for c in range(4)]
        w = [(pp[3 + c] + 2 * pp[4 + c] + pp[5 + c] + 2) >> 2
             for c in range(4)]
        x2 = (pp[2] + 2 * pp[3] + pp[4] + 2) >> 2
        x3 = (pp[1] + 2 * pp[2] + pp[3] + 2) >> 2
        b[0] = v
        b[1] = w
        b[2] = [x2, v[0], v[1], v[2]]
        b[3] = [x3, w[0], w[1], w[2]]
    elif mode == B_VL:
        v = [(a[c] + a[c + 1] + 1) >> 1 for c in range(4)]
        w = [(a[c] + 2 * a[c + 1] + a[c + 2] + 2) >> 2
             for c in range(4)]
        b[0] = v
        b[1] = w
        b[2] = [v[1], v[2], v[3], (a[4] + 2 * a[5] + a[6] + 2) >> 2]
        b[3] = [w[1], w[2], w[3], (a[5] + 2 * a[6] + a[7] + 2) >> 2]
    elif mode == B_HD:
        b[0] = [(pp[3] + pp[4] + 1) >> 1,
                (pp[3] + 2 * pp[4] + pp[5] + 2) >> 2,
                (pp[4] + 2 * pp[5] + pp[6] + 2) >> 2,
                (pp[5] + 2 * pp[6] + pp[7] + 2) >> 2]
        b[1] = [(pp[2] + pp[3] + 1) >> 1,
                (pp[2] + 2 * pp[3] + pp[4] + 2) >> 2,
                b[0, 0], b[0, 1]]
        b[2] = [(pp[1] + pp[2] + 1) >> 1,
                (pp[1] + 2 * pp[2] + pp[3] + 2) >> 2,
                b[1, 0], b[1, 1]]
        b[3] = [(pp[0] + pp[1] + 1) >> 1,
                (pp[0] + 2 * pp[1] + pp[2] + 2) >> 2,
                b[2, 0], b[2, 1]]
    else:  # B_HU
        b[0] = [(ll[0] + ll[1] + 1) >> 1,
                (ll[0] + 2 * ll[1] + ll[2] + 2) >> 2,
                (ll[1] + ll[2] + 1) >> 1,
                (ll[1] + 2 * ll[2] + ll[3] + 2) >> 2]
        b[1] = [b[0, 2], b[0, 3],
                (ll[2] + ll[3] + 1) >> 1,
                (ll[2] + 3 * ll[3] + 2) >> 2]
        b[2] = [b[1, 2], b[1, 3], ll[3], ll[3]]
        b[3] = [ll[3], ll[3], ll[3], ll[3]]
    plane[y:y + 4, x:x + 4] = np.clip(b, 0, 255).astype(np.uint8)


def _add_residual(plane, y, x, res):
    blk = plane[y:y + 4, x:x + 4].astype(np.int32)
    blk += np.array(res, np.int32).reshape(4, 4)
    plane[y:y + 4, x:x + 4] = np.clip(blk, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- main

def decode_vp8_yuv(data: bytes):
    """Decode one VP8 keyframe -> (Y, U, V) uint8 arrays of shape
    (h, w) and ((h+1)//2, (w+1)//2). Bit-exact vs libwebp."""
    h, bd, parts = _parse_headers(data)
    W, H = h.width, h.height
    mb_w, mb_h = (W + 15) >> 4, (H + 15) >> 4
    dqs = _dequant_factors(h)

    ypl = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    upl = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    vpl = np.zeros((mb_h * 8, mb_w * 8), np.uint8)

    # nonzero contexts: above per MB column, left per MB
    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 Y, 2 U, 2 V, 1 Y2
    # per-MB metadata for the loop filter
    mb_info = [[None] * mb_w for _ in range(mb_h)]
    # B-submode context rows
    above_sub = [[B_DC] * 4 for _ in range(mb_w)]

    for mb_y in range(mb_h):
        left_nz = [0] * 9
        left_sub = [B_DC] * 4
        tok = parts[mb_y % len(parts)]
        for mb_x in range(mb_w):
            seg = 0
            if h.update_map:
                seg = bd.tree(_SEG_TREE, h.seg_tree_probs)
            skip_flag = bd.get(h.skip_prob) if h.no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            submodes = [B_DC] * 16
            if ymode == B_PRED:
                for r in range(4):
                    for c in range(4):
                        a = (
                            above_sub[mb_x][c]
                            if r == 0
                            else submodes[(r - 1) * 4 + c]
                        )
                        lft = (
                            left_sub[r]
                            if c == 0
                            else submodes[r * 4 + c - 1]
                        )
                        submodes[r * 4 + c] = bd.tree(
                            BMODE_TREE, _KF_BMODE[a][lft]
                        )
                above_sub[mb_x] = submodes[12:16]
                left_sub = [submodes[3], submodes[7], submodes[11],
                            submodes[15]]
            else:
                sub = _MODE_TO_SUB[ymode]
                above_sub[mb_x] = [sub] * 4
                left_sub = [sub] * 4
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)

            (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac) = dqs[seg]
            has_y2 = ymode != B_PRED

            y_coeffs = [[0] * 16 for _ in range(16)]
            uv_coeffs = [[0] * 16 for _ in range(8)]
            any_nz = False
            if skip_flag:
                # §13.1: skipped MB zeroes Y/U/V contexts; the Y2
                # context is zeroed only when the MB HAS a Y2 block
                for i in range(8):
                    above_nz[mb_x][i] = 0
                    left_nz[i] = 0
                if has_y2:
                    above_nz[mb_x][8] = 0
                    left_nz[8] = 0
            else:
                first = 0
                if has_y2:
                    ctx = above_nz[mb_x][8] + left_nz[8]
                    c2, nz = _decode_coeffs(
                        tok, h.coeff_probs[1], 0, ctx, y2dc, y2ac
                    )
                    above_nz[mb_x][8] = left_nz[8] = int(nz)
                    wht = _iwht4x4(c2)
                    first = 1
                    any_nz = any_nz or nz
                btype = 0 if has_y2 else 3
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = above_nz[mb_x][c] + left_nz[r]
                    coeffs, nz = _decode_coeffs(
                        tok, h.coeff_probs[btype], first, ctx, y1dc, y1ac
                    )
                    # the nonzero CONTEXT counts only TOKEN-decoded
                    # coefficients — under a Y2 transform the DC is
                    # carried by the WHT, not the token stream, and
                    # must not flip the context (§13.3)
                    above_nz[mb_x][c] = left_nz[r] = int(nz)
                    any_nz = any_nz or nz
                    if has_y2:
                        coeffs[0] = wht[b]
                    y_coeffs[b] = coeffs
                for b in range(8):
                    pl = b >> 2  # 0 = U, 1 = V
                    r, c = (b >> 1) & 1, b & 1
                    ai = 4 + pl * 2 + c
                    li = 4 + pl * 2 + r
                    ctx = above_nz[mb_x][ai] + left_nz[li]
                    coeffs, nz = _decode_coeffs(
                        tok, h.coeff_probs[2], 0, ctx, uvdc, uvac
                    )
                    above_nz[mb_x][ai] = left_nz[li] = int(nz)
                    uv_coeffs[b] = coeffs
                    any_nz = any_nz or nz

            # ---- reconstruction
            y0, x0 = mb_y * 16, mb_x * 16
            if ymode != B_PRED:
                _pred16_or_8(ypl, y0, x0, 16, ymode, mb_y, mb_x)
                for b in range(16):
                    r, c = b >> 2, b & 3
                    if any(y_coeffs[b]):
                        res = _idct4x4(y_coeffs[b])
                        _add_residual(ypl, y0 + r * 4, x0 + c * 4, res)
            else:
                for b in range(16):
                    r, c = b >> 2, b & 3
                    yy, xx = y0 + r * 4, x0 + c * 4
                    above8 = _sub_above(
                        ypl, yy, xx, mb_y, mb_x, mb_w * 16, r, c == 3
                    )
                    _pred4(
                        ypl, yy, xx, submodes[b], above8,
                        mb_y == 0, xx > 0,
                    )
                    if any(y_coeffs[b]):
                        res = _idct4x4(y_coeffs[b])
                        _add_residual(ypl, yy, xx, res)
            cy0, cx0 = mb_y * 8, mb_x * 8
            for pl, plane in ((0, upl), (1, vpl)):
                _pred16_or_8(plane, cy0, cx0, 8, uvmode, mb_y, mb_x)
                for b in range(4):
                    r, c = b >> 1, b & 1
                    coeffs = uv_coeffs[pl * 4 + b]
                    if any(coeffs):
                        res = _idct4x4(coeffs)
                        _add_residual(
                            plane, cy0 + r * 4, cx0 + c * 4, res
                        )

            mb_info[mb_y][mb_x] = (seg, ymode, skip_flag or not any_nz)

    _loop_filter(h, ypl, upl, vpl, mb_info, mb_w, mb_h, dqs)

    ch, cw = (H + 1) >> 1, (W + 1) >> 1
    return ypl[:H, :W].copy(), upl[:ch, :cw].copy(), vpl[:ch, :cw].copy()


# ---------------------------------------------------------- loop filter

def _filter_level_for(h, seg, ymode):
    lvl = h.filter_level
    if h.segmentation:
        lvl = h.seg_lf[seg] if h.seg_abs else lvl + h.seg_lf[seg]
        lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
    if h.lf_delta:
        lvl += h.ref_lf_delta[0]  # intra frame
        if ymode == B_PRED:
            lvl += h.mode_lf_delta[0]
        lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
    return lvl


def _limits(h, lvl):
    interior = lvl
    if h.sharpness:
        interior >>= 2 if h.sharpness > 4 else 1
        if interior > 9 - h.sharpness:
            interior = 9 - h.sharpness
    if interior < 1:
        interior = 1
    hev = 0
    if lvl >= 40:
        hev = 2
    elif lvl >= 15:
        hev = 1
    mb_lim = ((lvl + 2) * 2) + interior
    sb_lim = (lvl * 2) + interior
    return interior, hev, mb_lim, sb_lim


def _u2s(v):
    return v - 128


def _common_adjust(px, use_outer, i3, i2, i1, i0, i_0, i_1):
    """§15.2 common 2-tap adjust on p1 p0 | q0 q1 at the given flat
    indices; returns the filter value a."""
    P1, P0, Q0, Q1 = (
        _u2s(px[i1]), _u2s(px[i0]), _u2s(px[i_0]), _u2s(px[i_1])
    )
    a = _c((_c(P1 - Q1) if use_outer else 0) + 3 * (Q0 - P0))
    F = _c(a + 4) >> 3
    E = _c(a + 3) >> 3
    px[i_0] = _clamp8(Q0 - F + 128)
    px[i0] = _clamp8(P0 + E + 128)
    return F


def _normal_mask(px, idx, int_lim, edge_lim):
    p3, p2, p1, p0, q0, q1, q2, q3 = (int(px[i]) for i in idx)
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_lim
        and abs(p3 - p2) <= int_lim
        and abs(p2 - p1) <= int_lim
        and abs(p1 - p0) <= int_lim
        and abs(q1 - q0) <= int_lim
        and abs(q2 - q1) <= int_lim
        and abs(q3 - q2) <= int_lim
    )


def _hev(px, idx, thr):
    _p3, _p2, p1, p0, q0, q1, _q2, _q3 = (int(px[i]) for i in idx)
    return abs(p1 - p0) > thr or abs(q1 - q0) > thr


def _sb_filter(px, idx, int_lim, edge_lim, hev_thr):
    if not _normal_mask(px, idx, int_lim, edge_lim):
        return
    hv = _hev(px, idx, hev_thr)
    a = _common_adjust(px, hv, *idx[0:6])
    if not hv:
        a = (a + 1) >> 1
        px[idx[5]] = _clamp8(_u2s(int(px[idx[5]])) - a + 128)  # q1
        px[idx[2]] = _clamp8(_u2s(int(px[idx[2]])) + a + 128)  # p1


def _mb_filter(px, idx, int_lim, edge_lim, hev_thr):
    if not _normal_mask(px, idx, int_lim, edge_lim):
        return
    if _hev(px, idx, hev_thr):
        _common_adjust(px, True, *idx[0:6])
        return
    P2, P1, P0, Q0, Q1, Q2 = (
        _u2s(int(px[idx[1]])), _u2s(int(px[idx[2]])),
        _u2s(int(px[idx[3]])), _u2s(int(px[idx[4]])),
        _u2s(int(px[idx[5]])), _u2s(int(px[idx[6]])),
    )
    w = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
    a = _c((27 * w + 63) >> 7)
    px[idx[4]] = _clamp8(Q0 - a + 128)
    px[idx[3]] = _clamp8(P0 + a + 128)
    a = _c((18 * w + 63) >> 7)
    px[idx[5]] = _clamp8(Q1 - a + 128)
    px[idx[2]] = _clamp8(P1 + a + 128)
    a = _c((9 * w + 63) >> 7)
    px[idx[6]] = _clamp8(Q2 - a + 128)
    px[idx[1]] = _clamp8(P2 + a + 128)


def _simple_filter(px, idx, edge_lim):
    p1, p0, q0, q1 = (
        int(px[idx[2]]), int(px[idx[3]]), int(px[idx[4]]),
        int(px[idx[5]]),
    )
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_lim:
        _common_adjust(px, True, *idx[0:6])


def _col_idx(plane_w, y, x):
    # p3..q3 horizontally across a vertical edge at column x
    return [y * plane_w + x + d for d in (-4, -3, -2, -1, 0, 1, 2, 3)]


def _row_idx(plane_w, y, x):
    return [(y + d) * plane_w + x for d in (-4, -3, -2, -1, 0, 1, 2, 3)]


def _loop_filter(h, ypl, upl, vpl, mb_info, mb_w, mb_h, dqs):
    if h.filter_level == 0:
        return
    yw = ypl.shape[1]
    uw = upl.shape[1]
    yf = ypl.reshape(-1)
    uf = upl.reshape(-1)
    vf = vpl.reshape(-1)
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            seg, ymode, mb_skip = mb_info[mb_y][mb_x]
            lvl = _filter_level_for(h, seg, ymode)
            if lvl == 0:
                continue
            interior, hev_thr, mb_lim, sb_lim = _limits(h, lvl)
            inner = (not mb_skip) or ymode == B_PRED
            y0, x0 = mb_y * 16, mb_x * 16
            c0, cx = mb_y * 8, mb_x * 8
            if h.filter_type_simple:
                if mb_x > 0:
                    for r in range(16):
                        _simple_filter(
                            yf, _col_idx(yw, y0 + r, x0), mb_lim
                        )
                if inner:
                    for dx in (4, 8, 12):
                        for r in range(16):
                            _simple_filter(
                                yf, _col_idx(yw, y0 + r, x0 + dx),
                                sb_lim,
                            )
                if mb_y > 0:
                    for c in range(16):
                        _simple_filter(
                            yf, _row_idx(yw, y0, x0 + c), mb_lim
                        )
                if inner:
                    for dy in (4, 8, 12):
                        for c in range(16):
                            _simple_filter(
                                yf, _row_idx(yw, y0 + dy, x0 + c),
                                sb_lim,
                            )
                continue
            # normal filter: Y then chroma
            if mb_x > 0:
                for r in range(16):
                    _mb_filter(
                        yf, _col_idx(yw, y0 + r, x0), interior,
                        mb_lim, hev_thr,
                    )
                for r in range(8):
                    _mb_filter(
                        uf, _col_idx(uw, c0 + r, cx), interior,
                        mb_lim, hev_thr,
                    )
                    _mb_filter(
                        vf, _col_idx(uw, c0 + r, cx), interior,
                        mb_lim, hev_thr,
                    )
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        _sb_filter(
                            yf, _col_idx(yw, y0 + r, x0 + dx),
                            interior, sb_lim, hev_thr,
                        )
                for r in range(8):
                    _sb_filter(
                        uf, _col_idx(uw, c0 + r, cx + 4), interior,
                        sb_lim, hev_thr,
                    )
                    _sb_filter(
                        vf, _col_idx(uw, c0 + r, cx + 4), interior,
                        sb_lim, hev_thr,
                    )
            if mb_y > 0:
                for c in range(16):
                    _mb_filter(
                        yf, _row_idx(yw, y0, x0 + c), interior,
                        mb_lim, hev_thr,
                    )
                for c in range(8):
                    _mb_filter(
                        uf, _row_idx(uw, c0, cx + c), interior,
                        mb_lim, hev_thr,
                    )
                    _mb_filter(
                        vf, _row_idx(uw, c0, cx + c), interior,
                        mb_lim, hev_thr,
                    )
            if inner:
                for dy in (4, 8, 12):
                    for c in range(16):
                        _sb_filter(
                            yf, _row_idx(yw, y0 + dy, x0 + c),
                            interior, sb_lim, hev_thr,
                        )
                for c in range(8):
                    _sb_filter(
                        uf, _row_idx(uw, c0 + 4, cx + c), interior,
                        sb_lim, hev_thr,
                    )
                    _sb_filter(
                        vf, _row_idx(uw, c0 + 4, cx + c), interior,
                        sb_lim, hev_thr,
                    )


def yuv420_to_rgb(y, u, v):
    """BT.601 full-range YUV 4:2:0 -> RGB with nearest-neighbor chroma
    upsampling. NOT part of the VP8 spec (which ends at YUV) — a
    documented repo choice, kept simple and exactly reproducible."""
    H, W = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:H, :W].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:H, :W].astype(np.int32)
    yy = y.astype(np.int32)
    r = yy + ((91881 * (vv - 128)) >> 16)
    g = yy - ((22554 * (uu - 128) + 46802 * (vv - 128)) >> 16)
    b = yy + ((116130 * (uu - 128)) >> 16)
    return np.clip(
        np.stack([r, g, b], axis=-1), 0, 255
    ).astype(np.uint8)
