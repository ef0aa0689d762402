"""Pure-numpy WebP lossless (VP8L) codec — the last stubbed image
format in ``decode_image``'s matrix (reference stores media as opaque
object-store payloads; decode parity per SURVEY §2 multimodal ops).

Implements the public VP8L bitstream specification (RFC 9649 /
"WebP Lossless Bitstream Specification", Google; reimplemented from
the spec text, no libwebp code):

- RIFF container walk ('WEBP' + 'VP8L', or 'VP8X' extended files whose
  image chunk is VP8L);
- LSB-first bit reader, canonical prefix codes (simple 1/2-symbol and
  normal code-length-coded forms, incl. the max_symbol shortcut);
- spatially-coded image: optional color cache, meta prefix codes
  (entropy image), five-code prefix groups, LZ77 backward references
  with the 120-entry two-dimensional distance mapping, color-cache
  hits;
- all four transforms, inverted in reverse order: predictor (all 14
  modes, scan-order exact), cross-channel color transform (3.5-bit
  fixed-point deltas), subtract-green, color indexing (palette with
  sub-byte pixel bundling);
- the ALPH-chunk variant (headerless VP8L stream carrying a lossy
  file's alpha plane in the green channel, plus the alpha filters) —
  decoded in tests against a REAL libwebp-encoded file, which is the
  compliance evidence for the shared bitstream machinery.

The encoder (``encode_vp8l``) emits valid streams for synthetic
fixtures: flat 8-bit literal codes, optional subtract-green transform
and optional left-run LZ77 references (exercising the 2D distance
map). It exists so graded queries can materialize genuine WebP
payloads whose pixel sums an SQL oracle can state in closed form —
the same design as the PNG/JPEG fixture encoders.

Scale: codecs run inside Arrow-batched ``mapInPandas`` stages
(operators/multimodal.py) — embarrassingly parallel, no shuffle; the
pure-Python constant factor is documented there (swap-in point for
libwebp is ``decode_image``).
"""

from __future__ import annotations

import struct

import numpy as np

# Code-length-code read order (spec §5.2.1 kCodeLengthCodeOrder).
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# Two-dimensional distance mapping (spec §4.2.2): distance codes 1..120
# name pixels in a close scan-order neighborhood. The spec's explicit
# table follows a closed form — all offsets (dx, dy) with dy in 0..7,
# dx in -7..8, (dy > 0 or dx > 0), ordered by squared euclidean
# distance, then |dx|, then positive dx first. The domain bounds
# matter: a dy<=8 / |dx|<=8 domain reproduces only codes 1..96 and
# diverges from libwebp's plane_to_code_lut at code 97 ((0,8) instead
# of (8,0)) — caught by cross-checking against libwebp's table in
# review; tests pin the head rows, code 97, and the domain extremes,
# and the real libwebp-encoded ALPH fixture exercises live
# backreferences through the map.
_DIST_MAP: list[tuple[int, int]] = sorted(
    (
        (dx, dy)
        for dy in range(0, 8)
        for dx in range(-7, 9)
        if (dy > 0 or dx > 0)
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0),
)[:120]


class BitReader:
    """LSB-first bit reader over bytes (DEFLATE-style packing). Bits
    are unpacked once into a flat list — per-bit access is then a list
    index, which keeps the per-pixel decode loops cheap (this codec
    runs inside Arrow-batched executors over many small payloads)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8), bitorder="little"
        ).tolist()
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        bits, p = self.bits, self.pos
        if p + n > len(bits):
            raise ValueError("VP8L: bitstream overrun")
        v = 0
        for i in range(n):
            v |= bits[p + i] << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        try:
            b = self.bits[self.pos]
        except IndexError:
            raise ValueError("VP8L: bitstream overrun") from None
        self.pos += 1
        return b


class BitWriter:
    """LSB-first bit writer mirroring :class:`BitReader`."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """A canonical prefix code: root-first = MSB of ``code`` first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


class PrefixCode:
    """Canonical prefix decoder built from per-symbol code lengths
    (DEFLATE canonical ordering: by length, then symbol index)."""

    def __init__(self, lengths: list[int]):
        nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nonzero:
            raise ValueError("VP8L: empty prefix code")
        if len(nonzero) == 1:
            # single-symbol code reads zero bits (spec-sanctioned)
            self.single: int | None = nonzero[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        kraft = sum(2 ** -ln for ln, _ in nonzero)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"VP8L: invalid prefix code (kraft={kraft})")
        nonzero.sort()
        self.table = {}
        code = 0
        prev_len = nonzero[0][0]
        for ln, sym in nonzero:
            code <<= ln - prev_len
            prev_len = ln
            self.table[(ln, code)] = sym
            code += 1
        self.max_len = prev_len

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        bits, p = br.bits, br.pos
        table = self.table
        code = 0
        length = 0
        try:
            while True:
                code = (code << 1) | bits[p]
                p += 1
                length += 1
                sym = table.get((length, code))
                if sym is not None:
                    br.pos = p
                    return sym
                if length > 15:
                    raise ValueError("VP8L: prefix code desync")
        except IndexError:
            raise ValueError("VP8L: bitstream overrun") from None

    def encode_map(self) -> dict[int, tuple[int, int]]:
        """symbol -> (code, length), for the encoder."""
        if self.single is not None:
            return {self.single: (0, 0)}
        return {sym: (code, ln) for (ln, code), sym in self.table.items()}


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read_bit():  # simple code
        n_sym = br.read_bit() + 1
        first_8bit = br.read_bit()
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if n_sym == 1:
            lengths[s0] = 1  # PrefixCode turns 1 symbol into 0-bit
            return PrefixCode(lengths)
        s1 = br.read(8)
        lengths[s0] = 1
        lengths[s1] = 1
        code = PrefixCode(lengths)
        # canonical order sorts by symbol; spec maps FIRST-read symbol
        # to bit 0 regardless of ordering
        code.table = {(1, 0): s0, (1, 1): s1}
        return code
    # normal: code lengths are themselves prefix-coded
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)
    if br.read_bit():  # max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = []
    prev = 8  # spec default when repeat-16 precedes any literal
    while len(lengths) < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths.append(s)
            if s:
                prev = s
        elif s == 16:
            lengths.extend([prev] * (3 + br.read(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.read(3)))
        else:
            lengths.extend([0] * (11 + br.read(7)))
    lengths = lengths[:alphabet_size]
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return PrefixCode(lengths)


def _lz77_value(sym: int, br: BitReader) -> int:
    """Length/distance prefix decode (spec §4.2.2)."""
    if sym < 4:
        return sym + 1
    extra = (sym >> 1) - 1
    return ((2 + (sym & 1)) << extra) + 1 + br.read(extra)


def _lz77_symbol(value: int) -> tuple[int, int, int]:
    """Inverse of :func:`_lz77_value`: value -> (symbol, extra_bits,
    n_extra)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    extra = v.bit_length() - 2
    b = (v >> extra) & 1
    sym = 2 * extra + 2 + b
    rest = v - ((2 + b) << extra)
    return sym, rest, extra


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(
    br: BitReader, w: int, h: int, is_main: bool
) -> np.ndarray:
    """Spatially-coded image (spec §5.2.2): color-cache info, meta
    prefix codes (main image only), prefix-code groups, LZ77 data.
    Returns a flat uint32 ARGB array of length w*h."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: bad color cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    mw = 0
    n_groups = 1
    if is_main and br.read_bit():
        meta_bits = br.read(3) + 2
        mw, mh = _subsample(w, meta_bits), _subsample(h, meta_bits)
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, 256 + 24 + cache_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    out = np.zeros(w * h, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    total = w * h
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    cur_group = -1
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])
            if gi != cur_group:
                g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
                cur_group = gi
        s = g_green.read(br)
        if s < 256:
            r = g_red.read(br)
            b = g_blue.read(br)
            a = g_alpha.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 280:
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(g_dist.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(dy * w + dx, 1)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: backref out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            if s - 280 >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            out[pos] = cache[s - 280]
            pos += 1
    return out


# ----------------------------------------------------- inverse transforms


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _px_channels(p: int) -> np.ndarray:
    return np.array(
        [(p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF],
        dtype=np.int32,
    )


def _channels_px(c: np.ndarray) -> int:
    c = np.clip(c, 0, 255).astype(np.uint32)
    return int((c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3])


def _predict(mode: int, flat: np.ndarray, pos: int, w: int) -> int:
    """Predicted ARGB for scan-order position ``pos`` (spec §4.4:
    L/T/TL/TR taken from the flat scan-order buffer, so TR at the
    rightmost column is the current row's first pixel — exactly the
    spec's memory layout)."""
    left = int(flat[pos - 1])
    top = int(flat[pos - w])
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return int(flat[pos - w + 1])
    if mode == 4:
        return int(flat[pos - w - 1])
    lc = _px_channels(left)
    tc = _px_channels(top)
    if mode == 5:
        trc = _px_channels(int(flat[pos - w + 1]))
        return _channels_px(_avg2(_avg2(lc, trc), tc))
    tlc = _px_channels(int(flat[pos - w - 1]))
    if mode == 6:
        return _channels_px(_avg2(lc, tlc))
    if mode == 7:
        return _channels_px(_avg2(lc, tc))
    if mode == 8:
        return _channels_px(_avg2(tlc, tc))
    if mode == 9:
        trc = _px_channels(int(flat[pos - w + 1]))
        return _channels_px(_avg2(tc, trc))
    if mode == 10:
        trc = _px_channels(int(flat[pos - w + 1]))
        return _channels_px(_avg2(_avg2(lc, tlc), _avg2(tc, trc)))
    if mode == 11:  # Select
        p_l = int(np.abs(lc - tlc).sum())
        p_t = int(np.abs(tc - tlc).sum())
        return top if p_l <= p_t else left
    if mode == 12:  # ClampAddSubtractFull
        return _channels_px(lc + tc - tlc)
    if mode == 13:  # ClampAddSubtractHalf
        # (ave - TL) / 2 with C semantics: truncation toward ZERO
        # (libwebp AddSubtractComponentHalf), not Python floor — they
        # differ by one for negative odd deltas
        ave = _avg2(lc, tc)
        delta = ave - tlc
        half = np.sign(delta) * (np.abs(delta) // 2)
        return _channels_px(ave + half)
    raise ValueError(f"VP8L: predictor mode {mode}")


def _inv_predictor(
    argb: np.ndarray, w: int, h: int, bits: int, timg: np.ndarray
) -> np.ndarray:
    flat = argb.copy()
    mw = _subsample(w, bits)
    modes = ((timg >> 8) & 0xFF).astype(np.int64)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(flat[pos - 1])  # top row: left
        elif x == 0:
            pred = int(flat[pos - w])  # left column: top
        else:
            mode = int(modes[(y >> bits) * mw + (x >> bits)])
            pred = _predict(mode, flat, pos, w)
        # per-channel add mod 256
        s = int(flat[pos])
        flat[pos] = (
            (((s >> 24) + (pred >> 24)) & 0xFF) << 24
            | ((((s >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
            | ((((s >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
            | (((s & 0xFF) + (pred & 0xFF)) & 0xFF)
        )
    return flat


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (spec §4.3)."""
    return (t.astype(np.int8).astype(np.int32)
            * c.astype(np.int8).astype(np.int32)) >> 5


def _inv_color_transform(
    argb: np.ndarray, w: int, h: int, bits: int, timg: np.ndarray
) -> np.ndarray:
    mw = _subsample(w, bits)
    ys, xs = np.divmod(np.arange(w * h), w)
    elem = timg[(ys >> bits) * mw + (xs >> bits)]
    g2r = (elem & 0xFF).astype(np.uint8)
    g2b = ((elem >> 8) & 0xFF).astype(np.uint8)
    r2b = ((elem >> 16) & 0xFF).astype(np.uint8)
    a = (argb >> 24) & 0xFF
    r = ((argb >> 16) & 0xFF).astype(np.int32)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.int32)
    r = (r + _ct_delta(g2r, g)) & 0xFF
    b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r.astype(np.uint8))) & 0xFF
    return (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & 0xFF00FF00) | (r << 16) | b


def _inv_palette(
    argb: np.ndarray, packed_w: int, w: int, h: int,
    palette: np.ndarray, width_bits: int,
) -> np.ndarray:
    idx = ((argb >> 8) & 0xFF).astype(np.int64).reshape(h, packed_w)
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits
        cols = []
        for i in range(per):
            cols.append((idx >> (i * bits)) & ((1 << bits) - 1))
        idx = np.stack(cols, axis=-1).reshape(h, packed_w * per)[:, :w]
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("VP8L: palette index out of range")
    return palette[idx.reshape(-1)]


def decode_vp8l_stream(
    data: bytes, w: int, h: int, br: BitReader | None = None
) -> np.ndarray:
    """Decode a spatially-coded VP8L image of known size (transforms +
    entropy image). Returns flat uint32 ARGB of length w*h. Used both
    for the VP8L chunk body (after its size header) and the headerless
    ALPH-chunk stream."""
    if br is None:
        br = BitReader(data)
    transforms: list[tuple] = []
    seen: set[int] = set()
    cur_w = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 2:
            transforms.append(("subgreen",))
        elif ttype in (0, 1):
            bits = br.read(3) + 2
            tw, th = _subsample(cur_w, bits), _subsample(h, bits)
            timg = _decode_entropy_image(br, tw, th, False)
            transforms.append(
                ("pred" if ttype == 0 else "color", bits, timg, cur_w)
            )
        else:  # color indexing
            n = br.read(8) + 1
            pal = _decode_entropy_image(br, n, 1, False)
            # palette entries are component-wise delta-coded: each
            # channel accumulates over the previous entry, mod 256
            prev = np.zeros(4, dtype=np.uint32)
            entries = []
            for e in pal:
                cur = np.array(
                    [(int(e) >> s) & 0xFF for s in (24, 16, 8, 0)],
                    dtype=np.uint32,
                )
                prev = (prev + cur) & 0xFF
                entries.append(
                    (prev[0] << 24) | (prev[1] << 16)
                    | (prev[2] << 8) | prev[3]
                )
            palette = np.array(entries, dtype=np.uint32)
            width_bits = (
                3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
            )
            packed_w = _subsample(cur_w, width_bits)
            transforms.append(
                ("palette", palette, width_bits, cur_w, packed_w)
            )
            cur_w = packed_w
    argb = _decode_entropy_image(br, cur_w, h, True)
    for t in reversed(transforms):
        if t[0] == "subgreen":
            argb = _inv_subtract_green(argb)
        elif t[0] == "pred":
            _, bits, timg, tw = t
            argb = _inv_predictor(argb, tw, h, bits, timg)
        elif t[0] == "color":
            _, bits, timg, tw = t
            argb = _inv_color_transform(argb, tw, h, bits, timg)
        else:
            _, palette, width_bits, orig_w, packed_w = t
            argb = _inv_palette(
                argb, packed_w, orig_w, h, palette, width_bits
            )
    return argb


def decode_vp8l_chunk(chunk: bytes) -> tuple[np.ndarray, int, int]:
    """VP8L chunk body: 0x2F signature, 14-bit w-1 / h-1, alpha hint,
    3-bit version, then the spatially-coded image."""
    if not chunk or chunk[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(chunk)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint (informational)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L: unsupported version {version}")
    return decode_vp8l_stream(chunk, w, h, br=br), w, h


def riff_chunks(payload: bytes):
    """Yield ``(tag, body)`` for each chunk of a RIFF/WEBP container
    (word-aligned per the RIFF spec; a size that overruns the payload
    yields the truncated body, matching libwebp's tolerant parse).
    The ONE chunk walk — decode_webp and the multimodal stats path
    both iterate this, so padding/truncation fixes land once."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        yield tag, payload[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a WebP file — lossless ('VP8L', this module) OR lossy
    ('VP8 ', the RFC 6386 keyframe decoder in ``operators/vp8.py``,
    pinned bit-exact against libwebp in tests/test_vp8.py), including
    extended ('VP8X') files whose alpha rides in an ALPH chunk — to an
    (h, w, 3) RGB or (h, w, 4) RGBA uint8 array (alpha kept only when
    not fully opaque). The lossy RGB conversion is the repo's
    documented ``yuv420_to_rgb`` (the VP8 spec ends at YUV)."""
    vp8l = vp8 = alph = None
    for tag, body in riff_chunks(payload):
        if tag == b"VP8L":
            vp8l = body
            break  # VP8L carries its own alpha; ALPH never follows
        if tag == b"VP8 ":
            vp8 = body
            break  # ALPH precedes the image chunk in extended files
        if tag == b"ALPH":
            alph = body
    if vp8l is not None:
        argb, w, h = decode_vp8l_chunk(vp8l)
        a = ((argb >> 24) & 0xFF).astype(np.uint8)
        r = ((argb >> 16) & 0xFF).astype(np.uint8)
        g = ((argb >> 8) & 0xFF).astype(np.uint8)
        b = (argb & 0xFF).astype(np.uint8)
        if bool((a == 255).all()):
            return np.stack([r, g, b], axis=-1).reshape(h, w, 3)
        return np.stack([r, g, b, a], axis=-1).reshape(h, w, 4)
    if vp8 is None:
        raise ValueError("WebP: no VP8/VP8L image chunk found")
    from .vp8 import decode_vp8_yuv, yuv420_to_rgb

    y, u, v = decode_vp8_yuv(vp8)
    rgb = yuv420_to_rgb(y, u, v)
    if alph is not None:
        h, w = y.shape
        a = decode_alpha_chunk(alph, w, h)
        if not bool((a == 255).all()):
            return np.dstack([rgb, a])
    return rgb


def decode_alpha_chunk(alph: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk of an extended WebP file (spec §'Alpha'): 1-byte
    header (reserved:2 | preprocessing:2 | filtering:2 | compression:2),
    then either raw bytes or a HEADERLESS VP8L stream whose green
    channel carries the alpha plane. Returns an (h, w) uint8 plane.

    This is the codec path a REAL libwebp-encoded file exercises in
    tests (lossy+alpha files ship VP8L-coded alpha), making it the
    empirical compliance check for the whole VP8L machinery."""
    head = alph[0]
    compression = head & 0x3
    filtering = (head >> 2) & 0x3
    if compression == 0:
        plane = np.frombuffer(
            alph[1:], dtype=np.uint8, count=w * h
        ).reshape(h, w).copy()
    elif compression == 1:
        argb = decode_vp8l_stream(alph[1:], w, h)
        plane = ((argb >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    else:
        raise ValueError(f"ALPH: unknown compression {compression}")
    if filtering:
        plane = plane.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = plane[0, x - 1]
                elif x == 0:
                    pred = plane[y - 1, 0]
                elif filtering == 1:
                    pred = plane[y, x - 1]
                elif filtering == 2:
                    pred = plane[y - 1, x]
                else:  # gradient
                    pred = int(
                        np.clip(
                            plane[y, x - 1]
                            + plane[y - 1, x]
                            - plane[y - 1, x - 1],
                            0,
                            255,
                        )
                    )
                plane[y, x] = (plane[y, x] + pred) & 0xFF
        plane = plane.astype(np.uint8)
    return plane


# ------------------------------------------------------------- encoder


def write_prefix_code(
    bw: BitWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Emit a 'normal' prefix code declaring exactly ``lengths`` (one
    per alphabet symbol; zeros = absent) and return the symbol ->
    (code, bits) map for emitting data. Fixture/test helper: the
    length sequence is written symbol-by-symbol without run
    compression, and the code-length code is a balanced (complete)
    code over the distinct length values present. Lengths must form a
    complete prefix code themselves (PrefixCode validates Kraft)."""
    import math

    used = sorted({ln for ln in lengths})
    if len(used) == 1:
        cl_len = {used[0]: 1}  # reader: single-symbol CL, 0-bit reads
    else:
        bits = math.ceil(math.log2(len(used)))
        n_short = (1 << bits) - len(used)
        cl_len = {
            s: (bits - 1) if i < n_short else bits
            for i, s in enumerate(used)
        }
    order_idx = {sym: i for i, sym in enumerate(_CL_ORDER)}
    num_cl = max(4, max(order_idx[s] for s in cl_len) + 1)
    bw.write(0, 1)  # not simple
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_len.get(_CL_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut
    cl19 = [0] * 19
    for s, ln in cl_len.items():
        cl19[s] = ln
    cl_enc = PrefixCode(cl19).encode_map()
    for ln in lengths:
        c, n = cl_enc[ln]
        bw.write_code(c, n)
    return PrefixCode(lengths).encode_map()


def balanced_lengths(symbols: list[int], alphabet_size: int) -> list[int]:
    """Complete (Kraft = 1) code lengths over ``symbols`` inside an
    alphabet: k symbols get lengths ceil(log2 k) with the first
    2^ceil - k shortened by one (all length 0 elsewhere). Fixture
    helper for handcrafting decoder-path tests."""
    import math

    lengths = [0] * alphabet_size
    k = len(symbols)
    if k == 1:
        lengths[symbols[0]] = 1  # PrefixCode single-symbol: 0-bit
        return lengths
    bits = math.ceil(math.log2(k))
    n_short = (1 << bits) - k
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = (bits - 1) if i < n_short else bits
    return lengths


def _write_flat_green_code(bw: BitWriter) -> None:
    """Normal prefix code for the green/length alphabet (280 symbols):
    256 literals at length 8, the 24 length symbols absent — a complete
    flat 8-bit code (256 * 2^-8 = 1). The reader stops after the 24
    zeros (the full alphabet is covered)."""
    bw.write(0, 1)  # not simple
    # code-length code: symbols {8: len 1, 18: len 1}; read order puts
    # 18 at index 1 and 8 at index 11 -> 12 lengths read
    bw.write(12 - 4, 4)
    for v in [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]:
        bw.write(v, 3)
    bw.write(0, 1)  # no max_symbol shortcut
    # canonical CL code: 8 -> bit 0, 18 -> bit 1
    for _ in range(256):
        bw.write_code(0, 1)  # length 8
    bw.write_code(1, 1)  # symbol 18: run of 24 zeros
    bw.write(24 - 11, 7)


def _write_lz77_green_code(bw: BitWriter) -> None:
    """Green/length code for the LZ77 encoder mode: 256 literals at
    length 9 plus length-prefix symbol 258 (run length 3) at length 1.
    Kraft: 256 * 2^-9 + 2^-1 = 1. Canonical assignment gives symbol 258
    the 1-bit code '0' and literal i the 9-bit code '1' + i — so a
    backreference costs one bit."""
    bw.write(0, 1)  # not simple
    # CL code over {0, 1, 9, 18}, each length 2; read order indexes:
    # 0->2, 1->3, 9->12, 18->1 -> 13 lengths read
    bw.write(13 - 4, 4)
    for v in [0, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 2]:
        bw.write(v, 3)
    bw.write(0, 1)  # no max_symbol shortcut
    # canonical CL codes (len 2, symbol order): 0->00, 1->01, 9->10,
    # 18->11
    for _ in range(256):
        bw.write_code(0b10, 2)  # literal lengths: 9
    bw.write_code(0b00, 2)  # symbol 256: absent
    bw.write_code(0b00, 2)  # symbol 257: absent
    bw.write_code(0b01, 2)  # symbol 258 (length 3): code length 1
    bw.write_code(0b11, 2)  # 21 remaining zeros via symbol 18
    bw.write(21 - 11, 7)


def _write_flat_256(bw: BitWriter) -> None:
    """Flat 8-bit code over exactly 256 symbols (red/blue/alpha)."""
    bw.write(0, 1)
    bw.write(12 - 4, 4)
    for v in [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]:
        bw.write(v, 3)
    bw.write(0, 1)
    for _ in range(256):
        bw.write_code(0, 1)


def _write_simple_single(bw: BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def encode_vp8l(
    img: np.ndarray, subtract_green: bool = False, use_lz77: bool = False
) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as a lossless WebP file.

    Fixture-grade encoder: flat 8-bit literal codes, no color cache or
    meta codes; ``subtract_green`` applies the forward transform (the
    decoder must invert it), ``use_lz77`` emits a backward reference
    for each run of repeated pixels using 2D distance code (1,0) —
    exercising the distance-mapping path."""
    h, w, ch = img.shape
    assert ch == 3 and img.dtype == np.uint8
    r = img[:, :, 0].astype(np.int32).reshape(-1)
    g = img[:, :, 1].astype(np.int32).reshape(-1)
    b = img[:, :, 2].astype(np.int32).reshape(-1)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    if use_lz77:
        _write_lz77_green_code(bw)
    else:
        _write_flat_green_code(bw)
    _write_flat_256(bw)  # red
    _write_flat_256(bw)  # blue
    _write_simple_single(bw, 255)  # alpha: always 255, 0 bits/px
    # distance tree: single prefix symbol for 2D distance code 2 =
    # _DIST_MAP entry (1, 0), the left neighbor in scan order:
    # _lz77_symbol(2) -> symbol 1, no extra bits
    left_code = _DIST_MAP.index((1, 0)) + 1
    dist_sym, _, dist_nbits = _lz77_symbol(left_code)
    assert (dist_sym, dist_nbits) == (1, 0), _DIST_MAP[:4]
    _write_simple_single(bw, dist_sym)
    i = 0
    n = w * h
    while i < n:
        if (
            use_lz77
            and i > 0
            and i + 3 <= n
            and g[i] == g[i - 1]
            and r[i] == r[i - 1]
            and b[i] == b[i - 1]
            and g[i + 1] == g[i]
            and r[i + 1] == r[i]
            and b[i + 1] == b[i]
            and g[i + 2] == g[i]
            and r[i + 2] == r[i]
            and b[i + 2] == b[i]
        ):
            # length-3 backreference to the left neighbor: green
            # symbol 258 = 1-bit code '0'; distance tree is 0-bit
            bw.write_code(0, 1)
            i += 3
            continue
        if use_lz77:
            bw.write_code(0b100000000 | int(g[i]), 9)
        else:
            bw.write_code(int(g[i]), 8)
        bw.write_code(int(r[i]), 8)
        bw.write_code(int(b[i]), 8)
        i += 1
    payload = bytes([0x2F]) + bw.tobytes()
    return _riff_wrap(payload)


def _riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
