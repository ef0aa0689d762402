"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public
standard): marker parse, DQT/DHT/SOF0/SOS, Huffman entropy coding,
zigzag, dequantization, 8x8 IDCT, level shift, and YCbCr->RGB — no
libjpeg. Supports BASELINE sequential, 8-bit, 1-component (grayscale)
and 3-component 4:4:4 (no chroma subsampling); progressive, 4:2:0/
4:2:2 subsampling, 12-bit, and arithmetic coding raise loudly.

The encoder exists so the correctness gate can exercise the decoder on
REAL bitstreams: it writes standard Annex K Huffman/quant tables, byte
stuffing, DC prediction — everything a conforming decoder must parse.
JPEG is lossy, so the oracle-exact contract uses CONSTANT blocks
(FDCT of a constant image is DC-only; with the Annex K luminance table
q[0,0] = 16, any value with an even offset from 128 quantizes and
reconstructs EXACTLY — see ``synthetic_jpeg``); non-constant content
is covered by quantization-error-bound roundtrip tests in
tests/test_jpeg.py.

Reference parity: the reference treats JPEG blobs as opaque payloads
(no decode anywhere in ivanemoje/scalable-etl); this codec extends the
multimodal surface past it, completing native decode for all three
image formats (netpbm, PNG, JPEG) with only video/audio-compressed
formats left to ffmpeg.
"""

from __future__ import annotations

# ------------------------------------------------------------ tables

# Annex K.1 luminance / K.2 chrominance quantization tables (natural
# row-major order).
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Zigzag scan: _ZIGZAG[i] = natural index of the i-th zigzag element.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix: FDCT = M @ B @ M.T (on level-
    shifted blocks), IDCT = M.T @ C @ M — the float reference path
    (T.81 Annex A defines the ideal transform; conformance allows
    float implementations)."""
    import math

    import numpy as np

    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


def _huffman_codes(bits, vals):
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huffman_lut(bits, vals):
    """(code, length) -> symbol decode map."""
    return {cl: sym for sym, cl in _huffman_codes(bits, vals).items()}


def _category(v: int) -> int:
    """Bit category of a DC diff / AC value (T.81 F.1.2.1.1)."""
    a = abs(v)
    n = 0
    while a:
        a >>= 1
        n += 1
    return n


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def value_bits(self, v: int, size: int):
        if size == 0:
            return
        if v < 0:
            v = v + (1 << size) - 1  # one's-complement negative coding
        self.put(v, size)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data "
                    "(restart markers not supported)"
                )
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.bit()
        return v

    def decode_symbol(self, lut: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = lut.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map received bits to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ----------------------------------------------------------- encoder


def encode_jpeg(img, quality_tables=None) -> bytes:
    """Encode a uint8 array — (h, w) grayscale or (h, w, 3) RGB — as a
    BASELINE sequential JPEG (4:4:4 for color: every component at full
    resolution), standard Annex K Huffman + quantization tables.
    Dimensions are padded to 8-multiples with edge replication."""
    import struct

    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if gray:
        comps = [a.astype(np.float64)]
        qts = [np.array(_QT_LUMA, dtype=np.float64).reshape(8, 8)]
        qids = [0]
        hids = [(0, 0)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
        qluma = np.array(_QT_LUMA, dtype=np.float64).reshape(8, 8)
        qchroma = np.array(_QT_CHROMA, dtype=np.float64).reshape(8, 8)
        qts = [qluma, qchroma, qchroma]
        qids = [0, 1, 1]
        hids = [(0, 0), (1, 1), (1, 1)]
    if quality_tables is not None:
        qts = [np.asarray(q, dtype=np.float64).reshape(8, 8) for q in
               quality_tables]

    M = _dct_matrix()
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = []
    for c in comps:
        p = np.empty((bh * 8, bw * 8), dtype=np.float64)
        p[:h, :w] = c
        p[h:, :w] = c[-1:, :]
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p)

    dc_tabs = [_huffman_codes(*_DC_LUMA), _huffman_codes(*_DC_CHROMA)]
    ac_tabs = [_huffman_codes(*_AC_LUMA), _huffman_codes(*_AC_CHROMA)]
    bw_ = _BitWriter()
    pred = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, p in enumerate(padded):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = M @ block @ M.T
                q = np.rint(coef / qts[qids[ci]]).astype(np.int64)
                zz = [int(q.flat[_ZIGZAG[i]]) for i in range(64)]
                dct_t = dc_tabs[hids[ci][0]]
                act_t = ac_tabs[hids[ci][1]]
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                size = _category(diff)
                code, ln = dct_t[size]
                bw_.put(code, ln)
                bw_.value_bits(diff, size)
                run = 0
                last_nz = 0
                for i in range(63, 0, -1):
                    if zz[i]:
                        last_nz = i
                        break
                for i in range(1, last_nz + 1):
                    v = zz[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act_t[0xF0]  # ZRL
                        bw_.put(code, ln)
                        run -= 16
                    size = _category(v)
                    code, ln = act_t[(run << 4) | size]
                    bw_.put(code, ln)
                    bw_.value_bits(v, size)
                    run = 0
                if last_nz < 63:
                    code, ln = act_t[0x00]  # EOB
                    bw_.put(code, ln)
    entropy = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    # DQT: one segment per distinct table id actually referenced
    for qid in sorted(set(qids)):
        zz_q = bytes(
            int(qts[qids.index(qid)].flat[_ZIGZAG[i]]) for i in range(64)
        )
        out += seg(0xFFDB, bytes([qid]) + zz_q)
    ncomp = len(comps)
    # SOF carries the TRUE dimensions; decoders scan ceil(d/8) blocks
    # and crop — encoding the padded dims would change the image size.
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])  # 1x1 sampling: 4:4:4
    out += seg(0xFFC0, sof)
    dhts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ncomp == 3:
        dhts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, vals) in dhts:
        out += seg(0xFFC4, bytes([tc_th] + bits + vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        dc_id, ac_id = hids[ci]
        sos += bytes([ci + 1, (dc_id << 4) | ac_id])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------- decoder


def decode_jpeg(payload: bytes):
    """Decode a BASELINE sequential JPEG to uint8 (h, w) grayscale or
    (h, w, 3) RGB. 4:4:4 only; progressive (SOF2), subsampled chroma,
    12-bit, arithmetic coding, and restart intervals raise
    NotImplementedError/ValueError rather than producing wrong pixels."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, "np.ndarray"] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    frame = None
    scan = None
    entropy_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.float64)
                for k in range(64):
                    tbl[_ZIGZAG[k]] = body[i + 1 + k]
                qts[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                lut = _huffman_lut(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
                i += 17 + nv
        elif marker == 0xFFC0:
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            hgt, wid = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (only 4:4:4 / grayscale)"
                    )
                comps.append((cid, tq))
            frame = (hgt, wid, comps)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:04X})"
            )
        elif marker == 0xFFDD:
            raise NotImplementedError("JPEG restart intervals")
        elif marker == 0xFFDA:
            ns = body[0]
            scan = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4,
                 body[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            entropy_start = pos + 2 + ln
            break
        pos += 2 + ln
    if frame is None or scan is None or entropy_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    hgt, wid, comps = frame
    if len(scan) != len(comps):
        raise ValueError("JPEG scan/frame component mismatch")
    # entropy data runs until EOI
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(payload[entropy_start:end])
    M = _dct_matrix()
    bh, bw = (hgt + 7) // 8, (wid + 7) // 8
    planes = [
        np.empty((bh * 8, bw * 8), dtype=np.float64) for _ in comps
    ]
    pred = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, (_cid, tq) in enumerate(comps):
                if tq not in qts:
                    raise ValueError(f"JPEG references missing DQT {tq}")
                _sid, dc_id, ac_id = scan[ci]
                if dc_id not in dc_luts or ac_id not in ac_luts:
                    raise ValueError("JPEG references missing DHT")
                dlut, alut = dc_luts[dc_id], ac_luts[ac_id]
                zz = [0] * 64
                size = reader.decode_symbol(dlut)
                diff = _extend(reader.receive(size), size)
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(alut)
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC run overflow")
                    zz[k] = _extend(reader.receive(size), size)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                for i in range(64):
                    coef[_ZIGZAG[i]] = zz[i]
                block = M.T @ (coef.reshape(8, 8) * qts[tq]) @ M
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    block + 128.0
                )
    planes = [p[:hgt, :wid] for p in planes]
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------------------------ exact-gate contract

# Constant-gray contract for the oracle gate: a 16x16 grayscale JPEG
# whose every pixel is val = 104 + 2*(doc_id % 25). A constant block's
# FDCT is DC-only with DC = 8*(val-128); the Annex K luminance table
# has q[0,0] = 16, so the quantized DC is (val-128)/2 — an INTEGER for
# even offsets — and reconstruction is bit-exact: decode returns the
# constant val. The bitstream is still a full baseline JPEG (markers,
# Huffman DC coding with per-block zero diffs, EOB-coded AC, byte
# stuffing when the entropy stream hits 0xFF).
JPEG_W = JPEG_H = 16


def jpeg_const_value(doc_id: int) -> int:
    return 104 + 2 * (doc_id % 25)


def _const_jpeg(val: int) -> bytes:
    import numpy as np

    return encode_jpeg(np.full((JPEG_H, JPEG_W), val, dtype=np.uint8))


def synthetic_jpeg(doc_id: int) -> bytes:
    """Payload for ``doc_id``'s value class. Only 25 distinct images
    exist by construction, so the ENCODER memoizes per class (per
    executor worker); the DECODE side stays per-row — that is the path
    the gate exercises."""
    import functools

    global _const_jpeg
    if not hasattr(_const_jpeg, "cache_info"):
        _const_jpeg = functools.lru_cache(maxsize=64)(_const_jpeg)
    return _const_jpeg(jpeg_const_value(doc_id))
