"""Independent JPEG ENCODER (baseline + progressive) for the decoder oracle.

Written from ITU-T T.81 Annexes C/F/K directly — shares no code with
``tidierdb_jl_spark.llm.jpeg`` (the decoder under test).  Uses the
Annex K example quantization + huffman tables.  Supports grayscale,
4:4:4 and 4:2:0 color, optional restart intervals.

Note on oracle strength: JPEG is lossy, so the test asserts the decoder
reproduces the ORIGINAL pixels within a PSNR bound (plus exactness on
DC-only images where quantization is lossless).  A compensating-error
pair (encoder and decoder both wrong the same way) is the residual risk;
mitigated by asserting spec-fixed intermediate structure (marker layout,
table checksums) and DC-exactness, where the math has one right answer.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 quantization tables (quality 50)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32)

# Annex K.3 typical huffman tables: (BITS list, HUFFVAL bytes)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           bytes(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             bytes(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _fdct(block):
    return _D @ block @ _D.T


def _huff_codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _mag(v):
    """signed coefficient -> (size, raw bits)"""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _encode_block(w, block, qtab, dc_codes, ac_codes, pred):
    q = np.round(_fdct(block) / qtab.reshape(8, 8)).astype(np.int32)
    zz = q.reshape(-1)[ZIGZAG]
    return _encode_zz_block(w, zz, dc_codes, ac_codes, pred)


def _encode_zz_block(w, zz, dc_codes, ac_codes, pred):
    """Emit one already-quantized zigzag block as baseline entropy data."""
    diff = int(zz[0]) - pred
    t, bitsv = _mag(diff)
    w.put(*dc_codes[t])
    if t:
        w.put(t, bitsv)
    run = 0
    last_nz = max(np.nonzero(zz[1:])[0]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        t, bitsv = _mag(v)
        w.put(*ac_codes[(run << 4) | t])
        w.put(t, bitsv)
        run = 0
    if last_nz < 63:
        w.put(*ac_codes[0x00])  # EOB
    return int(zz[0])


def encode_jpeg(arr, subsampling="444", restart_interval=0):
    """HxWx3 uint8 RGB (or HxW grayscale) -> baseline JFIF bytes."""
    gray = arr.ndim == 2
    h, w_ = arr.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, payload):
        out.extend(marker + struct.pack(">H", len(payload) + 2) + payload)

    seg(b"\xff\xdb", bytes([0]) + bytes(QT_LUMA.reshape(-1)[ZIGZAG].tolist()))
    if not gray:
        seg(b"\xff\xdb", bytes([1]) + bytes(QT_CHROMA.reshape(-1)[ZIGZAG].tolist()))

    hf, vf = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    if gray:
        comps = [(1, 1, 1, 0)]
    else:
        comps = [(1, hf, vf, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = bytes([8]) + struct.pack(">HH", h, w_) + bytes([len(comps)])
    for cid, chf, cvf, tq in comps:
        sof += bytes([cid, (chf << 4) | cvf, tq])
    seg(b"\xff\xc0", sof)

    for tc, th, (bits, vals) in [(0, 0, DC_LUMA), (1, 0, AC_LUMA)] + (
        [] if gray else [(0, 1, DC_CHROMA), (1, 1, AC_CHROMA)]
    ):
        seg(b"\xff\xc4", bytes([(tc << 4) | th]) + bytes(bits) + vals)

    if restart_interval:
        seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    seg(b"\xff\xda", sos)

    # color transform + plane extraction
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling != "444":
            # pad to factor-aligned dims, box-average down by (vf, hf)
            def down(p):
                p = np.pad(p, ((0, (-p.shape[0]) % vf), (0, (-p.shape[1]) % hf)),
                           "edge")
                return p.reshape(p.shape[0] // vf, vf,
                                 p.shape[1] // hf, hf).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    mcux = (w_ + 8 * hf - 1) // (8 * hf) if not gray else (w_ + 7) // 8
    mcuy = (h + 8 * vf - 1) // (8 * vf) if not gray else (h + 7) // 8

    padded = []
    for (cid, chf, cvf, tq), p in zip(comps, planes):
        ph, pw = mcuy * cvf * 8, mcux * chf * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
        padded.append(pp)

    dc_tabs = {0: _huff_codes(*DC_LUMA), 1: _huff_codes(*DC_CHROMA)}
    ac_tabs = {0: _huff_codes(*AC_LUMA), 1: _huff_codes(*AC_CHROMA)}
    qtabs = {0: QT_LUMA, 1: QT_CHROMA}

    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out.extend(bw.out)
                bw = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                pred = [0] * len(comps)
            for ci, (cid, chf, cvf, tq) in enumerate(comps):
                for by in range(cvf):
                    for bx in range(chf):
                        y0, x0 = (my * cvf + by) * 8, (mx * chf + bx) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, blk, qtabs[tq], dc_tabs[0 if cid == 1 else 1],
                            ac_tabs[0 if cid == 1 else 1], pred[ci])
            mcu += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def encode_jpeg_multiscan(arr, subsampling="444", restart_interval=0):
    """Baseline JFIF with one NON-INTERLEAVED scan per component (T.81
    §B.2.3 multi-scan sequential): same headers/tables as ``encode_jpeg``
    but each component's blocks arrive in their own SOS, iterated over the
    component's NOMINAL block grid (ceil of scaled dims, not MCU-padded).
    DC prediction and the restart counter reset per scan; in a
    non-interleaved scan one data unit is one MCU for restart purposes.
    Written independently of the decoder under test — same quantized
    coefficients as ``encode_jpeg``, so decode must be pixel-identical."""
    gray = arr.ndim == 2
    comps, zzs, (h, w_), (_mcux, _mcuy) = _quantized_components(arr, subsampling)
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(marker + struct.pack(">H", len(payload) + 2) + payload)

    seg(b"\xff\xdb", bytes([0]) + bytes(QT_LUMA.reshape(-1)[ZIGZAG].tolist()))
    if not gray:
        seg(b"\xff\xdb", bytes([1]) + bytes(QT_CHROMA.reshape(-1)[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w_) + bytes([len(comps)])
    for cid, chf, cvf, tq in comps:
        sof += bytes([cid, (chf << 4) | cvf, tq])
    seg(b"\xff\xc0", sof)
    for tc, th, (bits, vals) in [(0, 0, DC_LUMA), (1, 0, AC_LUMA)] + (
        [] if gray else [(0, 1, DC_CHROMA), (1, 1, AC_CHROMA)]
    ):
        seg(b"\xff\xc4", bytes([(tc << 4) | th]) + bytes(bits) + vals)
    if restart_interval:
        seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    dc_tabs = {0: _huff_codes(*DC_LUMA), 1: _huff_codes(*DC_CHROMA)}
    ac_tabs = {0: _huff_codes(*AC_LUMA), 1: _huff_codes(*AC_CHROMA)}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for ci, (cid, chf, cvf, _tq) in enumerate(comps):
        seg(b"\xff\xda", bytes([1, cid, 0x00 if cid == 1 else 0x11, 0, 63, 0]))
        th = 0 if cid == 1 else 1
        bw_n = (-(-w_ * chf // hmax) + 7) // 8
        bh_n = (-(-h * cvf // vmax) + 7) // 8
        bw = _BitWriter()
        pred = 0
        nunit = 0
        rst = 0
        for by in range(bh_n):
            for bx in range(bw_n):
                if restart_interval and nunit and nunit % restart_interval == 0:
                    bw.flush()
                    out.extend(bw.out)
                    bw = _BitWriter()
                    out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                    rst += 1
                    pred = 0
                pred = _encode_zz_block(
                    bw, zzs[ci][by, bx], dc_tabs[th], ac_tabs[th], pred
                )
                nunit += 1
        bw.flush()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — T.81 Annex G, written independently of the
# decoder under test.  Emits a full successive-approximation scan script
# (DC first + refine, per-band AC first + refine with real EOB runs and
# buffered correction bits) over the SAME quantized coefficients the
# baseline encoder produces, so progressive-vs-baseline decode must be
# pixel-identical.  Huffman tables are built per scan from the actual
# symbol set (canonical, fixed length, all-ones codeword avoided).
# ---------------------------------------------------------------------------


def _quantized_components(arr, subsampling):
    """Shared front half of encoding: color transform, subsample, pad,
    FDCT + quantize.  Returns (comps_meta, list of (bh, bw, 64) zigzag
    int arrays, (h, w))."""
    gray = arr.ndim == 2
    h, w_ = arr.shape[:2]
    hf, vf = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [arr.astype(np.float64) - 128.0]
        hf = vf = 1
    else:
        comps = [(1, hf, vf, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling != "444":
            def down(p):
                p = np.pad(p, ((0, (-p.shape[0]) % vf), (0, (-p.shape[1]) % hf)),
                           "edge")
                return p.reshape(p.shape[0] // vf, vf,
                                 p.shape[1] // hf, hf).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    mcux = (w_ + 8 * hf - 1) // (8 * hf)
    mcuy = (h + 8 * vf - 1) // (8 * vf)
    qtabs = {0: QT_LUMA, 1: QT_CHROMA}
    out = []
    for (cid, chf, cvf, tq), p in zip(comps, planes):
        ph, pw = mcuy * cvf * 8, mcux * chf * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
        bh, bw = ph // 8, pw // 8
        zz = np.zeros((bh, bw, 64), np.int32)
        for by in range(bh):
            for bx in range(bw):
                q = np.round(
                    _fdct(pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8])
                    / qtabs[tq].reshape(8, 8)
                ).astype(np.int32)
                zz[by, bx] = q.reshape(-1)[ZIGZAG]
        out.append(zz)
    return comps, out, (h, w_), (mcux, mcuy)


class _OpStream:
    """Scan emission buffer: huffman symbols + raw bits + restarts are
    recorded first, the per-scan huffman table is built from the symbols
    actually used, then everything serializes through _BitWriter."""

    def __init__(self):
        self.ops = []

    def sym(self, s):
        self.ops.append(("h", s))

    def bits(self, n, v):
        if n:
            self.ops.append(("b", n, v & ((1 << n) - 1)))

    def rst(self, i):
        self.ops.append(("r", i % 8))

    def table(self):
        syms = sorted({o[1] for o in self.ops if o[0] == "h"})
        k = len(syms)
        L = max(2, (k + 1).bit_length())  # all-ones codeword never assigned
        bits = [0] * 16
        bits[L - 1] = k
        return bits, bytes(syms), {s: (L, i) for i, s in enumerate(syms)}

    def serialize(self, codes):
        out = bytearray()
        w = _BitWriter()
        for op in self.ops:
            if op[0] == "h":
                w.put(*codes[op[1]])
            elif op[0] == "b":
                w.put(op[1], op[2])
            else:
                w.flush()
                out.extend(w.out)
                w = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + op[1]]))
        w.flush()
        out.extend(w.out)
        return bytes(out)


def _pt_ac(v, al):
    """AC point transform: magnitude shift, truncation toward zero."""
    return (abs(int(v)) >> al) * (1 if v > 0 else -1)


def encode_jpeg_progressive(
    arr, subsampling="444", restart_interval=0, al_dc=1, al_ac=1,
    bands=((1, 63),),
):
    """HxWx3 uint8 RGB (or HxW gray) -> progressive (SOF2) JPEG bytes.

    Scan script: interleaved DC first (Al=al_dc) + one DC refinement per
    bit; then per component and per spectral band, AC first (Al=al_ac)
    followed by AC refinements down to Al=0."""
    comps, zzs, (h, w_), (mcux, mcuy) = _quantized_components(arr, subsampling)
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(marker + struct.pack(">H", len(payload) + 2) + payload)

    seg(b"\xff\xdb", bytes([0]) + bytes(QT_LUMA.reshape(-1)[ZIGZAG].tolist()))
    if len(comps) > 1:
        seg(b"\xff\xdb", bytes([1]) + bytes(QT_CHROMA.reshape(-1)[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w_) + bytes([len(comps)])
    for cid, chf, cvf, tq in comps:
        sof += bytes([cid, (chf << 4) | cvf, tq])
    seg(b"\xff\xc2", sof)
    if restart_interval:
        seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    def emit_scan(ops, scomps, ss, se, ah, al, tc):
        bits, vals, codes = ops.table()
        seg(b"\xff\xc4", bytes([(tc << 4) | 0]) + bytes(bits) + vals)
        sos = bytes([len(scomps)])
        for cid in scomps:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(b"\xff\xda", sos)
        out.extend(ops.serialize(codes))

    # ---- DC first scan (interleaved, arithmetic shift by al_dc) ----
    ops = _OpStream()
    pred = [0] * len(comps)
    cnt = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and cnt and cnt % restart_interval == 0:
                ops.rst(cnt // restart_interval - 1)
                pred = [0] * len(comps)
            for ci, (_cid, chf, cvf, _tq) in enumerate(comps):
                for by in range(cvf):
                    for bx in range(chf):
                        v = int(zzs[ci][my * cvf + by, mx * chf + bx, 0]) >> al_dc
                        diff = v - pred[ci]
                        pred[ci] = v
                        t, bv = _mag(diff)
                        ops.sym(t)
                        ops.bits(t, bv)
            cnt += 1
    emit_scan(ops, [c[0] for c in comps], 0, 0, 0, al_dc, 0)

    # ---- DC refinement scans (one bit plane per scan) ----
    for a in range(al_dc - 1, -1, -1):
        ops = _OpStream()
        cnt = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and cnt and cnt % restart_interval == 0:
                    ops.rst(cnt // restart_interval - 1)
                for ci, (_cid, chf, cvf, _tq) in enumerate(comps):
                    for by in range(cvf):
                        for bx in range(chf):
                            v = int(zzs[ci][my * cvf + by, mx * chf + bx, 0])
                            ops.bits(1, (v >> a) & 1)
                cnt += 1
        emit_scan(ops, [c[0] for c in comps], 0, 0, a + 1, a, 0)

    # ---- AC scans: non-interleaved, per component, per band ----
    for ci, (cid, chf, cvf, _tq) in enumerate(comps):
        bw_n = (-(-w_ * chf // max(c[1] for c in comps)) + 7) // 8
        bh_n = (-(-h * cvf // max(c[2] for c in comps)) + 7) // 8
        blocks = [(by, bx) for by in range(bh_n) for bx in range(bw_n)]

        for ss, se in bands:
            # first AC scan at precision al_ac, with EOB runs
            ops = _OpStream()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    rr = eobrun.bit_length() - 1
                    ops.sym(rr << 4)
                    ops.bits(rr, eobrun - (1 << rr))
                    eobrun = 0

            cnt = 0
            for by, bx in blocks:
                if restart_interval and cnt and cnt % restart_interval == 0:
                    flush_eob()
                    ops.rst(cnt // restart_interval - 1)
                cnt += 1
                zz = zzs[ci][by, bx]
                sh = [_pt_ac(zz[k], al_ac) for k in range(ss, se + 1)]
                nz = [i for i, v in enumerate(sh) if v]
                if not nz:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(nz[-1] + 1):
                    v = sh[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ops.sym(0xF0)
                        run -= 16
                    t, bv = _mag(v)
                    ops.sym((run << 4) | t)
                    ops.bits(t, bv)
                    run = 0
                if nz[-1] < se - ss:
                    eobrun += 1
            flush_eob()
            emit_scan(ops, [cid], ss, se, 0, al_ac, 1)

            # refinement scans al_ac-1 .. 0, buffered correction bits
            for a in range(al_ac - 1, -1, -1):
                ops = _OpStream()
                eobrun = 0
                br_global = []

                def flush_eob_r():
                    nonlocal eobrun, br_global
                    if eobrun:
                        rr = eobrun.bit_length() - 1
                        ops.sym(rr << 4)
                        ops.bits(rr, eobrun - (1 << rr))
                        for bit in br_global:
                            ops.bits(1, bit)
                        br_global = []
                        eobrun = 0

                cnt = 0
                for by, bx in blocks:
                    if restart_interval and cnt and cnt % restart_interval == 0:
                        flush_eob_r()
                        ops.rst(cnt // restart_interval - 1)
                    cnt += 1
                    zz = zzs[ci][by, bx]
                    t = [abs(int(zz[k])) >> a for k in range(ss, se + 1)]
                    sgn = [1 if zz[k] > 0 else -1 for k in range(ss, se + 1)]
                    newly = [i for i, tv in enumerate(t) if tv == 1]
                    # mirror the decoder's walk EXACTLY: correction bits
                    # interleave in position order — after each symbol,
                    # only the bits for positions that symbol's advance
                    # traverses (through the placing/16th zero-history
                    # position), not everything buffered so far
                    i = 0
                    if newly:
                        flush_eob_r()
                    for j in newly:
                        zh = [p for p in range(i, j) if t[p] == 0]
                        run = len(zh)
                        while run > 15:
                            boundary = zh[15]  # ZRL spans 16 zero-history
                            ops.sym(0xF0)
                            for p in range(i, boundary + 1):
                                if t[p] > 1:
                                    ops.bits(1, t[p] & 1)
                            i = boundary + 1
                            zh = zh[16:]
                            run -= 16
                        ops.sym((run << 4) | 1)
                        ops.bits(1, 1 if sgn[j] > 0 else 0)
                        for p in range(i, j):
                            if t[p] > 1:
                                ops.bits(1, t[p] & 1)
                        i = j + 1
                    eob = (newly[-1] + 1) if newly else 0
                    if eob <= se - ss:
                        eobrun += 1
                        for p in range(eob, se - ss + 1):
                            if t[p] > 1:
                                br_global.append(t[p] & 1)
                        if eobrun == 32767:
                            flush_eob_r()
                flush_eob_r()
                emit_scan(ops, [cid], ss, se, a + 1, a, 1)

    out.extend(b"\xff\xd9")
    return bytes(out)
