"""Pure-Python baseline JPEG decoder (ITU-T T.81 sequential DCT, 8-bit).

Closes the last common image format that previously required
``fake=True`` in :mod:`multimodal`: web corpora are dominated by
JPEG/PNG, and this container ships no codec library.  Scope:

- baseline sequential DCT (SOF0), 8-bit precision
- 1 (grayscale) or 3 (YCbCr) components
- chroma subsampling 4:4:4, 4:2:2, 4:2:0 (h/v factors 1-2)
- restart intervals (DRI/RSTn), multiple DQT/DHT segments
- progressive (SOF2), arithmetic coding, 12-bit: ``NotImplementedError``

The hot loop is per-coefficient Python (fine for test-scale images; a
production deployment vendors libjpeg-turbo), but the IDCT runs as one
numpy basis-matrix sandwich per block and the color transform is one
vectorized pass per image.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg"]

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 DCT-II basis matrix C: IDCT(block) = C.T @ block @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, with 0xFF00
    byte-unstuffing; stops (returns marker) at any real 0xFFxx marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        if self.marker is not None:
            # past a marker: feed zero bits (T.81 F.2.2.5 padding rule)
            self.bits = (self.bits << 8) & 0xFFFFFFFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bits >> self.nbits) & ((1 << n) - 1)

    def align(self):
        self.nbits = 0
        self.bits = 0

    def sync_rst(self):
        """Consume an expected RSTn marker between restart intervals."""
        self.align()
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.marker = None
            return
        # marker not yet consumed from the stream: scan forward
        while self.pos < len(self.data) - 1:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: missing restart marker")


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, per T.81 Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1: map t raw bits to a signed coefficient."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(blob: bytes) -> "np.ndarray":
    """bytes -> HxWx3 uint8 RGB (grayscale replicated to 3 channels)."""
    if blob[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(id, hf, vf, tq), ...]
    n = len(blob)

    while pos < n:
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", blob, pos)
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, o).astype(np.int32)
                o += 64
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = seg[o + 17 : o + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []  # (comp_idx, dc_tbl, ac_tbl)
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(frame[2]) if c[0] == cs)
                scan.append((ci, tt >> 4, tt & 0xF))
            return _decode_scan(
                blob, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(blob, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for _cid, hf, vf, _tq in comps:
        planes.append(np.zeros((mcuy * vf * 8, mcux * hf * 8), np.float64))

    r = _BitReader(blob, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.sync_rst()
                pred = [0] * len(comps)
            for ci, dct, act in scan:
                _cid, hf, vf, tq = comps[ci]
                for by in range(vf):
                    for bx in range(hf):
                        coeffs = np.zeros(64, np.int32)
                        t = _huff_decode(r, huff_dc[dct])
                        diff = _extend(r.read(t), t) if t else 0
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, huff_ac[act])
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coeffs[k] = _extend(r.read(ss), ss)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[_ZIGZAG] = coeffs * qt[tq]
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * vf + by) * 8
                        x0 = (mx * hf + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # upsample each component to full MCU-grid resolution, crop to (h, w)
    full = []
    for (cid, hf, vf, tq), plane in zip(comps, planes):
        if hf != hmax or vf != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vf, 0), hmax // hf, 1)
        full.append(plane[:h, :w])

    if len(comps) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
