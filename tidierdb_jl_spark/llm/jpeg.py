"""Pure-Python JPEG decoder (ITU-T T.81, 8-bit DCT).

Closes the last common image format that previously required
``fake=True`` in :mod:`multimodal`: web corpora are dominated by
JPEG/PNG, and this container ships no codec library.  Scope:

- baseline sequential DCT (SOF0/SOF1), 8-bit precision, including
  multi-scan files (non-interleaved component scans, T.81 §B.2.3)
- progressive DCT (SOF2): spectral selection, successive approximation
  (DC and AC first + refinement scans, EOB runs — T.81 Annex G)
- 1 (grayscale) or 3 (YCbCr) components
- chroma subsampling 4:4:4, 4:2:2, 4:2:0 (h/v factors 1-2)
- restart intervals (DRI/RSTn), multiple DQT/DHT segments
- hierarchical, lossless, arithmetic coding, 12-bit:
  ``NotImplementedError``

The entropy hot loop is per-coefficient Python (fine for test-scale
images; a production deployment vendors libjpeg-turbo), but the final
reconstruction (dezigzag, dequant, IDCT, color) runs as vectorized
numpy over all blocks at once.
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
    progressive = False
    coeff = None  # per-comp (blocks_y, blocks_x, 64) int32, zigzag order
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hf_, vf_ = hv >> 4, hv & 0xF
                if not (1 <= hf_ <= 4 and 1 <= vf_ <= 4):
                    raise ValueError(f"JPEG: invalid sampling factors {hf_}x{vf_}")
                comps.append((cid, hf_, vf_, tq))
            if h == 0 or w == 0 or not comps:
                raise ValueError("JPEG: empty frame")
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential and "
                "progressive supported"
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
                ci = next(
                    (j for j, c in enumerate(frame[2]) if c[0] == cs), None
                )
                if ci is None:
                    raise ValueError(f"JPEG: scan references unknown component {cs}")
                scan.append((ci, tt >> 4, tt & 0xF))
            if not progressive:
                if ns == len(frame[2]) and coeff is None:
                    # the common case: ONE interleaved scan covering every
                    # component — decode and reconstruct in a single pass
                    return _decode_scan(
                        blob, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                        restart_interval,
                    )
                # multi-scan baseline (T.81 §B.2.3: components may arrive
                # in separate scans, each over its own nominal block grid):
                # accumulate every scan into the same coefficient store the
                # progressive path uses, reconstruct once at the end
                if coeff is None:
                    coeff = _alloc_coeff(frame)
                pos = _decode_seq_scan(
                    blob, pos + seglen, frame, scan, coeff, huff_dc, huff_ac,
                    restart_interval,
                )
                continue
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coeff is None:
                coeff = _alloc_coeff(frame)
            pos = _decode_prog_scan(
                blob, pos + seglen, frame, scan, ss, se, ahal >> 4,
                ahal & 0xF, coeff, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen
    if coeff is not None:  # progressive OR multi-scan baseline
        return _reconstruct(frame, coeff, qt)
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


def _geometry(frame):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _alloc_coeff(frame):
    """Per-component coefficient store spanning the padded MCU grid
    (zigzag order) — progressive scans accumulate into these across the
    whole file, reconstruction happens once at EOI."""
    _h, _w, comps = frame
    _hm, _vm, mcux, mcuy = _geometry(frame)
    return [
        np.zeros((mcuy * vf, mcux * hf, 64), np.int32)
        for _cid, hf, vf, _tq in comps
    ]


def _decode_seq_scan(
    blob, pos, frame, scan, coeff, huff_dc, huff_ac, restart_interval
):
    """One baseline (sequential) scan of a multi-scan file (T.81 §B.2.3)
    into the persistent ``coeff`` store: full DC+AC block decode per data
    unit, interleaved MCU order when the scan carries several components,
    the component's NOMINAL block grid (not MCU-padded) when it carries
    one.  DC prediction and the restart counter are per-scan state.
    Returns the blob position for the marker loop to resume at."""
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = _geometry(frame)
    r = _BitReader(blob, pos)
    pred = [0] * len(comps)
    count = 0

    def maybe_restart():
        nonlocal count, pred
        if restart_interval and count and count % restart_interval == 0:
            r.sync_rst()
            pred = [0] * len(comps)
        count += 1

    def unit(ci, dct, act, by, bx):
        c = coeff[ci][by, bx]
        t = _huff_decode(r, huff_dc[dct])
        diff = _extend(r.read(t), t) if t else 0
        pred[ci] += diff
        c[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _huff_decode(r, huff_ac[act])
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr == 15:
                    k += 16
                    continue
                break  # EOB
            k += rr
            if k > 63:
                raise ValueError("JPEG: AC index overflow")
            c[k] = _extend(r.read(s), s)
            k += 1

    if len(scan) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci, dct, act in scan:
                    _cid, hf, vf, _tq = comps[ci]
                    for by in range(vf):
                        for bx in range(hf):
                            unit(ci, dct, act, my * vf + by, mx * hf + bx)
    else:
        ci, dct, act = scan[0]
        _cid, hf, vf, _tq = comps[ci]
        bw_n = (-(-w * hf // hmax) + 7) // 8
        bh_n = (-(-h * vf // vmax) + 7) // 8
        for by in range(bh_n):
            for bx in range(bw_n):
                maybe_restart()
                unit(ci, dct, act, by, bx)
    return _scan_resume_pos(r)


def _scan_resume_pos(r):
    """Byte position for the marker loop to resume at after an
    entropy-coded scan: if the reader already consumed a marker, back up
    so the loop sees it; otherwise resume at the read head (the loop
    itself skips pad bytes while searching for 0xFF)."""
    return r.pos - 2 if r.marker is not None else r.pos


def _decode_prog_scan(
    blob, pos, frame, scan, ss, se, ah, al, coeff, huff_dc, huff_ac,
    restart_interval,
):
    """One progressive scan (T.81 Annex G.2): DC or AC band, first or
    refinement pass, into the persistent ``coeff`` arrays.  Returns the
    blob position for the marker loop to resume at."""
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = _geometry(frame)
    r = _BitReader(blob, pos)
    state = {"eobrun": 0, "pred": [0] * len(comps)}

    def reset():
        state["eobrun"] = 0
        state["pred"] = [0] * len(comps)

    def dc_unit(ci, dct, by, bx):
        c = coeff[ci][by, bx]
        if ah == 0:
            t = _huff_decode(r, huff_dc[dct])
            diff = _extend(r.read(t), t) if t else 0
            state["pred"][ci] += diff
            c[0] = state["pred"][ci] << al
        else:
            if r.read(1):
                c[0] |= 1 << al

    def ac_first(ci, act, by, bx):
        c = coeff[ci][by, bx]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(r, huff_ac[act])
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr < 15:
                    state["eobrun"] = (1 << rr) - 1
                    if rr:
                        state["eobrun"] += r.read(rr)
                    break
                k += 16  # ZRL
            else:
                k += rr
                if k > se:
                    raise ValueError("JPEG: AC index past band end")
                c[k] = _extend(r.read(s), s) << al
                k += 1

    p1, m1 = 1 << al, -1 << al

    def refine_nonzero(c, k):
        """Correction bit for a coefficient with nonzero history."""
        if r.read(1) and (c[k] & p1) == 0:
            c[k] += p1 if c[k] >= 0 else m1

    def ac_refine(ci, act, by, bx):
        c = coeff[ci][by, bx]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _huff_decode(r, huff_ac[act])
                rr, s = rs >> 4, rs & 0xF
                if s == 0:
                    if rr < 15:
                        state["eobrun"] = 1 << rr
                        if rr:
                            state["eobrun"] += r.read(rr)
                        break
                    val = 0  # ZRL: skip 16 zero-history coefficients
                elif s == 1:
                    val = p1 if r.read(1) else m1
                else:
                    raise ValueError("JPEG: invalid AC refinement symbol")
                # advance past rr zero-history coefficients, emitting
                # correction bits for any nonzero-history ones passed over
                while k <= se:
                    if c[k] != 0:
                        refine_nonzero(c, k)
                    else:
                        if rr == 0:
                            if s:
                                c[k] = val
                            k += 1
                            break
                        rr -= 1
                    k += 1
        if state["eobrun"] > 0:
            # EOB span covers the rest of this block: correction bits only
            while k <= se:
                if c[k] != 0:
                    refine_nonzero(c, k)
                k += 1
            state["eobrun"] -= 1

    if ss == 0:
        if se != 0:
            raise ValueError("JPEG: DC scan with Se != 0")
        unit = dc_unit
    else:
        if len(scan) != 1:
            raise ValueError("JPEG: interleaved AC progressive scan")
        unit = ac_first if ah == 0 else ac_refine

    count = 0

    def maybe_restart():
        nonlocal count
        if restart_interval and count and count % restart_interval == 0:
            r.sync_rst()
            reset()
        count += 1

    if len(scan) > 1:
        # interleaved (DC scans over multiple components): MCU order
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci, dct, _act in scan:
                    _cid, hf, vf, _tq = comps[ci]
                    for by in range(vf):
                        for bx in range(hf):
                            dc_unit(ci, dct, my * vf + by, mx * hf + bx)
    else:
        # non-interleaved: the component's own block grid, NOMINAL size
        # (ceil of scaled dims — not padded to the MCU grid)
        ci, dct, act = scan[0]
        _cid, hf, vf, _tq = comps[ci]
        bw_n = (-(-w * hf // hmax) + 7) // 8
        bh_n = (-(-h * vf // vmax) + 7) // 8
        for by in range(bh_n):
            for bx in range(bw_n):
                maybe_restart()
                if ss == 0:
                    dc_unit(ci, dct, by, bx)
                else:
                    unit(ci, act, by, bx)
    return _scan_resume_pos(r)


def _reconstruct(frame, coeff, qt):
    """Dequantize + IDCT + upsample + color for accumulated coefficient
    arrays — vectorized numpy over all blocks at once."""
    h, w, comps = frame
    hmax, vmax, _mcux, _mcuy = _geometry(frame)
    full = []
    for (cid, hf, vf, tq), ca in zip(comps, coeff):
        bh, bw = ca.shape[:2]
        deq = np.zeros((bh, bw, 64), np.float64)
        deq[..., _ZIGZAG] = ca * qt[tq]
        blocks = deq.reshape(bh, bw, 8, 8)
        px = np.einsum("ki,yxkl,lj->yxij", _C, blocks, _C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
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
