"""Independent WebP **lossless** (VP8L) ENCODER for the decoder oracle.

Written from the public WebP Lossless Bitstream Specification — shares
no code with ``tidierdb_jl_spark.llm.webp``.  Emits real variable-length
canonical prefix codes (built from symbol frequencies, transmitted
through the 19-symbol code-length code with 16/17/18 repeats), optional
color cache, optional LZ77 backward references (linear distances),
meta prefix groups, and the four transforms: SUBTRACT_GREEN, PREDICTOR
(per-tile modes), COLOR (per-tile cross-channel deltas) and
COLOR_INDEXING (delta-coded palette, sub-byte packing for ≤16 colors).
VP8L is lossless, so every roundtrip oracle is exact pixel equality.
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np


class _BitsW:
    """LSB-first bit writer (VP8L order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, n, v):
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _code_lengths(freqs: dict, max_len: int = 15) -> dict:
    """Huffman code lengths from frequencies (package-merge-free: plain
    huffman then length-limit by rebalancing — inputs here are small)."""
    items = [(f, s) for s, f in freqs.items() if f > 0]
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][1]: 1}
    import heapq

    heap = [(f, i, [s]) for i, (f, s) in enumerate(items)]
    heapq.heapify(heap)
    depth = {s: 0 for _f, _i, [s] in heap}
    uid = len(heap)
    while len(heap) > 1:
        f1, _i1, s1 = heapq.heappop(heap)
        f2, _i2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, s1 + s2))
        uid += 1
    # length-limit (rare at test sizes): clamp and fix Kraft by extending
    # the shallowest sibling — adequate for oracle-scale alphabets
    while max(depth.values()) > max_len:
        over = max(depth, key=lambda s: depth[s])
        under = min(depth, key=lambda s: depth[s])
        depth[over] = max_len
        depth[under] += 1
    return depth


def _canonical(lengths: dict) -> dict:
    """lengths {sym: len} -> {sym: (len, code)} DEFLATE-canonical."""
    out = {}
    code = 0
    for length in range(1, 16):
        for s in sorted(s for s, ln in lengths.items() if ln == length):
            out[s] = (length, code)
            code += 1
        code <<= 1
    return out


def _write_prefix_code(bw: _BitsW, lengths: dict, alphabet_size: int):
    """Transmit a prefix code: simple form for ≤2 symbols, else the full
    code-length-code form (every cl symbol at 3 fixed bits for
    simplicity — always a legal transmission)."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(1, len(syms) - 1)
        if syms[0] >= 2:
            bw.write(1, 1)
            bw.write(8, syms[0])
        else:
            bw.write(1, 0)
            bw.write(1, syms[0])
        if len(syms) == 2:
            bw.write(8, syms[1])
        return
    bw.write(1, 0)  # full form
    # build the length sequence over the whole alphabet with 17/18 zero runs
    seq = []  # cl symbols with extra bits: (sym, extra_n, extra_v)
    i = 0
    arr = [lengths.get(s, 0) for s in range(alphabet_size)]
    while i < alphabet_size:
        if arr[i] == 0:
            j = i
            while j < alphabet_size and arr[j] == 0:
                j += 1
            run = j - i
            if j == alphabet_size:
                break  # trailing zeros: max-symbol shortcut handles them
            while run >= 11:
                r = min(run, 138)
                seq.append((18, 7, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                seq.append((17, 3, r - 3))
                run -= r
            for _ in range(run):
                seq.append((0, 0, 0))
            i = j
        else:
            seq.append((arr[i], 0, 0))
            i += 1
    used_cl = sorted({s for s, _n, _v in seq})
    # fixed-length cl code over the used symbols (uniform lengths are a
    # valid canonical code when count <= 2^L)
    L = max(1, (len(used_cl) - 1).bit_length())
    cl_lengths = {s: L for s in used_cl}
    cl_codes = _canonical(cl_lengths)
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    # transmit as many cl-lengths as needed to cover every used symbol
    need = max(order.index(s) for s in used_cl) + 1
    num_codes = max(4, need)
    bw.write(4, num_codes - 4)
    for i2 in range(num_codes):
        bw.write(3, cl_lengths.get(order[i2], 0))
    # max-symbol shortcut: transmit exactly len(seq) symbols
    n_read = len(seq)
    bw.write(1, 1)
    length_nbits = 2 + 2 * 7
    bw.write(3, 7)
    bw.write(length_nbits, n_read - 2)
    for s, en, ev in seq:
        if len(used_cl) > 1:  # single-symbol cl code: zero bits on the wire
            ln, code = cl_codes[s]
            # canonical codes are read MSB-first by the decoder's tree walk
            for b in range(ln - 1, -1, -1):
                bw.write(1, (code >> b) & 1)
        if en:
            bw.write(en, ev)


class _Emitter:
    """Buffers (code_id, symbol) + raw-bit events for one image stream,
    builds per-code canonical tables from observed frequencies, then
    serializes."""

    def __init__(self):
        self.events = []  # ("s", code_id, sym) | ("b", n, v)
        self.freqs = {}

    def sym(self, code_id, s):
        self.events.append(("s", code_id, s))
        self.freqs.setdefault(code_id, Counter())[s] += 1

    def bits(self, n, v):
        if n:
            self.events.append(("b", n, v))


def _lz77_emit(em, code_id, value):
    """value -> (prefix code, extra bits) per the spec transform."""
    if value <= 4:
        em.sym(code_id, value - 1)
        return
    bits = (value - 1).bit_length() - 1
    rest = value - 1 - (1 << bits)
    if rest < (1 << (bits - 1)):
        code = 2 * bits
        extra = rest
    else:
        code = 2 * bits + 1
        extra = rest - (1 << (bits - 1))
    em.sym(code_id, code)
    em.bits(bits - 1, extra)


_HASH_MUL = 0x1E35A7BD


def _emit_image_stream(
    bw,
    argb,                      # (h, w, 4) uint8 [A, R, G, B]
    *,
    cache_bits=0,
    lz77=False,
    meta=None,                 # (shift, (mh, mw) group-index array) or None
    is_main=False,
):
    """Emit one entropy-coded image (sub-images: meta=None, no LZ77)."""
    h, w = argb.shape[:2]
    if cache_bits:
        bw.write(1, 1)
        bw.write(4, cache_bits)
        cache = [None] * (1 << cache_bits)
    else:
        bw.write(1, 0)
        cache = None

    n_groups = 1
    if is_main:
        if meta is not None:
            shift, groups_img = meta
            bw.write(1, 1)
            bw.write(3, shift - 2)
            sub = np.zeros((*groups_img.shape, 4), np.uint8)
            sub[..., 0] = 255
            sub[..., 1] = (groups_img >> 8) & 0xFF
            sub[..., 2] = groups_img & 0xFF
            _emit_image_stream(bw, sub)
            n_groups = int(groups_img.max()) + 1
        else:
            bw.write(1, 0)

    em = _Emitter()
    flat = argb.reshape(-1, 4)
    n = len(flat)
    pos = 0
    while pos < n:
        if meta is not None:
            y, x = pos // w, pos % w
            g = int(meta[1][y >> meta[0], x >> meta[0]])
        else:
            g = 0
        gid = ("g", g)
        a, r, gg, b = (int(v) for v in flat[pos])
        argb32 = (a << 24) | (r << 16) | (gg << 8) | b
        if cache is not None:
            slot = (_HASH_MUL * argb32 & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == argb32:
                em.sym(gid, 280 + slot)
                pos += 1
                continue
        if lz77 and pos >= w and pos + 4 <= n and np.array_equal(
            flat[pos : pos + 4], flat[pos - w : pos - w + 4]
        ):
            # vertical copy of length 4..8, linear distance w
            length = 4
            while (length < 8 and pos + length < n
                   and np.array_equal(flat[pos + length],
                                      flat[pos + length - w])):
                length += 1
            # length symbol lives in the green alphabet offset by 256
            if length <= 4:
                em.sym(gid, 256 + length - 1)
            else:
                bits = (length - 1).bit_length() - 1
                rest = length - 1 - (1 << bits)
                if rest < (1 << (bits - 1)):
                    em.sym(gid, 256 + 2 * bits)
                    em.bits(bits - 1, rest)
                else:
                    em.sym(gid, 256 + 2 * bits + 1)
                    em.bits(bits - 1, rest - (1 << (bits - 1)))
            _lz77_emit(em, ("d", g), w + 120)  # linear distance code
            for i in range(length):
                aa, rr2, gg2, bb2 = (int(v) for v in flat[pos + i])
                if cache is not None:
                    v32 = (aa << 24) | (rr2 << 16) | (gg2 << 8) | bb2
                    cache[(_HASH_MUL * v32 & 0xFFFFFFFF) >> (32 - cache_bits)] = v32
            pos += length
            continue
        em.sym(gid, gg)
        em.sym(("r", g), r)
        em.sym(("b", g), b)
        em.sym(("a", g), a)
        if cache is not None:
            cache[slot] = argb32
        pos += 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    for g in range(n_groups):
        em_ids = [("g", g), ("r", g), ("b", g), ("a", g), ("d", g)]
        sizes = [green_alpha, 256, 256, 256, 40]
        # serialize tables+streams per group? The format interleaves ALL
        # group tables first, then one shared event stream — emit tables
        # for each group now and the events once after the last group.
        for cid, asize in zip(em_ids, sizes):
            freqs = em.freqs.get(cid, Counter({0: 1}))
            lengths = _code_lengths(dict(freqs))
            _write_prefix_code(bw, lengths, asize)
            em.freqs[cid + ("done",)] = lengths  # stash for event pass
    # event pass
    tables = {}
    for g in range(n_groups):
        for cid in [("g", g), ("r", g), ("b", g), ("a", g), ("d", g)]:
            tables[cid] = _canonical(em.freqs[cid + ("done",)])
    for ev in em.events:
        if ev[0] == "s":
            tab = tables[ev[1]]
            if len(tab) == 1:
                continue  # single-symbol code: zero bits on the wire
            ln, code = tab[ev[2]]
            for bit in range(ln - 1, -1, -1):
                bw.write(1, (code >> bit) & 1)
        else:
            bw.write(ev[1], ev[2])


def encode_webp_lossless(
    rgb: np.ndarray,
    *,
    cache_bits=0,
    lz77=False,
    subtract_green=False,
    predictor=None,      # (shift, (th, tw) mode array) or None
    color=None,          # (shift, (th, tw, 3) int8 g2r/g2b/r2b array) or None
    palette=False,
    meta=None,           # (shift, group-index array) or None
) -> bytes:
    """HxWx3 uint8 RGB -> WebP (VP8L) bytes with the selected features."""
    h, w = rgb.shape[:2]
    argb = np.zeros((h, w, 4), np.uint8)
    argb[..., 0] = 255
    argb[..., 1:4] = rgb

    bw = _BitsW()
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 0)  # alpha hint
    bw.write(3, 0)  # version

    packed = argb.astype(np.int32)
    packed_w = w

    if palette:
        colors = {}
        for px in argb.reshape(-1, 4):
            colors.setdefault(tuple(int(v) for v in px), len(colors))
        assert len(colors) <= 256, "palette encoder: too many colors"
        pal = sorted(colors, key=colors.get)
        idx = np.array(
            [colors[tuple(int(v) for v in px)] for px in argb.reshape(-1, 4)],
            np.int32,
        ).reshape(h, w)
        npal = len(pal)
        bits_pp = 1 if npal <= 2 else 2 if npal <= 4 else 4 if npal <= 16 else 8
        bw.write(1, 1)
        bw.write(2, 3)  # COLOR_INDEXING
        bw.write(8, npal - 1)
        pal_arr = np.array(pal, np.int32)  # (n, 4) A R G B
        deltas = pal_arr.copy()
        deltas[1:] = (pal_arr[1:] - pal_arr[:-1]) & 0xFF
        _emit_image_stream(bw, deltas.astype(np.uint8).reshape(1, npal, 4))
        if bits_pp < 8:
            per = 8 // bits_pp
            packed_w = (w + per - 1) // per
            packed_idx = np.zeros((h, packed_w), np.int32)
            for i in range(per):
                cols = np.arange(packed_w) * per + i
                sel = cols < w
                packed_idx[:, np.arange(packed_w)[sel]] |= (
                    idx[:, cols[sel]] << (i * bits_pp)
                )
        else:
            packed_idx = idx
        packed = np.zeros((h, packed_w, 4), np.int32)
        packed[..., 0] = 255
        packed[..., 2] = packed_idx
    else:
        if color is not None:
            shift, cte = color
            out = packed.copy()
            for y in range(h):
                for x in range(w):
                    g2r, g2b, r2b = (int(v) for v in cte[y >> shift, x >> shift])
                    g = int(packed[y, x, 2])
                    r0 = int(packed[y, x, 1])

                    def d(t, c):
                        t8 = t - 256 if t >= 128 else t
                        c8 = c - 256 if c >= 128 else c
                        return (t8 * c8) >> 5

                    out[y, x, 1] = (r0 - d(g2r & 0xFF, g)) & 0xFF
                    out[y, x, 3] = (
                        int(packed[y, x, 3]) - d(g2b & 0xFF, g)
                        - d(r2b & 0xFF, r0)
                    ) & 0xFF
            packed = out
            bw.write(1, 1)
            bw.write(2, 1)
            bw.write(3, shift - 2)
            sub = np.zeros((*cte.shape[:2], 4), np.uint8)
            sub[..., 0] = 255
            sub[..., 1] = cte[..., 2] & 0xFF   # red_to_blue in red channel
            sub[..., 2] = cte[..., 1] & 0xFF   # green_to_blue in green
            sub[..., 3] = cte[..., 0] & 0xFF   # green_to_red in blue
            _emit_image_stream(bw, sub)
        if predictor is not None:
            shift, modes = predictor
            res = packed.copy()
            dec = packed  # original pixels are what the decoder rebuilds
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = np.array([255, 0, 0, 0], np.int32)
                    elif y == 0:
                        pred = dec[0, x - 1]
                    elif x == 0:
                        pred = dec[y - 1, 0]
                    else:
                        mode = int(modes[y >> shift, x >> shift])
                        L, T, TL = dec[y, x - 1], dec[y - 1, x], dec[y - 1, x - 1]
                        TR = dec[y - 1, x + 1] if x + 1 < w else dec[y, 0]
                        a2 = lambda p, q: (p + q) // 2  # noqa: E731
                        pred = {
                            0: np.array([255, 0, 0, 0], np.int32),
                            1: L, 2: T, 3: TR, 4: TL,
                            5: a2(a2(L, TR), T), 6: a2(L, TL), 7: a2(L, T),
                            8: a2(TL, T), 9: a2(T, TR),
                            10: a2(a2(L, TL), a2(T, TR)),
                            11: L if np.abs(T - TL).sum() < np.abs(L - TL).sum() else T,
                            12: np.clip(L + T - TL, 0, 255),
                            13: np.clip(a2(L, T) + np.sign(a2(L, T) - TL)
                                        * (np.abs(a2(L, T) - TL) // 2), 0, 255),
                        }[mode]
                    res[y, x] = (dec[y, x] - pred) & 0xFF
            packed = res
            bw.write(1, 1)
            bw.write(2, 0)
            bw.write(3, shift - 2)
            sub = np.zeros((*modes.shape, 4), np.uint8)
            sub[..., 0] = 255
            sub[..., 2] = modes
            _emit_image_stream(bw, sub)
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            g = packed[..., 2]
            packed = packed.copy()
            packed[..., 1] = (packed[..., 1] - g) & 0xFF
            packed[..., 3] = (packed[..., 3] - g) & 0xFF
    bw.write(1, 0)  # end of transforms

    _emit_image_stream(
        bw, packed.astype(np.uint8),
        cache_bits=cache_bits, lz77=lz77,
        meta=meta, is_main=True,
    )

    payload = b"\x2f" + bw.done()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l
