"""Pure-Python WebP **lossless** (VP8L) decoder — stdlib + numpy.

Implements the public "WebP Lossless Bitstream Specification" (Google,
RFC-style, public): LSB-first bitstream, canonical prefix codes (simple
2-symbol form and the DEFLATE-style code-length-code form with 16/17/18
repeats and the max-symbol shortcut), optional color cache, meta prefix
groups (entropy image), LZ77 backward references with the 120-entry 2D
short-distance mapping, and all four transforms — PREDICTOR (14 modes),
COLOR (per-tile signed 3.5 cross-channel deltas), SUBTRACT_GREEN and
COLOR_INDEXING (palette, including sub-byte pixel packing for palettes
of ≤16 colors).

Lossy WebP (VP8 intra frames) is a video-codec decode and stays behind
``fake=True`` in :mod:`.multimodal`.  GIF/PNG/JPEG live in their own
modules; this one is verified the same way — an independently written
VP8L encoder in ``tests/webp_ref.py`` plus exact-pixel roundtrips
(lossless ⇒ the oracle is equality).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp"]

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 120-entry short-distance (dx, dy) map, transcribed from the spec table
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _Bits:
    """LSB-first bit reader (VP8L bit order — opposite of JPEG/GIF)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0     # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L: bitstream overrun")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Prefix:
    """Canonical prefix code: decode by walking bit-by-bit (codes are
    assigned DEFLATE-style: by length, then symbol order)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][1]  # zero-bit code
            self.table = None
            return
        self.single = None
        table = {}
        code = 0
        for length in range(1, 16):
            for ln, s in sorted(nz):
                if ln == length:
                    table[(length, code)] = s
                    code += 1
            code <<= 1
        self.table = table

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            s = self.table.get((length, code))
            if s is not None:
                return s
        raise ValueError("VP8L: invalid prefix code")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1  # placeholder; decoded as zero-bit
            p = _Prefix(lengths)
            p.single = sym0
            p.table = None
            return p
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _Prefix(lengths)
    # full code-length-code form
    num_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # max-symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Prefix(lengths)


def _lz77_value(code: int, br: _Bits) -> int:
    """Length/distance prefix value -> actual value (spec extra-bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_image_stream(br: _Bits, w: int, h: int, is_main: bool):
    """Decode one entropy-coded ARGB image (the main image or a
    transform/meta sub-image).  Returns (h, w, 4) uint8 [A, R, G, B]."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("VP8L: bad color cache size")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_shift = 0
    n_groups = 1
    if is_main and br.read(1):  # meta prefix image
        meta_shift = br.read(3) + 2
        mw = (w + (1 << meta_shift) - 1) >> meta_shift
        mh = (h + (1 << meta_shift) - 1) >> meta_shift
        meta_img = _decode_image_stream(br, mw, mh, False)
        meta = (
            meta_img[..., 1].astype(np.int32) << 8
        ) | meta_img[..., 2].astype(np.int32)  # (red << 8) | green
        n_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),   # green + length + cache
            _read_prefix_code(br, 256),           # red
            _read_prefix_code(br, 256),           # blue
            _read_prefix_code(br, 256),           # alpha
            _read_prefix_code(br, 40),            # distance
        ))

    n = w * h
    argb = np.zeros((n, 4), np.uint8)  # [A, R, G, B]
    pos = 0

    def cache_insert(a, r, g, b):
        if cache is not None:
            v = (a << 24) | (r << 16) | (g << 8) | b
            cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)] = v

    while pos < n:
        if meta is not None:
            y, x = pos // w, pos % w
            gidx = int(meta[y >> meta_shift, x >> meta_shift])
            gcode, rcode, bcode, acode, dcode = groups[gidx]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.decode(br)
        if s < 256:  # literal
            g = s
            r = rcode.decode(br)
            b = bcode.decode(br)
            a = acode.decode(br)
            argb[pos] = (a, r, g, b)
            cache_insert(a, r, g, b)
            pos += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(dcode.decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for i in range(length):  # may self-overlap: copy sequentially
                argb[pos + i] = argb[pos + i - dist]
                a, r, g, b = (int(v) for v in argb[pos + i])
                cache_insert(a, r, g, b)
            pos += length
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            v = cache[s - 280]
            argb[pos] = ((v >> 24) & 0xFF, (v >> 16) & 0xFF,
                         (v >> 8) & 0xFF, v & 0xFF)
            pos += 1
    return argb.reshape(h, w, 4)


def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _inverse_predictor(img, modes, shift):
    """Apply the inverse spatial predictor in place (img: (h,w,4) int32
    residuals mod 256; modes: per-tile mode image)."""
    h, w = img.shape[:2]
    out = img.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)  # A=255 black
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> shift, x >> shift])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # rightmost column: TR wraps to the leftmost pixel of the
                # SAME row (the spec's row-major buffer convention)
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select
                    p = L + T - TL
                    perr = np.abs(p - L).sum()
                    terr = np.abs(p - T).sum()
                    pred = L if perr < terr else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # ClampAddSubtractHalf
                    # spec/libwebp use C integer division (truncate toward
                    # zero), NOT Python floor division — they differ by 1
                    # for negative odd (ave - TL)
                    ave = _avg2(L, T)
                    d = ave - TL
                    pred = np.clip(ave + np.sign(d) * (np.abs(d) // 2),
                                   0, 255)
                else:
                    raise ValueError(f"VP8L: bad predictor mode {mode}")
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _to_signed(v):
    return v - 256 if v >= 128 else v


def _color_delta(t, c):
    """Signed 3.5 fixed-point cross-channel delta: (int8(t)*int8(c))>>5."""
    return (_to_signed(int(t)) * _to_signed(int(c))) >> 5


def decode_webp(blob: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB (alpha dropped).  Lossless (VP8L) only;
    lossy VP8 raises NotImplementedError."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if tag == b"VP8L":
            payload = blob[pos + 8 : pos + 8 + size]
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP needs a VP8 video codec; only VP8L "
                "lossless decodes in pure Python — pass fake=True"
            )
        # VP8X (extended container: EXIF/ICC/alpha metadata) commonly
        # wraps a lossless VP8L chunk — skip it and keep scanning
        pos += 8 + size + (size & 1)
    if payload is None or payload[:1] != b"\x2f":
        raise ValueError("WebP: no VP8L chunk found")

    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")

    # transforms (each at most once, applied in reverse order at the end)
    transforms = []
    packed_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in (0, 1):  # PREDICTOR / COLOR: per-tile sub-image
            shift = br.read(3) + 2
            tw = (packed_w + (1 << shift) - 1) >> shift
            th = (h + (1 << shift) - 1) >> shift
            sub = _decode_image_stream(br, tw, th, False)
            transforms.append((ttype, shift, sub))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2, None, None))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal_img = _decode_image_stream(br, n_colors, 1, False)
            # palette entries are delta-coded left-to-right
            pal = pal_img[0].astype(np.int32)
            for i in range(1, n_colors):
                pal[i] = (pal[i] + pal[i - 1]) & 0xFF
            if n_colors <= 2:
                bits_pp = 1
            elif n_colors <= 4:
                bits_pp = 2
            elif n_colors <= 16:
                bits_pp = 4
            else:
                bits_pp = 8
            if bits_pp < 8:
                packed_w = (w + (8 // bits_pp) - 1) // (8 // bits_pp)
            transforms.append((3, bits_pp, pal.astype(np.uint8)))

    img = _decode_image_stream(br, packed_w, h, True)

    # inverse transforms, most-recently-read first
    for ttype, p1, p2 in reversed(transforms):
        if ttype == 3:  # color indexing: unpack + palette lookup
            bits_pp, pal = p1, p2
            idx = img[..., 2].astype(np.int32)  # green channel holds index
            if bits_pp < 8:
                per = 8 // bits_pp
                mask = (1 << bits_pp) - 1
                full = np.zeros((h, w), np.int32)
                for i in range(per):
                    cols = np.arange(img.shape[1]) * per + i
                    sel = cols < w
                    full[:, cols[sel]] = (idx[:, sel] >> (i * bits_pp)) & mask
                idx = full
            idx = np.clip(idx, 0, len(pal) - 1)
            img = pal[idx]
        elif ttype == 2:  # add green back
            g = img[..., 2].astype(np.int32)
            img = img.astype(np.int32)
            img[..., 1] = (img[..., 1] + g) & 0xFF
            img[..., 3] = (img[..., 3] + g) & 0xFF
            img = img.astype(np.uint8)
        elif ttype == 1:  # color transform (inverse: add deltas)
            shift, sub = p1, p2
            out = img.astype(np.int32)
            for y in range(h):
                for x in range(out.shape[1]):
                    te = sub[y >> shift, x >> shift]
                    g2r, g2b, r2b = int(te[3]), int(te[2]), int(te[1])
                    g = int(out[y, x, 2])
                    r = (out[y, x, 1] + _color_delta(g2r, g)) & 0xFF
                    b = (out[y, x, 3] + _color_delta(g2b, g)
                         + _color_delta(r2b, r)) & 0xFF
                    out[y, x, 1] = r
                    out[y, x, 3] = b
            img = out.astype(np.uint8)
        else:  # predictor
            shift, sub = p1, p2
            img = _inverse_predictor(img, sub[..., 2], shift)

    return img[..., 1:4].copy()  # A R G B -> R G B
