"""Header-only image metadata (no pixel decode).

The 100 TB gate/bucket pass over an image corpus — resolution filters,
aspect-ratio buckets, format census — needs (format, width, height,
bit depth, channels) and nothing else.  Full decode is O(pixels) per
file; every container below carries the dimensions in the first few
hundred bytes, so this parse is O(1) per blob and stays cheap at corpus
scale regardless of image size.  Counterpart of the audio/video
container parsers (:mod:`.mp3`, :mod:`.mp4`) for the image formats the
vendored codecs decode (:mod:`.jpeg`, :mod:`.webp`, PNG/GIF/BMP/PPM in
:mod:`.multimodal`) — plus lossy VP8, whose frame header is parseable
even though its sample decode is codec-library-gated.

Formats (byte-level, public specs): JPEG SOFn scan (ITU-T T.81), PNG
IHDR (RFC 2083), GIF logical screen descriptor (GIF89a), WebP VP8L /
VP8X / lossy VP8 headers (RIFF container), BMP BITMAPINFOHEADER, PPM
P3/P6.  Mirrors the reference's metadata-first posture for media columns
(it has no media support at all; SURVEY §2 extends it).
"""

from __future__ import annotations

import struct

__all__ = ["parse_image_header"]

# PNG color type -> sample channels (RFC 2083 §6.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# SOF markers carry frame dims; C4=DHT, C8=JPG ext, CC=DAC are not SOFs
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _le24(b: bytes) -> int:
    return b[0] | (b[1] << 8) | (b[2] << 16)


def _jpeg(src: bytes) -> dict | None:
    i = 2
    n = len(src)
    while i + 4 <= n:
        if src[i] != 0xFF:  # desync — not a well-formed marker stream
            return None
        while i < n and src[i] == 0xFF:  # fill bytes
            i += 1
        if i >= n:
            return None
        marker = src[i]
        i += 1
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # no payload
            continue
        if i + 2 > n:
            return None
        seglen = struct.unpack(">H", src[i : i + 2])[0]
        if marker in _JPEG_SOF:
            if i + 8 > n:
                return None
            prec = src[i + 2]
            h, w = struct.unpack(">HH", src[i + 3 : i + 7])
            ncomp = src[i + 7]
            return {
                "format": "jpeg",
                "width": w,
                "height": h,
                "bit_depth": prec,
                "n_channels": ncomp,
            }
        if marker == 0xDA:  # SOS before any SOF: give up, no dims ahead
            return None
        i += seglen
    return None


def _png(src: bytes) -> dict | None:
    if len(src) < 26 or src[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", src[16:24])
    depth, color_type = src[24], src[25]
    return {
        "format": "png",
        "width": w,
        "height": h,
        "bit_depth": depth,
        "n_channels": _PNG_CHANNELS.get(color_type),
    }


def _gif(src: bytes) -> dict | None:
    if len(src) < 13:
        return None
    w, h = struct.unpack("<HH", src[6:10])
    packed = src[10]
    return {
        "format": "gif",
        "width": w,
        "height": h,
        "bit_depth": (packed & 0x07) + 1,  # GCT entry resolution
        "n_channels": 3,  # palette entries are RGB
    }


def _webp(src: bytes) -> dict | None:
    # RIFF chunk walk; VP8X gives the canvas, VP8L/VP8 the coded frame.
    i = 12
    n = len(src)
    while i + 8 <= n:
        fourcc = src[i : i + 4]
        size = struct.unpack("<I", src[i + 4 : i + 8])[0]
        p = src[i + 8 : i + 8 + size]
        if fourcc == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
            val = struct.unpack("<I", p[1:5])[0]
            return {
                "format": "webp",
                "width": (val & 0x3FFF) + 1,
                "height": ((val >> 14) & 0x3FFF) + 1,
                "bit_depth": 8,
                "n_channels": 4 if (val >> 28) & 1 else 3,
            }
        if fourcc == b"VP8 " and len(p) >= 10 and p[3:6] == b"\x9d\x01\x2a":
            return {
                "format": "webp",
                "width": struct.unpack("<H", p[6:8])[0] & 0x3FFF,
                "height": struct.unpack("<H", p[8:10])[0] & 0x3FFF,
                "bit_depth": 8,
                "n_channels": 3,
            }
        if fourcc == b"VP8X" and len(p) >= 10:
            return {
                "format": "webp",
                "width": _le24(p[4:7]) + 1,
                "height": _le24(p[7:10]) + 1,
                "bit_depth": 8,
                "n_channels": 4 if p[0] & 0x10 else 3,
            }
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    return None


def _bmp(src: bytes) -> dict | None:
    if len(src) < 30:
        return None
    dib = struct.unpack("<I", src[14:18])[0]
    if dib < 40:  # BITMAPCOREHEADER etc. — rare, skip
        return None
    w, h = struct.unpack("<ii", src[18:26])
    bpp = struct.unpack("<H", src[28:30])[0]
    return {
        "format": "bmp",
        "width": abs(w),
        "height": abs(h),  # negative height = top-down rows
        "bit_depth": min(bpp, 8),
        "n_channels": max(bpp // 8, 1),
    }


def _ppm(src: bytes) -> dict | None:
    # token scan: magic, width, height, maxval (comments start with '#')
    toks: list[bytes] = []
    i = 2
    n = len(src)
    while i < n and len(toks) < 3:
        c = src[i]
        if c in b" \t\r\n":
            i += 1
        elif c == 0x23:  # '#' comment to EOL
            while i < n and src[i] not in b"\r\n":
                i += 1
        else:
            j = i
            while j < n and src[j] not in b" \t\r\n":
                j += 1
            toks.append(src[i:j])
            i = j
    if len(toks) < 3:
        return None
    try:
        w, h, maxval = (int(x) for x in toks)
    except ValueError:
        return None
    return {
        "format": "ppm",
        "width": w,
        "height": h,
        "bit_depth": 16 if maxval > 255 else 8,
        "n_channels": 3,
    }


def parse_image_header(src: bytes) -> dict | None:
    """Sniff + parse an image header: ``{format, width, height,
    bit_depth, n_channels}`` or ``None`` for unrecognized bytes.  Never
    raises — a corpus scan must not die on one odd file."""
    try:
        if src[:2] == b"\xff\xd8":
            return _jpeg(src)
        if src[:8] == b"\x89PNG\r\n\x1a\n":
            return _png(src)
        if src[:6] in (b"GIF87a", b"GIF89a"):
            return _gif(src)
        if src[:4] == b"RIFF" and src[8:12] == b"WEBP":
            return _webp(src)
        if src[:2] == b"BM":
            return _bmp(src)
        if src[:2] in (b"P3", b"P6") and (len(src) > 2 and src[2] in b" \t\r\n#"):
            return _ppm(src)
    except Exception:
        return None
    return None
