"""Pure-Python GIF decoder (GIF87a / GIF89a, first frame).

Covers the GIF features a web-corpus ingest pipeline actually meets:
global and local color tables, interlaced frames (4-pass row order),
transparency (GCE transparent index leaves the background/canvas color),
and full LZW decompression including variable code width growth up to 12
bits and dictionary resets via CLEAR codes.  Animated GIFs decode to
their first frame composited onto the logical screen — the standard
thumbnailing behavior.

Stdlib + numpy only (the container has no imaging libraries); verified
against an independently written LZW encoder in ``tests/gif_ref.py``.
GIF is lossless, so the roundtrip oracle is exact pixel equality.

Reference parity note: the reference engine
(``/root/reference/src/TidierDB.jl``) has no multimodal surface at all;
this belongs to the training-data-pipeline layer (SURVEY.md §2.12).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "iter_gif_frames"]

_MAX_CODE_WIDTH = 12


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """Decompress a GIF LZW stream into ``expected`` palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits and len(out) < expected:
        byte_idx = bitpos >> 3
        chunk = int.from_bytes(data[byte_idx : byte_idx + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK special case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < _MAX_CODE_WIDTH:
            code_size += 1
    if len(out) < expected:
        raise ValueError(
            f"corrupt GIF: LZW stream ended at {len(out)}/{expected} pixels"
        )
    del out[expected:]
    return out


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder interlaced GIF rows (pass1: 0,8,..; 2: 4,12,..; 3: 2,6,..;
    4: 1,3,..) back to top-to-bottom order."""
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def iter_gif_frames(blob: bytes):
    """Yield ``(delay_ms, HxWx3 uint8 canvas)`` per animation frame.

    Each yielded canvas is the fully composited logical screen at that
    frame, honoring per-frame Graphic Control Extensions: delay,
    transparent index, and disposal methods 0/1 (keep), 2 (restore to
    background) and 3 (restore to previous).  Single-image GIFs yield
    exactly one frame.  This is the real decode path behind
    ``frame_sample`` — animated GIF is the one video-like format
    decodable with stdlib+numpy alone.
    """
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
    transparent, delay_ms, disposal = -1, 0, 0
    yielded = False
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:  # graphic control for the NEXT frame
                size = blob[pos]
                flags, delay_cs, tidx = struct.unpack_from("<BHB", blob, pos + 1)
                transparent = tidx if flags & 0x01 else -1
                disposal = (flags >> 2) & 0x07
                delay_ms = delay_cs * 10
                pos += 1 + size
            while blob[pos]:  # skip (remaining) sub-blocks
                pos += 1 + blob[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unexpected block 0x{block:02x}")

        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("corrupt GIF: no color table for frame")

        min_code_size = blob[pos]
        pos += 1
        parts = []
        while blob[pos]:
            ln = blob[pos]
            parts.append(blob[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1

        idx = np.frombuffer(
            _lzw_decode(b"".join(parts), min_code_size, fw * fh), np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)

        region = canvas[top : top + fh, left : left + fw]
        saved = region.copy() if disposal == 3 else None
        frame = ct[np.minimum(idx, len(ct) - 1)]
        if transparent >= 0:
            opaque = (idx != transparent)[: region.shape[0], : region.shape[1], None]
            np.copyto(region, frame[: region.shape[0], : region.shape[1]], where=opaque)
        else:
            region[:] = frame[: region.shape[0], : region.shape[1]]
        yield delay_ms, canvas.copy()
        yielded = True

        if disposal == 2:  # restore the frame region to background
            region[:] = bg
        elif disposal == 3 and saved is not None:  # restore to previous
            region[:] = saved
        transparent, delay_ms, disposal = -1, 0, 0
    if not yielded:
        raise ValueError("GIF contains no image data")


def decode_gif(blob: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB array (logical screen, first frame)."""
    for _delay, canvas in iter_gif_frames(blob):
        return canvas
    raise ValueError("GIF contains no image data")
