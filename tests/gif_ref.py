"""Independent GIF *encoder* used as the test oracle for
``tidierdb_jl_spark.llm.gif.decode_gif``.

Written from the GIF89a specification (CompuServe, public) with a real
variable-width LZW compressor — dictionary growth through 12-bit codes
and CLEAR-code resets at table overflow — so the decoder's growth and
reset paths are genuinely exercised, not just the fixed-width case.
Supports global/local color tables, interlacing, and a transparent
index via a Graphic Control Extension.  GIF is lossless: the oracle is
exact pixel equality after palette lookup.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], code_size)
        table[cand] = next_code
        next_code += 1
        # The decoder widens its read size when ITS table reaches
        # 1<<code_size; its table trails ours by one entry, so widen when
        # we pass the boundary by one.
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code > (1 << 12):  # table full: reset
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], code_size)
    emit(end, code_size)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_rows(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )


def encode_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    local_table: bool = False,
    transparent: int = -1,
    bg_index: int = 0,
    screen: tuple[int, int] | None = None,
    offset: tuple[int, int] = (0, 0),
) -> bytes:
    """(h,w) uint8 palette indices + (n,3) uint8 palette → GIF bytes."""
    h, w = idx.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = palette
    sw, sh = screen or (w, h)
    left, top = offset

    out = bytearray(b"GIF89a")
    gflag = 0x00 if local_table else 0x80 | (bits - 1)
    out += struct.pack("<HHBBB", sw, sh, gflag, bg_index, 0)
    if not local_table:
        out += pal.tobytes()
    if transparent >= 0:
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x01, 0, transparent, 0)
    fflag = (0x80 | (bits - 1)) if local_table else 0x00
    if interlace:
        fflag |= 0x40
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, fflag)
    if local_table:
        out += pal.tobytes()

    rows = idx[_interlace_rows(h)] if interlace else idx
    min_code = max(2, bits)
    out.append(min_code)
    data = _lzw_encode(rows.astype(np.uint8).tobytes(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def expected_rgb(
    idx: np.ndarray,
    palette: np.ndarray,
    *,
    transparent: int = -1,
    bg_index: int = 0,
    screen: tuple[int, int] | None = None,
    offset: tuple[int, int] = (0, 0),
) -> np.ndarray:
    """Numpy model of the decoder's output: frame composited onto the
    logical screen, transparency showing the background color."""
    h, w = idx.shape
    sw, sh = screen or (w, h)
    left, top = offset
    bg = palette[bg_index] if bg_index < len(palette) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
    frame = palette[idx]
    region = canvas[top : top + h, left : left + w]
    if transparent >= 0:
        opaque = (idx != transparent)[: region.shape[0], : region.shape[1], None]
        np.copyto(region, frame[: region.shape[0], : region.shape[1]], where=opaque)
    else:
        region[:] = frame[: region.shape[0], : region.shape[1]]
    return canvas


def encode_animated_gif(
    frames,
    palette: np.ndarray,
    screen: tuple[int, int],
) -> bytes:
    """Multi-frame GIF89a: ``frames`` is a list of dicts with keys
    ``idx`` (h,w uint8), ``delay_ms``, ``disposal`` (0-3), ``offset``
    (left, top), ``transparent`` (index or -1).  Global color table only.
    """
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = palette
    sw, sh = screen

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    for fr in frames:
        idx = fr["idx"]
        h, w = idx.shape
        left, top = fr.get("offset", (0, 0))
        trans = fr.get("transparent", -1)
        flags = (fr.get("disposal", 0) & 0x07) << 2
        if trans >= 0:
            flags |= 0x01
        out += b"\x21\xf9" + struct.pack(
            "<BBHBB", 4, flags, fr.get("delay_ms", 0) // 10, max(trans, 0), 0
        )
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0x00)
        min_code = max(2, bits)
        out.append(min_code)
        data = _lzw_encode(idx.astype(np.uint8).tobytes(), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
