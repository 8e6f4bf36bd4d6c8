"""Independent, spec-written ENCODER for Delta deletion vectors.

Written directly from the public specs — ZeroMQ Z85 (rfc 32/Z85), the
RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec), and
Delta PROTOCOL.md's DV file framing — NOT from the repo decoder
(``tidierdb_jl_spark/sources/dvectors.py``).  Decoder/encoder agreement
on generated artifacts is the correctness evidence (the same strategy
as ``tests/avro_ref.py``).
"""

from __future__ import annotations

import struct
import zlib

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)


def z85_encode(raw: bytes) -> str:
    assert len(raw) % 4 == 0
    out = []
    for i in range(0, len(raw), 4):
        v = int.from_bytes(raw[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def _encode_container(values, force_run=False):
    """One 16-bit container from sorted 16-bit values.
    Returns (is_run, payload).  Array when card<=4096, bitmap above,
    run when forced (the encoder picks; the decoder must take all)."""
    if force_run:
        runs = []
        start = prev = values[0]
        for v in values[1:]:
            if v == prev + 1:
                prev = v
                continue
            runs.append((start, prev - start))
            start = prev = v
        runs.append((start, prev - start))
        payload = struct.pack("<H", len(runs))
        for s, ln in runs:
            payload += struct.pack("<HH", s, ln)
        return True, payload
    if len(values) <= 4096:
        return False, b"".join(struct.pack("<H", v) for v in values)
    words = [0] * 1024
    for v in values:
        words[v >> 6] |= 1 << (v & 63)
    return False, b"".join(struct.pack("<Q", w) for w in words)


def encode_roaring_bitmap32(values, force_run=False) -> bytes:
    """Standard-format serialization of one 32-bit roaring bitmap from a
    sorted iterable of uint32 values."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    conts = [_encode_container(by_key[k], force_run=force_run)
             for k in keys]
    size = len(keys)
    any_run = any(r for r, _ in conts)
    out = bytearray()
    if any_run:
        out += struct.pack("<i", (12347 & 0xFFFF) | ((size - 1) << 16))
        flags = bytearray((size + 7) // 8)
        for i, (r, _) in enumerate(conts):
            if r:
                flags[i // 8] |= 1 << (i % 8)
        out += flags
        has_offsets = size >= 4
    else:
        out += struct.pack("<i", 12346) + struct.pack("<i", size)
        has_offsets = True
    for k, (_, _p) in zip(keys, conts):
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    if has_offsets:
        pos = len(out) + 4 * size
        for _, p in conts:
            out += struct.pack("<I", pos)
            pos += len(p)
    for _, p in conts:
        out += p
    return bytes(out)


def encode_roaring_array(indexes, force_run=False) -> bytes:
    """Portable 64-bit RoaringBitmapArray of sorted int64 row indexes
    (RoaringFormatSpec 64-bit extension, as written by delta-spark):
    magic, LE-long count of NON-EMPTY buckets, then for each bucket in
    increasing key order a 4-byte LE key followed by its standard
    32-bit bitmap."""
    by_hi: dict[int, list[int]] = {}
    for i in sorted(indexes):
        by_hi.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    keys = sorted(by_hi)
    out = struct.pack("<i", 1681511377) + struct.pack("<q", len(keys))
    for hi in keys:
        out += struct.pack("<I", hi)
        out += encode_roaring_bitmap32(by_hi[hi], force_run=force_run)
    return out


def write_dv_file(dvs: list[bytes]) -> tuple[bytes, list[int]]:
    """DV FILE bytes (version byte 1, then per DV: BE size, data, BE
    CRC-32) and each DV's descriptor ``offset``."""
    blob = bytearray(b"\x01")
    offsets = []
    for data in dvs:
        offsets.append(len(blob))
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(blob), offsets


# ---- Iceberg v3 deletion vectors (Puffin) -------------------------------

_PUFFIN_MAGIC = b"PFA1"
_ICEBERG_DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])


def iceberg_dv_blob(indexes, force_run=False) -> bytes:
    """One deletion-vector-v1 blob (Iceberg v3 spec): BE length of
    magic+vector, then the magic bytes D1 D3 39 64 EXACTLY ONCE
    followed by the portable 64-bit roaring vector, then BE CRC-32
    over magic+vector.  The magic is Delta's LE magic 1681511377, so
    magic+vector == encode_roaring_array's output byte-for-byte (the
    spec's deliberate Delta interop)."""
    body = encode_roaring_array(indexes, force_run=force_run)
    assert body[:4] == _ICEBERG_DV_MAGIC  # spec interop invariant
    return (struct.pack(">i", len(body)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def write_puffin(blobs: list[bytes]) -> tuple[bytes, list[tuple[int, int]]]:
    """A spec-shaped Puffin file: header magic, the blobs, a footer
    (magic, json payload, LE payload size, flags, magic).  Returns the
    file bytes and each blob's (offset, length) as a manifest would
    record them (content_offset / content_size_in_bytes)."""
    import json as _json

    out = bytearray(_PUFFIN_MAGIC)
    spans = []
    for b in blobs:
        spans.append((len(out), len(b)))
        out += b
    payload = _json.dumps({
        "blobs": [{"type": "deletion-vector-v1", "fields": [],
                   "offset": off, "length": ln}
                  for off, ln in spans],
    }).encode("utf-8")
    out += _PUFFIN_MAGIC + payload
    out += struct.pack("<i", len(payload))
    out += b"\x00\x00\x00\x00"  # flags: uncompressed footer
    out += _PUFFIN_MAGIC
    return bytes(out), spans
