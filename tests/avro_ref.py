"""Independent Avro Object Container File ENCODER, written from the
Avro 1.11 specification for the tests only — deliberately a separate
implementation from ``sources/avro_lite.py``'s decoder (the repo's
codec-test strategy: reader and writer each follow the spec, agreement
is evidence; neither derives from the other).

Covers what the Iceberg fixtures need: container framing, null/deflate
codecs, and the binary encoding of the primitive + complex types.
"""

from __future__ import annotations

import io
import json
import struct
import zlib


def zigzag(n: int) -> bytes:
    """Spec 'Binary encoding / primitive types': int/long are zigzag
    then base-128 little-endian varint."""
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_value(schema, value) -> bytes:
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                return zigzag(i) + encode_value(branch, value)
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (list, dict)):
        return encode_value(t, value)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return zigzag(int(value))
    if t == "float":
        return struct.pack("<f", value)
    if t == "double":
        return struct.pack("<d", value)
    if t == "bytes":
        return zigzag(len(value)) + bytes(value)
    if t == "string":
        b = value.encode("utf-8")
        return zigzag(len(b)) + b
    if t == "fixed":
        assert len(value) == schema["size"]
        return bytes(value)
    if t == "enum":
        return zigzag(schema["symbols"].index(value))
    if t == "array":
        out = b""
        if value:
            out += zigzag(len(value))
            for v in value:
                out += encode_value(schema["items"], v)
        return out + zigzag(0)
    if t == "map":
        out = b""
        if value:
            out += zigzag(len(value))
            for k, v in value.items():
                kb = k.encode("utf-8")
                out += zigzag(len(kb)) + kb + encode_value(schema["values"], v)
        return out + zigzag(0)
    if t == "record":
        return b"".join(
            encode_value(f["type"], value[f["name"]]) for f in schema["fields"]
        )
    raise ValueError(f"encoder: unsupported type {t!r}")


def _matches(branch, value):
    t = branch["type"] if isinstance(branch, dict) else branch
    if t == "null":
        return value is None
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("record", "map"):
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    return value is not None


def write_container(schema: dict, records: list, codec: str = "null",
                    sync: bytes = b"0123456789abcdef") -> bytes:
    """Object Container File bytes: magic, metadata map (avro.schema +
    avro.codec), sync, one data block."""
    assert len(sync) == 16
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    buf.write(zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        buf.write(zigzag(len(kb)) + kb + zigzag(len(v)) + v)
    buf.write(zigzag(0))
    buf.write(sync)
    body = b"".join(encode_value(schema, r) for r in records)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()
    buf.write(zigzag(len(records)) + zigzag(len(body)) + body + sync)
    return buf.getvalue()
