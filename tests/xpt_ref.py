"""Independent SAS Transport (XPORT v5) ENCODER for oracle tests.

Written directly from the public spec (SAS Technical Note TS-140: 80-byte
records, NAMESTR catalog, IBM System/360 hex-float numerics, space-padded
latin-1 char fields) — deliberately NOT sharing any code with the reader
under test (pandas' xport parser), so a value-exact roundtrip checks both
sides against the spec rather than against each other (the jpeg_ref /
gif_ref / webp_ref discipline).
"""

from __future__ import annotations

import math
import struct

import pandas as pd


def ieee_to_ibm(x: float) -> bytes:
    """IEEE 754 double -> 8-byte big-endian IBM hex float (TS-140 §'missing
    values' for the NaN encoding: '.' + zero fill)."""
    if x != x:
        return b"." + bytes(7)
    if x == 0.0:
        return bytes(8)
    sign = 0x80 if x < 0 else 0
    x = abs(x)
    if not (16.0 ** -65 <= x < 16.0 ** 63):
        # IBM hex float range is 16**-65 .. 16**63; outside it the byte
        # packing below would silently corrupt the sign/exponent
        raise ValueError(f"value {x!r} outside IBM hex-float range")
    e = math.floor(math.log(x, 16)) + 1
    frac = x / (16.0 ** e)
    while frac >= 1.0:
        e += 1
        frac = x / (16.0 ** e)
    while frac < 1.0 / 16.0:
        e -= 1
        frac = x / (16.0 ** e)
    mant = int(round(frac * (1 << 56)))
    if mant >= 1 << 56:
        mant >>= 4
        e += 1
    return bytes([sign | (e + 64)]) + mant.to_bytes(7, "big")


def _pad80(b: bytes) -> bytes:
    return b + b" " * (-len(b) % 80)


def write_xport(df: pd.DataFrame, path: str, name: str = "DATA") -> None:
    """Write ``df`` (float64 + str columns, names <=8 chars) as XPORT v5."""
    ts = "01JAN24:00:00:00"
    recs = [
        _pad80(
            b"HEADER RECORD*******LIBRARY HEADER RECORD!!!!!!!"
            b"000000000000000000000000000000"
        ),
        _pad80(("SAS     SAS     SASLIB  9.4     Linux" + " " * 27 + ts).encode()),
        _pad80(ts.encode()),
        _pad80(
            b"HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!"
            b"000000000000000001600000000140"
        ),
        _pad80(
            b"HEADER RECORD*******DSCRPTR HEADER RECORD!!!!!!!"
            b"000000000000000000000000000000"
        ),
        _pad80(
            ("SAS     %-8s" % name[:8] + "SASDATA 9.4     Linux" + " " * 27 + ts).encode()
        ),
        _pad80((ts + " " * 16 + " " * 40 + "    ").encode()),
        _pad80(
            (
                "HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!"
                "000000%04d0000000000000000000000" % len(df.columns)
            ).encode()
        ),
    ]
    cols, pos, namestrs = [], 0, b""
    for i, c in enumerate(df.columns):
        s = df[c]
        if s.dtype == object:
            ntype = 2
            nlng = max(1, int(s.astype(str).str.len().max()))
        else:
            ntype, nlng = 1, 8
        cols.append((c, ntype, nlng))
        namestrs += struct.pack(
            ">hhhh8s40s8shhh2s8shhl52x",
            ntype, 0, nlng, i + 1,
            c.upper()[:8].ljust(8).encode(), b" " * 40, b" " * 8,
            0, 0, 0, b"  ", b" " * 8, 0, 0, pos,
        )
        pos += nlng
    recs.append(_pad80(namestrs))
    recs.append(
        _pad80(
            b"HEADER RECORD*******OBS     HEADER RECORD!!!!!!!"
            b"000000000000000000000000000000"
        )
    )
    data = b""
    for _, row in df.iterrows():
        for c, ntype, nlng in cols:
            if ntype == 1:
                data += ieee_to_ibm(float(row[c]))
            else:
                data += str(row[c]).encode("latin-1")[:nlng].ljust(nlng)
    with open(path, "wb") as fh:
        fh.write(b"".join(recs) + data + b" " * (-len(data) % 80))
