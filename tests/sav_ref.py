"""Independent, spec-written ENCODER for SPSS system files (.sav/.zsav).

Written directly from the public format description (PSPP's *System
File Format* appendix) — NOT from the repo decoder
(``tidierdb_jl_spark/sources/sav.py``).  Decoder/encoder agreement on
generated artifacts plus hand-written golden bytes are the correctness
evidence (the same strategy as ``tests/avro_ref.py`` /
``tests/roaring_ref.py``).

Supports: numeric and string (width ≤ 255) variables, variable labels,
user-missing values (discrete and range), value labels, long variable
names (extension 13), explicit encoding record (extension 20), both
byte orders, and all three compression codes (0 raw / 1 bytecode /
2 zsav zlib).
"""

from __future__ import annotations

import struct
import zlib

SYSMIS = struct.unpack("<d", b"\xff\xff\xff\xff\xff\xff\xef\xff")[0]


def _pad(b: bytes, n: int, fill: bytes = b" ") -> bytes:
    if len(b) > n:
        raise ValueError(f"{b!r} longer than {n}")
    return b + fill * (n - len(b))


class Var:
    """name: short name (≤8, stored uppercase-ish as given);
    width: 0 = numeric, 1-255 = string; label: optional variable label;
    missing: None, list of 1-3 discrete doubles, or ("range", lo, hi)
    or ("range+", lo, hi, discrete); long_name: optional."""

    def __init__(self, name, width=0, label=None, missing=None,
                 long_name=None, print_fmt=None):
        self.name, self.width, self.label = name, width, label
        self.missing, self.long_name = missing, long_name
        # default print format: F8.2 for numeric (type 5), A<w> (type 1)
        self.print_fmt = print_fmt if print_fmt is not None else (
            (5 << 16) | (8 << 8) | 2 if width == 0
            else (1 << 16) | (min(width, 255) << 8)
        )

    @property
    def nseg(self):
        return 1 if self.width == 0 else (self.width + 7) // 8


def write_sav(variables, rows, compression=1, bias=100.0, bo="<",
              encoding="latin-1", ncases=None, value_labels=None,
              zsav_block=0x3FF000, very_long=None) -> bytes:
    """Build a complete .sav (compression 0/1) or .zsav (2) byte string.
    ``rows``: list of tuples matching ``variables`` (floats / None for
    sysmis; str for string vars).  ``value_labels``: {var_name:
    {value: label}} emitted as type 3+4 records.  ``very_long``:
    {first_segment_name: true_width} emitted as an extension subtype-14
    record (PSPP appendix "Very Long String Record": NAME=width tuples,
    each \x00-terminated, \t-separated) — the caller passes the
    segment variables/values itself, keeping this encoder a dumb
    byte-level mirror of the spec."""
    if compression == 2:
        magic = b"$FL3"
    else:
        magic = b"$FL2"
    case_size = sum(v.nseg for v in variables)
    out = bytearray()
    out += magic
    out += _pad(b"@(#) SPSS DATA FILE sav_ref test writer", 60)
    out += struct.pack(bo + "i", 2)                 # layout_code
    out += struct.pack(bo + "i", case_size)
    out += struct.pack(bo + "i", compression)
    out += struct.pack(bo + "i", 0)                 # weight index
    out += struct.pack(bo + "i",
                       len(rows) if ncases is None else ncases)
    out += struct.pack(bo + "d", bias)
    out += _pad(b"01 Jan 26", 9) + _pad(b"00:00:00", 8)
    out += _pad(b"sav_ref fixture", 64) + b"\x00" * 3

    elem_index = {}  # var name -> 1-based dictionary index of element 1
    idx = 1
    for v in variables:
        elem_index[v.name] = idx
        out += struct.pack(bo + "i", 2)
        out += struct.pack(bo + "i", v.width)
        out += struct.pack(bo + "i", 1 if v.label else 0)
        if v.missing is None:
            nm, mvals = 0, ()
        elif isinstance(v.missing, tuple) and v.missing[0] == "range":
            nm, mvals = -2, v.missing[1:]
        elif isinstance(v.missing, tuple) and v.missing[0] == "range+":
            nm, mvals = -3, v.missing[1:]
        else:
            nm, mvals = len(v.missing), tuple(v.missing)
        out += struct.pack(bo + "i", nm)
        out += struct.pack(bo + "i", v.print_fmt)
        out += struct.pack(bo + "i", v.print_fmt)   # write format
        out += _pad(v.name.upper().encode("ascii"), 8)
        if v.label:
            lb = v.label.encode(encoding)
            out += struct.pack(bo + "i", len(lb))
            out += _pad(lb, (len(lb) + 3) // 4 * 4, b"\x00")
        for m in mvals:
            out += struct.pack(bo + "d", m)
        for _ in range(v.nseg - 1):                 # string continuations
            out += struct.pack(bo + "iiiii", 2, -1, 0, 0, 0)
            out += struct.pack(bo + "i", 0)
            out += _pad(b"", 8)
        idx += v.nseg

    for name, labs in (value_labels or {}).items():
        var = next(v for v in variables if v.name == name)
        out += struct.pack(bo + "ii", 3, len(labs))
        for val, lab in labs.items():
            if var.width == 0:
                out += struct.pack(bo + "d", float(val))
            else:
                out += _pad(str(val).encode(encoding), 8)
            lb = lab.encode(encoding)
            if len(lb) > 255:
                raise ValueError("value label too long")
            body = bytes([len(lb)]) + lb
            out += _pad(body, (len(body) + 7) // 8 * 8)
        out += struct.pack(bo + "ii", 4, 1)
        out += struct.pack(bo + "i", elem_index[name])

    longs = [(v.name.upper(), v.long_name) for v in variables
             if v.long_name]
    if longs:
        payload = "\t".join(f"{s}={ln}" for s, ln in longs).encode(encoding)
        out += struct.pack(bo + "iiii", 7, 13, 1, len(payload))
        out += payload
    if very_long:
        vl = "".join(f"{k.upper()}={w}\x00\t" for k, w in very_long.items())
        vlb = vl.encode("ascii")
        out += struct.pack(bo + "iiii", 7, 14, 1, len(vlb))
        out += vlb
    enc_payload = encoding.upper().encode("ascii")
    out += struct.pack(bo + "iiii", 7, 20, 1, len(enc_payload))
    out += enc_payload
    out += struct.pack(bo + "ii", 999, 0)

    elems = _element_stream(variables, rows, bo, encoding)
    if compression == 0:
        out += elems
    elif compression == 1:
        out += _bytecode_compress(elems, bo, bias)
    elif compression == 2:
        bc = _bytecode_compress(elems, bo, bias)
        zheader_ofs = len(out)
        blocks = [bc[i:i + zsav_block] for i in range(0, len(bc), zsav_block)] \
            or [b""]
        comp = [zlib.compress(b) for b in blocks]
        data_start = zheader_ofs + 24
        ztrailer_ofs = data_start + sum(len(c) for c in comp)
        ztrailer_len = 24 + 24 * len(blocks)
        out += struct.pack(bo + "qqq", zheader_ofs, ztrailer_ofs,
                           ztrailer_len)
        u_ofs, c_ofs = zheader_ofs, data_start
        table = bytearray(struct.pack(bo + "qqii", -int(bias), 0,
                                      zsav_block, len(blocks)))
        for b, c in zip(blocks, comp):
            out += c
            table += struct.pack(bo + "qqii", u_ofs, c_ofs, len(b), len(c))
            u_ofs += len(b)
            c_ofs += len(c)
        out += table
    else:
        raise ValueError(f"compression {compression}")
    return bytes(out)


def _element_stream(variables, rows, bo, encoding) -> bytes:
    out = bytearray()
    for row in rows:
        if len(row) != len(variables):
            raise ValueError("row arity mismatch")
        for v, val in zip(variables, row):
            if v.width == 0:
                d = SYSMIS if val is None else float(val)
                out += struct.pack(bo + "d", d)
            else:
                raw = (val if isinstance(val, (bytes, bytearray))
                       else ("" if val is None else str(val))
                       .encode(encoding))
                out += _pad(bytes(raw), v.nseg * 8)
    return bytes(out)


def _bytecode_compress(elems: bytes, bo: str, bias: float) -> bytes:
    """Compression-1 stream: groups of 8 opcode bytes, literals after
    each group.  Encodes small integers as code = value + bias, spaces
    as 254, sysmis as 255, everything else as 253 + literal."""
    sysmis8 = struct.pack(bo + "d", SYSMIS)
    spaces8 = b" " * 8
    out = bytearray()
    pend_codes: list[int] = []
    pend_lits: list[bytes] = []

    def flush(final=False):
        nonlocal pend_codes, pend_lits
        if not pend_codes and not final:
            return
        while len(pend_codes) < 8:
            pend_codes.append(0)
        out.extend(bytes(pend_codes))
        for lit in pend_lits:
            out.extend(lit)
        pend_codes, pend_lits = [], []

    for i in range(0, len(elems), 8):
        e = elems[i:i + 8]
        if e == sysmis8:
            pend_codes.append(255)
        elif e == spaces8:
            pend_codes.append(254)
        else:
            code = None
            try:
                d = struct.unpack(bo + "d", e)[0]
                c = d + bias
                if c == int(c) and 1 <= c <= 251 and \
                        struct.pack(bo + "d", int(c) - bias) == e:
                    code = int(c)
            except struct.error:
                pass
            if code is not None:
                pend_codes.append(code)
            else:
                pend_codes.append(253)
                pend_lits.append(e)
        if len(pend_codes) == 8:
            flush()
    pend_codes.append(252)  # end of data
    flush(final=True)
    return bytes(out)
