"""SPSS system-file (.sav / .zsav) decoder, pure Python.

Reference parity: the reference reads SPSS exports through DuckDB's
``read_stat`` community extension (``/root/reference/src/TidierDB.jl:
175-178``), which wraps ReadStat; pandas delegates to pyreadstat — a
wheel that is not in this image.  This module implements the READ side
of the publicly documented SPSS "system file" format directly (the
canonical public description is PSPP's *System File Format* appendix,
https://www.gnu.org/software/pspp/pspp-dev/html_node/System-File-Format.html),
the same jar-free/wheel-free codec strategy as the repo's PNG/JPEG/GIF/
Avro/roaring decoders, with the independent spec-written encoder in
``tests/sav_ref.py`` plus hand-written golden bytes as the evidence.

Layout implemented:

- **Header** (176 bytes): magic ``$FL2`` (``$FL3`` for zsav), product,
  ``layout_code`` (endianness detector — the file carries whatever the
  writing machine used), nominal case size, compression code (0 raw /
  1 bytecode / 2 zlib-on-bytecode), weight index, ncases, compression
  ``bias`` (normally 100), dates, label.
- **Variable records** (type 2): numeric (type 0) or string of width
  1-255 (type = width, followed by ``ceil(w/8)-1`` continuation records
  of type -1), optional variable label, user-missing values (1-3
  discrete, or a range with optional extra discrete, n < 0).
- **Value labels** (types 3+4) are parsed and returned as metadata
  (NOT applied to values — pyreadstat's default behavior).
- **Documents** (type 6) skipped.
- **Extension records** (type 7): subtype 13 (long variable names)
  applied; subtype 20 / subtype 3's character code set the string
  encoding; subtype 14 (very long strings, width > 255 — r12) maps the
  first segment's short name to the true width, and column assembly
  stitches the ceil(w/252) consecutive segment variables (252 data
  bytes per non-final 255-wide segment, remainder in the last) BEFORE
  decoding, so multi-byte characters split across segments reassemble;
  width/segment mismatches refuse loudly; unknown subtypes are skipped
  by size, as the spec instructs.
- **Dictionary terminator** (type 999) then the data:
  compression 0 = raw 8-byte elements; 1 = bytecode (8 opcode bytes
  per block: 0 pad, 1-251 ⇒ value ``code - bias``, 252 EOF, 253
  literal 8-byte element follows the block, 254 all-spaces, 255
  system-missing); 2 (zsav) = a zheader (3 int64s) + zlib blocks whose
  concatenated inflation is exactly the compression-1 stream, with the
  block table in an uncompressed trailer.

Values: numerics are IEEE doubles; ``SYSMIS`` (lowest double) and
user-missing codes/ranges map to NaN (pyreadstat's default); strings
decode with the declared encoding and trailing spaces stripped.  No
date/number reformatting is applied — values come back as stored
(SPSS date formats are seconds since 1582-10-14; callers convert
explicitly, keeping the decoder deterministic).

Everything malformed raises loudly — a silently misread survey file is
wrong data downstream, the one thing an ingest layer must never do.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

__all__ = ["read_sav_bytes", "SYSMIS"]

SYSMIS = struct.unpack("<d", b"\xff\xff\xff\xff\xff\xff\xef\xff")[0]

# IBM/Windows code page -> python codec for the subtype-3 character code
_CODEPAGES = {
    2: "ascii", 20127: "ascii", 65001: "utf-8", 1250: "cp1250",
    1251: "cp1251", 1252: "cp1252", 1253: "cp1253", 1254: "cp1254",
    28591: "latin-1", 28592: "iso8859-2", 932: "cp932", 936: "gbk",
    950: "big5", 874: "cp874", 1256: "cp1256",
}


class _Cursor:
    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf, self.pos, self.end = buf, pos, len(buf)

    def take(self, n: int) -> bytes:
        if self.pos + n > self.end:
            raise ValueError(
                f"sav: truncated at byte {self.pos} (need {n} more)"
            )
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b


def _norm_encoding(name: str) -> str:
    import codecs

    try:
        codecs.lookup(name)
        return name
    except LookupError:
        raise ValueError(f"sav: unknown character encoding {name!r}")


def read_sav_bytes(data: bytes):
    """Decode one .sav/.zsav byte string.  Returns ``(pdf, meta)`` where
    ``meta`` carries ``{"labels": {var: {value: label}}, "var_labels":
    {var: label}, "encoding": str, "n_cases": int}``."""
    if len(data) < 176 or data[:4] not in (b"$FL2", b"$FL3"):
        raise ValueError(
            f"sav: bad magic {data[:4]!r} (expected $FL2/$FL3)"
        )
    zsav = data[:4] == b"$FL3"
    # endianness from layout_code at offset 64 (2 or 3 in writer order)
    (lc_le,) = struct.unpack_from("<i", data, 64)
    if lc_le in (2, 3):
        bo = "<"
    else:
        (lc_be,) = struct.unpack_from(">i", data, 64)
        if lc_be not in (2, 3):
            raise ValueError(
                f"sav: layout_code {lc_le}/{lc_be} in neither byte order"
            )
        bo = ">"
    case_size, compression, _weight, ncases = struct.unpack_from(
        bo + "iiii", data, 68
    )
    (bias,) = struct.unpack_from(bo + "d", data, 84)
    if zsav and compression != 2:
        raise ValueError(f"sav: $FL3 magic with compression={compression}")

    cur = _Cursor(data, 176)
    # one entry per 8-byte ELEMENT of a case:
    #   ("num", name, print_fmt, missing) | ("str", name, width) | None
    elements: list = []
    value_label_sets: list[tuple[list[bytes], dict]] = []
    long_names: dict[str, str] = {}
    very_long: dict[str, int] = {}  # first-segment short name -> width
    encoding: str | None = None

    def _i32() -> int:
        return struct.unpack(bo + "i", cur.take(4))[0]

    while True:
        rec = _i32()
        if rec == 999:
            if _i32() != 0:
                raise ValueError("sav: dictionary terminator filler != 0")
            break
        if rec == 2:  # variable
            vtype = _i32()
            has_label = _i32()
            n_missing = _i32()
            print_fmt = _i32()
            _write_fmt = _i32()
            name = cur.take(8).decode("latin-1").rstrip()
            if has_label:
                ll = _i32()
                cur.take((ll + 3) // 4 * 4)
            miss: tuple = ()
            if n_missing:
                vals = struct.unpack(
                    bo + "d" * abs(n_missing), cur.take(8 * abs(n_missing))
                )
                miss = (n_missing, vals)
            if vtype == 0:
                elements.append(("num", name, print_fmt, miss))
            elif 1 <= vtype <= 255:
                elements.append(("str", name, vtype))
            elif vtype == -1:
                elements.append(None)  # string continuation element
            else:
                raise ValueError(f"sav: variable type {vtype} out of range")
        elif rec == 3:  # value labels (+ mandatory type-4 var list)
            n = _i32()
            pairs = []
            for _ in range(n):
                raw = cur.take(8)
                ll = cur.take(1)[0]
                lab = cur.take(((ll + 1 + 7) // 8) * 8 - 1)[:ll]
                pairs.append((raw, lab))
            if _i32() != 4:
                raise ValueError("sav: value-label record without type-4")
            nv = _i32()
            idx = [_i32() for _ in range(nv)]
            value_label_sets.append((idx, pairs))
        elif rec == 6:  # documents
            cur.take(80 * _i32())
        elif rec == 7:  # extensions
            subtype = _i32()
            size, count = _i32(), _i32()
            payload = cur.take(size * count)
            if subtype == 13:  # long variable names
                for pair in payload.decode("latin-1").split("\t"):
                    if "=" in pair:
                        s, long = pair.split("=", 1)
                        long_names[s.rstrip()] = long
            elif subtype == 14:
                # very long strings (PSPP appendix "Very Long String
                # Record"): "NAME=width" tuples, each \x00-terminated,
                # \t-separated — maps the FIRST segment's short name to
                # the string's true width; stitching happens at column
                # assembly below (r12)
                for pair in payload.decode("latin-1") \
                        .replace("\x00", "").split("\t"):
                    if "=" in pair:
                        nm, w = pair.split("=", 1)
                        w = w.strip()
                        if not w.isdigit():
                            raise ValueError(
                                f"sav: malformed very-long-string entry "
                                f"{pair!r}"
                            )
                        very_long[nm.rstrip()] = int(w)
            elif subtype == 20:
                encoding = _norm_encoding(
                    payload.decode("ascii", "replace").strip("\x00 ")
                )
            elif subtype == 3 and encoding is None and size * count >= 32:
                code = struct.unpack_from(bo + "i", payload, 28)[0]
                if code in _CODEPAGES:
                    encoding = _CODEPAGES[code]
            # every other subtype: skipped by size, per spec
        else:
            raise ValueError(f"sav: unknown record type {rec}")

    encoding = encoding or "latin-1"
    if case_size not in (-1, len(elements)):
        raise ValueError(
            f"sav: header case size {case_size} != {len(elements)} "
            "declared elements"
        )

    raw = _data_elements(cur, compression, bo, bias, len(elements), ncases)
    n_cases = raw.shape[0]

    # assemble columns
    cols: dict[str, object] = {}
    names: list[str] = []
    i = 0
    labels: dict[str, dict] = {}
    elem_name: dict[int, tuple[str, str]] = {}  # 1-based index -> (name, kind)
    while i < len(elements):
        el = elements[i]
        if el is None:
            raise ValueError(
                f"sav: continuation element {i} without a string variable"
            )
        if el[0] == "num":
            _, name, _fmt, miss = el
            name = long_names.get(name, name)
            vals = raw[:, i].copy().view(np.float64)
            nan_mask = vals == SYSMIS
            if miss:
                nm, mv = miss
                if nm > 0:
                    for v in mv:
                        nan_mask |= vals == v
                else:  # range (lo, hi) + optional discrete
                    nan_mask |= (vals >= mv[0]) & (vals <= mv[1])
                    for v in mv[2:]:
                        nan_mask |= vals == v
            vals[nan_mask] = np.nan
            elem_name[i + 1] = (name, "num")
            cols[name] = vals
            names.append(name)
            i += 1
        elif el[2] <= 255 and el[1] in very_long and very_long[el[1]] > 255:
            # very long string (subtype 14, r12 — PSPP appendix): the
            # true width w spans ceil(w/252) consecutive SEGMENT string
            # variables; every non-final segment is declared 255 wide
            # but carries exactly 252 data bytes (3 pad), the final one
            # carries the remainder.  Bytes are stitched BEFORE
            # decoding, so multi-byte characters split across a segment
            # boundary reassemble correctly.
            short, true_w = el[1], very_long[el[1]]
            n_vars = (true_w + 251) // 252
            seg_specs: list[tuple[int, int, int]] = []  # (start, nelem, w)
            k = i
            for s in range(n_vars):
                el2 = elements[k] if k < len(elements) else None
                if el2 is None or el2[0] != "str":
                    raise ValueError(
                        f"sav: very long string {short!r} (width {true_w})"
                        f" expects {n_vars} consecutive string segments — "
                        f"segment {s} is absent; refusing a partial stitch"
                    )
                w2 = el2[2]
                nseg2 = (w2 + 7) // 8
                for j in range(1, nseg2):
                    if elements[k + j] is not None:
                        raise ValueError(
                            f"sav: segment {s} of {short!r} (width {w2}) "
                            f"missing continuation element {j}"
                        )
                seg_specs.append((k, nseg2, w2))
                k += nseg2
            takes, remaining = [], true_w
            for _st, _ns, w2 in seg_specs:
                t = min(252, w2, remaining)
                takes.append(t)
                remaining -= t
            if remaining:
                raise ValueError(
                    f"sav: subtype-14 declares width {true_w} for "
                    f"{short!r} but its {n_vars} segments hold only "
                    f"{true_w - remaining} data bytes"
                )
            per_seg: list[list[bytes]] = []
            for (st, ns, _w2), t in zip(seg_specs, takes):
                seg = raw[:, st:st + ns]
                b = seg.tobytes() if bo == "<" else seg.byteswap().tobytes()
                per_seg.append([b[r * ns * 8:r * ns * 8 + t]
                                for r in range(n_cases)])
            svals = [
                b"".join(parts).decode(encoding, "replace").rstrip(" ")
                for parts in zip(*per_seg)
            ]
            name = long_names.get(short, short)
            elem_name[i + 1] = (name, "str")
            cols[name] = svals
            names.append(name)
            i = k
        else:
            _, name, width = el
            name = long_names.get(name, name)
            nseg = (width + 7) // 8
            for j in range(1, nseg):
                if elements[i + j] is not None:
                    raise ValueError(
                        f"sav: string {name!r} (width {width}) missing "
                        f"continuation element {j}"
                    )
            seg = raw[:, i:i + nseg]
            b = seg.tobytes() if bo == "<" else seg.byteswap().tobytes()
            # row-major: each case's nseg elements are contiguous
            svals = [
                b[r * nseg * 8:r * nseg * 8 + width]
                .decode(encoding, "replace").rstrip(" ")
                for r in range(n_cases)
            ]
            elem_name[i + 1] = (name, "str")
            cols[name] = svals
            names.append(name)
            i += nseg

    for idx, pairs in value_label_sets:
        tgt = [elem_name[j] for j in idx if j in elem_name]
        for name, kind in tgt:
            d = labels.setdefault(name, {})
            for rawv, lab in pairs:
                if kind == "num":
                    key = struct.unpack(bo + "d", rawv)[0]
                else:
                    key = rawv.decode(encoding, "replace").rstrip(" ")
                d[key] = lab.decode(encoding, "replace").rstrip(" ")

    pdf = pd.DataFrame(cols, columns=names)
    meta = {"labels": labels, "encoding": encoding, "n_cases": n_cases,
            "compression": compression}
    return pdf, meta


def _data_elements(cur: _Cursor, compression: int, bo: str, bias: float,
                   case_size: int, ncases: int) -> np.ndarray:
    """Decode the data section into an (ncases, case_size) uint64 array
    of raw 8-byte elements (numeric views + string bytes alike)."""
    dt = np.dtype(np.uint64).newbyteorder(bo)
    if compression == 0:
        body = cur.buf[cur.pos:]
        need = ncases * case_size * 8 if ncases >= 0 else None
        if need is not None and len(body) < need:
            raise ValueError(
                f"sav: raw data truncated ({len(body)} < {need} bytes)"
            )
        n = ncases if ncases >= 0 else len(body) // (case_size * 8)
        arr = np.frombuffer(body, dtype=dt, count=n * case_size)
        return arr.reshape(n, case_size).astype(np.uint64)
    if compression == 2:  # zsav: zlib blocks over the bytecode stream
        zh_ofs, zt_ofs, zt_len = struct.unpack(
            bo + "qqq", cur.take(24)
        )
        if zh_ofs != cur.pos - 24:
            raise ValueError(
                f"sav: zheader self-offset {zh_ofs} != {cur.pos - 24}"
            )
        trailer = cur.buf[zt_ofs:zt_ofs + zt_len]
        if len(trailer) != zt_len or zt_len < 24:
            raise ValueError("sav: zlib trailer truncated")
        t_bias, t_zero, block_size, n_blocks = struct.unpack_from(
            bo + "qqii", trailer, 0
        )
        if t_bias != -int(bias) or t_zero != 0:
            raise ValueError(
                f"sav: zlib trailer (bias {t_bias}, zero {t_zero}) "
                f"inconsistent with header bias {bias}"
            )
        if zt_len != 24 + 24 * n_blocks:
            raise ValueError(
                f"sav: zlib trailer length {zt_len} != 24 + 24*{n_blocks}"
            )
        stream = bytearray()
        for b in range(n_blocks):
            u_ofs, c_ofs, u_sz, c_sz = struct.unpack_from(
                bo + "qqii", trailer, 24 + 24 * b
            )
            if u_sz > block_size:
                raise ValueError("sav: zlib block exceeds block_size")
            chunk = zlib.decompress(cur.buf[c_ofs:c_ofs + c_sz])
            if len(chunk) != u_sz:
                raise ValueError(
                    f"sav: zlib block {b} inflated to {len(chunk)} "
                    f"(trailer says {u_sz})"
                )
            stream += chunk
        inner = _Cursor(bytes(stream))
        return _bytecode(inner, bo, bias, case_size, ncases)
    if compression != 1:
        raise NotImplementedError(f"sav: compression code {compression}")
    return _bytecode(cur, bo, bias, case_size, ncases)


_SPACES8 = struct.unpack("<Q", b" " * 8)[0]


def _bytecode(cur: _Cursor, bo: str, bias: float, case_size: int,
              ncases: int) -> np.ndarray:
    """Compression-1 stream -> (n, case_size) uint64 element array."""
    sysmis_u = struct.unpack(bo + "Q", struct.pack(bo + "d", SYSMIS))[0]
    spaces_u = _SPACES8 if bo == "<" else _SPACES8  # 8 spaces, order-free
    out: list[int] = []
    eof = False
    while not eof and cur.pos < cur.end:
        codes = cur.take(8)
        for c in codes:
            if c == 0:
                continue
            if c == 252:
                eof = True
                break
            if c == 253:
                out.append(
                    struct.unpack(bo + "Q", cur.take(8))[0]
                )
            elif c == 254:
                out.append(spaces_u)
            elif c == 255:
                out.append(sysmis_u)
            else:  # 1..251: value = code - bias
                out.append(
                    struct.unpack(
                        bo + "Q", struct.pack(bo + "d", c - bias)
                    )[0]
                )
    if case_size == 0:
        return np.zeros((0, 0), dtype=np.uint64)
    if len(out) % case_size:
        raise ValueError(
            f"sav: decompressed element count {len(out)} is not a "
            f"multiple of the case size {case_size}"
        )
    n = len(out) // case_size
    if ncases >= 0 and n != ncases:
        raise ValueError(
            f"sav: header declares {ncases} cases, data holds {n}"
        )
    return np.array(out, dtype=np.uint64).reshape(n, case_size)
