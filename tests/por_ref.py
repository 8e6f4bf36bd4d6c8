"""Independent, spec-written ENCODER for SPSS portable files (.por).

Written directly from the public format description (PSPP's *Portable
File Format* appendix) — NOT from the repo decoder
(``tidierdb_jl_spark/sources/por.py``).  Decoder/encoder agreement plus
hand-written golden number fields are the correctness evidence.

Emits ASCII portable files: 5 x 40-char vanity lines, the 256-byte
translation table, the ``SPSSPORT`` signature, version ``A``,
date/time, tagged dictionary records, case data, and ``Z`` padding to
the 80-char line grid.  Numbers are base-30 with ``/`` terminators;
``*.`` is system-missing.
"""

from __future__ import annotations

import math

_DIGITS = "0123456789ABCDEFGHIJKLMNOPQRST"


def n30(value, max_frac: int = 10) -> str:
    """Base-30 number field INCLUDING the '/' terminator; None -> '*.'
    (system missing, no terminator per spec)."""
    if value is None:
        return "*."
    v = float(value)
    out = ""
    if v < 0 or (v == 0 and math.copysign(1, v) < 0):
        out += "-"
        v = -v
    ip = int(v)
    frac = v - ip
    digs = ""
    while ip:
        digs = _DIGITS[ip % 30] + digs
        ip //= 30
    out += digs or "0"
    if frac > 0:
        out += "."
        for _ in range(max_frac):
            frac *= 30
            d = int(frac + 1e-9)
            out += _DIGITS[d]
            frac -= d
            if frac <= 1e-9:
                break
        out = out.rstrip("0") if not out.endswith(".") else out
    return out + "/"


def s30(text: str) -> str:
    """String field: base-30 length + '/' + the characters."""
    return n30(len(text)) + text


class PVar:
    def __init__(self, name, width=0, label=None, missing=(),
                 ranges=()):
        self.name, self.width, self.label = name, width, label
        self.missing, self.ranges = list(missing), list(ranges)


# a plausible ASCII translation table (the decoder gates on the ASCII
# signature and ignores the table, as real-world files are ASCII)
_TRANS = ("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
          "abcdefghijklmnopqrstuvwxyz"
          " .<(+0&[]!$*);^-/|,%_>?`:#@'=\"").ljust(256, "0")[:256]


def write_por(variables, rows, product="por_ref test writer",
              line_sep="\r\n") -> bytes:
    body = ""
    body += ("ASCII SPSS PORT FILE" + " " * 60).ljust(200)[:200]
    body += _TRANS
    body += "SPSSPORT"
    body += "A"                       # version
    body += s30("20260101")           # date
    body += s30("000000")             # time
    body += "1" + s30(product)
    body += "4" + n30(len(variables))
    body += "5" + n30(11)             # precision
    for v in variables:
        body += "7" + n30(v.width) + s30(v.name.upper())
        fmt = (5, 8, 2) if v.width == 0 else (1, v.width, 0)
        for f in fmt * 2:
            body += n30(f)
        for m in v.missing:
            body += "8" + (s30(m) if v.width else n30(m))
        for lo, hi in v.ranges:
            if lo == -math.inf:
                body += "9" + n30(hi)
            elif hi == math.inf:
                body += "A" + n30(lo)
            else:
                body += "B" + n30(lo) + n30(hi)
        if v.label:
            body += "C" + s30(v.label)
    return _finish(body, variables, rows, line_sep)


def write_por_with_labels(variables, rows, value_labels,
                          line_sep="\r\n") -> bytes:
    body = ""
    body += ("ASCII SPSS PORT FILE" + " " * 60).ljust(200)[:200]
    body += _TRANS
    body += "SPSSPORT" + "A" + s30("20260101") + s30("000000")
    body += "4" + n30(len(variables))
    for v in variables:
        body += "7" + n30(v.width) + s30(v.name.upper())
        fmt = (5, 8, 2) if v.width == 0 else (1, v.width, 0)
        for f in fmt * 2:
            body += n30(f)
    for name, labs in value_labels.items():
        var = next(v for v in variables if v.name.upper() == name.upper())
        body += "D" + n30(1) + s30(name.upper()) + n30(len(labs))
        for val, lab in labs.items():
            body += (s30(str(val)) if var.width else n30(float(val)))
            body += s30(lab)
    return _finish(body, variables, rows, line_sep)


def _finish(body: str, variables, rows, line_sep: str) -> bytes:
    body += "F"
    for row in rows:
        if len(row) != len(variables):
            raise ValueError("row arity mismatch")
        for v, val in zip(variables, row):
            if v.width == 0:
                body += n30(val)
            else:
                body += s30("" if val is None else str(val))
    if len(body) % 80:
        body += "Z" * (80 - len(body) % 80)
    lines = [body[i:i + 80] for i in range(0, len(body), 80)]
    return (line_sep.join(lines) + line_sep).encode("ascii")
