"""SPSS portable-file (.por) decoder, pure Python.

Closes the last leg of the reference's ``read_stat`` extension surface
(``/root/reference/src/TidierDB.jl:175-178``): with :mod:`.sav` (r11)
covering system files, this module covers the legacy PORTABLE format,
written directly from the public description (PSPP's *Portable File
Format* appendix,
https://www.gnu.org/software/pspp/pspp-dev/html_node/Portable-File-Format.html).

Structure implemented:

- 200-byte vanity header (5 x 40-char splash lines), 256-byte character
  translation table, 8-byte signature ``SPSSPORT``.  The format allows
  arbitrary single-byte encodings resolved through the table; real
  writers emit ASCII, so this reader REQUIRES the literal ASCII
  signature and refuses translated (e.g. EBCDIC) files loudly rather
  than guessing a mapping.
- The file is a character stream broken into 80-char lines (CR/LF or
  LF); line terminators are stripped and the stream re-joined before
  parsing, trailing ``Z`` padding ends the file.
- **Numbers** are base-30 ("trigesimal", digits ``0-9A-T``) with
  optional sign, fraction (``.``), and exponent (``+``/``-``),
  terminated by ``/``; the system-missing value is written ``*.``.
- **Strings** are a number (the length) immediately followed by that
  many characters.
- **Tagged records**: ``1``/``2``/``3`` product/author/subproduct,
  ``4`` variable count, ``5`` precision, ``6`` case weight, ``7``
  variable (width, name, print format triple, write format triple) with
  optional ``8`` discrete missing / ``9`` LO-THRU-x / ``A`` x-THRU-HI /
  ``B`` range / ``C`` variable label, ``D`` value labels, ``E``
  documents, ``F`` start of case data (values in dictionary order until
  the ``Z`` padding / end of stream).

Missing values (system + user-defined) map to NaN, matching the .sav
reader and pyreadstat's default; value labels come back as metadata.
Everything malformed raises loudly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["read_por_bytes"]

_DIGITS = "0123456789ABCDEFGHIJKLMNOPQRST"
_DIGIT_VAL = {c: i for i, c in enumerate(_DIGITS)}


class _Stream:
    __slots__ = ("s", "pos")

    def __init__(self, s: str):
        self.s, self.pos = s, 0

    def peek(self) -> str:
        if self.pos >= len(self.s):
            raise ValueError("por: unexpected end of stream")
        return self.s[self.pos]

    def take(self, n: int = 1) -> str:
        if self.pos + n > len(self.s):
            raise ValueError(
                f"por: truncated at character {self.pos} (need {n} more)"
            )
        out = self.s[self.pos:self.pos + n]
        self.pos += n
        return out

    def skip_spaces(self) -> None:
        while self.pos < len(self.s) and self.s[self.pos] == " ":
            self.pos += 1


def _number(st: _Stream):
    """Base-30 number field terminated by '/'; '*.' is system-missing
    (returns None)."""
    st.skip_spaces()
    if st.peek() == "*":
        st.take()
        if st.take() != ".":
            raise ValueError("por: '*' not followed by '.' (sysmis)")
        return None
    neg = False
    if st.peek() in "+-":
        neg = st.take() == "-"
    int_part = 0.0
    ndig = 0
    while st.peek() in _DIGIT_VAL:
        int_part = int_part * 30 + _DIGIT_VAL[st.take()]
        ndig += 1
    frac = 0.0
    if st.peek() == ".":
        st.take()
        scale = 1.0
        while st.peek() in _DIGIT_VAL:
            scale /= 30.0
            frac += _DIGIT_VAL[st.take()] * scale
            ndig += 1
    val = int_part + frac
    if st.peek() in "+-":
        esign = -1 if st.take() == "-" else 1
        e = 0
        while st.peek() in _DIGIT_VAL:
            e = e * 30 + _DIGIT_VAL[st.take()]
        val *= 30.0 ** (esign * e)
    elif ndig == 0:
        raise ValueError(
            f"por: empty number field at character {st.pos}"
        )
    if st.take() != "/":
        raise ValueError(
            f"por: number not terminated by '/' at character {st.pos - 1}"
        )
    return -val if neg else val


def _integer(st: _Stream) -> int:
    v = _number(st)
    if v is None or v != int(v):
        raise ValueError(f"por: expected an integer, got {v!r}")
    return int(v)


def _string(st: _Stream) -> str:
    n = _integer(st)
    if n < 0 or n > 100_000:
        raise ValueError(f"por: implausible string length {n}")
    return st.take(n)


def read_por_bytes(data: bytes):
    """Decode one .por byte string.  Returns ``(pdf, meta)`` with the
    same meta shape as :func:`.sav.read_sav_bytes`."""
    # the header is positional in the RAW byte stream (line structure
    # included); find the signature across common line lengths by
    # normalizing lines first, then checking the canonical offset
    try:
        text = data.decode("latin-1")
    except Exception as e:  # pragma: no cover - latin-1 never fails
        raise ValueError("por: undecodable bytes") from e
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    # spec: every line is 80 characters; writers pad short lines.  Pad
    # defensively (some writers trim trailing spaces) and re-join.
    stream = "".join(ln.ljust(80) for ln in lines)
    if len(stream) < 464:
        raise ValueError(f"por: file too short ({len(stream)} chars)")
    if stream[456:464] != "SPSSPORT":
        raise NotImplementedError(
            "por: signature at offset 456 is not ASCII 'SPSSPORT' — "
            "translated (non-ASCII) portable files are not supported by "
            "this reader; convert with PSPP, or ship pyreadstat"
        )
    st = _Stream(stream)
    st.pos = 464
    version = st.take()
    if version != "A":
        raise ValueError(f"por: unsupported version {version!r}")
    _file_date = _string(st)
    _file_time = _string(st)

    variables: list[dict] = []
    value_label_sets: list[tuple[list[str], list[tuple]]] = []
    n_vars_declared: int | None = None
    cur: dict | None = None

    while True:
        st.skip_spaces()
        tag = st.take()
        if tag in "123":
            _string(st)  # product / author / subproduct
        elif tag == "4":
            n_vars_declared = _integer(st)
        elif tag == "5":
            _integer(st)  # precision
        elif tag == "6":
            _string(st)  # case-weight variable name
        elif tag == "7":
            width = _integer(st)
            name = _string(st).rstrip()
            pf = (_integer(st), _integer(st), _integer(st))
            _wf = (_integer(st), _integer(st), _integer(st))
            if width < 0 or width > 255:
                raise ValueError(f"por: variable width {width} for {name!r}")
            cur = {"name": name, "width": width, "print": pf,
                   "missing": [], "ranges": []}
            variables.append(cur)
        elif tag in "89ABC":
            if cur is None:
                raise ValueError(
                    f"por: tag {tag!r} before any variable record"
                )
            if tag == "8":  # discrete missing value
                cur["missing"].append(
                    _string(st) if cur["width"] else _number(st)
                )
            elif tag == "9":  # LO THRU x
                cur["ranges"].append((-math.inf, _number(st)))
            elif tag == "A":  # x THRU HI
                cur["ranges"].append((_number(st), math.inf))
            elif tag == "B":  # x THRU y
                lo = _number(st)
                cur["ranges"].append((lo, _number(st)))
            else:  # 'C' variable label
                cur["label"] = _string(st)
        elif tag == "D":
            nv = _integer(st)
            names = [_string(st).rstrip() for _ in range(nv)]
            widths = {v["name"]: v["width"] for v in variables}
            unknown = [n for n in names if n not in widths]
            if unknown:
                raise ValueError(
                    f"por: value labels for unknown variables {unknown}"
                )
            is_str = widths[names[0]] > 0
            if any((widths[n] > 0) != is_str for n in names):
                raise ValueError(
                    "por: one value-label record mixes numeric and "
                    "string variables"
                )
            nl = _integer(st)
            pairs = []
            for _ in range(nl):
                val = _string(st) if is_str else _number(st)
                pairs.append((val, _string(st)))
            value_label_sets.append((names, pairs))
        elif tag == "E":
            for _ in range(_integer(st)):
                _string(st)
        elif tag == "F":
            break
        elif tag == "Z":
            # dictionary-only file: Z padding instead of data
            st.pos = len(st.s)
            break
        else:
            raise ValueError(
                f"por: unknown tag {tag!r} at character {st.pos - 1}"
            )

    if n_vars_declared is not None and n_vars_declared != len(variables):
        raise ValueError(
            f"por: variable count record says {n_vars_declared}, "
            f"dictionary holds {len(variables)}"
        )
    if not variables:
        raise ValueError("por: no variable records before data")

    cols: dict[str, list] = {v["name"]: [] for v in variables}
    while st.pos < len(st.s):
        st.skip_spaces()
        if st.pos >= len(st.s) or st.peek() == "Z":
            break  # Z padding fills the final line
        for v in variables:
            if v["width"] == 0:
                cols[v["name"]].append(_number(st))
            else:
                cols[v["name"]].append(_string(st).rstrip(" "))

    labels: dict[str, dict] = {}
    for names, pairs in value_label_sets:
        for n in names:
            labels.setdefault(n, {}).update(dict(pairs))

    out = {}
    for v in variables:
        vals = cols[v["name"]]
        if v["width"] == 0:
            arr = np.array(
                [np.nan if x is None else x for x in vals], dtype=float
            )
            nan_mask = np.zeros(len(arr), dtype=bool)
            for m in v["missing"]:
                if m is not None:
                    nan_mask |= arr == m
            for lo, hi in v["ranges"]:
                nan_mask |= (arr >= lo) & (arr <= hi)
            arr[nan_mask] = np.nan
            out[v["name"]] = arr
        else:
            out[v["name"]] = vals
    pdf = pd.DataFrame(out, columns=[v["name"] for v in variables])
    meta = {"labels": labels, "encoding": "ascii",
            "n_cases": len(pdf), "compression": 0}
    return pdf, meta
