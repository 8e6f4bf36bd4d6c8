"""Pure-Python SPSS .sav/.zsav decoder (sources/sav.py).

pyreadstat is not in this image, so the fixtures come from the
independent spec-written encoder in ``tests/sav_ref.py`` (PSPP's
System File Format appendix), plus HAND-WRITTEN golden bytes for the
compression-1 opcode semantics so an encoder/decoder shared divergence
cannot pass (the roaring-codec lesson from r10/r11).
"""

import math
import struct

import numpy as np
import pandas as pd
import pytest

from tidierdb_jl_spark.sources.sav import SYSMIS, read_sav_bytes

from sav_ref import Var, write_sav


ROWS = [
    (1.0, 7.5, "alpha", "short"),
    (2.0, None, "beta", ""),
    (3.0, -1.25, "a rather longer str", "x"),
]
VARS = [
    Var("ID"),
    Var("SCORE", label="test score"),
    Var("NAME", width=19),
    Var("TAG", width=5),
]


@pytest.mark.parametrize("compression", [0, 1, 2])
@pytest.mark.parametrize("bo", ["<", ">"])
def test_roundtrip_all_compressions_both_orders(compression, bo):
    data = write_sav(VARS, ROWS, compression=compression, bo=bo)
    pdf, meta = read_sav_bytes(data)
    assert list(pdf.columns) == ["ID", "SCORE", "NAME", "TAG"]
    assert meta["compression"] == compression
    assert pdf["ID"].tolist() == [1.0, 2.0, 3.0]
    assert pdf["SCORE"][0] == 7.5 and pdf["SCORE"][2] == -1.25
    assert math.isnan(pdf["SCORE"][1])  # sysmis -> NaN
    assert pdf["NAME"].tolist() == ["alpha", "beta",
                                    "a rather longer str"]
    assert pdf["TAG"].tolist() == ["short", "", "x"]


def test_golden_bytecode_opcodes():
    """Hand-written compression-1 stream, spec-derived: opcodes
    1..251 = value - bias, 253 literal, 254 spaces, 255 sysmis,
    0 padding, 252 EOF.  One numeric var (F8.2), one 8-wide string."""
    header = write_sav([Var("N"), Var("S", width=8)], [], compression=1,
                       ncases=3)
    # strip the (empty) data section the encoder appended: it is just
    # the EOF opcode block
    dict_end = header.rindex(struct.pack("<ii", 999, 0)) + 8
    body = header[:dict_end]
    golden = bytes([
        101, 254, 253, 253, 103, 254, 252, 0,     # 6 data opcodes + EOF
    ])
    golden += struct.pack("<d", 3.25)             # literal for opcode 3
    golden += b"spss ok "                         # literal for opcode 4
    pdf, _ = read_sav_bytes(body + golden)
    # cases: (101-100=1.0, spaces->""), (3.25, "spss ok"), (3.0, "")
    assert pdf["N"].tolist() == [1.0, 3.25, 3.0]
    assert pdf["S"].tolist() == ["", "spss ok", ""]


def test_user_missing_discrete_and_range():
    vars_ = [
        Var("A", missing=[99.0]),
        Var("B", missing=("range", 90.0, 95.0)),
        Var("C", missing=("range+", 0.0, 1.0, 9.0)),
    ]
    rows = [(99.0, 92.0, 0.5), (1.0, 89.0, 9.0), (2.0, 96.0, 2.0)]
    pdf, _ = read_sav_bytes(write_sav(vars_, rows))
    assert math.isnan(pdf["A"][0]) and pdf["A"][1] == 1.0
    assert math.isnan(pdf["B"][0]) and pdf["B"][1] == 89.0 \
        and pdf["B"][2] == 96.0
    assert math.isnan(pdf["C"][0]) and math.isnan(pdf["C"][1]) \
        and pdf["C"][2] == 2.0


def test_long_names_and_value_labels():
    vars_ = [Var("Q1", long_name="satisfaction_level"),
             Var("GRP", width=4, long_name="group_code")]
    rows = [(1.0, "ctl"), (2.0, "trt")]
    data = write_sav(vars_, rows,
                     value_labels={"Q1": {1.0: "low", 2.0: "high"},
                                   "GRP": {"ctl": "control"}})
    pdf, meta = read_sav_bytes(data)
    assert list(pdf.columns) == ["satisfaction_level", "group_code"]
    assert meta["labels"]["satisfaction_level"] == {1.0: "low",
                                                    2.0: "high"}
    assert meta["labels"]["group_code"] == {"ctl": "control"}
    assert pdf["group_code"].tolist() == ["ctl", "trt"]


def test_encoding_record_applies():
    vars_ = [Var("CITY", width=16)]
    rows = [("Zürich",), ("Málaga",)]
    pdf, meta = read_sav_bytes(
        write_sav(vars_, rows, encoding="utf-8"))
    assert meta["encoding"] == "UTF-8"
    assert pdf["CITY"].tolist() == ["Zürich", "Málaga"]
    # same text through latin-1
    pdf2, meta2 = read_sav_bytes(write_sav(vars_, rows, encoding="latin-1"))
    assert pdf2["CITY"].tolist() == ["Zürich", "Málaga"]


def test_zsav_multiblock_and_integrity():
    rows = [(float(i), f"row{i}") for i in range(500)]
    vars_ = [Var("I"), Var("S", width=8)]
    data = write_sav(vars_, rows, compression=2, zsav_block=1024)
    pdf, meta = read_sav_bytes(data)
    assert len(pdf) == 500 and pdf["I"][499] == 499.0
    assert pdf["S"][499] == "row499"
    # flip one byte inside a zlib block -> loud failure, never wrong rows
    bad = bytearray(data)
    zh = data.index(b"$FL3")  # locate data area via the trailer offsets
    assert zh == 0
    with pytest.raises(Exception):
        corrupt = bytearray(data)
        corrupt[-30] ^= 0xFF  # inside the trailer block table
        read_sav_bytes(bytes(corrupt))


def test_gates_and_refusals():
    with pytest.raises(ValueError, match="magic"):
        read_sav_bytes(b"NOPE" + bytes(200))
    data = write_sav(VARS, ROWS)
    with pytest.raises(ValueError, match="truncated"):
        read_sav_bytes(data[:200])
    # declared ncases != actual
    wrong = write_sav(VARS, ROWS, ncases=7)
    with pytest.raises(ValueError, match="7 cases"):
        read_sav_bytes(wrong)
    # malformed subtype-14 entry (non-numeric width) refuses loudly
    base = write_sav([Var("A")], [(1.0,)])
    term = struct.pack("<ii", 999, 0)
    pos = base.rindex(term)
    vls = struct.pack("<iiii", 7, 14, 1, 4) + b"A=x\t"
    with pytest.raises(ValueError, match="very-long-string"):
        read_sav_bytes(base[:pos] + vls + base[pos:])


def test_read_stat_sav_distributed(spark, tmp_path):
    """The library surface: read_stat over three .sav files (one per
    task), schema peek, lineage column, and the .zsav extension —
    pyreadstat-free."""
    from tidierdb_jl_spark.sources.statfiles import read_stat

    vars_ = [Var("DOC", print_fmt=(5 << 16) | (8 << 8)),
             Var("LANG", width=8)]
    for i in range(3):
        rows = [(float(10 * i + j), f"l{i}") for j in range(4)]
        with open(tmp_path / f"part{i}.sav", "wb") as fh:
            fh.write(write_sav(vars_, rows, compression=1))
    with open(tmp_path / "extra.zsav", "wb") as fh:
        fh.write(write_sav(vars_, [(99.0, "zz")], compression=2))

    tf = read_stat(spark, str(tmp_path / "*.sav"), file_col="src")
    got = tf.collect().sort_values("DOC")
    assert len(got) == 12
    assert got["DOC"].tolist() == [float(v) for v in
                                   list(range(4)) + list(range(10, 14))
                                   + list(range(20, 24))]
    assert set(got["src"]) == {"part0.sav", "part1.sav", "part2.sav"}

    zf = read_stat(spark, str(tmp_path / "extra.zsav"))
    zp = zf.collect()
    assert zp["DOC"].tolist() == [99.0] and zp["LANG"].tolist() == ["zz"]


# ---- very long strings (subtype 14, r12) ---------------------------------

def _segments(s: str, true_w: int, encoding="latin-1"):
    """Split a value into spec segment values: 252 data bytes per
    non-final (255-wide) segment, remainder in the last."""
    b = s.encode(encoding).ljust(true_w, b" ")
    n = (true_w + 251) // 252
    segs = []
    for i in range(n):
        chunk = b[252 * i: min(252 * (i + 1), true_w)]
        segs.append(chunk.decode("latin-1"))
    return segs


def _vls_vars(true_w: int):
    n = (true_w + 251) // 252
    out = [Var("VLS1", width=255)]
    for i in range(1, n):
        w = 255 if i < n - 1 else true_w - 252 * (n - 1)
        out.append(Var(f"VLS1_S{i}", width=w))
    return out


@pytest.mark.parametrize("compression", [0, 1, 2])
def test_very_long_string_stitches(compression):
    """A 600-byte string spans 3 segments (255/255/96 declared, 252+252+96
    data); the decoder must stitch BYTES before decoding and rstrip only
    the final value — interior spaces at segment boundaries survive."""
    true_w = 600
    # values engineered so segment boundaries land mid-word and on
    # spaces: a naive per-segment rstrip corrupts both
    v1 = ("A" * 250 + "  " + "B" * 250 + "  " + "C" * 90)
    v2 = "short value"
    v3 = "x" * 600
    vars_ = [Var("ID")] + _vls_vars(true_w)
    rows = [
        (float(i + 1), *_segments(v, true_w))
        for i, v in enumerate((v1, v2, v3))
    ]
    data = write_sav(vars_, rows, compression=compression,
                     very_long={"VLS1": true_w})
    pdf, meta = read_sav_bytes(data)
    assert list(pdf.columns) == ["ID", "VLS1"]
    assert pdf["VLS1"].tolist() == [v1, v2, v3]


def test_very_long_string_long_name_and_following_vars():
    """The stitched column takes the subtype-13 long name, and ordinary
    variables AFTER the segments keep decoding (element bookkeeping)."""
    true_w = 300  # 2 segments: 255 + 48
    vars_ = ([Var("ID")] + _vls_vars(true_w)
             + [Var("TAIL", width=4)])
    vars_[1].long_name = "very_long_text"
    val = "y" * 260 + " z" + "q" * 30
    rows = [(9.0, *_segments(val, true_w), "tttt")]
    data = write_sav(vars_, rows, very_long={"VLS1": true_w})
    pdf, _ = read_sav_bytes(data)
    assert list(pdf.columns) == ["ID", "very_long_text", "TAIL"]
    assert pdf["very_long_text"].tolist() == [val]
    assert pdf["TAIL"].tolist() == ["tttt"]


def test_very_long_string_multibyte_boundary():
    """A multi-byte UTF-8 character split across the 252-byte segment
    boundary reassembles — the proof stitching happens before decode."""
    true_w = 300
    # 251 ASCII bytes then a 2-byte é: bytes 251..252 straddle segments
    val = "a" * 251 + "é" + "b" * 20
    assert len(val.encode("utf-8")) == 273
    vars_ = [Var("ID")] + _vls_vars(true_w)
    rows = [(1.0, *[seg for seg in _segments_utf8(val, true_w)])]
    data = write_sav(vars_, rows, very_long={"VLS1": true_w},
                     encoding="utf-8")
    pdf, meta = read_sav_bytes(data)
    assert meta["encoding"].lower() == "utf-8"
    assert pdf["VLS1"].tolist() == [val]


def _segments_utf8(s: str, true_w: int):
    """Byte-true segment split for utf-8 values: returns raw bytes so
    the encoder writes them verbatim (a str carrier would re-encode)."""
    b = s.encode("utf-8").ljust(true_w, b" ")
    n = (true_w + 251) // 252
    return [b[252 * i: min(252 * (i + 1), true_w)] for i in range(n)]


def test_very_long_string_width_mismatch_refuses():
    """Declared width needing 3 segments but only 2 present must refuse
    — a partial stitch is silent corruption."""
    vars_ = [Var("ID")] + _vls_vars(300)
    rows = [(1.0, *_segments("v" * 300, 300))]
    data = write_sav(vars_, rows, very_long={"VLS1": 700})
    with pytest.raises(ValueError, match="segments"):
        read_sav_bytes(data)
