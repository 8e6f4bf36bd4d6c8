"""Pure-Python SPSS portable-file decoder (sources/por.py).

Fixtures from the independent spec-written encoder in
``tests/por_ref.py`` plus HAND-WRITTEN golden base-30 number fields —
the sav/roaring codec-test strategy."""

import math

import pytest

from tidierdb_jl_spark.sources.por import _Stream, _number, read_por_bytes

from por_ref import PVar, n30, write_por, write_por_with_labels


def test_golden_base30_numbers():
    """Hand-computed trigesimal fields straight from the spec: digits
    0-9A-T, '.' fraction, '+/-' exponent, '/' terminator, '*.'
    system-missing."""
    cases = {
        "0/": 0.0,
        "1/": 1.0,
        "T/": 29.0,
        "10/": 30.0,
        "3T/": 119.0,          # 3*30 + 29
        "-5/": -5.0,
        "0.F/": 0.5,           # 15/30
        "2.7F/": 2.25,         # 7/30 + 15/900
        "1+2/": 900.0,         # 1 * 30^2
        "F-1/": 0.5,           # 15 * 30^-1
        "-0.F/": -0.5,
    }
    for field, want in cases.items():
        got = _number(_Stream(field))
        assert got == want, field
    assert _number(_Stream("*.")) is None
    # encoder emits the same fields
    assert n30(119) == "3T/"
    assert n30(0.5) == "0.F/"
    assert n30(None) == "*."
    with pytest.raises(ValueError, match="terminated"):
        _number(_Stream("12 "))


@pytest.mark.parametrize("line_sep", ["\r\n", "\n"])
def test_roundtrip_with_missing_and_labels(line_sep):
    vars_ = [
        PVar("ID"),
        PVar("SCORE", missing=[99.0], ranges=[(-math.inf, -1.0)]),
        PVar("NAME", width=12, label="respondent"),
    ]
    rows = [
        (1.0, 7.5, "alpha"),
        (2.0, None, "beta"),
        (3.0, 99.0, ""),
        (4.0, -5.0, "gamma"),
    ]
    pdf, meta = read_por_bytes(write_por(vars_, rows, line_sep=line_sep))
    assert list(pdf.columns) == ["ID", "SCORE", "NAME"]
    assert pdf["ID"].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert pdf["SCORE"][0] == 7.5
    # sysmis, discrete user-missing, and LO-THRU range all -> NaN
    assert math.isnan(pdf["SCORE"][1])
    assert math.isnan(pdf["SCORE"][2])
    assert math.isnan(pdf["SCORE"][3])
    assert pdf["NAME"].tolist() == ["alpha", "beta", "", "gamma"]
    assert meta["n_cases"] == 4


def test_value_labels_metadata():
    vars_ = [PVar("Q1"), PVar("GRP", width=4)]
    rows = [(1.0, "ctl")]
    data = write_por_with_labels(
        vars_, rows, {"Q1": {1.0: "low", 2.0: "high"}})
    pdf, meta = read_por_bytes(data)
    assert meta["labels"]["Q1"] == {1.0: "low", 2.0: "high"}
    assert pdf["GRP"].tolist() == ["ctl"]


def test_values_spanning_line_boundaries():
    """80-char lines split fields mid-token; the joined stream must
    parse identically."""
    vars_ = [PVar("TXT", width=60), PVar("N")]
    rows = [(f"row {i} " + "x" * 40, float(i)) for i in range(30)]
    pdf, _ = read_por_bytes(write_por(vars_, rows))
    assert pdf["N"].tolist() == [float(i) for i in range(30)]
    assert pdf["TXT"][7] == "row 7 " + "x" * 40


def test_gates_and_refusals():
    vars_ = [PVar("A")]
    good = write_por(vars_, [(1.0,)])
    # non-ASCII signature -> loud NotImplementedError, not a guess
    bad = good.replace(b"SPSSPORT", b"\xe2\xe2\xd7\xe2\xd7\xd6\xd9\xe3")
    with pytest.raises(NotImplementedError, match="SPSSPORT"):
        read_por_bytes(bad)
    with pytest.raises(ValueError, match="too short"):
        read_por_bytes(good[:100])
    # variable-count mismatch
    two = write_por([PVar("A"), PVar("B")], [(1.0, 2.0)])
    trimmed = two.replace(b"4" + n30(2).encode(), b"4" + n30(3).encode())
    with pytest.raises(ValueError, match="variable count"):
        read_por_bytes(trimmed)


def test_read_stat_por_distributed(spark, tmp_path):
    """The library surface: read_stat over .por files without
    pyreadstat — the last read_stat extension now decodes in-image."""
    from tidierdb_jl_spark.sources.statfiles import read_stat

    vars_ = [PVar("DOC"), PVar("LANG", width=8)]
    for i in range(2):
        rows = [(float(10 * i + j), f"l{i}") for j in range(3)]
        with open(tmp_path / f"p{i}.por", "wb") as fh:
            fh.write(write_por(vars_, rows))
    tf = read_stat(spark, str(tmp_path / "*.por"), file_col="src")
    got = tf.collect().sort_values("DOC")
    assert got["DOC"].tolist() == [0.0, 1.0, 2.0, 10.0, 11.0, 12.0]
    assert set(got["src"]) == {"p0.por", "p1.por"}
