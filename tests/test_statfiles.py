"""Statistical-package readers + Google Sheets ingest (SURVEY §2.1 —
the reference's read_stat / read_gsheet dispatch, TidierDB.jl:170-178)."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from xpt_ref import ieee_to_ibm, write_xport

from tidierdb_jl_spark import db_table, read_gsheet, read_stat
from tidierdb_jl_spark.sources.statfiles import gsheet_export_url


def _write_dta_shards(d, n_files=3, rows_per=7):
    frames = []
    for i in range(n_files):
        pdf = pd.DataFrame(
            {
                "id": np.arange(i * rows_per, (i + 1) * rows_per, dtype=np.int32),
                "score": np.arange(i * rows_per, (i + 1) * rows_per) * 0.5 - 3,
                "tag": [f"t{j % 4}" for j in range(i * rows_per, (i + 1) * rows_per)],
            }
        )
        pdf.to_stata(os.path.join(d, f"part{i}.dta"), write_index=False)
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)


def test_read_stat_dta_multi_file_distributed(spark):
    d = tempfile.mkdtemp(prefix="stat_dta_")
    want = _write_dta_shards(d)
    got = (
        read_stat(spark, os.path.join(d, "*.dta"))
        .arrange("id")
        .collect()
    )
    assert list(got.columns) == ["id", "score", "tag"]
    assert got["id"].tolist() == want["id"].tolist()
    assert np.allclose(got["score"], want["score"])
    assert got["tag"].tolist() == want["tag"].tolist()
    # one task per file — the scan parallelism IS the file count
    assert read_stat(spark, os.path.join(d, "*.dta")).df.rdd.getNumPartitions() >= 1


def test_db_table_dispatches_stat_extensions_and_lineage(spark):
    d = tempfile.mkdtemp(prefix="stat_disp_")
    _write_dta_shards(d, n_files=2)
    tf = db_table(spark, os.path.join(d, "*.dta"), alias="dta_view")
    assert tf.collect().shape[0] == 14
    assert spark.sql("SELECT count(*) FROM dta_view").first()[0] == 14
    # vector-of-paths form routes too
    paths = [os.path.join(d, f"part{i}.dta") for i in range(2)]
    assert db_table(spark, paths).collect().shape[0] == 14
    # per-file lineage column (free for non-splittable formats)
    got = read_stat(spark, paths, file_col="src").collect()
    assert set(got["src"]) == {"part0.dta", "part1.dta"}


def test_read_stat_xport_vs_independent_encoder(spark):
    """pandas' xport READER vs our spec-written ENCODER (tests/xpt_ref.py):
    value-exact roundtrip including negative / fractional / large doubles
    and missing values — the two implementations share no code."""
    d = tempfile.mkdtemp(prefix="stat_xpt_")
    want = pd.DataFrame(
        {
            "ID": [1.0, 2.0, 3.0, 4.0],
            "VAL": [3.5, -0.25, 123456789.0, float("nan")],
            "TAG": ["en", "fr", "de", "zz"],
        }
    )
    write_xport(want.iloc[:2], os.path.join(d, "a.xpt"))
    write_xport(want.iloc[2:], os.path.join(d, "b.xpt"))
    got = read_stat(spark, os.path.join(d, "*.xpt")).arrange("ID").collect()
    assert got["ID"].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert got["VAL"].tolist()[:3] == [3.5, -0.25, 123456789.0]
    assert np.isnan(got["VAL"].iloc[3])
    assert got["TAG"].tolist() == ["en", "fr", "de", "zz"]  # bytes -> str


def test_ibm_float_roundtrip_exact():
    """Every IEEE double with <=53 significant bits relative to a base-16
    boundary survives IEEE->IBM->IEEE exactly; check via pandas' own
    IBM->IEEE converter on a hostile value set."""
    from pandas.io.sas.sas_xport import _parse_float_vec

    vals = [1.0, -1.0, 0.5, -0.25, 3.1415920257568359375,
            2.0**50, -(2.0**50) - 1, 1e-10, 7.0 / 8.0, 1048576.125]
    raw = b"".join(ieee_to_ibm(v) for v in vals)
    arr = np.frombuffer(raw, dtype="S8")
    back = _parse_float_vec(arr)
    assert np.array_equal(back, np.array(vals))
    # canonical IBM zero (all-zero bytes, how SAS writes 0.0) is a known
    # pandas quirk (decodes to 2**-260); our reader snaps it — checked via
    # the full read path in test_read_stat_xport_zero_roundtrip
    assert ieee_to_ibm(0.0) == bytes(8)


def test_read_stat_xport_zero_roundtrip(spark):
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="stat_zero_")
    want = pd.DataFrame({"A": [0.0, -0.0, 2.0, 0.0]})
    write_xport(want, os.path.join(d, "z.xpt"))
    got = read_stat(spark, os.path.join(d, "z.xpt")).collect()
    assert got["A"].tolist() == [0.0, 0.0, 2.0, 0.0]


def test_read_stat_xport_zero_vs_minimal_ibm_float(spark):
    """The all-zero IBM field (SAS 0.0) and the minimal normalized IBM
    hex float 16**-65 both decode to 2**-260 under pandas; the byte-level
    disambiguation must snap only the former."""
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="stat_tiny_")
    tiny = 16.0 ** -65  # == 2**-260, genuinely representable
    want = pd.DataFrame(
        {"A": [0.0, tiny, -tiny, 3.5], "B": [tiny, 0.0, 7.0, -0.0]}
    )
    write_xport(want, os.path.join(d, "t.xpt"))
    got = read_stat(spark, os.path.join(d, "t.xpt")).collect().sort_values("A")
    assert sorted(got["A"].tolist()) == sorted([0.0, tiny, -tiny, 3.5])
    assert sorted(got["B"].tolist()) == sorted([tiny, 0.0, 7.0, 0.0])


def test_xpt_raw_field_parser_locates_numeric_bytes():
    """Layout parser sanity: the located raw field for a known value must
    equal the reference encoder's bytes for it (mixed char/num columns so
    npos bookkeeping is exercised)."""
    import tempfile as _tf

    from tidierdb_jl_spark.sources.statfiles import _xpt_raw_numeric_fields

    d = _tf.mkdtemp(prefix="stat_raw_")
    df = pd.DataFrame({"S": ["abc", "de"], "A": [0.0, 16.0 ** -65]})
    p = os.path.join(d, "r.xpt")
    write_xport(df, p)
    data = open(p, "rb").read()
    fields = _xpt_raw_numeric_fields(data, ["A"], 2)
    assert fields is not None
    assert fields["A"][0] == bytes(8)
    assert fields["A"][1] == ieee_to_ibm(16.0 ** -65)
    assert fields["A"][1][1:] != bytes(7)  # mantissa distinguishes it


def test_read_stat_rejects_mixed_families_and_missing(spark):
    with pytest.raises(ValueError, match="one stat-file family"):
        read_stat(spark, ["a.dta", "b.xpt"])
    with pytest.raises(ValueError, match="one stat-file family"):
        read_stat(spark, "plain.csv")
    with pytest.raises(Exception):
        read_stat(spark, "/tmp/definitely_missing_dir_xyz/*.dta")


def test_read_stat_ragged_schema_fails_loudly(spark):
    d = tempfile.mkdtemp(prefix="stat_rag_")
    pd.DataFrame({"a": [1.0], "b": ["x"]}).to_stata(
        os.path.join(d, "p0.dta"), write_index=False
    )
    pd.DataFrame({"a": [2.0]}).to_stata(os.path.join(d, "p1.dta"), write_index=False)
    with pytest.raises(Exception, match=r"missing \['b'\]"):
        read_stat(spark, os.path.join(d, "*.dta")).collect()


def test_spss_decodes_in_repo_malformed_refuses(spark):
    """r11: .sav/.zsav decode via sources/sav.py and .por via
    sources/por.py (no pyreadstat anywhere) — malformed files refuse
    loudly instead of gating."""
    d = tempfile.mkdtemp(prefix="stat_sav_")
    p = os.path.join(d, "x.sav")
    with open(p, "wb") as fh:
        fh.write(b"$FL2" + bytes(60))  # truncated header
    with pytest.raises(Exception, match="truncated|magic"):
        read_stat(spark, p).collect()
    q = os.path.join(d, "x.por")
    with open(q, "wb") as fh:
        fh.write(bytes(200))
    with pytest.raises(Exception, match="too short|SPSSPORT"):
        read_stat(spark, q).collect()


def test_gsheet_url_resolution_and_offline_read(spark):
    url = "https://docs.google.com/spreadsheets/d/1AbC_xy-9/edit#gid=1234"
    assert gsheet_export_url(url) == (
        "https://docs.google.com/spreadsheets/d/1AbC_xy-9/export?format=csv&gid=1234"
    )
    assert gsheet_export_url(
        "https://docs.google.com/spreadsheets/d/ZZ9/view"
    ).endswith("/d/ZZ9/export?format=csv&gid=0")
    with pytest.raises(ValueError, match="Google Sheets URL"):
        gsheet_export_url("https://example.com/sheet")

    fetched = {}

    def fetch(u):
        fetched["url"] = u
        return b"city,pop\nOslo,717\nLima,11067\n"

    tf = read_gsheet(spark, url, fetch=fetch, alias="gs_view")
    got = tf.arrange("city").collect()
    assert fetched["url"].endswith("gid=1234")
    assert got["city"].tolist() == ["Lima", "Oslo"]
    assert got["pop"].tolist() == [11067, 717]
    assert spark.sql("SELECT count(*) FROM gs_view").first()[0] == 2
    # db_table URL dispatch (TidierDB.jl:171)
    assert db_table(spark, url, fetch=fetch).collect().shape == (2, 2)

    import urllib.request

    real = urllib.request.urlopen

    def deny(*a, **k):
        raise OSError("network disabled")

    urllib.request.urlopen = deny
    try:
        with pytest.raises(RuntimeError, match="network"):
            read_gsheet(spark, url)
    finally:
        urllib.request.urlopen = real


def test_read_stat_gzip_content_not_supported_hint():
    """.zsav is listed but routes to the gated SPSS family — make sure the
    extension table covers every reference extension (TidierDB.jl:175)."""
    from tidierdb_jl_spark.sources.statfiles import STAT_EXTENSIONS

    assert set(STAT_EXTENSIONS) == {".dta", ".xpt", ".sas7bdat", ".sav", ".zsav", ".por"}


def test_read_stat_empty_peek_file_clear_error(spark):
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="stat_empty_")
    pd.DataFrame({"a": pd.Series([], dtype=float)}).to_stata(
        os.path.join(d, "a_empty.dta"), write_index=False
    )
    pd.DataFrame({"a": [1.0]}).to_stata(os.path.join(d, "b.dta"), write_index=False)
    # empty file sorts first -> schema peek must fail loudly, not crash
    with pytest.raises(ValueError, match="0 rows.*schema"):
        read_stat(spark, os.path.join(d, "*.dta"))
    # explicit schema unblocks the same read
    from pyspark.sql import types as T

    sch = T.StructType([T.StructField("a", T.DoubleType())])
    got = read_stat(spark, os.path.join(d, "*.dta"), schema=sch).collect()
    assert got["a"].tolist() == [1.0]


def test_xport_roundtrip_property(spark):
    """Property sweep: random IEEE doubles (mixed magnitudes, signs,
    specials) and latin-1 strings survive our spec-written XPT encoder ->
    pandas reader -> read_stat exactly, across multiple files."""
    import tempfile as _tf

    rng = np.random.default_rng(7)
    n = 200
    # doubles built from <=50-bit integers scaled by powers of two are
    # exactly representable in both IEEE and IBM hex float
    mant = rng.integers(-(2**50), 2**50, size=n).astype(float)
    exp2 = rng.integers(-30, 30, size=n)
    vals = mant * (2.0 ** exp2)
    vals[rng.random(n) < 0.05] = 0.0
    vals[rng.random(n) < 0.05] = float("nan")
    tags = ["".join(chr(rng.integers(32, 126)) for _ in range(rng.integers(1, 9))).rstrip()
            or "x" for _ in range(n)]
    want = pd.DataFrame({"K": np.arange(n, dtype=float), "V": vals, "TAG": tags})

    d = _tf.mkdtemp(prefix="stat_prop_")
    for i in range(4):
        write_xport(want.iloc[i * 50:(i + 1) * 50], os.path.join(d, f"p{i}.xpt"))
    got = read_stat(spark, os.path.join(d, "*.xpt")).arrange("K").collect()
    gv, wv = got["V"].to_numpy(), want["V"].to_numpy()
    both_nan = np.isnan(gv) & np.isnan(wv)
    assert np.array_equal(gv[~both_nan], wv[~both_nan])
    assert (~np.isnan(gv) | np.isnan(wv)).all()
    assert got["TAG"].tolist() == want["TAG"].tolist()


def test_review_guards_dispatch_and_schema(spark):
    """Round-7 review fixes: (1) fmt= override beats the stat-extension
    dispatch; (2) a local path merely CONTAINING 'docs.google' is not
    hijacked to the Sheets reader; (3) extra columns in a shard fail as
    loudly as missing ones; (4) file_col colliding with a data column is
    rejected; (5) the oracle XPT encoder refuses out-of-range magnitudes
    instead of silently corrupting the sign bit."""
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="stat_guard_")
    # (1) a CSV misnamed .dta still reads as CSV under fmt="csv"
    p = os.path.join(d, "notreally.dta")
    with open(p, "w") as fh:
        fh.write("a,b\n1,x\n2,y\n")
    got = db_table(spark, p, fmt="csv")
    assert got.collect().shape == (2, 2)

    # (2) local file named like a Sheets host is NOT routed to gsheet
    p2 = os.path.join(d, "docs.google.com_export.csv")
    with open(p2, "w") as fh:
        fh.write("k,v\n1,2\n")
    assert db_table(spark, p2).collect().shape == (1, 2)

    # (3) extra columns fail loudly
    pd.DataFrame({"a": [1.0]}).to_stata(os.path.join(d, "s0.dta"), write_index=False)
    pd.DataFrame({"a": [2.0], "b": ["x"]}).to_stata(
        os.path.join(d, "s1.dta"), write_index=False
    )
    with pytest.raises(Exception, match="extra"):
        read_stat(spark, [os.path.join(d, "s0.dta"), os.path.join(d, "s1.dta")]).collect()

    # (4) lineage-column collision
    with pytest.raises(ValueError, match="collides"):
        read_stat(spark, os.path.join(d, "s0.dta"), file_col="a")

    # (5) encoder range clamp
    from xpt_ref import ieee_to_ibm

    with pytest.raises(ValueError, match="range"):
        ieee_to_ibm(1e77)
    with pytest.raises(ValueError, match="range"):
        ieee_to_ibm(1e-100)
