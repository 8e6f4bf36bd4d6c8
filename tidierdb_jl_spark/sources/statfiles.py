"""Statistical-package file readers + Google Sheets ingest.

Reference surface: ``db_table`` dispatches ``.sas7bdat .xpt .sav .zsav
.por .dta`` paths to a stat-file scan and ``docs.google.com`` URLs to a
Sheets scan (``/root/reference/src/TidierDB.jl:170-178``, backed there by
the ``read_stat`` / ``gsheets`` DuckDB community extensions).

Spark mapping — these formats are NON-SPLITTABLE single-writer containers
(row data is position-encoded against an in-file catalog), so the unit of
parallelism is the FILE, exactly like ``.warc.gz``:

* ``read_stat`` lists the input as a ``binaryFile`` scan (one file per
  task, bytes never touch the driver) and parses each file inside one
  Arrow ``mapInPandas`` stage — zero shuffles.  A 100 TB survey corpus is
  tens of thousands of export files; this plan reads them at full cluster
  parallelism.  The output schema comes from parsing ONE file (driver-side
  peek, same contract as ``spark.read.csv(inferSchema=True)``) or from an
  explicit ``schema=``; every task coerces to it, so ragged exports fail
  loudly instead of silently unioning mismatched frames.
* Stata (``.dta``) and SAS (``.xpt`` transport, ``.sas7bdat``) parse with
  pandas' built-in readers (pure-Python, already in the image).  SPSS
  files decode with the in-repo pure-Python readers (r11 — the
  PNG/Avro/roaring codec strategy applied to the PSPP-documented
  formats): system files (``.sav``/``.zsav``) via :mod:`.sav`, the
  legacy portable format (``.por``) via :mod:`.por`.  The whole
  reference ``read_stat`` extension list now parses in-image, no
  pyreadstat required.
* ``read_gsheet`` resolves a Sheets URL to its CSV export endpoint.  A
  sheet is hard-capped by Google at 10M cells, i.e. always driver-sized:
  the right plan is ONE driver fetch + Arrow upload, never a distributed
  read.  The fetch is injectable (``fetch=``) so the URL/parse logic is
  testable offline; the default ``urllib`` path raises a gated error in
  a no-network sandbox.
"""

from __future__ import annotations

import io
import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..core import TidyFrame

__all__ = ["read_stat", "read_gsheet", "STAT_EXTENSIONS"]

# extension -> (family, pandas format hint)
STAT_EXTENSIONS = {
    ".dta": ("stata", None),
    ".xpt": ("sas", "xport"),
    ".sas7bdat": ("sas", "sas7bdat"),
    ".sav": ("spss", "sav"),
    ".zsav": ("spss", "zsav"),
    ".por": ("spss", "por"),
}


def stat_format_for(path: str) -> tuple[str, str | None] | None:
    low = path.lower()
    for ext, fam in STAT_EXTENSIONS.items():
        if low.endswith(ext):
            return fam
    return None


def _xpt_raw_numeric_fields(data: bytes, cols, nrows: int):
    """Locate the raw 8-byte fields of the named numeric variables in an
    XPORT v5 byte stream (TS-140 layout: 80-byte records, NAMESTR catalog
    with the variable count in the header's digit block, 140-byte NAMESTR
    entries carrying ntype/nlng/nname/npos, data rows after the OBS header).

    Returns ``{col: [bytes8, ...]}`` with one entry per data row, or
    ``None`` when the stream doesn't match the single-member layout this
    parser understands (caller falls back to value-level handling).
    """
    import struct

    try:
        ns_marker = b"HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!"
        obs_marker = b"HEADER RECORD*******OBS     HEADER RECORD!!!!!!!"
        mem_marker = b"HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!"
        if data.count(mem_marker) != 1 or data.count(ns_marker) != 1:
            return None  # multi-member files: one namestr block per member
        mem_pos = data.index(mem_marker)
        # member header digit block ends with the NAMESTR entry size
        ns_size = int(data[mem_pos + 74 : mem_pos + 78])
        ns_pos = data.index(ns_marker)
        n_vars = int(data[ns_pos + 54 : ns_pos + 58])
        cat = data[ns_pos + 80 :]
        want = {str(c).strip().upper(): c for c in cols}
        fields, row_len = {}, 0
        for i in range(n_vars):
            ent = cat[i * ns_size : (i + 1) * ns_size]
            ntype, _, nlng = struct.unpack(">hhh", ent[0:6])
            nname = ent[8:16].decode("latin-1").strip().upper()
            npos = struct.unpack(">l", ent[84:88])[0]
            row_len = max(row_len, npos + nlng)
            if ntype == 1 and nlng == 8 and nname in want:
                fields[want.pop(nname)] = npos
        if want or row_len <= 0:
            return None  # a requested column is absent or truncated (nlng<8)
        obs_pos = data.index(obs_marker, ns_pos)
        rows = data[obs_pos + 80 :]
        if len(rows) < nrows * row_len:
            return None
        return {
            c: [rows[r * row_len + p : r * row_len + p + 8] for r in range(nrows)]
            for c, p in fields.items()
        }
    except (ValueError, struct.error):
        return None


def _parse_stat_bytes(data: bytes, family: str, sub: str | None, options: dict) -> pd.DataFrame:
    if family == "stata":
        pdf = pd.read_stata(io.BytesIO(data), **options)
    elif family == "sas":
        pdf = pd.read_sas(io.BytesIO(data), format=sub, **options)
        if sub == "xport":
            # pandas' IBM-float parser has no zero special-case: the
            # canonical all-zero IBM double (how SAS writes 0.0) decodes
            # to ±2**-260.  But 2**-260 == 16**-65 is ALSO the smallest
            # genuinely representable normalized IBM hex float (exponent
            # byte 0, mantissa 2**52), so the value alone is ambiguous.
            # Disambiguate at the byte level: re-locate each hit's raw
            # 8-byte field in the XPT record area and snap only fields
            # whose mantissa is all-zero (a true SAS 0.0).
            import numpy as np

            tiny = 2.0 ** -260
            hit_cols = [
                c
                for c in pdf.columns
                if pdf[c].dtype == float and (np.abs(pdf[c].to_numpy()) == tiny).any()
            ]
            if hit_cols:
                raw_fields = _xpt_raw_numeric_fields(data, hit_cols, len(pdf))
                for c in hit_cols:
                    vals = pdf[c].to_numpy(copy=True)
                    hits = np.flatnonzero(np.abs(vals) == tiny)
                    for i in hits:
                        fld = None if raw_fields is None else raw_fields.get(c, [None])[i]
                        # fld is None when layout parsing failed — keep the
                        # historical value-level snap (zeros vastly outnumber
                        # true 16**-65 values in real exports)
                        if fld is None or not any(fld[1:]):
                            vals[i] = 0.0
                    pdf[c] = vals
    elif family == "spss" and sub in ("sav", "zsav"):
        # in-repo pure-Python system-file decoder (sources/sav.py, r11):
        # no pyreadstat wheel needed for .sav/.zsav
        from .sav import read_sav_bytes

        pdf, _meta = read_sav_bytes(data)
    else:  # spss .por — in-repo pure-Python portable-file decoder (r11)
        from .por import read_por_bytes

        pdf, _meta = read_por_bytes(data)
    # normalize to Spark-stable dtypes: value-labelled categoricals ->
    # their label strings, bytes (xport char fields) -> str
    for c in pdf.columns:
        s = pdf[c]
        if isinstance(s.dtype, pd.CategoricalDtype):
            pdf[c] = s.astype(str).where(s.notna(), None)
        elif s.dtype == object:
            pdf[c] = s.map(
                lambda v: v.decode("latin-1").rstrip() if isinstance(v, (bytes, bytearray)) else v
            )
    return pdf


def read_stat(
    spark: SparkSession,
    source,
    *,
    schema: T.StructType | None = None,
    file_col: str | None = None,
    **options,
) -> TidyFrame:
    """Distributed read of Stata/SAS/SPSS export files (one file per task).

    ``source`` is a path, glob, or list of paths (mixing families in one
    call is rejected — their schemas never line up anyway).  ``schema=``
    skips the driver-side single-file peek; ``file_col=`` adds the source
    file name to every row (non-splittable formats make per-file lineage
    free — the task already knows its file).
    """
    paths = list(source) if isinstance(source, (list, tuple)) else [source]
    fams = {stat_format_for(str(p)) for p in paths}
    if len(fams) != 1 or None in fams:
        raise ValueError(
            f"read_stat needs one stat-file family per call; got {sorted(str(p) for p in paths)} "
            f"(supported: {sorted(STAT_EXTENSIONS)})"
        )
    family, sub = fams.pop()

    scan = spark.read.format("binaryFile").load(paths)
    if schema is None:
        first = scan.select("path").orderBy("path").limit(1).collect()
        if not first:
            raise FileNotFoundError(f"read_stat: no files matched {source!r}")
        # driver-side peek at ONE file for the schema (the
        # spark.read.csv(inferSchema) contract; bounded by one export file)
        peek_bytes = (
            scan.filter(scan.path == first[0].path).select("content").head()[0]
        )
        peek = _parse_stat_bytes(bytes(peek_bytes), family, sub, options)
        if not len(peek):
            raise ValueError(
                f"read_stat: schema peek file {first[0].path} has 0 rows — "
                "Spark cannot infer types from it; pass schema= explicitly"
            )
        schema = spark.createDataFrame(peek.head(10)).schema
    names = [f.name for f in schema.fields]
    out_schema = schema
    if file_col:
        if file_col in names:
            raise ValueError(
                f"read_stat: file_col={file_col!r} collides with a data column"
            )
        out_schema = T.StructType(list(schema.fields) + [T.StructField(file_col, T.StringType())])

    def parse(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                one = _parse_stat_bytes(bytes(content), family, sub, options)
                missing = [c for c in names if c not in one.columns]
                extra = [c for c in one.columns if c not in names]
                if missing or extra:
                    raise ValueError(
                        f"read_stat: {path} does not match the schema "
                        f"(missing {missing}, extra {extra}) — ragged "
                        "exports fail loudly; pass schema= or split the read"
                    )
                one = one[names]
                if file_col:
                    one[file_col] = path.rsplit("/", 1)[-1]
                yield one

    return TidyFrame(scan.select("path", "content").mapInPandas(parse, out_schema))


_GSHEET_ID = re.compile(r"/spreadsheets/d/([A-Za-z0-9_-]+)")
_GSHEET_GID = re.compile(r"[#?&]gid=(\d+)")


def gsheet_export_url(url: str) -> str:
    """Resolve any docs.google.com spreadsheet URL (edit/view/share form)
    to its CSV export endpoint, preserving the worksheet ``gid``."""
    m = _GSHEET_ID.search(url)
    if not m:
        raise ValueError(f"not a Google Sheets URL: {url!r}")
    gid = _GSHEET_GID.search(url)
    return (
        f"https://docs.google.com/spreadsheets/d/{m.group(1)}/export"
        f"?format=csv&gid={gid.group(1) if gid else 0}"
    )


def _default_fetch(url: str) -> bytes:
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:
        # the server ANSWERED — not a connectivity problem
        raise RuntimeError(
            f"Google Sheets returned HTTP {e.code} for {url} — the sheet "
            "is likely not link-shared (Anyone with the link can view) or "
            "the id/gid is wrong."
        ) from e
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            "Google Sheets fetch needs outbound network access, which this "
            "environment does not have; pass fetch= (url -> bytes) to "
            "read_gsheet, or export the sheet to CSV and read that."
        ) from e


def read_gsheet(
    spark: SparkSession,
    url: str,
    *,
    fetch=None,
    alias: str | None = "gsheet",
    **csv_options,
) -> TidyFrame:
    """Read a (public / link-shared) Google Sheet as a TidyFrame
    (``/root/reference/src/TidierDB.jl:170-174``).

    Sheets are capped at 10M cells by Google, so the scale-correct plan is
    one driver fetch of the CSV export + an Arrow upload — a sheet is a
    DIMENSION input to 100 TB jobs (lookup/config tables), and the
    resulting local DataFrame is exactly what ``broadcast()`` wants.
    """
    data = (fetch or _default_fetch)(gsheet_export_url(url))
    pdf = pd.read_csv(io.BytesIO(data), **csv_options)
    pdf.columns = [str(c) for c in pdf.columns]
    out = TidyFrame(spark.createDataFrame(pdf))
    if alias:
        out.df.createOrReplaceTempView(alias)
    return out
