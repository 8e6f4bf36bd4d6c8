"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl ingest path.

Common Crawl — the canonical 100 TB-scale LLM pretraining source — ships
as ``.warc.gz`` files of ~1 GB, each a concatenation of independently
gzipped WARC records (the multi-member layout exists precisely so a
record can be read without inflating the whole file).  The standard
cluster processing model, used here, is **one file per task**: Spark's
``binaryFile`` source lists files in parallel and hands each task whole
files, and a ``mapInPandas`` stage splits them into records, parses the
WARC named fields, and (for ``response`` records) the embedded HTTP
message — status, Content-Type, charset-decoded body text.

At 100 TB this plan is: parallel file listing on the driver, one
narrow scan stage (no shuffle at all), Arrow-batched record rows out.
Column pruning drops ``payload`` (the raw bytes) when a downstream
query only touches the decoded ``text`` — so a text-only pipeline never
carries the binary column past this stage.  Skew guard: WARC shards are
near-uniform ~1 GB by construction (Common Crawl caps them), so
file-per-task is balanced without salting.

Parsing is stdlib-only (``zlib`` for the gzip members, bytes splitting
for the WARC/HTTP headers) — no external WARC library exists in this
environment, and none is needed.

Reference parity note: the reference engine
(``/root/reference/src/TidierDB.jl``) has no web-archive surface; this
belongs to the training-data-pipeline layer (SURVEY.md §2.12).
"""

from __future__ import annotations

import zlib

from pyspark.sql import types as T

__all__ = ["read_warc", "parse_warc_records"]

_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        # compressed-stream byte offset of the gzip member holding this
        # record (0 for plain .warc input) — usable for HTTP range reads
        T.StructField("member_offset", T.LongType()),
        # UNCOMPRESSED byte offset of the record within its member (== the
        # plain-file offset for non-gzip input).  Kept separate from
        # member_offset because adding them would mix compressed and
        # uncompressed units into a value that identifies no real position.
        T.StructField("record_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("warc_record_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("text", T.StringType()),
    ]
)


def _gunzip_members(blob: bytes):
    """Yield (offset, inflated bytes) per gzip member of a multi-member
    stream — the .warc.gz layout.  Plain (non-gzip) input yields itself
    once."""
    if blob[:2] != b"\x1f\x8b":
        yield 0, blob
        return
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = d.decompress(blob[pos:])
        out += d.flush()
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage; stop rather than spin
            return
        yield pos, out
        pos += consumed


def _split_records(data: bytes):
    """Yield (offset_in_stream, header bytes, payload bytes) per WARC
    record in an inflated stream (records are back-to-back, each
    ``WARC/1.x`` headers + CRLFCRLF + Content-Length payload + CRLFCRLF).
    """
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(f"not a WARC record at offset {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        header = data[pos:hdr_end]
        length = None
        for line in header.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v.strip())
        if length is None:
            raise ValueError(f"WARC record at {pos} has no Content-Length")
        body_start = hdr_end + 4
        yield pos, header, data[body_start : body_start + length]
        pos = body_start + length


def _header_fields(header: bytes) -> dict:
    fields = {}
    for line in header.split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        fields[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
            "utf-8", "replace"
        )
    return fields


def _parse_http(payload: bytes):
    """(status, content_type, body bytes) from an HTTP response message;
    (None, None, payload) when it isn't one."""
    if not payload[:5] == b"HTTP/":
        return None, None, payload
    try:
        hdr_end = payload.index(b"\r\n\r\n")
    except ValueError:
        return None, None, payload
    lines = payload[:hdr_end].split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("ascii", "replace")
    return status, ctype, payload[hdr_end + 4 :]


_META_CHARSET = __import__("re").compile(
    rb"""(?is)<meta[^>]+charset\s*=\s*["']?\s*([a-z0-9_.:-]+)"""
)


def _decode_text(body: bytes, content_type: str | None) -> str | None:
    """Charset-decode a textual body.  Priority order mirrors what
    browsers do: BOM, Content-Type ``charset=`` param, HTML
    ``<meta charset>`` / ``http-equiv`` declaration (sniffed in the first
    1024 bytes — where legacy windows-1252/shift_jis pages actually
    declare it), then utf-8 and latin-1 (never fails) as fallbacks.
    None for non-text content types."""
    if content_type is not None and not (
        content_type.startswith("text/")
        or "json" in content_type
        or "xml" in content_type
        or "javascript" in content_type
    ):
        return None
    if body[:3] == b"\xef\xbb\xbf":
        return body[3:].decode("utf-8", "replace")
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return body.decode("utf-16", "replace")
    charset = None
    if content_type and "charset=" in content_type:
        charset = content_type.split("charset=", 1)[1].split(";")[0].strip(" \"'")
    if charset is None:
        m = _META_CHARSET.search(body[:1024])
        if m:
            charset = m.group(1).decode("ascii", "replace")
    for enc in filter(None, (charset, "utf-8", "latin-1")):
        try:
            return body.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return None


def parse_warc_records(path: str, blob: bytes):
    """Driver-free core: yield one dict per WARC record in one file's
    bytes (plain or multi-member gzip).  Exposed for tests and for reuse
    inside the mapInPandas stage."""
    for member_off, data in _gunzip_members(blob):
        for rec_off, header, payload in _split_records(data):
            f = _header_fields(header)
            status, http_ctype, body = _parse_http(payload)
            warc_ctype = f.get("content-type")
            if status is not None:
                text = _decode_text(body, http_ctype)
            elif warc_ctype and warc_ctype.startswith(
                ("text/", "application/warc-fields")
            ):
                text = _decode_text(body, "text/plain")
            else:
                text = None
            yield {
                "warc_file": path,
                "member_offset": member_off,
                "record_offset": rec_off,
                "warc_type": f.get("warc-type"),
                "warc_record_id": f.get("warc-record-id"),
                "warc_date": f.get("warc-date"),
                "target_uri": f.get("warc-target-uri"),
                "warc_content_type": warc_ctype,
                "http_status": status,
                "http_content_type": http_ctype,
                "payload": body,
                "text": text,
            }


def _parse_stage(keep_payload: bool, warc_types: tuple):
    """Shared record-split stage for the batch and streaming readers:
    (schema, mapInPandas generator) over a (path, content) frame."""
    schema = _SCHEMA
    if not keep_payload:
        schema = T.StructType([f for f in schema.fields if f.name != "payload"])
    cols = [f.name for f in schema.fields]
    want = tuple(warc_types)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for rec in parse_warc_records(r["path"], bytes(r["content"])):
                    if want and rec["warc_type"] not in want:
                        continue
                    if not keep_payload:
                        rec.pop("payload")
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return schema, run


def read_warc(
    spark,
    path,
    recursive: bool = False,
    path_glob: str | None = None,
    keep_payload: bool = True,
    warc_types: tuple = (),
):
    """Read WARC / WARC.GZ files into a record-per-row TidyFrame.

    ``warc_types=("response",)`` keeps only those record types (the
    common case — Common Crawl files interleave request/response/
    metadata records); ``keep_payload=False`` drops the raw bytes column
    inside the parse stage, so a text-only pipeline never materializes
    them into Arrow batches at all.
    """
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path).select("path", "content")

    schema, run = _parse_stage(keep_payload, warc_types)

    from ..core import TidyFrame

    return TidyFrame(files.mapInPandas(run, schema))


def read_warc_stream(
    spark,
    path,
    path_glob: str | None = "*.warc*",
    keep_payload: bool = True,
    warc_types: tuple = (),
    max_files_per_trigger: int | None = None,
):
    """Continuous WARC ingest: a STREAMING record-per-row TidyFrame over
    crawl files as they land under ``path`` — the steady-state shape of a
    Common-Crawl-scale pipeline (the crawler drops .warc.gz shards into
    object storage; this source picks each file up exactly once, the same
    one-file-per-task parse as :func:`read_warc`, checkpointed by
    Structured Streaming's file-source log).

    Compose with the rest of :mod:`tidierdb_jl_spark.streaming` —
    watermarks/windows on ``warc_date``, ``dedup_within_watermark`` on
    the fingerprint, ``write_stream``/``foreach_batch`` to land parquet.
    ``max_files_per_trigger`` bounds per-microbatch work (files are the
    unit of parallelism AND of admission — size it to cluster cores)."""
    from .readers import binary_file_stream

    files = binary_file_stream(
        spark, path, path_glob, max_files_per_trigger
    ).select("path", "content")

    schema, run = _parse_stage(keep_payload, warc_types)

    from ..core import TidyFrame

    return TidyFrame(files.mapInPandas(run, schema))
