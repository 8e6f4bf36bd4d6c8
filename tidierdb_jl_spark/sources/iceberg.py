"""Apache Iceberg snapshot reader without connector jars.

Reference parity: the reference scans Iceberg through DuckDB's
``iceberg_scan`` extension (``/root/reference/src/TidierDB.jl:161-165,
208-211``); the Spark-native route is the iceberg-spark-runtime jar —
absent from this image.  This module implements the READ side of the
public Iceberg table spec (https://iceberg.apache.org/spec/) directly:

- ``metadata/v<N>.metadata.json`` (+ ``version-hint.text``): table
  metadata — schemas, snapshots, current snapshot id.
- snapshot → manifest list (Avro; decoded by :mod:`.avro_lite`) →
  manifests (Avro) → ``manifest_entry`` records whose non-DELETED
  ``data_file``s enumerate the snapshot's files exactly.

The scan is ONE distributed read of exactly the live data files (no
directory listing — the metadata tree is the point of Iceberg on object
storage), with the parquet footers supplying the physical schema; the
reader then projects the CURRENT metadata schema's column names.
Iceberg data files always materialize all columns (partition values are
hidden metadata used for pruning, not reconstruction), so unlike Delta
nothing needs re-attaching.

Row-level deletes, ALL THREE kinds (r10): POSITION delete files
(``content=1`` parquet files of ``(file_path, pos)`` pairs) apply as a
distributed ``(file, _metadata.row_index)`` anti-join — see
:func:`_apply_position_deletes`; v3 DELETION VECTORS (``content=1``
PUFFIN entries — one roaring bitmap of ordinals per referenced data
file, the SAME RoaringBitmapArray serialization Delta uses, decoded by
:mod:`.dvectors` executor-side) union into the same anti-join;
EQUALITY delete files (``content=2``) apply as null-safe anti-joins on
the ``equality_ids`` columns gated by the spec's sequence-number
ordering (a delete removes rows only from data files with a strictly
smaller data sequence number, so re-inserts after the delete survive)
— see :func:`_apply_equality_deletes`.  Format version 3 is therefore
readable, including v3 COLUMN DEFAULTS (r11): a field's
``initial-default`` fills rows from data files that predate the field —
per-file presence probed from the parquet footers in one distributed
metadata job — while files containing the field keep stored values,
genuine nulls included (:func:`_scan_with_defaults`).  Unknown types
fail in the parquet reader rather than silently.

Column resolution (r11): parquet live sets resolve columns BY FIELD ID
from each file's footer (``PARQUET:field_id`` — what real Iceberg
writers emit), so renames and even name swaps project correctly;
no-id files (imported plain parquet) fall back to name matching; a
field absent from a file fills its v3 ``initial-default``, else NULL
when optional (spec "Column Projection") — see :func:`_resolved_scan`.

Loud gates (wrong-rows risks refuse, never guess): format version > 3;
unresolvable sequence numbers when equality deletes are present;
equality field ids absent from the current schema; non-parquet/orc
(or mixed-format) data files; in a NO-id file, a missing column name
with no default (rename vs added column is indistinguishable there);
a REQUIRED column absent with no default.  ``snapshot_id=`` gives time
travel across retained snapshots.  Metadata I/O goes through
:mod:`.fsio` (any Hadoop scheme).

Avro correctness story: ``avro_lite`` is verified against an
independently spec-written encoder in the tests plus the Avro spec's
own zigzag vectors — the repo's codec-test strategy.
"""

from __future__ import annotations

import json

from ..core import TidyFrame
from .avro_lite import read_avro_file
from .fsio import fs_exists, hadoop_fs, join_path, read_text

__all__ = ["read_iceberg"]


def _latest_metadata(spark, path: str) -> str:
    mdir = join_path(path, "metadata")
    if not fs_exists(spark, mdir):
        raise ValueError(f"{path} is not an Iceberg table (no metadata/)")
    hint = join_path(mdir, "version-hint.text")
    if fs_exists(spark, hint):
        v = int(read_text(spark, hint).strip())
        cand = join_path(mdir, f"v{v}.metadata.json")
        if fs_exists(spark, cand):
            return cand
    fs, hdir = hadoop_fs(spark, mdir)
    cands = []
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if not name.endswith(".metadata.json"):
            continue
        head = name[:-len(".metadata.json")]
        # two public layouts: hadoop-table `v<N>.metadata.json` and
        # catalog-style `<NNNNN>-<uuid>.metadata.json` (standard
        # Spark/Hive-catalog output, which ships WITHOUT version-hint) —
        # the leading integer is the version in both
        if head[:1] == "v" and head[1:].isdigit():
            cands.append((int(head[1:]), name))
        elif head.split("-", 1)[0].isdigit():
            cands.append((int(head.split("-", 1)[0]), name))
        else:
            cands.append((None, name))
    if not cands:
        raise ValueError(f"{path}: no *.metadata.json under metadata/")
    versioned = [c for c in cands if c[0] is not None]
    if not versioned:
        if len(cands) > 1:
            raise ValueError(
                f"{path}: {len(cands)} metadata files with no parseable "
                f"version ({sorted(n for _, n in cands)}) and no "
                "version-hint.text — refusing to guess which snapshot is "
                "current"
            )
        return join_path(mdir, cands[0][1])
    best_v = max(v for v, _ in versioned)
    best = [n for v, n in versioned if v == best_v]
    if len(best) > 1:
        raise ValueError(
            f"{path}: multiple metadata files claim version {best_v} "
            f"({sorted(best)}) — indistinguishable without a catalog; "
            "refusing to pick arbitrarily"
        )
    return join_path(mdir, best[0])


def _resolve_path(table_path: str, p: str) -> str:
    """Manifest/data paths are absolute in the spec but commonly carry a
    different filesystem prefix than the one we reached the table by
    (moved tables — the reason duckdb's iceberg_scan grew
    allow_moved_paths).  Re-root anything containing the table's
    basename segment; pass through paths that already exist under the
    table root."""
    p = str(p)
    root = table_path.rstrip("/")
    base = root.rsplit("/", 1)[-1]
    marker = f"/{base}/"
    if p.startswith(root + "/"):
        return p
    i = p.find(marker)
    if i >= 0:
        return root + "/" + p[i + len(marker):]
    raise ValueError(
        f"cannot re-root metadata path {p!r} under table {table_path!r}"
    )


def read_iceberg(spark, path: str, snapshot_id: int | None = None,
                 ref: str | None = None,
                 _file_col: str | None = None,
                 _ridx_col: str | None = None) -> TidyFrame:
    """Read an Iceberg table snapshot as a TidyFrame (jar-free metadata
    traversal — module docstring has the support contract).
    ``snapshot_id`` time-travels to any retained snapshot; ``ref``
    reads a named branch or tag from the metadata's ``refs`` map
    (``VERSION AS OF 'tag'`` semantics — see
    :func:`~.iceberg_ops.tag_iceberg`).

    ``_file_col`` (internal, r12 — same hook as ``read_delta``'s):
    append a column carrying each row's data-file BASENAME, the
    copy-on-write discovery key used by the row-level ops in
    :mod:`.iceberg_ops`.  Rows have already had position/DV/equality
    deletes subtracted, so a rewrite driven by this column materializes
    them.  ``_ridx_col`` appends the PHYSICAL row index
    (``_metadata.row_index`` — what position deletes address; the
    merge-on-read DELETE's discovery hook)."""
    from pyspark.sql import functions as F

    path = str(path)
    meta = json.loads(read_text(spark, _latest_metadata(spark, path)))
    fv = int(meta.get("format-version", 1))
    if fv > 3:
        raise NotImplementedError(
            f"Iceberg format-version {fv} at {path} — this jar-free reader "
            "supports versions 1-3"
        )
    snaps = meta.get("snapshots") or []
    if not snaps:
        schema = _spark_schema(meta)
        empty = spark.createDataFrame([], schema)
        if _file_col:
            empty = empty.withColumn(_file_col, F.lit(None).cast("string"))
        return TidyFrame(empty)
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError(
                "read_iceberg: pass snapshot_id OR ref, not both")
        refs = meta.get("refs") or {}
        if ref not in refs:
            raise ValueError(
                f"ref {ref!r} not found at {path}; available: "
                f"{sorted(refs)}"
            )
        snapshot_id = int(refs[ref]["snapshot-id"])
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snap = next((s for s in snaps if s.get("snapshot-id") == sid), None)
    if snap is None:
        raise ValueError(
            f"snapshot {sid} not found at {path}; retained: "
            f"{[s.get('snapshot-id') for s in snaps]}"
        )

    if "manifest-list" in snap:
        mlist = read_avro_file(
            spark, _resolve_path(path, snap["manifest-list"])
        )
        # (path, manifest sequence number) — entries with a null
        # sequence_number INHERIT the manifest's (spec: sequence number
        # inheritance for ADDED entries)
        manifests = [(m["manifest_path"], m.get("sequence_number"))
                     for m in mlist if int(m.get("content") or 0) == 0]
        # content=1: DELETE manifests (v2 row-level deletes) — position
        # AND equality delete files are applied below
        delete_manifests = [(m["manifest_path"], m.get("sequence_number"))
                            for m in mlist if int(m.get("content") or 0) == 1]
    else:  # v1 inline manifest list (no row-level deletes in v1)
        manifests = [(p, 0) for p in (snap.get("manifests") or [])]
        delete_manifests = []

    # live = (added/existing) - DELETED, resolved across ALL of the
    # snapshot's manifests: a compaction-less writer may retain an older
    # manifest that still lists a file a newer manifest marks DELETED —
    # the spec says a DELETED file is no longer part of the table, so
    # the exclusion is global, not per-manifest
    added, deleted, fmts = {}, set(), set()
    parts_of: dict[str, dict] = {}
    for mp, mseq in manifests:
        for entry in read_avro_file(spark, _resolve_path(path, mp)):
            df_ = entry["data_file"]
            fp = _resolve_path(path, df_["file_path"])
            status = int(entry.get("status") or 0)
            if status == 2:  # DELETED
                deleted.add(fp)
                continue
            if int(df_.get("content") or 0) != 0:
                raise ValueError(
                    f"{path}: a DATA manifest lists a data_file with "
                    f"content={df_['content']} — delete files belong in "
                    "content=1 manifests"
                )
            fmts.add(str(df_.get("file_format", "PARQUET")).upper())
            added[fp] = _entry_seq(entry, mseq, status)
            parts_of[fp] = dict(df_.get("partition") or {})
    pos_deletes, dv_deletes, eq_deletes = _delete_files(
        spark, path, delete_manifests
    )
    live = {p: s for p, s in added.items() if p not in deleted}
    if not live:
        empty = spark.createDataFrame([], _spark_schema(meta))
        if _file_col:
            empty = empty.withColumn(_file_col, F.lit(None).cast("string"))
        return TidyFrame(empty)
    if not fmts <= {"PARQUET", "ORC"} or len(fmts) > 1:
        # a mixed PARQUET+ORC live set must refuse too: there is one
        # distributed read, and feeding ORC files to the parquet reader
        # yields a footer error at best, wrong rows at worst
        raise NotImplementedError(
            f"{path}: data file formats {sorted(fmts)} — a single-format "
            "parquet or orc live set only"
        )
    want_fields = _current_schema(meta)["fields"]
    want = [f["name"] for f in want_fields]
    # spec "Column Projection" rule 1: a field ABSENT from a data file
    # whose id is the source of an IDENTITY partition transform fills
    # from the file's partition metadata (some writers omit identity
    # partition source columns from data files; null-filling them
    # would be silently wrong answers)
    ident: dict[str, int] = {}
    specs = meta.get("partition-specs")
    if specs is None and meta.get("partition-spec"):
        specs = [{"fields": meta["partition-spec"]}]  # v1 single-spec
    for spec in specs or []:
        for pf in spec.get("fields", []):
            if pf.get("transform") == "identity" and \
                    pf.get("source-id") is not None:
                ident[pf["name"]] = int(pf["source-id"])
    ident_fill: dict[str, dict] = {}
    if ident:
        for fp, pv in parts_of.items():
            fills = {fid: pv[nm] for nm, fid in ident.items()
                     if nm in pv}
            if fills:
                ident_fill[fp] = fills
    if fmts == {"PARQUET"}:
        # spec-exact column resolution (r11): every parquet read goes
        # through the per-file footer probe — field-id renames, v3
        # initial-defaults, and null-fill for later-added optional
        # columns are all PER-FILE properties that a plain union read
        # (one random footer picks the schema) gets silently wrong.
        # _metadata is retained only when position/DV deletes will need
        # row_index — otherwise it would widen every scan's ReadSchema
        df = _resolved_scan(spark, path, sorted(live), want_fields,
                            keep_metadata=bool(pos_deletes or dv_deletes
                                               or _ridx_col),
                            ident_fill=ident_fill)
    else:
        # ORC live sets (r12): the SAME spec-exact field-id resolution
        # as parquet — ids come from the ORC iceberg.id type attributes
        # via the in-repo tail parser (sources/orc_meta.py); id-less
        # files fall back to name matching with the loud absent-column
        # gate, exactly like imported plain parquet
        df = _resolved_scan(spark, path, sorted(live), want_fields,
                            keep_metadata=bool(pos_deletes or dv_deletes
                                               or _ridx_col),
                            fmt="orc", ident_fill=ident_fill)
    if _ridx_col:
        df = df.withColumn(_ridx_col, F.col("_metadata.row_index"))
    if _file_col:
        # basename, URL-decoded the same way the delete machinery keys
        # files (input_file_name() is URL-encoded; '+' pre-escaped so
        # URLDecoder does not read it as a space).  Attached SCAN-side:
        # input_file_name() refuses plans with more than one file
        # source, which the delete anti-joins below introduce.
        df = df.withColumn(
            _file_col,
            F.url_decode(F.regexp_replace(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                r"\+", "%2B",
            )))
    if pos_deletes or dv_deletes:
        df = _apply_position_deletes(spark, path, df, list(live),
                                     pos_deletes, dv_deletes)
    if eq_deletes:
        df = _apply_equality_deletes(spark, path, df, live, eq_deletes,
                                     _current_schema(meta))
    keep = (list(want) + ([_file_col] if _file_col else [])
            + ([_ridx_col] if _ridx_col else []))
    return TidyFrame(df.select(*keep))


def _entry_seq(entry: dict, mseq, status: int):
    """Data sequence number of a manifest entry: explicit, or inherited
    from the manifest-list entry for ADDED rows (spec: sequence number
    inheritance); None when unresolvable — gated later only if equality
    deletes actually need it."""
    s = entry.get("sequence_number")
    if s is not None:
        return int(s)
    if status == 1 and mseq is not None:  # ADDED inherits
        return int(mseq)
    return None


def _delete_files(spark, path: str, delete_manifests):
    """Resolve the snapshot's live delete files.  Returns
    ``(pos_deletes, dv_deletes, eq_deletes)``: parquet position deletes
    as ``[(path, record_count)]``, v3 Puffin deletion vectors as
    ``[(referenced_data_file, puffin_path, offset, size, cardinality)]``,
    equality deletes as ``[(path, equality_ids tuple, sequence_number)]``.
    A DELETED-status entry removes its delete file from consideration,
    same rule as data files.  (A DV applies to exactly the data file it
    references, so sequence ordering is irrelevant for it — path-keyed
    exactness, same argument as parquet position deletes.)"""
    pos, dvs, eq, removed = {}, {}, {}, set()
    for mp, mseq in delete_manifests:
        for entry in read_avro_file(spark, _resolve_path(path, mp)):
            df_ = entry["data_file"]
            fp = _resolve_path(path, df_["file_path"])
            status = int(entry.get("status") or 0)
            if status == 2:  # DELETED
                removed.add(fp)
                continue
            content = int(df_.get("content") or 0)
            if content not in (1, 2):
                raise ValueError(
                    f"{path}: delete manifest {mp} lists a data_file with "
                    f"content={content} (expected 1=position or "
                    "2=equality deletes)"
                )
            fmt = str(df_.get("file_format", "PARQUET")).upper()
            if content == 1 and fmt == "PUFFIN":
                # v3 deletion vector: one roaring blob per referenced
                # data file, located by the manifest's offset/size
                ref = df_.get("referenced_data_file")
                off = df_.get("content_offset")
                if not ref or off is None:
                    raise ValueError(
                        f"{path}: PUFFIN delete entry without "
                        "referenced_data_file/content_offset — malformed "
                        "v3 manifest"
                    )
                dvs[fp + f"@{int(off)}"] = (
                    _resolve_path(path, ref), fp, int(off),
                    df_.get("content_size_in_bytes"),
                    df_.get("record_count"),
                )
                continue
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"{path}: delete file format {fmt} — parquet (or "
                    "PUFFIN deletion vectors) only"
                )
            if content == 1:
                pos[fp] = df_.get("record_count")
            else:
                ids = df_.get("equality_ids")
                if not ids:
                    raise ValueError(
                        f"{path}: equality delete file {df_['file_path']} "
                        "lists no equality_ids — malformed manifest"
                    )
                seq = _entry_seq(entry, mseq, status)
                if seq is None:
                    raise NotImplementedError(
                        f"{path}: equality delete file {df_['file_path']} "
                        "has no resolvable sequence number — ordering "
                        "deletes against data files is impossible; use "
                        "the iceberg connector jar"
                    )
                eq[fp] = (tuple(int(i) for i in ids), seq,
                          df_.get("record_count"))
    return (
        [(p, n) for p, n in pos.items() if p not in removed],
        [v for v in dvs.values() if v[1] not in removed],
        [(p, ids, seq, rc) for p, (ids, seq, rc) in eq.items()
         if p not in removed],
    )


def _apply_equality_deletes(spark, path, df, live_seq, eq_deletes, schema):
    """v2 EQUALITY deletes: a delete-file row removes every data row
    whose values equal it on the ``equality_ids`` columns (null matches
    null — spec), in data files whose data sequence number is STRICTLY
    LESS than the delete file's.  Ordering is what makes re-inserts
    after a delete survive, so every live data file needs a resolvable
    sequence number when equality deletes are present (loud gate
    otherwise).

    Plan shape: per distinct equality-ids set, one left-anti join of the
    scan against the (typically tiny — CDC writers emit small delete
    files) delete rows, null-safe on the equality columns plus the
    non-equi ``delete.seq > file.seq`` predicate; the per-file sequence
    number rides a broadcast basename map, same as the partition
    re-attach machinery elsewhere.  The delete side is broadcast-hinted
    when the manifests' record counts say it is small (r11 — the same
    smallness rule as the position-delete path: a deterministic plan
    beats AQE rediscovering the same answer per query), else the
    strategy is left to AQE."""
    from pyspark.sql import functions as F

    unresolved = sorted(p for p, s in live_seq.items() if s is None)
    if unresolved:
        raise NotImplementedError(
            f"{path}: equality deletes present but {len(unresolved)} live "
            f"data file(s) have no resolvable sequence number (e.g. "
            f"{unresolved[0]!r}) — refusing to guess delete ordering"
        )
    name_of = {int(f["id"]): f["name"] for f in schema["fields"]}
    base_seq = {p.rsplit("/", 1)[-1]: s for p, s in live_seq.items()}
    if len(base_seq) != len(live_seq):
        raise ValueError(
            f"{path}: duplicate data-file basenames — cannot key sequence "
            "numbers by file name; use the iceberg connector jar"
        )
    seq_map = spark.createDataFrame(
        [(b, int(s)) for b, s in base_seq.items()],
        "__file string, __fseq long",
    )
    df = (
        df.withColumn(
            "__file",
            F.url_decode(F.regexp_replace(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                r"\+", "%2B",
            )),
        )
        .join(F.broadcast(seq_map), "__file")
    )
    by_ids: dict[tuple, list[tuple]] = {}
    for p, ids, seq, rc in eq_deletes:
        by_ids.setdefault(ids, []).append((p, seq, rc))
    for ids, files in sorted(by_ids.items()):
        cols = []
        for fid in ids:
            if fid not in name_of:
                raise NotImplementedError(
                    f"{path}: equality delete references field id {fid}, "
                    "absent from the current schema — dropped-column "
                    "deletes need the connector jar"
                )
            cols.append(name_of[fid])
        dseq = spark.createDataFrame(
            [(p.rsplit("/", 1)[-1], int(s)) for p, s, _rc in files],
            "__dfile string, __dseq long",
        )
        dels = (
            spark.read.parquet(*sorted(p for p, *_ in files))
            .select(
                *[F.col(c).alias(f"__d_{c}") for c in cols],
                F.element_at(F.split(F.input_file_name(), "/"), -1)
                .alias("__dfile"),
            )
            .join(F.broadcast(dseq), "__dfile")
        )
        counts = [rc for _p, _s, rc in files]
        if all(n is not None for n in counts) and sum(counts) <= 4_000_000:
            dels = F.broadcast(dels)
        cond = F.col("__dseq") > F.col("__fseq")
        for c in cols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__d_{c}"))
        df = df.join(dels, cond, "left_anti")
    return df.drop("__file", "__fseq")


def _dv_rows_df(spark, dv_deletes):
    """(``__file``, ``__ridx``) rows from v3 Puffin deletion vectors,
    decoded EXECUTOR-side (mapInPandas over the descriptors — the same
    distributed-decode shape as the Delta DV path; the driver never
    holds row data).  ``__file`` is the REFERENCED data file's basename."""
    descs = [(ref.rsplit("/", 1)[-1], pf, int(off),
              None if size is None else int(size),
              -1 if card is None else int(card))
             for ref, pf, off, size, card in dv_deletes]
    ddf = spark.createDataFrame(
        descs, "fname string, url string, off long, size long, card long"
    )
    if len(descs) > 1:
        ddf = ddf.repartition(min(len(descs), 64))

    def expand(batches):
        import pandas as pd

        from tidierdb_jl_spark.sources.dvectors import (
            read_file_bytes, read_iceberg_dv_from_bytes,
        )

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                blob = read_file_bytes(r.url)
                idx = read_iceberg_dv_from_bytes(
                    blob, int(r.off),
                    None if pd.isna(r.size) else int(r.size),
                    None if r.card < 0 else int(r.card),
                )
                if len(idx):
                    yield pd.DataFrame(
                        {"__file": r.fname, "__ridx": idx.astype("int64")}
                    )

    return ddf.mapInPandas(expand, "__file string, __ridx long")


def _apply_position_deletes(spark, path, df, live, pos_deletes,
                            dv_deletes=()):
    """Anti-join the data scan against the deleted (file, pos) pairs —
    from parquet position delete files (spec: a row deletes the ordinal
    ``pos`` of the data file named ``file_path``) and/or v3 Puffin
    deletion vectors (one roaring bitmap of ordinals per referenced
    data file, decoded by :mod:`.dvectors` — the SAME serialization
    Delta uses, deliberate interop in the v3 spec).

    Keys are data-file BASENAMES (uuid-named, uniqueness verified) so
    moved tables — where the delete files still record the ORIGINAL
    absolute paths — match; ``pos`` is the physical ordinal, which is
    exactly Spark's ``_metadata.row_index``.  The delete side is a
    distributed read/decode (never driver-resident); it broadcasts
    when the manifests' record counts say it is small, else AQE picks
    the strategy at runtime."""
    from pyspark.sql import functions as F

    base_live = {p.rsplit("/", 1)[-1] for p in live}
    if len(base_live) != len(set(live)):
        raise ValueError(
            f"{path}: duplicate data-file basenames in the live set — "
            "cannot key position deletes by file name; use the iceberg "
            "connector jar for this table"
        )
    parts = []
    if pos_deletes:
        parts.append(
            spark.read.parquet(*sorted(p for p, _ in pos_deletes))
            .select(
                F.element_at(F.split(F.col("file_path"), "/"), -1)
                .alias("__file"),
                F.col("pos").cast("long").alias("__ridx"),
            )
        )
    if dv_deletes:
        parts.append(_dv_rows_df(spark, dv_deletes))
    dels = parts[0]
    for extra in parts[1:]:
        dels = dels.unionByName(extra)
    counts = ([n for _, n in pos_deletes]
              + [c for *_, c in dv_deletes])
    if all(n is not None for n in counts) and sum(counts) <= 4_000_000:
        dels = F.broadcast(dels)
    return (
        df.withColumn(
            "__file",
            # input_file_name() is URL-encoded; delete files record the
            # writer's raw path string — decode the scan side (literal
            # '+' pre-escaped: URLDecoder reads bare '+' as a space)
            F.url_decode(F.regexp_replace(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                r"\+", "%2B",
            )),
        )
        .withColumn("__ridx", F.col("_metadata.row_index"))
        .join(dels, ["__file", "__ridx"], "left_anti")
        .drop("__file", "__ridx")
    )


def _default_literal(path: str, f: dict):
    """Typed Spark literal for a field's ``initial-default`` (spec
    "Default values" — the metadata stores the JSON single-value
    serialization).  Primitive types only; a default on a nested type
    refuses loudly rather than fabricating a struct."""
    from pyspark.sql import functions as F

    v = f["initial-default"]
    t = f["type"]
    if not isinstance(t, str):
        raise NotImplementedError(
            f"{path}: initial-default on nested-typed field "
            f"{f['name']!r} — connector-jar territory"
        )
    if t in ("binary",) or t.startswith("fixed"):
        # JSON single-value serialization stores bytes as hex
        return F.lit(bytes.fromhex(v))
    if t.startswith("decimal"):
        spark_t = t
    elif t in _ICEBERG_TO_SPARK and t != "time":
        spark_t = _ICEBERG_TO_SPARK[t]
    else:
        raise NotImplementedError(
            f"{path}: initial-default for iceberg type {t!r} on field "
            f"{f['name']!r} is not supported by this jar-free reader"
        )
    return F.lit(v).cast(spark_t)


def _partition_literal(path: str, f: dict, v):
    """Typed Spark literal for an identity-partition fill (spec Column
    Projection rule 1).  Avro partition tuples store dates as epoch-day
    ints and timestamps as epoch-micro longs (single-value
    serialization); strings (e.g. a converted hive layout) cast through
    the field's Spark type."""
    from pyspark.sql import functions as F

    t = f["type"]
    if v is None:
        return F.lit(None).cast(_iceberg_spark_type(path, f))
    if t == "date" and isinstance(v, int):
        return F.date_add(F.lit("1970-01-01").cast("date"), v)
    if t in ("timestamp", "timestamptz") and isinstance(v, int):
        lit = F.timestamp_micros(F.lit(v))
        return lit.cast(_ICEBERG_TO_SPARK[t])
    return F.lit(v).cast(_iceberg_spark_type(path, f))


def _iceberg_spark_type(path: str, f: dict) -> str:
    t = f["type"]
    if isinstance(t, str):
        if t.startswith("decimal"):
            return t
        if t in _ICEBERG_TO_SPARK and t != "time":
            return _ICEBERG_TO_SPARK[t]
    raise NotImplementedError(
        f"{path}: cannot synthesize a fill value of iceberg type {t!r} "
        f"for absent field {f['name']!r}"
    )


def _resolved_scan(spark, path: str, files: list, fields: list,
                   keep_metadata: bool = False, fmt: str = "parquet",
                   ident_fill: dict | None = None):
    """Spec-exact column resolution (Iceberg spec "Column Projection" +
    v3 "Default values"), replacing name matching:

    - Each live file's footer is probed ONCE in a distributed metadata
      job (batched tasks — O(files) driver footprint, same as the live
      list itself; never row data): top-level ``(name, field id)``
      pairs.  Parquet ids come from the ``PARQUET:field_id`` schema
      metadata (pyarrow footer read); ORC ids (r12) from the
      ``iceberg.id`` type attributes via the in-repo ORC tail parser
      (:mod:`.orc_meta` — pyarrow's ORC reader does not expose type
      attributes).
    - A current-schema field resolves in a file BY FIELD ID when the
      file carries ids (what real Iceberg writers emit) — renames and
      even name SWAPS resolve correctly, the failure mode pure name
      matching silently gets wrong.  Files with no ids at all (imported
      plain parquet) fall back to name matching.
    - A field ABSENT from a file fills its ``initial-default`` (v3),
      else NULL when optional (spec: missing field id ⇒ default or
      null), else refuses (required, no default).  Files that contain
      the field keep stored values, INCLUDING genuine nulls — the
      per-file distinction a plain union-schema read erases.
    - In a no-id file a missing NAME with no default still refuses: it
      could be a rename, and without ids the two cases are
      indistinguishable.

    Files are grouped by their full resolution signature, each group
    scanned once (physical→logical aliases + typed fill literals), and
    the groups unioned by name.  With ``keep_metadata`` the hidden
    ``_metadata`` struct is retained explicitly so the row-level delete
    machinery keeps its ``row_index`` access across the union; without
    deletes it is omitted, keeping the pushed ReadSchema exactly the
    projected columns."""
    from pyspark.sql import functions as F

    fdf = spark.createDataFrame([(f,) for f in files], "path string")
    if len(files) > 1:
        fdf = fdf.repartition(min(len(files), 64))

    def probe(batches):
        import pandas as pd

        def topfields_parquet(p):
            import pyarrow.parquet as pq

            if "://" not in p or p.startswith("file://"):
                lp = p[len("file://"):] if p.startswith("file://") else p
                sch = pq.read_schema(lp)
            else:
                from pyarrow import fs as pafs

                if p.startswith("s3a://"):
                    p = "s3://" + p[len("s3a://"):]
                filesystem, pth = pafs.FileSystem.from_uri(p)
                with filesystem.open_input_file(pth) as fh:
                    sch = pq.read_schema(fh)
            out = []
            for fld in sch:
                fid = None
                if fld.metadata and b"PARQUET:field_id" in fld.metadata:
                    try:
                        fid = int(fld.metadata[b"PARQUET:field_id"])
                    except ValueError:
                        fid = None
                out.append((fld.name, fid))
            return out

        def topfields(p):
            if fmt == "orc":
                from tidierdb_jl_spark.sources.orc_meta import (
                    orc_top_fields_from_url,
                )

                return orc_top_fields_from_url(p)
            return topfields_parquet(p)

        for pdf in batches:
            yield pd.DataFrame({
                "path": pdf["path"],
                "fields": [json.dumps(topfields(p)) for p in pdf["path"]],
            })

    footer = {
        r["path"]: [(n, fid) for n, fid in json.loads(r["fields"])]
        for r in fdf.mapInPandas(probe, "path string, fields string")
        .collect()
    }

    def resolve(p: str) -> tuple:
        """Per-file signature: one entry per current-schema field —
        ("col", physical_name) | ("pfill", value) | ("default",) |
        ("null",).  ``pfill`` is the spec's Column Projection rule 1:
        an absent field whose id sources an IDENTITY partition
        transform fills from the file's partition metadata (takes
        precedence over initial-default per spec ordering)."""
        fl = footer[p]
        by_id = {fid: n for n, fid in fl if fid is not None}
        names = {n for n, _ in fl}
        has_ids = bool(by_id)
        pf_vals = (ident_fill or {}).get(p) or {}
        sig = []
        for f in fields:
            fid, fname = int(f["id"]), f["name"]
            if has_ids and fid in by_id:
                sig.append(("col", by_id[fid]))
            elif not has_ids and fname in names:
                sig.append(("col", fname))
            elif fid in pf_vals:
                sig.append(("pfill", pf_vals[fid]))
            elif f.get("initial-default") is not None:
                sig.append(("default",))
            elif not has_ids:
                raise NotImplementedError(
                    f"{path}: column {fname!r} absent from data file "
                    f"{p.rsplit('/', 1)[-1]!r}, which carries no field "
                    "ids (parquet PARQUET:field_id / ORC iceberg.id) — "
                    "a rename is indistinguishable from an added column "
                    "here; rewrite the file with an Iceberg writer or "
                    "add an initial-default"
                )
            elif f.get("required"):
                raise ValueError(
                    f"{path}: REQUIRED column {fname!r} (id {fid}) absent "
                    f"from data file {p.rsplit('/', 1)[-1]!r} and has no "
                    "initial-default — refusing to fabricate values"
                )
            else:
                sig.append(("null",))
        return tuple(sig)

    groups: dict[tuple, list] = {}
    for p in files:
        groups.setdefault(resolve(p), []).append(p)

    out = None
    for sig, grp in sorted(groups.items()):
        g = (spark.read.orc(*sorted(grp)) if fmt == "orc"
             else spark.read.parquet(*sorted(grp)))
        cols = []
        for f, how in zip(fields, sig):
            if how[0] == "col":
                cols.append(F.col(how[1]).alias(f["name"]))
            elif how[0] == "pfill":
                cols.append(
                    _partition_literal(path, f, how[1]).alias(f["name"]))
            elif how[0] == "default":
                cols.append(_default_literal(path, f).alias(f["name"]))
            else:
                cols.append(
                    F.lit(None).cast(_iceberg_spark_type(path, f))
                    .alias(f["name"])
                )
        if keep_metadata:
            cols.append(F.col("_metadata"))
        g = g.select(*cols)
        out = g if out is None else out.unionByName(g)
    return out


def _current_schema(meta: dict) -> dict:
    if "schemas" in meta:
        cid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id") == cid:
                return s
        return meta["schemas"][-1]
    return meta["schema"]  # v1 single-schema form


_ICEBERG_TO_SPARK = {
    "boolean": "boolean", "int": "int", "long": "long", "float": "float",
    "double": "double", "date": "date", "string": "string",
    "binary": "binary", "uuid": "string", "time": "long",
    "timestamp": "timestamp_ntz", "timestamptz": "timestamp",
}


def _spark_schema(meta: dict):
    """Spark StructType for the current Iceberg schema — used only for
    the empty-table result (data files carry their own schema)."""
    from pyspark.sql import types as T

    def conv(t):
        if isinstance(t, str):
            if t in _ICEBERG_TO_SPARK:
                return _ICEBERG_TO_SPARK[t]
            if t.startswith("decimal"):
                return t
        raise NotImplementedError(
            f"iceberg type {t!r} in an empty-table schema — nested types "
            "materialize from data files only"
        )

    fields = ", ".join(
        f"`{f['name']}` {conv(f['type'])}"
        for f in _current_schema(meta)["fields"]
    )
    return T.StructType.fromDDL(fields) if fields else T.StructType([])
