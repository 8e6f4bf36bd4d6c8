"""Delta Lake Change Data Feed (CDF) reader without connector jars.

Beyond-reference (the reference is read-only on Delta via DuckDB's
delta_scan, ``/root/reference/src/TidierDB.jl:166-169``; CDF is not in
its surface at all) — implements the READ side of PROTOCOL.md's
"Change Data Files" for a version range, the primitive that lets the
incremental corpus states (:mod:`..llm.dedupstate`) consume row-level
changes instead of re-reading full snapshots at 100 TB:

- A commit WITH ``cdc`` actions: exactly those files (parquet under
  ``_change_data/``, each row carrying its ``_change_type`` —
  ``insert`` / ``delete`` / ``update_preimage`` / ``update_postimage``)
  are the commit's change set; its add/remove actions are ignored for
  CDF purposes.
- A commit WITHOUT ``cdc`` actions derives per the protocol: every row
  of an ``add`` with ``dataChange=true`` is an ``insert``, every row of
  a ``remove`` with ``dataChange=true`` is a ``delete``.
  ``dataChange=false`` commits (OPTIMIZE) contribute nothing.

Output = table columns plus ``_change_type`` (string),
``_commit_version`` (long), ``_commit_timestamp`` (timestamp from the
commitInfo action) — delta-spark's CDF column contract.

Scale shape: the driver walks ONLY the JSON commits of the range (the
same O(commits) metadata as a snapshot replay, seeded from a checkpoint
when the range starts past one); the rows flow through at most THREE
distributed parquet scans (cdc files, inserted files, removed files),
each joined to a BROADCAST basename -> (version, timestamp) map — a
file inserted in one version and removed in a later one is read once
per role, and a basename appearing in several versions of the same
role fans out through the join, which is exactly CDF semantics.

Loud gates: commits in the range whose JSON was checkpointed away
(change provenance is gone — a checkpoint holds state, not history),
and derived commits whose add/remove actions carry deletion vectors
(the per-(file, version) DV diff is connector-jar territory; the
in-repo row ops write ``cdc`` files on CDF-enabled tables instead,
see :func:`~.delta_writer.delete_delta`).  Column-mapped tables
resolve physical names exactly like :func:`~.delta.read_delta`.
"""

from __future__ import annotations

import json
from urllib.parse import unquote

from pyspark.sql import functions as F

from ..core import TidyFrame
from .delta import _log_entries, _physical_names, _snapshot
from .fsio import fs_exists, join_path, read_text

__all__ = ["read_delta_cdf"]

_META_COLS = ("_change_type", "_commit_version", "_commit_timestamp")


def read_delta_cdf(spark, path: str, starting_version: int = 0,
                   ending_version: int | None = None) -> TidyFrame:
    """Row-level changes committed in versions
    ``[starting_version, ending_version]`` (inclusive; default = the
    full log), as a TidyFrame of table columns +
    ``_change_type`` / ``_commit_version`` / ``_commit_timestamp``.
    Module docstring has the protocol contract."""
    from pyspark.sql import types as T

    root = str(path).rstrip("/")
    log_dir = join_path(root, "_delta_log")
    if not fs_exists(spark, log_dir):
        raise ValueError(f"{root} is not a Delta table (no _delta_log/)")

    ex_end: dict = {}
    _live, meta, end_v = _snapshot(spark, root, ending_version, None,
                                   ex_end)
    _dv_possible = "deletionVectors" in set(
        (ex_end.get("protocol") or {}).get("readerFeatures") or [])
    start_v = int(starting_version)
    if not 0 <= start_v <= end_v:
        raise ValueError(
            f"read_delta_cdf: starting_version={start_v} out of range "
            f"(table is at version {end_v})"
        )

    json_of = {v: n for v, k, n in _log_entries(spark, log_dir)
               if k == "json"}
    missing = [v for v in range(start_v, end_v + 1) if v not in json_of]
    if missing:
        raise ValueError(
            f"read_delta_cdf: commit JSON for version(s) {missing} is "
            "gone (checkpointed away / archived) — a checkpoint holds "
            "state, not change provenance; refusing to fabricate a diff"
        )

    # seed the add-info map so removes in the range know their file's
    # partitionValues / DV state at removal time.  If the pre-range
    # snapshot was checkpointed past (state reconstructible only AT or
    # AFTER start_v), the seed is unavailable — legal as long as no
    # ranged remove references a pre-range file (checked below).
    adds_info: dict[str, dict] = {}
    seed_ok = True
    if start_v > 0:
        ex0: dict = {}
        try:
            _snapshot(spark, root, start_v - 1, None, ex0)
            adds_info = dict(ex0.get("adds", {}))
        except ValueError:
            seed_ok = False

    cdc: list[tuple] = []     # (relpath, pv, version, ts)
    ins: list[tuple] = []
    dele: list[tuple] = []
    for v in range(start_v, end_v + 1):
        lines = [json.loads(ln) for ln in
                 read_text(spark, join_path(log_dir, json_of[v]))
                 .splitlines() if ln.strip()]
        ts = next((d["commitInfo"].get("timestamp") for d in lines
                   if d.get("commitInfo")), None)
        v_cdc = [d["cdc"] for d in lines if d.get("cdc")]
        v_add = [d["add"] for d in lines if d.get("add")]
        v_rem = [d["remove"] for d in lines if d.get("remove")]
        if v_cdc:
            for c in v_cdc:
                cdc.append((unquote(c["path"]),
                            c.get("partitionValues") or {}, v, ts))
        else:
            for a in v_add:
                if not a.get("dataChange", True):
                    continue
                if a.get("deletionVector"):
                    raise NotImplementedError(
                        f"read_delta_cdf: version {v} adds a file with a "
                        "deletion vector and writes no cdc action — the "
                        "per-version DV diff cannot be derived; re-run "
                        "the writing operation on a CDF-enabled table"
                    )
                ins.append((unquote(a["path"]),
                            a.get("partitionValues") or {}, v, ts))
            for r in v_rem:
                if not r.get("dataChange", True):
                    continue
                p = unquote(r["path"])
                if p not in adds_info and not seed_ok and (
                        r.get("partitionValues") is None or _dv_possible):
                    raise ValueError(
                        f"read_delta_cdf: version {v} removes {p!r}, "
                        "added before the range, and the pre-range "
                        "snapshot was checkpointed away — its partition "
                        "values / DV state are unrecoverable; widen "
                        "starting_version to a reconstructible point"
                    )
                info = adds_info.get(p, {})
                if r.get("deletionVector") or info.get("deletionVector"):
                    raise NotImplementedError(
                        f"read_delta_cdf: version {v} removes a DV-"
                        "bearing file and writes no cdc action — the "
                        "derived delete set would wrongly include rows "
                        "the DV had already deleted"
                    )
                pv = (r.get("partitionValues")
                      or info.get("partitionValues") or {})
                dele.append((p, pv, v, ts))
        for a in v_add:
            if a.get("path"):
                adds_info[unquote(a["path"])] = a
        for r in v_rem:
            if r.get("path"):
                adds_info.pop(unquote(r["path"]), None)

    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    phys, ptypes = _physical_names(meta, schema, root)
    data_fields = [
        T.StructField(phys[f.name], ptypes[f.name], f.nullable)
        for f in schema.fields if f.name not in part_cols
    ]
    types = {f.name: f.dataType for f in schema.fields}

    def _logical(f):
        c = F.col(phys[f.name])
        if ptypes[f.name] != f.dataType:
            c = c.cast(f.dataType)
        return c.alias(f.name)

    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schema.fields]
        + [T.StructField("_change_type", T.StringType()),
           T.StructField("_commit_version", T.LongType()),
           T.StructField("_commit_timestamp", T.TimestampType())]
    )

    def scan(files: list[tuple], ctype: str | None):
        """One distributed read of ``files`` with version/timestamp (and
        partition values) re-attached by a broadcast basename join;
        ``ctype`` None means the files carry their own _change_type
        column (cdc files)."""
        if not files:
            return None
        base_rows = [(p.rsplit("/", 1)[-1], int(v),
                      None if ts is None else int(ts),
                      *[None if pv.get(phys[c]) is None
                        else str(pv.get(phys[c])) for c in part_cols])
                     for p, pv, v, ts in files]
        if len({(r[0], r[1]) for r in base_rows}) != len(base_rows):
            raise ValueError(
                f"read_delta_cdf: duplicate (file, version) change "
                f"entries at {root} — malformed log"
            )
        msch = T.StructType(
            [T.StructField("__file", T.StringType()),
             T.StructField("__v", T.LongType()),
             T.StructField("__ts", T.LongType())]
            + [T.StructField(f"__pv_{c}", T.StringType())
               for c in part_cols]
        )
        mapping = spark.createDataFrame(base_rows, msch)
        read_schema = T.StructType(
            list(data_fields)
            + ([T.StructField("_change_type", T.StringType())]
               if ctype is None else [])
        )
        paths = sorted({join_path(root, p) for p, _pv, _v, _ts in files})
        df = spark.read.schema(read_schema).parquet(*paths)
        df = df.withColumn(
            "__file",
            F.url_decode(F.regexp_replace(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                r"\+", "%2B",
            )),
        )
        # inner join: a basename in several versions fans out (CDF
        # semantics); rows of files not in this role's map cannot occur
        # because the read lists exactly the mapped files
        df = df.join(F.broadcast(mapping), "__file", "inner")
        cols = [
            _logical(f) if f.name not in part_cols
            else F.col(f"__pv_{f.name}").cast(types[f.name]).alias(f.name)
            for f in schema.fields
        ]
        cols.append(
            (F.col("_change_type") if ctype is None
             else F.lit(ctype)).alias("_change_type"))
        cols.append(F.col("__v").alias("_commit_version"))
        cols.append(F.timestamp_millis(F.col("__ts"))
                    .alias("_commit_timestamp"))
        return df.select(*cols)

    parts = [s for s in (scan(cdc, None), scan(ins, "insert"),
                         scan(dele, "delete")) if s is not None]
    if not parts:
        return TidyFrame(spark.createDataFrame([], out_schema))
    out = parts[0]
    for s in parts[1:]:
        out = out.unionByName(s)
    return TidyFrame(out)
