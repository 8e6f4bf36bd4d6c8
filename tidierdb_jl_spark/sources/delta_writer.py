"""Delta Lake transaction-log WRITER without connector jars.

Beyond-reference (the reference — and this repo until r11 — is
read-only on Delta: ``/root/reference/src/TidierDB.jl:166-169`` scans
via DuckDB's delta extension).  A training-data pipeline wants
VERSIONED corpus snapshots: append today's crawl, overwrite a cleaned
partition, time-travel an experiment to last week's table — so this
module implements the WRITE side of the public protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) at
protocol (1, 2): parquet data files plus JSON commits, readable by this
repo's :mod:`.delta` reader and by any standard Delta reader.

How a commit works (the protocol's optimistic concurrency):

1. Spark writes the batch as ordinary parquet into a staging directory
   INSIDE the table root (same filesystem ⇒ rename is cheap on
   HDFS/POSIX; copy+delete on object stores — the files land under
   uuid-fresh names either way, so a crashed attempt leaves only
   unreferenced garbage, never a torn table).
2. Each part file moves to its final partition directory; its add
   action records the RFC-2396-encoded relative path, partition values
   parsed from the staging layout, size, and modification time.
3. The commit file ``_delta_log/<version>.json`` is created with
   ``overwrite=False`` — atomic on POSIX/HDFS, check-then-create on
   object stores.  A concurrent writer losing the race re-snapshots and
   retries with the next version (appends always compose; an overwrite
   recomputes its remove set against the new snapshot).

Modes: ``append`` (new table or existing), ``overwrite`` (remove every
live file, keep history — time travel still reaches old versions),
``error`` (refuse if the table exists).  Schema is enforced EXACTLY
against the table's metaData on append — silent column reordering or
type drift is how lakehouse tables rot; widen explicitly with
``overwrite`` + ``overwrite_schema=True``.

Maintenance: :func:`checkpoint_delta` writes classic parquet
checkpoints (incl. ``txn`` watermark rows, so exactly-once streaming
survives JSON-prefix truncation) + ``_last_checkpoint``;
:func:`optimize_delta` compacts small files per partition with
``dataChange=false`` commits — the streaming-sink steady state would
otherwise degrade a 100 TB table into millions of tiny files.

Row-level ops by COPY-ON-WRITE: :func:`delete_delta` (rewrite matching
files without the matching rows) and :func:`merge_delta` (upsert —
``WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *``); both touch
only the files containing matches, so work scales with the change set,
not the table.

NOT implemented (loud): writer features beyond protocol 2 (deletion
vectors, column mapping, CDF...); row-level ops on mapped or DV-bearing
tables refuse.
"""

from __future__ import annotations

import json
import time
import uuid
from urllib.parse import quote, unquote

__all__ = ["write_delta", "last_txn_version", "checkpoint_delta",
           "optimize_delta", "delete_delta", "merge_delta", "vacuum_delta",
           "describe_history"]

_MAX_COMMIT_RETRIES = 20


def last_txn_version(spark, path: str, app_id: str) -> int:
    """Highest ``txn`` version committed for ``app_id`` (PROTOCOL.md
    "Transaction Identifiers"), or -1 — the idempotent-writer check:
    a streaming sink replaying micro-batch N after a crash sees
    ``last_txn_version(...) >= N`` and skips the duplicate commit."""
    from .delta import _snapshot
    from .fsio import fs_exists, join_path

    if not fs_exists(spark, join_path(str(path).rstrip("/"), "_delta_log")):
        return -1
    txns: dict = {}
    _snapshot(spark, str(path).rstrip("/"), None, txns)
    return txns.get(app_id, -1)


def _schema_fingerprint(schema_json: str):
    """(name, normalized type) list — order-sensitive, metadata-free."""
    fields = json.loads(schema_json)["fields"]
    return [(f["name"], json.dumps(f["type"], sort_keys=True))
            for f in fields]


def _list_staged(spark, staging: str, part_cols):
    """Walk the staging dir: [(relpath, size, mtime, partitionValues)].
    Partition values come from the ``k=v`` directory segments Spark
    wrote (``__HIVE_DEFAULT_PARTITION__`` ⇒ null), URL-unescaped the
    same way Spark escaped them."""
    from .fsio import hadoop_fs

    fs, hroot = hadoop_fs(spark, staging)
    out = []
    stack = [hroot]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            p = st.getPath()
            if st.isDirectory():
                stack.append(p)
                continue
            name = p.getName()
            if not name.endswith(".parquet") or name.startswith("_"):
                continue
            rel = p.toString()[len(fs.makeQualified(hroot).toString()):] \
                .lstrip("/")
            segs = rel.split("/")[:-1]
            pv = {}
            for seg in segs:
                if "=" not in seg:
                    raise ValueError(
                        f"write_delta: unexpected staging dir {seg!r}"
                    )
                k, v = seg.split("=", 1)
                pv[k] = (None if v == "__HIVE_DEFAULT_PARTITION__"
                         else unquote(v))
            missing = [c for c in part_cols if c not in pv]
            if missing:
                raise ValueError(
                    f"write_delta: staged file {rel!r} lacks partition "
                    f"dirs for {missing}"
                )
            out.append((rel, st.getLen(), st.getModificationTime(), pv))
    return out


def _stage_batch(spark, root: str, df, part_cols) -> list[dict]:
    """Write ``df`` as parquet into a staging dir inside the table root
    and move each file to its final uuid-fresh name; returns the add
    actions.  Names get a FRESH uuid per file (what delta-spark does):
    Spark reuses one job uuid across partition dirs, so staged basenames
    collide across dirs — and readers (this repo's included) key
    per-file metadata by the uuid-unique basename."""
    from .fsio import fs_delete, fs_mkdirs, fs_rename, join_path

    staging = join_path(root, f"_staging_{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(staging)
    staged = _list_staged(spark, staging, part_cols)
    # an empty batch stages a single 0-row parquet file — a legal add
    # (the commit still creates/extends the table with its schema); a
    # genuinely file-less staging dir would mean the Spark write failed
    if not staged:
        fs_delete(spark, staging, recursive=True)
        raise ValueError("write_delta: the staged write produced no files")
    adds = []
    for i, (rel, size, mtime, pv) in enumerate(staged):
        parent_rel = rel.rsplit("/", 1)[0] if "/" in rel else ""
        fname = f"part-{i:05d}-{uuid.uuid4()}.snappy.parquet"
        final_rel = f"{parent_rel}/{fname}" if parent_rel else fname
        dest = join_path(root, final_rel)
        fs_mkdirs(spark, dest.rsplit("/", 1)[0])
        fs_rename(spark, join_path(staging, rel), dest)
        adds.append({
            "path": quote(final_rel, safe="/=-"),
            "partitionValues": pv,
            "size": int(size),
            "modificationTime": int(mtime),
            "dataChange": True,
        })
    fs_delete(spark, staging, recursive=True)
    return adds


def _try_create(spark, path: str, text: str) -> bool:
    """create(overwrite=False) + full write; False if it already
    exists (the optimistic-concurrency loser)."""
    from .fsio import hadoop_fs

    fs, hpath = hadoop_fs(spark, path)
    try:
        stream = fs.create(hpath, False)
    except Exception:  # noqa: BLE001 — FileAlreadyExists et al.
        return False
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    return True


def write_delta(
    tf,
    path: str,
    mode: str = "append",
    partition_by=None,
    overwrite_schema: bool = False,
    txn: tuple | None = None,
) -> int:
    """Commit ``tf`` to the Delta table at ``path``; returns the
    committed version number.  Module docstring has the protocol
    contract.

    ``txn=(app_id, version)`` stamps the commit with a setTransaction
    action and makes it IDEMPOTENT: if the table already records a
    ``txn`` watermark >= ``version`` for ``app_id``, the write is a
    no-op returning the current table version — the exactly-once
    building block for streaming sinks replaying a micro-batch after a
    crash (see :func:`last_txn_version` and
    :func:`~tidierdb_jl_spark.streaming.stream.write_stream_delta`).
    The check re-runs inside the optimistic-commit loop, so losing a
    race to a duplicate of yourself stays exactly-once."""
    from .delta import _snapshot
    from .fsio import fs_exists, fs_mkdirs, join_path

    def _snapshot_for(sp, r):
        return _snapshot(sp, r, None)

    if mode not in ("append", "overwrite", "error"):
        raise ValueError(f"write_delta: mode {mode!r} "
                         "(append|overwrite|error)")
    df = tf.df if hasattr(tf, "df") else tf
    spark = df.sparkSession
    root = str(path).rstrip("/")
    part_cols = ([partition_by] if isinstance(partition_by, str)
                 else list(partition_by or []))
    bad = [c for c in part_cols if c not in df.columns]
    if bad:
        raise ValueError(f"write_delta: partition_by {bad} not in columns")

    if txn is not None:
        txn = (str(txn[0]), int(txn[1]))

    log_dir = join_path(root, "_delta_log")
    exists = fs_exists(spark, log_dir)
    if exists and mode == "error":
        raise ValueError(f"write_delta: {root} already exists (mode=error)")
    if exists and txn is not None:
        done = last_txn_version(spark, root, txn[0])
        if done >= txn[1]:
            # replayed batch: the table already contains this commit
            _, _, version = _snapshot_for(spark, root)
            return version

    # 1+2. stage the data inside the table root and move each file to
    # its uuid-fresh final name, collecting the add actions
    adds = _stage_batch(spark, root, df, part_cols)

    schema_json = df.schema.json()
    new_meta = {
        "id": str(uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_json,
        "partitionColumns": part_cols,
        "configuration": {},
        "createdTime": int(time.time() * 1000),
    }

    # 3. optimistic commit loop
    for _attempt in range(_MAX_COMMIT_RETRIES):
        txns: dict = {}
        if fs_exists(spark, log_dir):
            live, meta, version = _snapshot(spark, root, None, txns)
        else:
            live, meta, version = {}, None, -1
        if txn is not None and txns.get(txn[0], -1) >= txn[1]:
            # a concurrent duplicate of this very batch won the race:
            # exactly-once means we drop ours (the moved files stay as
            # unreferenced garbage, never table rows)
            return version

        actions = []
        if meta is None:
            actions.append({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}})
            actions.append({"metaData": new_meta})
        else:
            old_parts = list(meta.get("partitionColumns") or [])
            if old_parts != part_cols:
                raise ValueError(
                    f"write_delta: table is partitioned by {old_parts}, "
                    f"write requested {part_cols} — repartitioning an "
                    "existing table needs overwrite of a NEW location"
                )
            if _schema_fingerprint(meta["schemaString"]) != \
                    _schema_fingerprint(schema_json):
                if mode == "overwrite" and overwrite_schema:
                    actions.append({"metaData": dict(
                        new_meta, id=meta.get("id", new_meta["id"])
                    )})
                else:
                    raise ValueError(
                        f"write_delta: batch schema does not match the "
                        f"table schema at {root} — schema drift must be "
                        "explicit (mode='overwrite', "
                        "overwrite_schema=True)"
                    )
        if mode == "overwrite":
            now_ms = int(time.time() * 1000)
            for p in sorted(live):
                actions.append({"remove": {
                    "path": quote(p, safe="/=-"),
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }})
        actions.extend({"add": a} for a in adds)
        if txn is not None:
            actions.append({"txn": {
                "appId": txn[0], "version": txn[1],
                "lastUpdated": int(time.time() * 1000),
            }})
        actions.append({"commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": "WRITE",
            "operationParameters": {"mode": mode.upper()},
            "engineInfo": "tidierdb_jl_spark jar-free writer",
        }})

        commit = join_path(log_dir, f"{version + 1:020d}.json")
        if not fs_exists(spark, log_dir):
            fs_mkdirs(spark, log_dir)
        text = "\n".join(json.dumps(a, separators=(",", ":"))
                         for a in actions) + "\n"
        if _try_create(spark, commit, text):
            return version + 1
        # lost the race: re-snapshot (new live set, new version) and retry
    raise RuntimeError(
        f"write_delta: lost the commit race {_MAX_COMMIT_RETRIES} times "
        f"at {root} — a writer storm; back off and retry"
    )


def checkpoint_delta(spark, path: str) -> int:
    """Write a CLASSIC checkpoint for the table's current version
    (PROTOCOL.md "Checkpoints"): one parquet file
    ``<version>.checkpoint.parquet`` holding the replayed state —
    protocol, metaData, every live add, and one ``txn`` row per
    application watermark (so exactly-once streaming survives the JSON
    prefix being truncated/archived) — plus the ``_last_checkpoint``
    pointer.  Readers (this repo's and standard ones) then replay from
    the checkpoint instead of every JSON commit: the difference between
    O(commits) and O(1) metadata reads on a long-lived streaming table.
    Returns the checkpointed version.

    Remove tombstones are NOT carried (this writer never leaves a
    VACUUM-able tombstone window — data files become unreferenced only
    via overwrite/compaction commits that the checkpoint supersedes)."""
    from pyspark.sql import types as T

    from .delta import _snapshot
    from .fsio import (fs_delete, fs_rename, hadoop_fs, join_path,
                       write_text_atomic)

    root = str(path).rstrip("/")
    txns: dict = {}
    live, meta, version = _snapshot(spark, root, None, txns)

    schema = T.StructType([
        T.StructField("protocol", T.StructType([
            T.StructField("minReaderVersion", T.IntegerType()),
            T.StructField("minWriterVersion", T.IntegerType()),
        ])),
        T.StructField("metaData", T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("format", T.StructType([
                T.StructField("provider", T.StringType()),
                T.StructField("options",
                              T.MapType(T.StringType(), T.StringType())),
            ])),
            T.StructField("schemaString", T.StringType()),
            T.StructField("partitionColumns",
                          T.ArrayType(T.StringType())),
            T.StructField("configuration",
                          T.MapType(T.StringType(), T.StringType())),
            T.StructField("createdTime", T.LongType()),
        ])),
        T.StructField("add", T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("partitionValues",
                          T.MapType(T.StringType(), T.StringType(),
                                    True)),
            T.StructField("size", T.LongType()),
            T.StructField("modificationTime", T.LongType()),
            T.StructField("dataChange", T.BooleanType()),
        ])),
        T.StructField("txn", T.StructType([
            T.StructField("appId", T.StringType()),
            T.StructField("version", T.LongType()),
        ])),
    ])
    rows = [
        ((int(meta.get("__minReader", 1)) if False else 1, 2),
         None, None, None),
        (None, (meta.get("id"),
                ((meta.get("format") or {}).get("provider", "parquet"),
                 dict((meta.get("format") or {}).get("options") or {})),
                meta["schemaString"],
                list(meta.get("partitionColumns") or []),
                dict(meta.get("configuration") or {}),
                meta.get("createdTime")), None, None),
    ]
    for p, (pv, dv) in sorted(live.items()):
        if dv is not None:
            raise NotImplementedError(
                f"checkpoint_delta: {root} has deletion vectors — "
                "checkpointing DV descriptors is connector-jar territory"
            )
        rows.append((None, None,
                     (quote(p, safe="/=-"), dict(pv), 0, 0, False), None))
    for app, v in sorted(txns.items()):
        rows.append((None, None, None, (app, int(v))))

    log_dir = join_path(root, "_delta_log")
    tmp = join_path(log_dir, f".ckpt_tmp_{uuid.uuid4().hex}")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(tmp)
    fs, htmp = hadoop_fs(spark, tmp)
    part = next(
        st.getPath() for st in fs.listStatus(htmp)
        if st.getPath().getName().startswith("part-")
    )
    dest = join_path(log_dir, f"{version:020d}.checkpoint.parquet")
    fs_rename(spark, part.toString(), dest)
    fs_delete(spark, tmp, recursive=True)
    write_text_atomic(
        spark, join_path(log_dir, "_last_checkpoint"),
        json.dumps({"version": version, "size": len(rows)}),
    )
    return version


def optimize_delta(spark, path: str, min_files: int = 2) -> int | None:
    """Compact small files (the OPTIMIZE operation): for every
    partition holding at least ``min_files`` live data files, rewrite
    them as one file and commit the swap with ``dataChange=false`` —
    streams tailing the table see no new data, history stays
    time-travelable, and the next scan reads one file per partition
    instead of one per micro-batch (the streaming-sink steady state
    that otherwise degrades a 100 TB table into millions of tiny
    files).  Returns the committed version, or None when nothing
    qualified.  The rewrite reads ONLY the affected files — work scales
    with compactable bytes, not table size."""
    from .delta import _snapshot, read_delta
    from .fsio import fs_delete, fs_exists, fs_mkdirs, fs_rename, join_path

    root = str(path).rstrip("/")
    live, meta, version = _snapshot(spark, root, None)
    if any(dv is not None for _pv, dv in live.values()):
        raise NotImplementedError(
            f"optimize_delta: {root} has deletion vectors — compaction "
            "must materialize them first (connector-jar territory)"
        )
    by_part: dict[tuple, list] = {}
    for p, (pv, _dv) in live.items():
        by_part.setdefault(tuple(sorted(pv.items())), []).append(p)
    todo = {k: sorted(v) for k, v in by_part.items()
            if len(v) >= max(2, min_files)}
    if not todo:
        return None

    part_cols = list(meta.get("partitionColumns") or [])
    adds, removes = [], []
    for pv_items, files in sorted(todo.items()):
        pv = dict(pv_items)
        src = spark.read.parquet(*[join_path(root, p) for p in files])
        staging = join_path(root, f"_staging_{uuid.uuid4().hex}")
        src.coalesce(1).write.mode("overwrite").parquet(staging)
        staged = _list_staged(spark, staging, [])
        if len(staged) != 1:
            fs_delete(spark, staging, recursive=True)
            raise RuntimeError(
                f"optimize_delta: expected 1 staged file, got {len(staged)}"
            )
        rel, size, mtime, _ = staged[0]
        seg = "/".join(
            f"{k}={'__HIVE_DEFAULT_PARTITION__' if v is None else quote(str(v), safe='')}"
            for k, v in ((c, pv.get(c)) for c in part_cols)
        )
        fname = f"part-00000-{uuid.uuid4()}.snappy.parquet"
        final_rel = f"{seg}/{fname}" if seg else fname
        dest = join_path(root, final_rel)
        fs_mkdirs(spark, dest.rsplit("/", 1)[0])
        fs_rename(spark, join_path(staging, rel), dest)
        fs_delete(spark, staging, recursive=True)
        adds.append({"path": quote(final_rel, safe="/=-"),
                     "partitionValues": pv, "size": int(size),
                     "modificationTime": int(mtime), "dataChange": False})
        removes.extend(files)

    for _attempt in range(_MAX_COMMIT_RETRIES):
        live_now, _meta, version = _snapshot(spark, root, None)
        gone = [p for p in removes if p not in live_now]
        if gone:
            raise RuntimeError(
                f"optimize_delta: {len(gone)} file(s) were removed "
                "concurrently (e.g. an overwrite) — aborting the compaction "
                "commit; the staged files are unreferenced garbage"
            )
        now_ms = int(time.time() * 1000)
        actions = [{"remove": {"path": quote(p, safe="/=-"),
                               "deletionTimestamp": now_ms,
                               "dataChange": False}}
                   for p in sorted(removes)]
        actions.extend({"add": a} for a in adds)
        actions.append({"commitInfo": {
            "timestamp": now_ms, "operation": "OPTIMIZE",
            "operationParameters": {},
            "engineInfo": "tidierdb_jl_spark jar-free writer",
        }})
        commit = join_path(root, "_delta_log", f"{version + 1:020d}.json")
        text = "\n".join(json.dumps(a, separators=(",", ":"))
                         for a in actions) + "\n"
        if _try_create(spark, commit, text):
            return version + 1
    raise RuntimeError(
        f"optimize_delta: lost the commit race {_MAX_COMMIT_RETRIES} "
        f"times at {root}"
    )


def _cow_guard(meta, live, root: str, op: str, part_cols):
    """Copy-on-write preconditions: no column mapping (new files would
    carry logical names a mapped table must not contain), no deletion
    vectors (rewriting a DV'd file must materialize its deletes
    first)."""
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none")
    if mode not in (None, "", "none"):
        raise NotImplementedError(
            f"{op}: {root} uses column mapping — copy-on-write rewrites "
            "need physical-name writes (connector-jar territory)"
        )
    if any(dv is not None for _pv, dv in live.values()):
        raise NotImplementedError(
            f"{op}: {root} has deletion vectors — rewriting DV'd files "
            "must materialize the deletes first (connector-jar territory)"
        )


def _commit_actions(spark, root: str, build_actions) -> int:
    """Optimistic commit loop shared by the row-level ops:
    ``build_actions(live, meta, version) -> list`` is re-invoked per
    attempt against a fresh snapshot."""
    from .delta import _snapshot
    from .fsio import join_path

    for _attempt in range(_MAX_COMMIT_RETRIES):
        live, meta, version = _snapshot(spark, root, None)
        actions = build_actions(live, meta, version)
        commit = join_path(root, "_delta_log", f"{version + 1:020d}.json")
        text = "\n".join(json.dumps(a, separators=(",", ":"))
                         for a in actions) + "\n"
        if _try_create(spark, commit, text):
            return version + 1
    raise RuntimeError(
        f"lost the commit race {_MAX_COMMIT_RETRIES} times at {root}"
    )


def delete_delta(spark, path: str, predicate: str) -> int | None:
    """Row-level DELETE by copy-on-write: files containing rows matching
    ``predicate`` are rewritten WITHOUT those rows; untouched files stay
    (work scales with matching files, not table size — the predicate is
    pushed into the touched-file discovery scan).  Returns the committed
    version, or None when nothing matched.  History is preserved: time
    travel before the delete still sees the rows."""
    from pyspark.sql import functions as F

    from .delta import _snapshot, read_delta

    root = str(path).rstrip("/")
    live, meta, _version = _snapshot(spark, root, None)
    part_cols = list(meta.get("partitionColumns") or [])
    _cow_guard(meta, live, root, "delete_delta", part_cols)
    if not live:
        return None

    tf = read_delta(spark, root, _file_col="__cow_file")
    touched = [r[0] for r in tf.df.where(F.expr(predicate))
               .select("__cow_file").distinct().collect()]
    if not touched:
        return None
    by_base = {p.rsplit("/", 1)[-1]: p for p in live}
    touched_paths = sorted(by_base[b] for b in touched)

    survivors = (
        tf.df.where(F.col("__cow_file").isin(touched))
        .where(~F.expr(predicate))
        .drop("__cow_file")
    )
    adds = _stage_batch(spark, root, survivors, part_cols)

    def build(live_now, _meta, _version):
        gone = [p for p in touched_paths if p not in live_now]
        if gone:
            raise RuntimeError(
                f"delete_delta: {len(gone)} touched file(s) changed "
                "concurrently — aborting; staged files are unreferenced "
                "garbage"
            )
        now_ms = int(time.time() * 1000)
        acts = [{"remove": {"path": quote(p, safe="/=-"),
                            "deletionTimestamp": now_ms,
                            "dataChange": True}} for p in touched_paths]
        acts.extend({"add": a} for a in adds)
        acts.append({"commitInfo": {
            "timestamp": now_ms, "operation": "DELETE",
            "operationParameters": {"predicate": predicate},
            "engineInfo": "tidierdb_jl_spark jar-free writer"}})
        return acts

    return _commit_actions(spark, root, build)


def merge_delta(spark, path: str, updates_tf, key) -> int:
    """UPSERT by copy-on-write (the MERGE ``WHEN MATCHED UPDATE SET * /
    WHEN NOT MATCHED INSERT *`` shape): rows whose ``key`` matches an
    update are replaced by it, new keys append.  Only files containing
    matched keys are rewritten — discovery is one broadcast semi-join of
    the distinct update keys against the scan, so work scales with the
    matched files plus the update batch, never the table.  The update
    batch must be unique per key (checked — an ambiguous MERGE must not
    pick a winner silently) and schema-identical to the table.  Returns
    the committed version."""
    from pyspark.sql import functions as F

    from .delta import _snapshot, read_delta

    root = str(path).rstrip("/")
    live, meta, _version = _snapshot(spark, root, None)
    part_cols = list(meta.get("partitionColumns") or [])
    _cow_guard(meta, live, root, "merge_delta", part_cols)
    keys = [key] if isinstance(key, str) else list(key)
    updates = updates_tf.df if hasattr(updates_tf, "df") else updates_tf
    if _schema_fingerprint(meta["schemaString"]) != \
            _schema_fingerprint(updates.schema.json()):
        raise ValueError(
            f"merge_delta: update batch schema does not match the table "
            f"schema at {root}"
        )
    dup = (updates.groupBy(*keys).count().where("count > 1").limit(1)
           .collect())
    if dup:
        raise ValueError(
            f"merge_delta: update batch has duplicate keys (e.g. "
            f"{tuple(dup[0][k] for k in keys)}) — an ambiguous MERGE "
            "must not pick a winner silently"
        )

    tf = read_delta(spark, root, _file_col="__cow_file")
    ukeys = updates.select(*keys).distinct()
    touched = [r[0] for r in
               tf.df.join(F.broadcast(ukeys), keys, "left_semi")
               .select("__cow_file").distinct().collect()]
    by_base = {p.rsplit("/", 1)[-1]: p for p in live}
    touched_paths = sorted(by_base[b] for b in touched)

    survivors = (
        tf.df.where(F.col("__cow_file").isin(touched))
        .join(F.broadcast(ukeys), keys, "left_anti")
        .drop("__cow_file")
        if touched else None
    )
    new_data = (survivors.unionByName(updates) if survivors is not None
                else updates)
    adds = _stage_batch(spark, root, new_data, part_cols)

    def build(live_now, _meta, _version):
        gone = [p for p in touched_paths if p not in live_now]
        if gone:
            raise RuntimeError(
                f"merge_delta: {len(gone)} touched file(s) changed "
                "concurrently — aborting; staged files are unreferenced "
                "garbage"
            )
        now_ms = int(time.time() * 1000)
        acts = [{"remove": {"path": quote(p, safe="/=-"),
                            "deletionTimestamp": now_ms,
                            "dataChange": True}} for p in touched_paths]
        acts.extend({"add": a} for a in adds)
        acts.append({"commitInfo": {
            "timestamp": now_ms, "operation": "MERGE",
            "operationParameters": {"matchedPredicate": ",".join(keys)},
            "engineInfo": "tidierdb_jl_spark jar-free writer"}})
        return acts

    return _commit_actions(spark, root, build)


def vacuum_delta(spark, path: str, retain_hours: float = 168.0,
                 dry_run: bool = False) -> list:
    """Garbage-collect data files no longer referenced by the CURRENT
    snapshot (standard VACUUM semantics): a candidate is deleted when it
    is (a) not live, (b) not inside ``_delta_log``, and (c) older than
    ``retain_hours`` by filesystem modification time — the retention
    window protects in-flight readers of recent versions, concurrent
    writers' staging dirs, and time travel within the window.  Time
    travel PAST the window stops working for vacuumed versions, exactly
    as with connector-jar VACUUM.  Returns the deleted (or, with
    ``dry_run``, the would-be-deleted) paths.

    Driver-side file listing is O(files) metadata — the same footprint
    as the live list itself; row data is never read."""
    import time as _time

    from .delta import _snapshot
    from .fsio import fs_delete, hadoop_fs

    root = str(path).rstrip("/")
    live, _meta, _version = _snapshot(spark, root, None)
    keep = {p for p in live}
    cutoff_ms = (_time.time() - retain_hours * 3600.0) * 1000.0

    fs, hroot = hadoop_fs(spark, root)
    qroot = fs.makeQualified(hroot).toString()
    victims, stack = [], [hroot]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            p = st.getPath()
            name = p.getName()
            rel = p.toString()[len(qroot):].lstrip("/")
            if rel == "_delta_log" or rel.startswith("_delta_log/"):
                continue
            if st.isDirectory():
                stack.append(p)
                continue
            if rel in keep:
                continue
            if st.getModificationTime() >= cutoff_ms:
                continue  # within retention — may still be read/committed
            victims.append(rel)
    if not dry_run:
        for rel in victims:
            fs_delete(spark, f"{root}/{rel}", recursive=False)
    return sorted(victims)


def describe_history(spark, path: str) -> list[dict]:
    """Table history, newest first: one dict per commit with
    ``version``, ``timestamp`` (ms), ``operation`` and
    ``operationParameters`` from the commitInfo action (None for
    commits without one), plus the counts of add/remove actions —
    the DESCRIBE HISTORY introspection surface.  Driver-side,
    metadata-sized (reads only the JSON commits; checkpointed-away
    versions are reported from the checkpoint horizon)."""
    from .delta import _log_entries
    from .fsio import fs_exists, join_path, read_text

    root = str(path).rstrip("/")
    log_dir = join_path(root, "_delta_log")
    if not fs_exists(spark, log_dir):
        raise ValueError(f"{root} is not a Delta table (no _delta_log/)")
    out = []
    for v, kind, name in _log_entries(spark, log_dir):
        if kind != "json":
            continue
        info, n_add, n_remove = None, 0, 0
        for line in read_text(spark, join_path(log_dir, name)).splitlines():
            if not line.strip():
                continue
            d = json.loads(line)
            if "commitInfo" in d:
                info = d["commitInfo"]
            n_add += "add" in d
            n_remove += "remove" in d
        out.append({
            "version": v,
            "timestamp": (info or {}).get("timestamp"),
            "operation": (info or {}).get("operation"),
            "operationParameters": (info or {}).get(
                "operationParameters"),
            "num_added_files": n_add,
            "num_removed_files": n_remove,
        })
    return sorted(out, key=lambda d: -d["version"])
