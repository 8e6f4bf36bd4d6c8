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

NOT implemented (loud): writer features beyond protocol 2 (deletion
vectors, column mapping, CDF...), MERGE/UPDATE/DELETE row-level ops,
and checkpoints (readers replay JSON commits; a thousand-commit table
should be checkpointed by a connector-jar writer).
"""

from __future__ import annotations

import json
import time
import uuid
from urllib.parse import quote, unquote

__all__ = ["write_delta", "last_txn_version"]

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
    from .fsio import fs_delete, fs_exists, fs_mkdirs, fs_rename, join_path

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

    # 1. stage the data as plain parquet inside the table root
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

    # 2. move files to their final names under the table root.  Names
    # get a FRESH uuid per file (what delta-spark does): Spark reuses
    # one job uuid across partition dirs, so staged basenames collide
    # across dirs — and readers (this repo's included) key per-file
    # metadata by the uuid-unique basename
    adds = []
    for i, (rel, size, mtime, pv) in enumerate(staged):
        parent_rel = rel.rsplit("/", 1)[0] if "/" in rel else ""
        fname = f"part-{i:05d}-{uuid.uuid4()}.snappy.parquet"
        final_rel = f"{parent_rel}/{fname}" if parent_rel else fname
        dest = join_path(root, final_rel)
        parent = dest.rsplit("/", 1)[0]
        fs_mkdirs(spark, parent)
        fs_rename(spark, join_path(staging, rel), dest)
        adds.append({
            "path": quote(final_rel, safe="/=-"),
            "partitionValues": pv,
            "size": int(size),
            "modificationTime": int(mtime),
            "dataChange": True,
        })
    fs_delete(spark, staging, recursive=True)

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
