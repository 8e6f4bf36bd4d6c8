"""Round-12 Delta writer hardening (sources/delta_writer.py).

Covers the r11-ADVICE fixes and the r12 scope extensions:

- checkpoints carry REAL add sizes/mtimes (PROTOCOL.md requires
  ``add.size``; standard readers plan splits from it), the table's
  protocol action VERBATIM (no downgrade), remove tombstones (VACUUM
  retention must survive JSON-prefix truncation) and deletionVector
  descriptors;
- VACUUM retention keys on the remove tombstone's deletionTimestamp,
  not the data file's mtime, and protects live DV sidecars;
- an empty PARTITIONED micro-batch is a metadata-only commit, not a
  crash;
- copy-on-write DELETE/MERGE materialize deletion vectors and write
  physical names + parquet field ids on column-mapped (flat) tables;
- OPTIMIZE skips DV'd files instead of refusing;
- merge's update-key join is size-aware (broadcast only small batches);
- the VACUUM listing distributes per partition directory.

Fixtures are hand-built from the public protocol (PROTOCOL.md), same
strategy as tests/test_delta.py.
"""

import json
import os
import uuid

import pytest

from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources.delta_writer import (
    checkpoint_delta, delete_delta, merge_delta, optimize_delta,
    vacuum_delta, write_delta,
)

from test_delta import _PROTO, _commit, _meta, _write_parquet


def _tf(spark, rows, schema):
    from tidierdb_jl_spark.core import TidyFrame

    return TidyFrame(spark.createDataFrame(rows, schema))


def _pdf(tf_):
    return tf_.collect() if hasattr(tf_, "collect") else tf_.toPandas()


# ---- checkpoint contents -----------------------------------------------

def test_checkpoint_real_sizes_and_tombstones(spark, tmp_path):
    """The checkpoint's add rows must carry the files' REAL size and
    modificationTime (delta-spark plans parquet splits from add.size —
    zeros would read zero bytes once the JSON prefix is gone), and the
    remove tombstones of the overwrite must be carried so VACUUM
    retention survives prefix truncation."""
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a"), (2, "b")], "id long, v string"), root)
    write_delta(_tf(spark, [(3, "c")], "id long, v string"), root,
                mode="overwrite")
    v = checkpoint_delta(spark, root)
    ck = spark.read.parquet(
        os.path.join(root, "_delta_log", f"{v:020d}.checkpoint.parquet"))
    adds = [r.asDict(recursive=True)["add"]
            for r in ck.where("add IS NOT NULL").collect()]
    assert adds, "checkpoint lost the live add"
    for a in adds:
        real = os.path.getsize(os.path.join(root, a["path"]))
        assert a["size"] == real and a["size"] > 0
        assert a["modificationTime"] > 0
    removes = [r.asDict(recursive=True)["remove"]
               for r in ck.where("remove IS NOT NULL").collect()]
    # the overwrite tombstoned every v0 file: all parquet in the table
    # dir except the live add
    all_pq = {f for f in os.listdir(root) if f.endswith(".parquet")}
    assert {r["path"] for r in removes} == all_pq - {a["path"]
                                                     for a in adds}
    assert removes and all(r["deletionTimestamp"] > 0 for r in removes)
    proto = [r.asDict(recursive=True)["protocol"]
             for r in ck.where("protocol IS NOT NULL").collect()]
    assert proto == [{"minReaderVersion": 1, "minWriterVersion": 2,
                      "readerFeatures": None, "writerFeatures": None}]

    # truncate the JSON prefix: replay from the checkpoint alone still
    # reconstructs the table AND the tombstone keeps protecting the
    # removed file from an over-eager VACUUM
    for i in range(v + 1):
        os.remove(os.path.join(root, "_delta_log", f"{i:020d}.json"))
    got = read_delta(spark, root).collect()
    assert got["id"].tolist() == [3]
    assert vacuum_delta(spark, root, retain_hours=24.0, dry_run=True) == []


def test_checkpoint_preserves_elevated_protocol_and_dvs(spark, tmp_path):
    """Checkpointing a reader-v3 DV table must write THAT protocol (not
    a hardcoded (1,2) downgrade) and the DV descriptors — otherwise,
    once the JSON prefix is truncated, the loud feature gate is lost
    and the deleted rows come back."""
    from roaring_ref import encode_roaring_array, write_dv_file, z85_encode
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    f0 = uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(i,) for i in range(10)], "id long",
                   os.path.join(root, f0))
    blob, offs = write_dv_file([encode_roaring_array([1, 3, 4])])
    u = uuid.uuid4()
    os.makedirs(os.path.join(root, "ab"), exist_ok=True)
    with open(os.path.join(root, "ab", f"deletion_vector_{u}.bin"),
              "wb") as fh:
        fh.write(blob)
    dv = {"storageType": "u", "pathOrInlineDv": "ab" + z85_encode(u.bytes),
          "offset": offs[0],
          "sizeInBytes": len(encode_roaring_array([1, 3, 4])),
          "cardinality": 3}
    schema = T.StructType([T.StructField("id", T.LongType())])
    proto = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}}
    _commit(root, 0, [proto, _meta(schema.json()),
                      {"add": {"path": f0, "partitionValues": {},
                               "size": 1, "modificationTime": 1,
                               "dataChange": True,
                               "deletionVector": dv}}])
    assert sorted(read_delta(spark, root).collect()["id"]) == \
        [0, 2, 5, 6, 7, 8, 9]

    v = checkpoint_delta(spark, root)
    ck = spark.read.parquet(
        os.path.join(root, "_delta_log", f"{v:020d}.checkpoint.parquet"))
    prow = [r.asDict(recursive=True)["protocol"]
            for r in ck.where("protocol IS NOT NULL").collect()]
    assert prow[0]["minReaderVersion"] == 3
    assert prow[0]["readerFeatures"] == ["deletionVectors"]
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    got = sorted(read_delta(spark, root).collect()["id"])
    assert got == [0, 2, 5, 6, 7, 8, 9]


def test_checkpoint_refuses_without_protocol(spark, tmp_path):
    """A log whose replay never sees a protocol action cannot be
    checkpointed — inventing one could downgrade the table."""
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    f0 = uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(1,)], "id long", os.path.join(root, f0))
    schema = T.StructType([T.StructField("id", T.LongType())])
    _commit(root, 0, [_meta(schema.json()),
                      {"add": {"path": f0, "partitionValues": {},
                               "size": 1, "modificationTime": 1,
                               "dataChange": True}}])
    with pytest.raises(ValueError, match="protocol"):
        checkpoint_delta(spark, root)


# ---- vacuum retention --------------------------------------------------

def test_vacuum_keys_on_tombstone_not_mtime(spark, tmp_path):
    """A file CREATED long ago but REMOVED minutes ago is inside the
    retention window: in-flight readers of recent versions and time
    travel within the window still need it.  The old mtime heuristic
    deleted it immediately."""
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")], "id long, v string"), root)
    # sorted: os.listdir order is arbitrary, and a tiny batch may still
    # stage >1 part file (Spark writes a file per task)
    live0 = sorted(f for f in os.listdir(root) if f.endswith(".parquet"))
    # age the data file far past any retention window
    old = 1_000_000_000  # 2001, epoch seconds
    os.utime(os.path.join(root, live0[0]), (old, old))
    write_delta(_tf(spark, [(2, "b")], "id long, v string"), root,
                mode="overwrite")  # tombstones the old file NOW

    got = vacuum_delta(spark, root, retain_hours=24.0, dry_run=True)
    assert got == [], "recently-tombstoned file must survive retention"
    # time travel within the window still works
    assert read_delta(spark, root, version=0).collect()["id"].tolist() == [1]
    # zero retention admits the tombstone — now it goes
    gone = vacuum_delta(spark, root, retain_hours=0.0)
    assert gone == live0
    # an untracked orphan with an old mtime still ages out by mtime
    orphan = os.path.join(root, "_staging_dead", "junk.parquet")
    os.makedirs(os.path.dirname(orphan))
    open(orphan, "wb").close()
    os.utime(orphan, (old, old))
    got = vacuum_delta(spark, root, retain_hours=24.0)
    assert got == ["_staging_dead/junk.parquet"]


def test_vacuum_protects_live_dv_sidecar(spark, tmp_path):
    """DV sidecar .bin files never appear as add/remove actions; a
    sidecar referenced by the CURRENT snapshot must survive VACUUM even
    at zero retention with an ancient mtime."""
    from roaring_ref import encode_roaring_array, write_dv_file, z85_encode
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    f0 = uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(i,) for i in range(5)], "id long",
                   os.path.join(root, f0))
    bm = encode_roaring_array([0])
    blob, offs = write_dv_file([bm])
    u = uuid.uuid4()
    os.makedirs(os.path.join(root, "ab"), exist_ok=True)
    sidecar = os.path.join(root, "ab", f"deletion_vector_{u}.bin")
    with open(sidecar, "wb") as fh:
        fh.write(blob)
    os.utime(sidecar, (1_000_000_000, 1_000_000_000))
    dv = {"storageType": "u", "pathOrInlineDv": "ab" + z85_encode(u.bytes),
          "offset": offs[0], "sizeInBytes": len(bm), "cardinality": 1}
    schema = T.StructType([T.StructField("id", T.LongType())])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(schema.json()),
        {"add": {"path": f0, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True,
                 "deletionVector": dv}}])
    assert vacuum_delta(spark, root, retain_hours=0.0) == []
    assert os.path.exists(sidecar)
    assert sorted(read_delta(spark, root).collect()["id"]) == [1, 2, 3, 4]


def test_distributed_listing_matches_serial_walk(spark, tmp_path):
    """The per-partition-dir Spark listing returns exactly what a
    serial os.walk sees — 10⁴ files across 50 dirs, no row data read."""
    from tidierdb_jl_spark.sources.delta_writer import _list_table_files

    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"))
    open(os.path.join(root, "_delta_log", "x.json"), "w").close()
    expect = set()
    for d in range(50):
        dd = os.path.join(root, f"p={d}")
        os.makedirs(dd)
        for i in range(200):
            rel = f"p={d}/f{i:04d}.parquet"
            open(os.path.join(root, rel), "wb").close()
            expect.add(rel)
    open(os.path.join(root, "top.parquet"), "wb").close()
    expect.add("top.parquet")
    got = _list_table_files(spark, root)
    assert {rel for rel, _mt in got} == expect
    assert all(mt > 0 for _rel, mt in got)


# ---- empty partitioned micro-batch --------------------------------------

def test_empty_partitioned_batch_is_metadata_only_commit(spark, tmp_path):
    """Spark emits no files for a 0-row partitioned write; the commit
    must still happen (a streaming sink's empty micro-batch advances
    its txn watermark) instead of raising."""
    from tidierdb_jl_spark.sources.delta_writer import last_txn_version

    root = str(tmp_path / "tbl")
    schema = "id long, v string, lang string"
    write_delta(_tf(spark, [(1, "a", "en")], schema), root,
                partition_by="lang", txn=("app", 0))
    empty = _tf(spark, [], schema)
    v = write_delta(empty, root, partition_by="lang", txn=("app", 1))
    assert v == 1
    assert last_txn_version(spark, root, "app") == 1
    assert read_delta(spark, root).df.count() == 1
    # replaying the empty batch is still a no-op
    assert write_delta(empty, root, partition_by="lang",
                       txn=("app", 1)) == 1
    # a brand-new table from an empty partitioned batch: schema-only
    root2 = str(tmp_path / "new")
    assert write_delta(empty, root2, partition_by="lang") == 0
    got = read_delta(spark, root2)
    assert got.df.columns == ["id", "v", "lang"] and got.df.count() == 0


# ---- copy-on-write on DV-bearing tables ---------------------------------

def _build_dv_table_r12(spark, root):
    """Two files: a (ids 0..9, physical rows {1,3} deleted via keyed
    portable sidecar => live 0,2,4..9) and b (ids 10..14, no DV)."""
    from roaring_ref import encode_roaring_array, write_dv_file, z85_encode
    from pyspark.sql import types as T

    fa = "a-" + uuid.uuid4().hex + ".parquet"
    fb = "b-" + uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(i, f"t{i}") for i in range(10)],
                   "id long, txt string", os.path.join(root, fa))
    _write_parquet(spark, [(i, f"t{i}") for i in range(10, 15)],
                   "id long, txt string", os.path.join(root, fb))
    bm = encode_roaring_array([1, 3])
    blob, offs = write_dv_file([bm])
    u = uuid.uuid4()
    os.makedirs(os.path.join(root, "ab"), exist_ok=True)
    with open(os.path.join(root, "ab", f"deletion_vector_{u}.bin"),
              "wb") as fh:
        fh.write(blob)
    dv = {"storageType": "u", "pathOrInlineDv": "ab" + z85_encode(u.bytes),
          "offset": offs[0], "sizeInBytes": len(bm), "cardinality": 2}
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("txt", T.StringType())])
    def add(p, dvd=None):
        a = {"path": p, "partitionValues": {}, "size": 1,
             "modificationTime": 1, "dataChange": True}
        if dvd:
            a["deletionVector"] = dvd
        return {"add": a}
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(schema.json()), add(fa, dv), add(fb)])
    return fa, fb


def test_delete_on_dv_table_materializes(spark, tmp_path):
    """DELETE on a DV'd file rewrites it MINUS both the DV-deleted rows
    and the predicate rows, and retires the DV descriptor; the DV-free
    file with no matches is untouched."""
    from tidierdb_jl_spark.sources.delta import _snapshot

    root = str(tmp_path / "tbl")
    fa, fb = _build_dv_table_r12(spark, root)
    # live before: a -> 0,2,4..9 ; b -> 10..14
    v = delete_delta(spark, root, "id % 2 = 0")  # touches both files
    assert v == 1
    got = sorted(read_delta(spark, root).collect()["id"])
    assert got == [5, 7, 9, 11, 13]  # 1,3 were DV-dead, evens deleted
    live, _m, _v = _snapshot(spark, root, None)
    assert all(dv is None for _pv, dv in live.values()), \
        "rewritten files must carry no DV descriptor"
    # time travel to v0 still sees the DV-filtered original
    got0 = sorted(read_delta(spark, root, version=0).collect()["id"])
    assert got0 == [0, 2] + list(range(4, 15))


def test_merge_on_dv_table(spark, tmp_path):
    """MERGE into a DV'd table: matched keys replace (never resurrecting
    DV-deleted rows), new keys append."""
    root = str(tmp_path / "tbl")
    _build_dv_table_r12(spark, root)
    updates = _tf(spark, [(2, "U2"), (3, "U3"), (99, "U99")],
                  "id long, txt string")
    merge_delta(spark, root, updates, key="id")
    got = read_delta(spark, root).collect().sort_values("id")
    ids = got["id"].tolist()
    # id=3 was DV-deleted; MERGE's not-matched branch INSERTS it anew
    assert ids == [0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 99]
    by = dict(zip(got["id"], got["txt"]))
    assert by[2] == "U2" and by[3] == "U3" and by[99] == "U99"
    assert by[5] == "t5"


def test_optimize_skips_dv_files(spark, tmp_path):
    """OPTIMIZE must not read a DV'd file raw (it would resurrect the
    deleted rows) — it compacts the DV-free files and leaves DV'd ones
    live and filtered."""
    from tidierdb_jl_spark.sources.delta import _snapshot

    root = str(tmp_path / "tbl")
    fa, fb = _build_dv_table_r12(spark, root)
    # add two more DV-free files so compaction has work
    write_delta(_tf(spark, [(20, "t20")], "id long, txt string"), root)
    write_delta(_tf(spark, [(21, "t21")], "id long, txt string"), root)
    v = optimize_delta(spark, root, min_files=2)
    assert v is not None
    live, _m, _v = _snapshot(spark, root, None)
    dvd = [p for p, (_pv, dv) in live.items() if dv is not None]
    assert dvd == [fa], "the DV'd file must remain live and untouched"
    got = sorted(read_delta(spark, root).collect()["id"])
    assert got == [0, 2] + list(range(4, 15)) + [20, 21]


# ---- copy-on-write on column-mapped tables -------------------------------

def _build_mapped_table(spark, root):
    """Name-mode mapped table, flat schema, partitioned by lang:
    en -> (1,a),(2,b) ; fr -> (3,c).  Physical names col-*."""
    from pyspark.sql import types as T

    p_id, p_val, p_lang = "col-aa11", "col-bb22", "col-cc33"
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True,
             "metadata": {"delta.columnMapping.id": i + 1,
                          "delta.columnMapping.physicalName": pn}}
            for i, (n, t, pn) in enumerate([
                ("id", "long", p_id), ("val", "string", p_val),
                ("lang", "string", p_lang)])
        ],
    })
    f_en = "part0/" + uuid.uuid4().hex + ".parquet"
    f_fr = "part1/" + uuid.uuid4().hex + ".parquet"
    phys_ddl = f"`{p_id}` long, `{p_val}` string"
    _write_parquet(spark, [(1, "a"), (2, "b")], phys_ddl,
                   os.path.join(root, f_en))
    _write_parquet(spark, [(3, "c")], phys_ddl, os.path.join(root, f_fr))

    def add(p, lang):
        return {"add": {"path": p, "partitionValues": {p_lang: lang},
                        "size": 1, "modificationTime": 1,
                        "dataChange": True}}

    meta = {"metaData": {
        "id": str(uuid.uuid4()), "format": {"provider": "parquet"},
        "schemaString": schema_json, "partitionColumns": ["lang"],
        "configuration": {"delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "3"}}}
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta, add(f_en, "en"), add(f_fr, "fr")])
    return p_id, p_val, p_lang


def test_write_and_rowops_on_mapped_table(spark, tmp_path):
    """Append, DELETE and MERGE on a name-mode mapped table: new files
    carry PHYSICAL column names + parquet footer field ids, the log's
    partitionValues use the physical partition key, and the reader
    returns logical columns throughout."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    p_id, p_val, p_lang = _build_mapped_table(spark, root)

    write_delta(_tf(spark, [(4, "d", "de")], "id long, val string, "
                    "lang string"), root, partition_by="lang")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [1, 2, 3, 4]

    # the appended file: physical dir name, physical columns, field ids
    de_dirs = [d for d in os.listdir(root) if d == f"{p_lang}=de"]
    assert de_dirs, "partition dir must use the PHYSICAL partition name"
    de_file = next(
        os.path.join(root, de_dirs[0], f)
        for f in os.listdir(os.path.join(root, de_dirs[0]))
        if f.endswith(".parquet"))
    sch = pq.read_schema(de_file)
    assert sch.names == [p_id, p_val]
    assert sch.field(p_id).metadata[b"PARQUET:field_id"] == b"1"
    assert sch.field(p_val).metadata[b"PARQUET:field_id"] == b"2"

    delete_delta(spark, root, "id = 2")
    merge_delta(spark, root,
                _tf(spark, [(3, "C", "fr"), (9, "i", "it")],
                    "id long, val string, lang string"), key="id")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "val", "lang"]].values.tolist() == [
        [1, "a", "en"], [3, "C", "fr"], [4, "d", "de"], [9, "i", "it"]]
    # time travel across the row ops still resolves mapped names
    assert read_delta(spark, root, version=0).df.count() == 3


def test_mapped_nested_schema_still_refuses(spark, tmp_path):
    """Nested mapped schemas cannot get per-depth field ids through the
    DataFrame writer — the gate stays, naming the columns."""
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "c1"}},
            {"name": "obj", "nullable": True,
             "type": {"type": "struct", "fields": [
                 {"name": "x", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "c3"}}]},
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "c2"}},
        ],
    })
    f0 = uuid.uuid4().hex + ".parquet"
    spark.createDataFrame([(1, (2,))], "`c1` long, `c2` struct<`c3`: long>") \
        .coalesce(1).write.parquet(os.path.join(root, "tmpw"))
    import glob
    import shutil

    shutil.move(glob.glob(os.path.join(root, "tmpw", "part-*.parquet"))[0],
                os.path.join(root, f0))
    shutil.rmtree(os.path.join(root, "tmpw"))
    meta = {"metaData": {
        "id": str(uuid.uuid4()), "format": {"provider": "parquet"},
        "schemaString": schema_json, "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "name"}}}
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta, {"add": {"path": f0, "partitionValues": {}, "size": 1,
                       "modificationTime": 1, "dataChange": True}}])
    with pytest.raises(NotImplementedError, match="obj"):
        delete_delta(spark, root, "id = 1")


# ---- size-aware merge join ----------------------------------------------

def test_merge_shuffle_path_when_batch_large(spark, tmp_path, monkeypatch):
    """Above the key threshold the update-key join must NOT broadcast
    (a 10⁸-key backfill would OOM executors); forcing the threshold to
    0 exercises the shuffle path end-to-end with identical results."""
    import tidierdb_jl_spark.sources.delta_writer as dw

    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(i, f"t{i}") for i in range(20)],
                    "id long, txt string"), root)
    monkeypatch.setattr(dw, "_MERGE_BROADCAST_KEYS", 0)
    merge_delta(spark, root,
                _tf(spark, [(5, "U5"), (50, "U50")], "id long, txt string"),
                key="id")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == list(range(20)) + [50]
    assert dict(zip(got["id"], got["txt"]))[5] == "U5"


# ---- OPTIMIZE ZORDER BY (r12) ---------------------------------------------

def test_optimize_zorder_tightens_minmax_envelopes(spark, tmp_path):
    """Z-order clustering must measurably shrink the per-FILE (x, y)
    min-max bounding boxes versus the unsorted layout — the property
    parquet data skipping prunes on.  Content is hash-checked equal
    before/after, history stays time-travelable, and the commitInfo
    records the zOrderBy columns."""
    import random

    import pyarrow.parquet as pq

    from tidierdb_jl_spark.sources.delta_writer import describe_history

    rng = random.Random(7)
    rows = [(i, rng.randrange(10_000), rng.randrange(10_000))
            for i in range(20_000)]
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, rows, "id long, x long, y long"), root)

    def envelope_volume():
        vol, nfiles = 0.0, 0
        for f in os.listdir(root):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            nfiles += 1
            for rg in range(md.num_row_groups):
                stats = {md.row_group(rg).column(c).path_in_schema:
                         md.row_group(rg).column(c).statistics
                         for c in range(md.row_group(rg).num_columns)}
                sx, sy = stats["x"], stats["y"]
                vol += ((sx.max - sx.min + 1) * (sy.max - sy.min + 1))
        return vol, nfiles

    before, _ = envelope_volume()
    v = optimize_delta(spark, root, zorder_by=["x", "y"],
                       max_file_bytes=64 * 1024)
    assert v is not None
    # content identical (ids are a permutation-insensitive set)
    got = read_delta(spark, root).collect()
    assert sorted(got["id"]) == list(range(20_000))
    assert int(got["x"].sum()) == sum(r[1] for r in rows)
    after, nfiles = envelope_volume()
    # old files are tombstoned but still on disk — recompute over LIVE
    from tidierdb_jl_spark.sources.delta import _snapshot

    live, _m, _v = _snapshot(spark, root, None)
    vol_live = 0.0
    for p in live:
        md = pq.ParquetFile(os.path.join(root, p)).metadata
        for rg in range(md.num_row_groups):
            stats = {md.row_group(rg).column(c).path_in_schema:
                     md.row_group(rg).column(c).statistics
                     for c in range(md.row_group(rg).num_columns)}
            sx, sy = stats["x"], stats["y"]
            vol_live += ((sx.max - sx.min + 1) * (sy.max - sy.min + 1))
    assert len(live) > 1, "max_file_bytes must split the output"
    assert vol_live < before / 2, (vol_live, before)
    hist = describe_history(spark, root)
    assert hist[0]["operation"] == "OPTIMIZE"
    assert "x" in hist[0]["operationParameters"]["zOrderBy"]
    # time travel to the pre-zorder version still works
    assert read_delta(spark, root, version=0).df.count() == 20_000


def test_optimize_zorder_validates_columns(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a", "en")], "id long, v string, "
                    "lang string"), root, partition_by="lang")
    with pytest.raises(ValueError, match="zorder_by"):
        optimize_delta(spark, root, zorder_by=["lang"])  # partition col
    with pytest.raises(ValueError, match="zorder_by"):
        optimize_delta(spark, root, zorder_by=["nope"])


# ---- append-only tables + CHECK constraints (r12) --------------------------

def test_append_only_table_refuses_data_removal(spark, tmp_path):
    """PROTOCOL.md appendOnly: delta.appendOnly=true prohibits commits
    that remove table data — overwrite / DELETE / MERGE refuse; appends
    and OPTIMIZE (dataChange=false removes) stay legal."""
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")], "id long, v string"), root,
                configuration={"delta.appendOnly": "true"})
    write_delta(_tf(spark, [(2, "b")], "id long, v string"), root,
                mode="append")
    with pytest.raises(ValueError, match="append-only"):
        write_delta(_tf(spark, [(9, "z")], "id long, v string"), root,
                    mode="overwrite")
    with pytest.raises(ValueError, match="append-only"):
        delete_delta(spark, root, "id = 1")
    with pytest.raises(ValueError, match="append-only"):
        merge_delta(spark, root, _tf(spark, [(1, "X")],
                                     "id long, v string"), key="id")
    assert optimize_delta(spark, root, min_files=2) is not None
    got = read_delta(spark, root).collect()
    assert sorted(got["id"]) == [1, 2]


def test_check_constraints_enforced_on_write_and_merge(spark, tmp_path):
    """delta.constraints.* expressions gate every added row: violating
    appends/merges refuse naming the constraint and the row; NULL
    passes (SQL CHECK semantics); valid batches commit."""
    root = str(tmp_path / "tbl")
    cfg = {"delta.constraints.positive": "value > 0"}
    with pytest.raises(ValueError, match="positive"):
        write_delta(_tf(spark, [(1, -5.0)], "id long, value double"),
                    root, configuration=cfg)
    write_delta(_tf(spark, [(1, 5.0), (2, None)],
                    "id long, value double"), root, configuration=cfg)
    with pytest.raises(ValueError, match="positive"):
        write_delta(_tf(spark, [(3, 0.0)], "id long, value double"),
                    root, mode="append")
    write_delta(_tf(spark, [(3, 1.0)], "id long, value double"), root,
                mode="append")
    with pytest.raises(ValueError, match="positive"):
        merge_delta(spark, root, _tf(spark, [(3, -1.0)],
                                     "id long, value double"), key="id")
    merge_delta(spark, root, _tf(spark, [(3, 9.0)],
                                 "id long, value double"), key="id")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [1, 2, 3]
    assert got["value"].tolist()[2] == 9.0


def test_column_invariants_enforced(spark, tmp_path):
    """The delta.invariants field metadata (writer protocol v2) gates
    adds exactly like CHECK constraints — built as a hand-written
    schemaString, the form real tables carry."""
    import uuid as _uuid

    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "score", "type": "double", "nullable": True,
             "metadata": {"delta.invariants": json.dumps(
                 {"expression": {"expression": "score <= 1.0"}})}},
        ],
    })
    f0 = _uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(1, 0.5)], "id long, score double",
                   os.path.join(root, f0))
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": str(_uuid.uuid4()),
                      "format": {"provider": "parquet"},
                      "schemaString": schema_json,
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": f0, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}}])
    with pytest.raises(ValueError, match="invariant"):
        write_delta(_tf(spark, [(2, 1.5)], "id long, score double"),
                    root, mode="append")
    write_delta(_tf(spark, [(2, 0.9)], "id long, score double"), root,
                mode="append")
    assert read_delta(spark, root).df.count() == 2


def test_new_table_protocol_declares_writer_features(spark, tmp_path):
    """A table created with constraints must declare minWriterVersion 3
    and with CDF version 4 — so writers that cannot enforce the feature
    refuse instead of corrupting the table (PROTOCOL.md feature table)."""
    for cfg, expect in (
        (None, 2),
        ({"delta.constraints.c1": "id > 0"}, 3),
        ({"delta.enableChangeDataFeed": "true"}, 4),
        ({"delta.constraints.c1": "id > 0",
          "delta.enableChangeDataFeed": "true"}, 4),
    ):
        root = str(tmp_path / f"tbl_{expect}_{bool(cfg)}")
        write_delta(_tf(spark, [(1, "a")], "id long, v string"), root,
                    configuration=cfg)
        line = open(os.path.join(
            root, "_delta_log", f"{0:020d}.json")).readline()
        assert json.loads(line)["protocol"]["minWriterVersion"] == expect


def test_generated_columns_verified_on_write(spark, tmp_path):
    """delta.generationExpression field metadata: stored values must
    equal the expression (null-safe) — a drifting generated column is
    refused, a consistent one commits."""
    import uuid as _uuid

    root = str(tmp_path / "tbl")
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "id2", "type": "long", "nullable": True,
             "metadata": {"delta.generationExpression": "id * 2"}},
        ],
    })
    f0 = _uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(1, 2)], "id long, id2 long",
                   os.path.join(root, f0))
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {"id": str(_uuid.uuid4()),
                      "format": {"provider": "parquet"},
                      "schemaString": schema_json,
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": f0, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}}])
    with pytest.raises(ValueError, match="generated"):
        write_delta(_tf(spark, [(5, 11)], "id long, id2 long"), root,
                    mode="append")
    write_delta(_tf(spark, [(5, 10), (None, None)],
                    "id long, id2 long"), root, mode="append")
    got = read_delta(spark, root).collect()
    assert len(got) == 3
