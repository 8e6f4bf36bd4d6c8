"""Jar-free Iceberg reader (sources/iceberg.py + sources/avro_lite.py).

No iceberg jar and no Avro wheel in this image, so the fixtures are
built BY HAND from the public specs: the Avro container files through
the independently spec-written encoder in ``tests/avro_ref.py``, the
metadata JSON / manifest chain per the Iceberg table spec.  Decoder vs
independent encoder agreement + the Avro spec's own zigzag vectors are
the correctness evidence (the repo's codec strategy).
"""

import json
import os
import uuid

import pytest

from avro_ref import write_container, zigzag
from tidierdb_jl_spark.sources.avro_lite import decode_avro_container
from tidierdb_jl_spark.sources.iceberg import read_iceberg


def test_zigzag_spec_vectors():
    """The Avro specification's own int encoding examples."""
    from tidierdb_jl_spark.sources.avro_lite import _Reader

    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
               2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, b in vectors.items():
        assert zigzag(n) == b, n                       # encoder side
        assert _Reader(b).varint() == n, n             # decoder side


def test_avro_roundtrip_all_types():
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "fx8", "size": 2}},
            {"name": "e", "type": {"type": "enum", "name": "col",
                                   "symbols": ["red", "green"]}},
            {"name": "u", "type": ["null", "long", "string"]},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "nest", "type": {"type": "record", "name": "n2",
                                      "fields": [{"name": "x",
                                                  "type": "long"}]}},
        ],
    }
    rows = [
        {"b": True, "i": -7, "l": 1 << 40, "f": 0.5, "d": -2.25,
         "s": "héllo", "by": b"\x00\xff", "fx": b"ab", "e": "green",
         "u": None, "arr": [1, -2, 3], "m": {"k": "v"}, "nest": {"x": 9}},
        {"b": False, "i": 0, "l": -1, "f": 1.0, "d": 0.0, "s": "",
         "by": b"", "fx": b"cd", "e": "red", "u": "str-branch",
         "arr": [], "m": {}, "nest": {"x": -9}},
    ]
    for codec in ("null", "deflate"):
        meta, got = decode_avro_container(
            write_container(schema, rows, codec=codec))
        assert got == rows, codec
    # corrupt sync -> loud error
    raw = bytearray(write_container(schema, rows))
    raw[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        decode_avro_container(bytes(raw))


# ---- Iceberg fixtures -------------------------------------------------

_MANIFEST_ENTRY = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
            ]}},
    ],
}
_MANIFEST_FILE = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int"},
    ],
}


def _data_file(spark, rows, dest):
    spark.createDataFrame(rows, "id long, val string").coalesce(1) \
        .write.parquet(dest + ".tmp")
    import glob
    import shutil

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(glob.glob(dest + ".tmp/part-*.parquet")[0], dest)
    shutil.rmtree(dest + ".tmp")


def _build_table(root, spark):
    """v2 table, two snapshots: snap 1 = {f0}, snap 2 = f0 deleted,
    f1+f2 added (so time travel and DELETED-entry handling both
    exercise)."""
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    files = {}
    for name, rows in (("f0", [(1, "a"), (2, "b")]), ("f1", [(3, "c")]),
                       ("f2", [(4, "d")])):
        rel = f"data/{name}-{uuid.uuid4().hex}.parquet"
        _data_file(spark, rows, os.path.join(root, rel))
        files[name] = f"{root}/{rel}"

    def manifest(n, entries):
        p = os.path.join(root, "metadata", f"m{n}.avro")
        recs = [{"status": st,
                 "data_file": {"content": 0, "file_path": files[f],
                               "file_format": "PARQUET", "record_count": 1}}
                for st, f in entries]
        with open(p, "wb") as fh:
            fh.write(write_container(_MANIFEST_ENTRY, recs, codec="deflate"))
        return f"{root}/metadata/m{n}.avro"

    def mlist(n, paths, content=0):
        p = os.path.join(root, "metadata", f"snap-{n}.avro")
        recs = [{"manifest_path": mp, "manifest_length": 1,
                 "content": content} for mp in paths]
        with open(p, "wb") as fh:
            fh.write(write_container(_MANIFEST_FILE, recs))
        return f"{root}/metadata/snap-{n}.avro"

    m1 = manifest(1, [(1, "f0")])
    m2 = manifest(2, [(2, "f0"), (1, "f1"), (1, "f2")])
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": root,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "val", "required": False, "type": "string"},
        ]}],
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": mlist(1, [m1])},
            {"snapshot-id": 2, "manifest-list": mlist(2, [m2])},
        ],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    return meta


def test_iceberg_snapshot_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _build_table(root, spark)
    now = read_iceberg(spark, root).collect().sort_values("id")
    assert now[["id", "val"]].values.tolist() == [[3, "c"], [4, "d"]]
    v1 = read_iceberg(spark, root, snapshot_id=1).collect().sort_values("id")
    assert v1[["id", "val"]].values.tolist() == [[1, "a"], [2, "b"]]
    with pytest.raises(ValueError, match="snapshot 99 not found"):
        read_iceberg(spark, root, snapshot_id=99)
    with pytest.raises(ValueError, match="not an Iceberg table"):
        read_iceberg(spark, str(tmp_path / "nope"))


def test_iceberg_moved_table_paths_reroot(spark, tmp_path):
    """Manifest/data paths recorded under the table's ORIGINAL location
    re-root under the current one (the reference passes
    allow_moved_paths=true to duckdb for exactly this)."""
    orig = str(tmp_path / "orig" / "tbl")
    _build_table(orig, spark)
    import shutil

    moved = str(tmp_path / "moved" / "tbl")
    os.makedirs(os.path.dirname(moved), exist_ok=True)
    shutil.move(orig, moved)  # absolute paths inside now point at orig/
    now = read_iceberg(spark, moved).collect().sort_values("id")
    assert now[["id", "val"]].values.tolist() == [[3, "c"], [4, "d"]]


def test_iceberg_delete_gates_and_db_table_fallback(spark, tmp_path):
    root = str(tmp_path / "tbl")
    meta = _build_table(root, spark)
    # a delete manifest whose entries are NOT position deletes (content=0
    # data files under a content=1 manifest) -> loud refusal, and
    # equality deletes gate by name below (test_iceberg_position_deletes)
    from avro_ref import write_container as wc

    dl = os.path.join(root, "metadata", "snap-del.avro")
    with open(dl, "wb") as fh:
        fh.write(wc(_MANIFEST_FILE, [{"manifest_path": f"{root}/metadata/m2.avro",
                                      "manifest_length": 1, "content": 1}]))
    meta["snapshots"].append({"snapshot-id": 3,
                              "manifest-list": f"{root}/metadata/snap-del.avro"})
    meta["current-snapshot-id"] = 3
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(ValueError, match="expected 1=position or 2=equality"):
        read_iceberg(spark, root)
    # time travel back past the delete snapshot still works
    ok = read_iceberg(spark, root, snapshot_id=2)
    assert ok.df.count() == 2
    # db_table(iceberg=True) falls back to this reader without jars
    from tidierdb_jl_spark.sources.readers import db_table

    tf = db_table(spark, root, iceberg=True, snapshot_id=2)
    assert tf.df.count() == 2 and set(tf.columns) == {"id", "val"}


def test_catalog_style_metadata_names(spark, tmp_path):
    """Catalog-style layouts name metadata ``00001-<uuid>.metadata.json``
    and ship WITHOUT version-hint.text — the leading integer is the
    version and the newest must win (an unparsed name used to score 0 and
    let listing order pick a stale snapshot)."""
    import shutil

    root = str(tmp_path / "tbl")
    meta = _build_table(root, spark)
    mdir = os.path.join(root, "metadata")
    os.remove(os.path.join(mdir, "version-hint.text"))
    # stale v1-content under a LOW catalog name, current under a HIGH one
    stale = dict(meta, **{"current-snapshot-id": 1})
    with open(os.path.join(mdir, f"00000-{uuid.uuid4().hex}.metadata.json"),
              "w") as fh:
        json.dump(stale, fh)
    shutil.move(os.path.join(mdir, "v1.metadata.json"),
                os.path.join(mdir, f"00001-{uuid.uuid4().hex}.metadata.json"))
    now = read_iceberg(spark, root).collect().sort_values("id")
    assert now[["id", "val"]].values.tolist() == [[3, "c"], [4, "d"]]
    # two files claiming the same version -> refuse, don't pick one
    with open(os.path.join(mdir, f"00001-{uuid.uuid4().hex}.metadata.json"),
              "w") as fh:
        json.dump(stale, fh)
    with pytest.raises(ValueError, match="multiple metadata files"):
        read_iceberg(spark, root)


def test_mixed_format_live_set_refused(spark, tmp_path):
    """PARQUET+ORC in one live set must refuse loudly: the scan is one
    distributed read, and ORC files through the parquet reader are a
    footer error at best."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    pq = f"data/{uuid.uuid4().hex}.parquet"
    _data_file(spark, [(1, "a")], os.path.join(root, pq))
    orc_rel = f"data/{uuid.uuid4().hex}.orc"
    dest = os.path.join(root, orc_rel)
    spark.createDataFrame([(2, "b")], "id long, val string").coalesce(1) \
        .write.orc(dest + ".tmp")
    import glob
    import shutil

    shutil.move(glob.glob(dest + ".tmp/part-*.orc")[0], dest)
    shutil.rmtree(dest + ".tmp")

    recs = [{"status": 1, "data_file": {
        "content": 0, "file_path": f"{root}/{p}",
        "file_format": f, "record_count": 1}}
        for p, f in ((pq, "PARQUET"), (orc_rel, "ORC"))]
    with open(os.path.join(root, "metadata", "m1.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_ENTRY, recs))
    with open(os.path.join(root, "metadata", "snap-1.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_FILE, [
            {"manifest_path": f"{root}/metadata/m1.avro",
             "manifest_length": 1, "content": 0}]))
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "val", "required": False, "type": "string"}]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": f"{root}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    with pytest.raises(NotImplementedError, match="single-format"):
        read_iceberg(spark, root)


def test_iceberg_position_deletes(spark, tmp_path):
    """v2 POSITION deletes: delete files are parquet (file_path, pos)
    pairs; the named ordinals disappear from the scan, equality deletes
    still refuse, and a moved table (delete files recording the ORIGINAL
    absolute data paths) still matches via basenames."""
    root = str(tmp_path / "orig" / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    rel = f"data/{uuid.uuid4().hex}.parquet"
    _data_file(spark, [(i, chr(97 + i)) for i in range(8)],
               os.path.join(root, rel))
    data_path = f"{root}/{rel}"

    # position delete file: kill ordinals 1, 4, 6 of the data file
    del_rel = f"data/{uuid.uuid4().hex}-deletes.parquet"
    spark.createDataFrame([(data_path, p) for p in (1, 4, 6)],
                          "file_path string, pos long") \
        .coalesce(1).write.parquet(os.path.join(root, del_rel) + ".tmp")
    import glob
    import shutil

    shutil.move(glob.glob(os.path.join(root, del_rel) + ".tmp/part-*.parquet")[0],
                os.path.join(root, del_rel))
    shutil.rmtree(os.path.join(root, del_rel) + ".tmp")

    def manifest(name, content, file_format="PARQUET", fp=None, st=1):
        p = os.path.join(root, "metadata", name)
        with open(p, "wb") as fh:
            fh.write(write_container(_MANIFEST_ENTRY, [
                {"status": st, "data_file": {
                    "content": content, "file_path": fp,
                    "file_format": file_format, "record_count": 3}}]))
        return f"{root}/metadata/{name}"

    m_data = manifest("m-data.avro", 0, fp=data_path)
    m_del = manifest("m-del.avro", 1, fp=f"{root}/{del_rel}")
    mlist_p = os.path.join(root, "metadata", "snap-1.avro")
    with open(mlist_p, "wb") as fh:
        fh.write(write_container(_MANIFEST_FILE, [
            {"manifest_path": m_data, "manifest_length": 1, "content": 0},
            {"manifest_path": m_del, "manifest_length": 1, "content": 1}]))
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "val", "required": False, "type": "string"}]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": f"{root}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [0, 2, 3, 5, 7]

    # moved table: delete-file file_path values still point at orig/
    moved = str(tmp_path / "moved" / "tbl")
    os.makedirs(os.path.dirname(moved), exist_ok=True)
    shutil.move(root, moved)
    got2 = read_iceberg(spark, moved).collect().sort_values("id")
    assert got2["id"].tolist() == [0, 2, 3, 5, 7]

    # an equality delete (content=2) without equality_ids is malformed
    with open(os.path.join(moved, "metadata", "m-del.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_ENTRY, [
            {"status": 1, "data_file": {
                "content": 2, "file_path": f"{moved}/{del_rel}",
                "file_format": "PARQUET", "record_count": 3}}]))
    with pytest.raises(ValueError, match="equality_ids"):
        read_iceberg(spark, moved)

    # a DELETED-status delete-file entry stops applying
    with open(os.path.join(moved, "metadata", "m-del.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_ENTRY, [
            {"status": 2, "data_file": {
                "content": 1, "file_path": f"{moved}/{del_rel}",
                "file_format": "PARQUET", "record_count": 3}}]))
    assert read_iceberg(spark, moved).df.count() == 8


def test_iceberg_orc_data_files(spark, tmp_path):
    """An all-ORC live set routes through spark.read.orc and returns the
    same relation (the reader's format gate is single-format, not
    parquet-only)."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    rel = f"data/{uuid.uuid4().hex}.orc"
    dest = os.path.join(root, rel)
    spark.createDataFrame([(i, chr(97 + i)) for i in range(5)],
                          "id long, val string").coalesce(1) \
        .write.orc(dest + ".tmp")
    import glob
    import shutil

    shutil.move(glob.glob(dest + ".tmp/part-*.orc")[0], dest)
    shutil.rmtree(dest + ".tmp")
    with open(os.path.join(root, "metadata", "m1.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_ENTRY, [
            {"status": 1, "data_file": {
                "content": 0, "file_path": f"{root}/{rel}",
                "file_format": "ORC", "record_count": 5}}]))
    with open(os.path.join(root, "metadata", "snap-1.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_FILE, [
            {"manifest_path": f"{root}/metadata/m1.avro",
             "manifest_length": 1, "content": 0}]))
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "val", "required": False, "type": "string"}]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": f"{root}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got[["id", "val"]].values.tolist() == [
        [i, chr(97 + i)] for i in range(5)]


def test_iceberg_equality_deletes(spark, tmp_path):
    """v2 EQUALITY deletes (r10): delete rows remove data rows matching
    on the equality_ids columns (null matches null), but ONLY from data
    files with a strictly smaller data sequence number — a re-insert
    after the delete survives.  Sequence numbers inherit from the
    manifest-list entry for ADDED rows; unresolvable sequence numbers
    gate loudly."""
    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "equality_ids",
                     "type": ["null", {"type": "array", "items": "int"}]},
                ]}}]}
    mlist_schema = {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "content", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"]}]}

    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    # data file A (seq 1): ids 1..4 with val a..d; one NULL val row (id 9)
    # data file B (seq 3): re-inserts id 2 (post-delete) + id 5
    def pq(rows, rel, schema="id long, val string"):
        dest = os.path.join(root, rel)
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(dest + ".tmp")
        import glob
        import shutil

        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(glob.glob(dest + ".tmp/part-*.parquet")[0], dest)
        shutil.rmtree(dest + ".tmp")
        return f"{root}/{rel}"

    fa = pq([(1, "a"), (2, "b"), (3, "c"), (4, "d"), (9, None)],
            f"data/{uuid.uuid4().hex}.parquet")
    fb = pq([(2, "b"), (5, "e")], f"data/{uuid.uuid4().hex}.parquet")
    # equality delete (seq 2) on id: kills ids 2, 9 — and a val IS NULL
    # delete via a second file on the val column
    d_id = pq([(2,), (9,)], f"data/{uuid.uuid4().hex}-eqdel.parquet",
              schema="id long")
    d_val = pq([(None,)], f"data/{uuid.uuid4().hex}-eqdel2.parquet",
               schema="val string")

    def manifest(name, recs):
        p = os.path.join(root, "metadata", name)
        with open(p, "wb") as fh:
            fh.write(write_container(entry_schema, recs))
        return f"{root}/metadata/{name}"

    def entry(content, fp, n, ids=None, seq=None):
        return {"status": 1, "sequence_number": seq,
                "data_file": {"content": content, "file_path": fp,
                              "file_format": "PARQUET", "record_count": n,
                              "equality_ids": ids}}

    # seq inheritance: data entries carry null seq -> inherit manifest's
    m_a = manifest("m-a.avro", [entry(0, fa, 5)])
    m_b = manifest("m-b.avro", [entry(0, fb, 2)])
    # the id-delete inherits seq 2; the val-delete has an EXPLICIT seq 2
    m_d = manifest("m-d.avro", [entry(2, d_id, 2, ids=[1]),
                                entry(2, d_val, 1, ids=[2], seq=2)])
    with open(os.path.join(root, "metadata", "snap-1.avro"), "wb") as fh:
        fh.write(write_container(mlist_schema, [
            {"manifest_path": m_a, "manifest_length": 1, "content": 0,
             "sequence_number": 1},
            {"manifest_path": m_b, "manifest_length": 1, "content": 0,
             "sequence_number": 3},
            {"manifest_path": m_d, "manifest_length": 1, "content": 1,
             "sequence_number": 2}]))
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "val", "required": False, "type": "string"}]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": f"{root}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    tf = read_iceberg(spark, root)
    got = tf.collect().sort_values("id")
    # from A (seq 1 < 2): ids 2, 9 deleted by the id-delete; the NULL-val
    # row 9 ALSO matches the val-delete (null matches null).  B (seq 3)
    # is untouched: its id=2 re-insert survives.
    assert got[["id", "val"]].values.tolist() == [
        [1, "a"], [2, "b"], [3, "c"], [4, "d"], [5, "e"]]
    # r11: the manifests' record counts say the delete side is tiny, so
    # the anti-joins must be DETERMINISTICALLY broadcast (not left for
    # AQE to rediscover): 2 equality-ids groups + the seq maps
    from tidierdb_jl_spark import plan_summary

    summ = plan_summary(tf)
    assert summ["broadcast_joins"] >= 2 and summ["sortmerge_joins"] == 0

    # unresolvable data-file sequence number + equality deletes -> gate
    m_a2 = manifest("m-a2.avro", [entry(0, fa, 5)])  # status=0, no seq
    with open(os.path.join(root, "metadata", "snap-2.avro"), "wb") as fh:
        fh.write(write_container(mlist_schema, [
            {"manifest_path": m_a2, "manifest_length": 1, "content": 0,
             "sequence_number": None},
            {"manifest_path": m_d, "manifest_length": 1, "content": 1,
             "sequence_number": 2}]))
    meta["snapshots"].append({"snapshot-id": 2,
                              "manifest-list": f"{root}/metadata/snap-2.avro"})
    meta["current-snapshot-id"] = 2
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(NotImplementedError, match="sequence number"):
        read_iceberg(spark, root)


def test_iceberg_v3_deletion_vectors(spark, tmp_path):
    """Iceberg v3 DVs: content=1 PUFFIN manifest entries reference a
    roaring blob (offset/size) inside a Puffin file; the named ordinals
    of the referenced data file disappear from the scan; integrity
    gates (CRC, size, cardinality) refuse loudly; parquet position
    deletes from a pre-v3 writer coexist in the same snapshot."""
    from roaring_ref import iceberg_dv_blob, write_puffin

    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "referenced_data_file",
                     "type": ["null", "string"]},
                    {"name": "content_offset", "type": ["null", "long"]},
                    {"name": "content_size_in_bytes",
                     "type": ["null", "long"]},
                ]}}]}

    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    def pq(rows, rel):
        dest = os.path.join(root, rel)
        spark.createDataFrame(rows, "id long, val string").coalesce(1) \
            .write.parquet(dest + ".tmp")
        import glob
        import shutil

        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(glob.glob(dest + ".tmp/part-*.parquet")[0], dest)
        shutil.rmtree(dest + ".tmp")
        return f"{root}/{rel}"

    # file A: ids 0..9 sorted; DV kills ordinals {1, 4, 6}
    # file B: ids 10..14; parquet position delete kills ordinal 0 (id 10)
    fa = pq([(i, chr(97 + i)) for i in range(10)],
            f"data/{uuid.uuid4().hex}.parquet")
    fb = pq([(i, chr(97 + i)) for i in range(10, 15)],
            f"data/{uuid.uuid4().hex}.parquet")
    blob = iceberg_dv_blob([1, 4, 6])
    puffin, spans = write_puffin([blob])
    puf_rel = f"data/{uuid.uuid4().hex}-deletes.puffin"
    with open(os.path.join(root, puf_rel), "wb") as fh:
        fh.write(puffin)
    off, ln = spans[0]
    del_rel = f"data/{uuid.uuid4().hex}-posdel.parquet"
    spark.createDataFrame([(fb, 0)], "file_path string, pos long") \
        .coalesce(1).write.parquet(os.path.join(root, del_rel) + ".tmp")
    import glob
    import shutil

    shutil.move(glob.glob(os.path.join(root, del_rel) + ".tmp/part-*.parquet")[0],
                os.path.join(root, del_rel))
    shutil.rmtree(os.path.join(root, del_rel) + ".tmp")

    def manifest(name, recs):
        p = os.path.join(root, "metadata", name)
        with open(p, "wb") as fh:
            fh.write(write_container(entry_schema, recs))
        return f"{root}/metadata/{name}"

    def dentry(content, fp, fmt="PARQUET", n=1, ref=None, off=None, ln=None):
        return {"status": 1, "data_file": {
            "content": content, "file_path": fp, "file_format": fmt,
            "record_count": n, "referenced_data_file": ref,
            "content_offset": off, "content_size_in_bytes": ln}}

    m_data = manifest("m-data.avro", [dentry(0, fa, n=10),
                                      dentry(0, fb, n=5)])
    m_del = manifest("m-del.avro", [
        dentry(1, f"{root}/{puf_rel}", fmt="PUFFIN", n=3, ref=fa,
               off=off, ln=ln),
        dentry(1, f"{root}/{del_rel}", n=1)])
    with open(os.path.join(root, "metadata", "snap-1.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_FILE, [
            {"manifest_path": m_data, "manifest_length": 1, "content": 0},
            {"manifest_path": m_del, "manifest_length": 1, "content": 1}]))
    meta = {
        "format-version": 3, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "val", "required": False, "type": "string"}]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": f"{root}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [0, 2, 3, 5, 7, 8, 9, 11, 12, 13, 14]

    # integrity: flip a bitmap byte inside the blob -> CRC refusal
    bad = bytearray(puffin)
    bad[off + 10] ^= 0xFF
    with open(os.path.join(root, puf_rel), "wb") as fh:
        fh.write(bytes(bad))
    with pytest.raises(Exception, match="CRC-32|cardinality|magic"):
        read_iceberg(spark, root).collect()
    with open(os.path.join(root, puf_rel), "wb") as fh:
        fh.write(puffin)  # restore

    # format-version 4 still refuses
    meta["format-version"] = 4
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg(spark, root)


def test_iceberg_v3_column_defaults(spark, tmp_path):
    """v3 COLUMN DEFAULTS (r11, spec "Default values"): a field added
    with ``initial-default`` fills that value for rows from data files
    whose footer LACKS the field, while files containing it keep stored
    values — including genuine NULLs (the distinction a union-schema
    null-fill would erase).  Composes with position deletes; a missing
    field with no default still refuses."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    def pq(rows, rel, schema):
        dest = os.path.join(root, rel)
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(dest + ".tmp")
        import glob
        import shutil

        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(glob.glob(dest + ".tmp/part-*.parquet")[0], dest)
        shutil.rmtree(dest + ".tmp")
        return f"{root}/{rel}"

    # f_old predates the score/tag/since columns; f_new has them, with a
    # genuine NULL score on id=11
    f_old = pq([(1, "a"), (2, "b")], f"data/{uuid.uuid4().hex}.parquet",
               "id long, val string")
    f_new = pq([(10, "x", 9.5, "real", "2030-05-06"),
                (11, "y", None, None, None)],
               f"data/{uuid.uuid4().hex}.parquet",
               "id long, val string, score double, tag string, "
               "since string")
    # position delete killing ordinal 0 of f_old (id=1) proves defaults
    # compose with the row-index machinery across the grouped union
    d_pos = pq([(f_old, 0)], f"data/{uuid.uuid4().hex}-del.parquet",
               "file_path string, pos long")

    def manifest(name, content, fp, n):
        p = os.path.join(root, "metadata", name)
        with open(p, "wb") as fh:
            fh.write(write_container(_MANIFEST_ENTRY, [
                {"status": 1, "data_file": {
                    "content": content, "file_path": fp,
                    "file_format": "PARQUET", "record_count": n}}]))
        return f"{root}/metadata/{name}"

    m_old = manifest("m-old.avro", 0, f_old, 2)
    m_new = manifest("m-new.avro", 0, f_new, 2)
    m_del = manifest("m-del.avro", 1, d_pos, 1)
    with open(os.path.join(root, "metadata", "snap-1.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_FILE, [
            {"manifest_path": m_old, "manifest_length": 1, "content": 0},
            {"manifest_path": m_new, "manifest_length": 1, "content": 0},
            {"manifest_path": m_del, "manifest_length": 1, "content": 1}]))
    fields = [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "val", "required": False, "type": "string"},
        {"id": 3, "name": "score", "required": False, "type": "double",
         "initial-default": 3.25, "write-default": 3.25},
        {"id": 4, "name": "tag", "required": False, "type": "string",
         "initial-default": "unset"},
        {"id": 5, "name": "since", "required": False, "type": "string",
         "initial-default": "2026-01-01"},
    ]
    meta = {
        "format-version": 3, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct",
                     "fields": fields}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": f"{root}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    got = read_iceberg(spark, root).collect().sort_values("id")
    assert list(got.columns) == ["id", "val", "score", "tag", "since"]
    rows = {int(r.id): (r.val, r.score, r.tag, r.since)
            for r in got.itertuples(index=False)}
    assert 1 not in rows  # position-deleted
    assert rows[2] == ("b", 3.25, "unset", "2026-01-01")  # defaults fill
    assert rows[10] == ("x", 9.5, "real", "2030-05-06")   # stored values
    v, s, t, d = rows[11]
    import pandas as pd

    assert v == "y" and pd.isna(s) and t is None and d is None  # real NULLs

    # a field missing from a NO-id file with NO default still refuses
    # (rename vs added column is indistinguishable without field ids)
    meta2 = json.loads(json.dumps(meta))
    del meta2["schemas"][0]["fields"][3]["initial-default"]
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta2, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(NotImplementedError, match="field ids"):
        read_iceberg(spark, root)


def test_iceberg_field_id_resolution(spark, tmp_path):
    """r11 spec-exact column projection: columns resolve BY FIELD ID
    from the parquet footers (PARQUET:field_id), so renames and even
    NAME SWAPS project correctly; a field id absent from an id-carrying
    file null-fills when optional and refuses when required."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    def id_field(name, typ, fid):
        return pa.field(name, typ, metadata={b"PARQUET:field_id":
                                             str(fid).encode()})

    # the file was written when id-1 was called "alpha" and id-2 "beta";
    # the CURRENT schema SWAPS the names: id 1 -> "beta", id 2 -> "alpha"
    sch = pa.schema([id_field("alpha", pa.int64(), 1),
                     id_field("beta", pa.string(), 2)])
    rel = f"data/{uuid.uuid4().hex}.parquet"
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    pq.write_table(
        pa.table({"alpha": [10, 20], "beta": ["x", "y"]}, schema=sch),
        os.path.join(root, rel))

    def manifest(name, fp):
        p = os.path.join(root, "metadata", name)
        with open(p, "wb") as fh:
            fh.write(write_container(_MANIFEST_ENTRY, [
                {"status": 1, "data_file": {
                    "content": 0, "file_path": fp,
                    "file_format": "PARQUET", "record_count": 2}}]))
        return f"{root}/metadata/{name}"

    m = manifest("m1.avro", f"{root}/{rel}")
    with open(os.path.join(root, "metadata", "snap-1.avro"), "wb") as fh:
        fh.write(write_container(_MANIFEST_FILE, [
            {"manifest_path": m, "manifest_length": 1, "content": 0}]))
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "beta", "required": False, "type": "long"},
            {"id": 2, "name": "alpha", "required": False,
             "type": "string"},
            {"id": 3, "name": "added", "required": False,
             "type": "double"},
        ]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": f"{root}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    got = read_iceberg(spark, root).collect().sort_values("beta")
    assert list(got.columns) == ["beta", "alpha", "added"]
    # id-resolution: "beta" carries the file's id-1 ints, "alpha" the
    # id-2 strings — name matching would have swapped them (or crashed)
    assert got["beta"].tolist() == [10, 20]
    assert got["alpha"].tolist() == ["x", "y"]
    # id 3 absent + optional + no default -> NULL fill, no gate
    assert got["added"].isna().all()

    # REQUIRED absent field refuses
    meta2 = json.loads(json.dumps(meta))
    meta2["schemas"][0]["fields"][2]["required"] = True
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta2, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(ValueError, match="REQUIRED"):
        read_iceberg(spark, root)


def test_identity_partition_metadata_fill(spark, tmp_path):
    """Spec "Column Projection" rule 1: a field ABSENT from a data file
    whose id sources an IDENTITY partition transform fills from the
    file's partition metadata — writers may omit identity source
    columns from data files; null-filling them is wrong answers.
    Files that DO carry the column keep stored values."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    # file A: carries only (id, val) — lang omitted, en partition
    rel_a = f"data/{uuid.uuid4().hex}.parquet"
    _data_file(spark, [(1, "a"), (2, "b")], os.path.join(root, rel_a))
    # file B: carries all three columns (fr partition)
    rel_b = f"data/{uuid.uuid4().hex}.parquet"
    import glob as _glob
    import shutil as _shutil

    tmp = os.path.join(root, rel_b) + ".tmp"
    spark.createDataFrame([(3, "c", "stored-fr")],
                          "id long, val string, lang string") \
        .coalesce(1).write.parquet(tmp)
    _shutil.move(_glob.glob(tmp + "/part-*.parquet")[0],
                 os.path.join(root, rel_b))
    _shutil.rmtree(tmp)

    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": [
                            {"name": "lang",
                             "type": ["null", "string"]}]}},
                ]}},
        ],
    }
    mpath = os.path.join(root, "metadata", "m-1.avro")
    with open(mpath, "wb") as fh:
        fh.write(write_container(entry_schema, [
            {"status": 1, "data_file": {
                "content": 0, "file_path": f"{root}/{rel_a}",
                "file_format": "PARQUET", "record_count": 2,
                "partition": {"lang": "en"}}},
            {"status": 1, "data_file": {
                "content": 0, "file_path": f"{root}/{rel_b}",
                "file_format": "PARQUET", "record_count": 1,
                "partition": {"lang": "fr"}}},
        ]))
    mlist = os.path.join(root, "metadata", "snap-1.avro")
    with open(mlist, "wb") as fh:
        fh.write(write_container(_MANIFEST_FILE, [
            {"manifest_path": mpath, "manifest_length": 1,
             "content": 0}]))
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": root, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "val", "required": False,
             "type": "string"},
            {"id": 3, "name": "lang", "required": False,
             "type": "string"}]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "lang", "transform": "identity", "source-id": 3,
             "field-id": 1000}]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1,
                       "manifest-list": mlist}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write("1")

    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got[["id", "val", "lang"]].values.tolist() == [
        [1, "a", "en"], [2, "b", "en"], [3, "c", "stored-fr"]]
