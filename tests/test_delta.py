"""Jar-free Delta Lake reader (sources/delta.py).

The image has no delta-spark connector, so the test builds Delta tables
BY HAND from the public protocol spec (PROTOCOL.md: JSON commit lines,
checkpoint parquet, _last_checkpoint pointer) — the same independent-
artifact strategy as the codec tests — and asserts the reader
reconstructs each snapshot exactly.
"""

import json
import os
import uuid

import pytest

from tidierdb_jl_spark.sources.delta import read_delta


def _write_parquet(spark, rows, schema, dest):
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(dest + ".tmp")
    import glob
    import shutil

    part = glob.glob(dest + ".tmp/part-*.parquet")[0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(dest + ".tmp")


def _commit(root, version, actions):
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _meta(schema_json, part_cols=()):
    return {"metaData": {"id": str(uuid.uuid4()), "format": {"provider": "parquet"},
                         "schemaString": schema_json,
                         "partitionColumns": list(part_cols),
                         "configuration": {}}}


_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _build_partitioned(spark, root):
    """v0: two partitions (en: ids 1,2; fr: id 3).  v1: overwrite the en
    file (remove+add: ids 1,2 -> 1,2,4) and add a de partition (id 5)."""
    from pyspark.sql import types as T

    full = T.StructType([T.StructField("id", T.LongType()),
                         T.StructField("val", T.StringType()),
                         T.StructField("lang", T.StringType())])
    data_schema = "id long, val string"
    f_en0 = "lang=en/" + uuid.uuid4().hex + ".parquet"
    f_fr0 = "lang=fr/" + uuid.uuid4().hex + ".parquet"
    f_en1 = "lang=en/" + uuid.uuid4().hex + ".parquet"
    f_de1 = "lang=de/" + uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(1, "a"), (2, "b")], data_schema,
                   os.path.join(root, f_en0))
    _write_parquet(spark, [(3, "c")], data_schema, os.path.join(root, f_fr0))
    _write_parquet(spark, [(1, "a"), (2, "b"), (4, "d")], data_schema,
                   os.path.join(root, f_en1))
    _write_parquet(spark, [(5, "e")], data_schema, os.path.join(root, f_de1))

    def add(p, lang):
        return {"add": {"path": p, "partitionValues": {"lang": lang},
                        "size": 1, "modificationTime": 1, "dataChange": True}}

    _commit(root, 0, [_PROTO, _meta(full.json(), ["lang"]),
                      add(f_en0, "en"), add(f_fr0, "fr")])
    _commit(root, 1, [{"remove": {"path": f_en0, "dataChange": True}},
                      add(f_en1, "en"), add(f_de1, "de")])
    return full


def test_partitioned_snapshot_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _build_partitioned(spark, root)
    now = read_delta(spark, root).collect().sort_values("id")
    assert now[["id", "val", "lang"]].values.tolist() == [
        [1, "a", "en"], [2, "b", "en"], [3, "c", "fr"],
        [4, "d", "en"], [5, "e", "de"]]
    v0 = read_delta(spark, root, version=0).collect().sort_values("id")
    assert v0[["id", "val", "lang"]].values.tolist() == [
        [1, "a", "en"], [2, "b", "en"], [3, "c", "fr"]]
    with pytest.raises(ValueError, match="out of range"):
        read_delta(spark, root, version=7)


def test_db_table_delta_falls_back_to_log_reader(spark, tmp_path):
    from tidierdb_jl_spark.sources.readers import db_table

    root = str(tmp_path / "tbl")
    _build_partitioned(spark, root)
    tf = db_table(spark, root, delta=True)  # no jars -> pure log replay
    assert tf.df.count() == 5
    assert set(tf.columns) == {"id", "val", "lang"}


def test_unpartitioned_with_checkpoint(spark, tmp_path):
    """Checkpoint parquet + _last_checkpoint replaces the JSON prefix:
    delete the pre-checkpoint JSONs and the snapshot must still
    reconstruct (checkpoint carries protocol/metaData/add rows)."""
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("val", T.StringType())])
    f0, f1, f2 = (uuid.uuid4().hex + ".parquet" for _ in range(3))
    for f, rows in ((f0, [(1, "a")]), (f1, [(2, "b")]), (f2, [(3, "c")])):
        _write_parquet(spark, rows, "id long, val string",
                       os.path.join(root, f))

    def add(p):
        return {"add": {"path": p, "partitionValues": {}, "size": 1,
                        "modificationTime": 1, "dataChange": True}}

    _commit(root, 0, [_PROTO, _meta(schema.json()), add(f0)])
    _commit(root, 1, [add(f1), {"remove": {"path": f0, "dataChange": True}}])

    # checkpoint at v1: live = {f1}, plus protocol + metaData rows
    log = os.path.join(root, "_delta_log")
    ck_schema = (
        "add struct<path:string, partitionValues:map<string,string>, "
        "size:long, modificationTime:long, dataChange:boolean>, "
        "remove struct<path:string>, "
        "metaData struct<id:string, schemaString:string, "
        "partitionColumns:array<string>>, "
        "protocol struct<minReaderVersion:int, minWriterVersion:int>"
    )
    meta = _meta(schema.json())["metaData"]
    rows = [
        ((f1, {}, 1, 1, True), None, None, None),
        (None, None, (meta["id"], meta["schemaString"], []), None),
        (None, None, None, (1, 2)),
    ]
    _write_parquet(spark, rows, ck_schema,
                   os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": 3}, fh)
    os.remove(os.path.join(log, f"{0:020d}.json"))  # truncate the prefix

    _commit(root, 2, [add(f2)])
    now = read_delta(spark, root).collect().sort_values("id")
    assert now[["id", "val"]].values.tolist() == [[2, "b"], [3, "c"]]
    # v2 via checkpoint+json; v0 is gone -> loud error
    with pytest.raises(ValueError, match="no longer reconstructible"):
        read_delta(spark, root, version=0)


def test_protocol_gate_refuses_unsupported_features(spark, tmp_path):
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    schema = T.StructType([T.StructField("id", T.LongType())])
    f0 = uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(1,)], "id long", os.path.join(root, f0))
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"]}},
        _meta(schema.json()),
        {"add": {"path": f0, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ])
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, root)
    # non-delta dir: clean error
    with pytest.raises(ValueError, match="not a Delta table"):
        read_delta(spark, str(tmp_path / "nope"))


def test_partition_filter_prunes_files_statically(spark, tmp_path):
    """partition_filter evaluates against the LOG's partitionValues
    before the scan exists: only matching files enter the plan (checked
    via inputFiles), and semantics are exact.  A .filter() on the frame
    cannot do this — the file list is fixed at plan time."""
    root = str(tmp_path / "tbl")
    _build_partitioned(spark, root)
    tf = read_delta(spark, root, partition_filter="lang = 'en'")
    got = tf.collect().sort_values("id")
    assert got[["id", "lang"]].values.tolist() == [
        [1, "en"], [2, "en"], [4, "en"]]
    files = tf.df.inputFiles()
    assert len(files) == 1 and "lang=en" in files[0]
    # typed comparison (not string-match): numeric predicates work too
    none = read_delta(spark, root, partition_filter="lang IN ('xx')")
    assert none.df.count() == 0
    with pytest.raises(ValueError, match="unpartitioned"):
        # the unpartitioned fixture from the checkpoint test
        up = str(tmp_path / "up")
        from pyspark.sql import types as T

        f0 = uuid.uuid4().hex + ".parquet"
        _write_parquet(spark, [(1, "a")], "id long, val string",
                       os.path.join(up, f0))
        schema = T.StructType([T.StructField("id", T.LongType()),
                               T.StructField("val", T.StringType())])
        _commit(up, 0, [_PROTO, _meta(schema.json()),
                        {"add": {"path": f0, "partitionValues": {},
                                 "size": 1, "modificationTime": 1,
                                 "dataChange": True}}])
        read_delta(spark, up, partition_filter="id = 1")
    # db_table passes the option through to the fallback reader
    from tidierdb_jl_spark.sources.readers import db_table

    via = db_table(spark, root, delta=True, partition_filter="lang = 'fr'")
    assert via.df.count() == 1 and via.df.inputFiles()[0].count("lang=fr")


def test_percent_encoded_paths_decode_and_reattach(spark, tmp_path):
    """PROTOCOL.md: add/remove paths are percent-encoded (RFC 2396).  A
    partition value with a space yields a dir like ``lang=en us/`` whose
    log path is ``lang=en%20us/...`` — the reader must decode it before
    joining to the root AND key the partition re-attach consistently
    with input_file_name()'s encoded URI (a mismatch used to silently
    drop every row of the file)."""
    from urllib.parse import quote

    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    full = T.StructType([T.StructField("id", T.LongType()),
                         T.StructField("val", T.StringType()),
                         T.StructField("lang", T.StringType())])
    rel = "lang=en us/" + uuid.uuid4().hex + "+x.parquet"
    _write_parquet(spark, [(1, "a"), (2, "b")], "id long, val string",
                   os.path.join(root, rel))
    enc = quote(rel)
    assert "%20" in enc  # the fixture really exercises the encoding
    _commit(root, 0, [_PROTO, _meta(full.json(), ["lang"]),
                      {"add": {"path": enc,
                               "partitionValues": {"lang": "en us"},
                               "size": 1, "modificationTime": 1,
                               "dataChange": True}}])
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "val", "lang"]].values.tolist() == [
        [1, "a", "en us"], [2, "b", "en us"]]
    # remove by the encoded path must match the decoded live key
    _commit(root, 1, [{"remove": {"path": enc, "dataChange": True}}])
    assert read_delta(spark, root).df.count() == 0


def test_log_gap_refused(spark, tmp_path):
    """A missing commit version mid-range (0,1,3) would silently skip
    that commit's add/remove actions — the reader must refuse."""
    root = str(tmp_path / "tbl")
    _build_partitioned(spark, root)  # commits 0, 1
    log = os.path.join(root, "_delta_log")
    os.rename(os.path.join(log, f"{1:020d}.json"),
              os.path.join(log, f"{1:020d}.json.hidden"))
    _commit(root, 2, [])  # now 0, 2 with 1 missing
    with pytest.raises(ValueError, match=r"gaps.*\[1\]"):
        read_delta(spark, root)
    # versionAsOf=0 stops before the gap and still works
    assert read_delta(spark, root, version=0).df.count() == 3


# ---- deletion vectors (round 10) --------------------------------------

def _dv_add(path, lang, dv):
    return {"add": {"path": path, "partitionValues": {"lang": lang},
                    "size": 1, "modificationTime": 1, "dataChange": True,
                    "deletionVector": dv}}


_DV_PROTO = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}}


def _build_dv_table(spark, root, inline_second=False):
    """Two partition files (en: ids 0..9, fr: ids 10..14).  v1 re-adds
    both with DVs: en physical rows {1,3,4} deleted via a 'u'-storage
    sidecar (with a random prefix), fr row {0} deleted inline ('i') or
    via an absolute-path sidecar ('p')."""
    import zlib as _zlib

    from roaring_ref import encode_roaring_array, write_dv_file, z85_encode
    from pyspark.sql import types as T

    full = T.StructType([T.StructField("id", T.LongType()),
                         T.StructField("lang", T.StringType())])
    f_en = "lang=en/" + uuid.uuid4().hex + ".parquet"
    f_fr = "lang=fr/" + uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(i,) for i in range(10)], "id long",
                   os.path.join(root, f_en))
    _write_parquet(spark, [(i,) for i in range(10, 15)], "id long",
                   os.path.join(root, f_fr))

    dv_en = encode_roaring_array([1, 3, 4])
    dv_fr = encode_roaring_array([0], force_run=True)
    u = uuid.uuid4()
    blob, offs = write_dv_file([dv_en])
    os.makedirs(os.path.join(root, "ab"), exist_ok=True)
    with open(os.path.join(root, "ab", f"deletion_vector_{u}.bin"),
              "wb") as fh:
        fh.write(blob)
    desc_en = {"storageType": "u", "pathOrInlineDv": "ab" + z85_encode(u.bytes),
               "offset": offs[0], "sizeInBytes": len(dv_en), "cardinality": 3}
    if inline_second:
        pad = (-len(dv_fr)) % 4
        desc_fr = {"storageType": "i",
                   "pathOrInlineDv": z85_encode(dv_fr + b"\x00" * pad),
                   "sizeInBytes": len(dv_fr), "cardinality": 1}
    else:
        blob2, offs2 = write_dv_file([dv_fr])
        abs_p = os.path.join(root, "standalone_dv.bin")
        with open(abs_p, "wb") as fh:
            fh.write(blob2)
        desc_fr = {"storageType": "p", "pathOrInlineDv": abs_p,
                   "offset": offs2[0], "sizeInBytes": len(dv_fr),
                   "cardinality": 1}
    _commit(root, 0, [_DV_PROTO, _meta(full.json(), ["lang"]),
                      {"add": {"path": f_en, "partitionValues":
                               {"lang": "en"}, "size": 1,
                               "modificationTime": 1, "dataChange": True}},
                      {"add": {"path": f_fr, "partitionValues":
                               {"lang": "fr"}, "size": 1,
                               "modificationTime": 1, "dataChange": True}}])
    _commit(root, 1, [{"remove": {"path": f_en, "dataChange": False}},
                      {"remove": {"path": f_fr, "dataChange": False}},
                      _dv_add(f_en, "en", desc_en),
                      _dv_add(f_fr, "fr", desc_fr)])
    return f_en, desc_en


def test_deletion_vectors_u_p_and_inline(spark, tmp_path):
    """PROTOCOL.md deletion vectors, all three storage types: physical
    row indexes from the roaring sidecar/inline bitmap are anti-filtered
    out of the scan; time travel to v0 still sees every row."""
    for inline in (False, True):
        root = str(tmp_path / f"tbl{int(inline)}")
        _build_dv_table(spark, root, inline_second=inline)
        got = read_delta(spark, root).collect().sort_values("id")
        assert got["id"].tolist() == [0, 2, 5, 6, 7, 8, 9, 11, 12, 13, 14]
        assert set(got["lang"]) == {"en", "fr"}
        v0 = read_delta(spark, root, version=0)
        assert v0.df.count() == 15
        # partition pruning composes with the DV filter
        fr = read_delta(spark, root, partition_filter="lang = 'fr'")
        assert fr.collect()["id"].tolist() == [11, 12, 13, 14]


def test_deletion_vector_integrity_gates(spark, tmp_path):
    """Corrupt CRC and wrong descriptor cardinality both fail the read
    loudly — a misread DV silently returning wrong rows is the one
    forbidden outcome."""
    root = str(tmp_path / "tbl")
    f_en, desc = _build_dv_table(spark, root)
    dv_path = os.path.join(
        root, "ab", os.listdir(os.path.join(root, "ab"))[0])
    blob = bytearray(open(dv_path, "rb").read())
    blob[desc["offset"] + 5] ^= 0xFF  # flip a data byte -> CRC mismatch
    with open(dv_path, "wb") as fh:
        fh.write(bytes(blob))
    with pytest.raises(Exception, match="CRC-32 mismatch"):
        read_delta(spark, root).collect()

    root2 = str(tmp_path / "tbl2")
    _build_dv_table(spark, root2)
    log = os.path.join(root2, "_delta_log")
    import json as _json

    acts = [_json.loads(x) for x in
            open(os.path.join(log, f"{1:020d}.json"))]
    for a in acts:
        dv = a.get("add", {}).get("deletionVector")
        if dv:
            dv["cardinality"] = dv["cardinality"] + 7
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write("\n".join(_json.dumps(a) for a in acts) + "\n")
    with pytest.raises(Exception, match="cardinality"):
        read_delta(spark, root2).collect()


# ---- column mapping (round 10) ----------------------------------------

def test_column_mapping_name_mode(spark, tmp_path):
    """PROTOCOL.md column mapping: data files + partitionValues use
    PHYSICAL names (col-<uuid>), the schemaString's per-field metadata
    carries the logical->physical map, and the reader returns LOGICAL
    columns.  Composes with partition re-attach, partition_filter and
    time travel; malformed (missing physicalName) and nested-mapped
    tables refuse loudly."""
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    p_id, p_val, p_lang = "col-aa11", "col-bb22", "col-cc33"
    fields = [
        ("id", "long", p_id), ("val", "string", p_val),
        ("lang", "string", p_lang),
    ]
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True,
             "metadata": {"delta.columnMapping.id": i + 1,
                          "delta.columnMapping.physicalName": pn}}
            for i, (n, t, pn) in enumerate(fields)
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
                        "size": 1, "modificationTime": 1, "dataChange": True}}

    meta = {"metaData": {
        "id": str(uuid.uuid4()), "format": {"provider": "parquet"},
        "schemaString": schema_json, "partitionColumns": ["lang"],
        "configuration": {"delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "3"}}}
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta, add(f_en, "en"), add(f_fr, "fr")])
    got = read_delta(spark, root).collect().sort_values("id")
    assert list(got.columns) == ["id", "val", "lang"]
    assert got.values.tolist() == [[1, "a", "en"], [2, "b", "en"],
                                   [3, "c", "fr"]]
    only_fr = read_delta(spark, root, partition_filter="lang = 'fr'")
    assert only_fr.collect()["id"].tolist() == [3]
    # time travel composes (v1 removes the fr file)
    _commit(root, 1, [{"remove": {"path": f_fr, "dataChange": True}}])
    assert read_delta(spark, root).df.count() == 2
    assert read_delta(spark, root, version=0).df.count() == 3

    # malformed: a field without physicalName metadata
    bad = json.loads(schema_json)
    del bad["fields"][1]["metadata"]["delta.columnMapping.physicalName"]
    meta2 = json.loads(json.dumps(meta))
    meta2["metaData"]["schemaString"] = json.dumps(bad)
    root2 = str(tmp_path / "bad")
    _write_parquet(spark, [(1, "a")], f"`{p_id}` long, `{p_val}` string",
                   os.path.join(root2, "f.parquet"))
    _commit(root2, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta2, {"add": {"path": "f.parquet", "partitionValues": {},
                        "size": 1, "modificationTime": 1,
                        "dataChange": True}}])
    with pytest.raises(ValueError, match="physicalName"):
        read_delta(spark, root2)

    # a mapped inner field missing its physicalName is malformed too,
    # and the raise names the full field path
    nested_bad = json.loads(schema_json)
    nested_bad["fields"][1] = {
        "name": "val", "nullable": True,
        "type": {"type": "struct", "fields": [
            {"name": "x", "type": "long", "nullable": True,
             "metadata": {}}]},
        "metadata": {"delta.columnMapping.id": 2,
                     "delta.columnMapping.physicalName": p_val}}
    meta3 = json.loads(json.dumps(meta))
    meta3["metaData"]["schemaString"] = json.dumps(nested_bad)
    root3 = str(tmp_path / "nestedbad")
    _write_parquet(spark, [(1,)], f"`{p_id}` long",
                   os.path.join(root3, "f.parquet"))
    _commit(root3, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta3, {"add": {"path": "f.parquet", "partitionValues": {},
                        "size": 1, "modificationTime": 1,
                        "dataChange": True}}])
    with pytest.raises(ValueError, match=r"'val'\.x"):
        read_delta(spark, root3)


@pytest.mark.parametrize("mode", ["name", "id"])
def test_column_mapping_nested_structs(spark, tmp_path, mode):
    """r11: column mapping with NESTED schemas — physical names at every
    depth (struct field, struct inside array, map value struct) restore
    to logical names exactly, composed with partition re-attach and a
    deletion vector.  PROTOCOL.md Column Mapping: both modes store
    physicalName metadata on every StructField; parquet files use the
    physical names at all levels."""
    import sys

    from pyspark.sql import types as T

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roaring_ref import encode_roaring_array, z85_encode

    root = str(tmp_path / "tbl")

    def fld(name, typ, pn, cid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.id": cid,
                             "delta.columnMapping.physicalName": pn}}

    inner = {"type": "struct", "fields": [
        fld("x", "long", "col-x9", 10),
        fld("y", "string", "col-y8", 11),
    ]}
    tag = {"type": "struct", "fields": [fld("t", "string", "col-t7", 12)]}
    schema_json = json.dumps({"type": "struct", "fields": [
        fld("id", "long", "col-id1", 1),
        fld("obj", inner, "col-obj2", 2),
        fld("tags", {"type": "array", "elementType": tag,
                     "containsNull": True}, "col-tags3", 3),
        fld("attrs", {"type": "map", "keyType": "string",
                      "valueType": inner, "valueContainsNull": True},
            "col-attrs4", 4),
        fld("lang", "string", "col-lang5", 5),
    ]})

    phys = T.StructType([
        T.StructField("col-id1", T.LongType()),
        T.StructField("col-obj2", T.StructType([
            T.StructField("col-x9", T.LongType()),
            T.StructField("col-y8", T.StringType())])),
        T.StructField("col-tags3", T.ArrayType(T.StructType([
            T.StructField("col-t7", T.StringType())]))),
        T.StructField("col-attrs4", T.MapType(
            T.StringType(), T.StructType([
                T.StructField("col-x9", T.LongType()),
                T.StructField("col-y8", T.StringType())]))),
    ])
    rows = [
        (1, (10, "a"), [("p",), ("q",)], {"k": (7, "z")}),
        (2, (20, "b"), [], {}),
        (3, (30, "c"), None, None),
    ]
    f_en = "p0/" + uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, rows, phys, os.path.join(root, f_en))

    # a DV deleting physical row 1 (id=2) proves mapping composes with
    # the row-index anti-join
    dv_bytes = encode_roaring_array([1])
    dv = {"storageType": "i", "pathOrInlineDv": z85_encode(
        dv_bytes + b"\x00" * (-len(dv_bytes) % 4)),
        "offset": None, "sizeInBytes": len(dv_bytes), "cardinality": 1}
    meta = {"metaData": {
        "id": str(uuid.uuid4()), "format": {"provider": "parquet"},
        "schemaString": schema_json, "partitionColumns": ["lang"],
        "configuration": {"delta.columnMapping.mode": mode,
                          "delta.columnMapping.maxColumnId": "12"}}}
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping",
                                         "deletionVectors"],
                      "writerFeatures": ["columnMapping",
                                         "deletionVectors"]}},
        meta,
        {"add": {"path": f_en, "partitionValues": {"col-lang5": "en"},
                 "size": 1, "modificationTime": 1, "dataChange": True,
                 "deletionVector": dv}}])

    tf = read_delta(spark, root)
    assert [f.name for f in tf.df.schema.fields] == [
        "id", "obj", "tags", "attrs", "lang"]
    obj_t = tf.df.schema["obj"].dataType
    assert [f.name for f in obj_t.fields] == ["x", "y"]
    assert [f.name
            for f in tf.df.schema["tags"].dataType.elementType.fields] == \
        ["t"]
    assert [f.name
            for f in tf.df.schema["attrs"].dataType.valueType.fields] == \
        ["x", "y"]
    got = tf.df.orderBy("id").collect()
    assert [r["id"] for r in got] == [1, 3]  # physical row 1 DV-deleted
    assert got[0]["obj"].asDict() == {"x": 10, "y": "a"}
    assert [t["t"] for t in got[0]["tags"]] == ["p", "q"]
    assert got[0]["attrs"]["k"].asDict() == {"x": 7, "y": "z"}
    assert got[1]["tags"] is None and got[1]["attrs"] is None
    assert {r["lang"] for r in got} == {"en"}


def test_deletion_vectors_survive_checkpoint(spark, tmp_path):
    """DVs ride checkpoints in real tables: rebuild the DV table's state
    as a checkpoint parquet (add rows WITH deletionVector structs),
    truncate the JSON prefix, and the snapshot must reconstruct with the
    deletes still applied."""
    root = str(tmp_path / "tbl")
    _build_dv_table(spark, root)
    log = os.path.join(root, "_delta_log")

    # replay the JSON log in-test to get the final adds + descriptors
    live, meta_act, proto = {}, None, None
    for v in (0, 1):
        for line in open(os.path.join(log, f"{v:020d}.json")):
            act = json.loads(line)
            if "metaData" in act:
                meta_act = act["metaData"]
            if "protocol" in act:
                proto = act["protocol"]
            if "add" in act:
                live[act["add"]["path"]] = act["add"]
            if "remove" in act:
                live.pop(act["remove"]["path"], None)

    ck_schema = (
        "add struct<path:string, partitionValues:map<string,string>, "
        "size:long, modificationTime:long, dataChange:boolean, "
        "deletionVector:struct<storageType:string, pathOrInlineDv:string, "
        "offset:int, sizeInBytes:int, cardinality:long>>, "
        "remove struct<path:string>, "
        "metaData struct<id:string, schemaString:string, "
        "partitionColumns:array<string>, "
        "configuration:map<string,string>>, "
        "protocol struct<minReaderVersion:int, minWriterVersion:int, "
        "readerFeatures:array<string>>"
    )

    def dv_tuple(a):
        dv = a.get("deletionVector")
        if not dv:
            return None
        return (dv["storageType"], dv["pathOrInlineDv"], dv.get("offset"),
                dv["sizeInBytes"], dv["cardinality"])

    rows = [((a["path"], a["partitionValues"], 1, 1, True, dv_tuple(a)),
             None, None, None) for a in live.values()]
    rows.append((None, None,
                 (meta_act["id"], meta_act["schemaString"],
                  meta_act["partitionColumns"],
                  meta_act.get("configuration") or {}), None))
    rows.append((None, None, None,
                 (proto["minReaderVersion"], proto["minWriterVersion"],
                  proto.get("readerFeatures"))))
    _write_parquet(spark, rows, ck_schema,
                   os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(rows)}, fh)
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))

    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [0, 2, 5, 6, 7, 8, 9, 11, 12, 13, 14]


def test_v2_checkpoint_manifest_and_sidecars(spark, tmp_path):
    """V2 checkpoints: a uuid-named manifest (json AND parquet variants)
    carrying protocol/metaData + sidecar actions, with the add/remove
    bulk in _delta_log/_sidecars/ parquet files, replays to the same
    snapshot as the JSON log it replaces; when classic and V2 coexist,
    exactly one is read (no double-fold)."""
    from pyspark.sql import types as T

    for manifest_kind in ("json", "parquet"):
        root = str(tmp_path / f"tbl_{manifest_kind}")
        _build_partitioned(spark, root)  # commits 0,1; live ids 1-5
        want = read_delta(spark, root).collect().sort_values("id")

        # state at v1, rebuilt as a v2 checkpoint
        log = os.path.join(root, "_delta_log")
        live = {}
        metad = None
        for v in (0, 1):
            for line in open(os.path.join(log, f"{v:020d}.json")):
                act = json.loads(line)
                if "metaData" in act:
                    metad = act["metaData"]
                if "add" in act:
                    live[act["add"]["path"]] = act["add"]
                if "remove" in act:
                    live.pop(act["remove"]["path"], None)
        adds = list(live.values())

        # two sidecars splitting the adds
        os.makedirs(os.path.join(log, "_sidecars"), exist_ok=True)
        sc_schema = ("add struct<path:string, "
                     "partitionValues:map<string,string>, size:long, "
                     "modificationTime:long, dataChange:boolean>, "
                     "remove struct<path:string>")
        sc_names = []
        for i, chunk in enumerate((adds[:1], adds[1:])):
            name = f"{uuid.uuid4()}.parquet"
            rows = [((a["path"], a["partitionValues"], 1, 1, True), None)
                    for a in chunk]
            _write_parquet(spark, rows, sc_schema,
                           os.path.join(log, "_sidecars", name))
            sc_names.append(name)

        proto = {"minReaderVersion": 3, "minWriterVersion": 7,
                 "readerFeatures": ["v2Checkpoint"],
                 "writerFeatures": ["v2Checkpoint"]}
        if manifest_kind == "json":
            mname = f"{1:020d}.checkpoint.{uuid.uuid4()}.json"
            acts = ([{"checkpointMetadata": {"version": 1}},
                     {"protocol": proto}, {"metaData": metad}]
                    + [{"sidecar": {"path": n, "sizeInBytes": 1}}
                       for n in sc_names])
            with open(os.path.join(log, mname), "w") as fh:
                fh.write("\n".join(json.dumps(a) for a in acts) + "\n")
        else:
            mname = f"{1:020d}.checkpoint.{uuid.uuid4()}.parquet"
            m_schema = (
                "protocol struct<minReaderVersion:int, minWriterVersion:int,"
                " readerFeatures:array<string>>, "
                "metaData struct<id:string, schemaString:string, "
                "partitionColumns:array<string>, "
                "configuration:map<string,string>>, "
                "sidecar struct<path:string, sizeInBytes:long>"
            )
            rows = [((proto["minReaderVersion"], proto["minWriterVersion"],
                      proto["readerFeatures"]), None, None),
                    (None, (metad["id"], metad["schemaString"],
                            metad["partitionColumns"],
                            metad.get("configuration") or {}), None)]
            rows += [(None, None, (n, 1)) for n in sc_names]
            _write_parquet(spark, rows, m_schema, os.path.join(log, mname))
        with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
            json.dump({"version": 1}, fh)
        os.remove(os.path.join(log, f"{0:020d}.json"))
        os.remove(os.path.join(log, f"{1:020d}.json"))

        got = read_delta(spark, root).collect().sort_values("id")
        assert got.values.tolist() == want.values.tolist(), manifest_kind

    # coexisting classic + v2 for the same version: read exactly one
    root = str(tmp_path / "tbl_parquet")
    log = os.path.join(root, "_delta_log")
    # plant a classic checkpoint with the SAME complete state
    import glob as _glob

    v2_manifest = _glob.glob(os.path.join(log, "*.checkpoint.*.parquet"))[0]
    import shutil

    # classic name: <v>.checkpoint.parquet — same content would be an
    # incomplete classic (sidecar refs are v2-only), so build it from
    # the sidecars' adds + meta
    sdf = spark.read.parquet(os.path.join(log, "_sidecars"))
    ck_schema = ("add struct<path:string, partitionValues:map<string,string>,"
                 " size:long, modificationTime:long, dataChange:boolean>, "
                 "remove struct<path:string>, "
                 "metaData struct<id:string, schemaString:string, "
                 "partitionColumns:array<string>>, "
                 "protocol struct<minReaderVersion:int, minWriterVersion:int>")
    meta_row = json.loads(open(os.path.join(
        str(tmp_path / "tbl_json"), "_delta_log",
        [n for n in os.listdir(os.path.join(str(tmp_path / "tbl_json"),
                                            "_delta_log"))
         if n.endswith(".json") and ".checkpoint." in n][0])).readline())
    adds = [r.asDict(recursive=True)["add"]
            for r in sdf.select("add").collect() if r["add"] is not None]
    mrow = None
    for line in open(os.path.join(
            str(tmp_path / "tbl_json"), "_delta_log",
            [n for n in os.listdir(os.path.join(str(tmp_path / "tbl_json"),
                                                "_delta_log"))
             if ".checkpoint." in n and n.endswith(".json")][0])):
        act = json.loads(line)
        if "metaData" in act:
            mrow = act["metaData"]
    rows = [((a["path"], a["partitionValues"], 1, 1, True),
             None, None, None) for a in adds]
    rows.append((None, None, (mrow["id"], mrow["schemaString"],
                              mrow["partitionColumns"]), None))
    rows.append((None, None, None, (1, 2)))
    _write_parquet(spark, rows, ck_schema,
                   os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [1, 2, 3, 4, 5]
