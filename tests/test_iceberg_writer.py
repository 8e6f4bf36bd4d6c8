"""Jar-free Iceberg v2 WRITER (sources/iceberg_writer.py) — verified
against the repo's independent metadata-traversal reader
(sources/iceberg.py, two rounds older, spec-tested on hand-built
fixtures) plus structural spec assertions (field ids in the parquet
footers, sequence numbers, snapshot log, optimistic metadata
versions)."""

import glob
import json
import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.iceberg import read_iceberg
from tidierdb_jl_spark.sources.iceberg_writer import write_iceberg


def _tf(spark, rows, schema="id long, val string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def test_write_append_overwrite_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    s0 = write_iceberg(_tf(spark, [(1, "a"), (2, "b")]), root)
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got[["id", "val"]].values.tolist() == [[1, "a"], [2, "b"]]

    s1 = write_iceberg(_tf(spark, [(3, "c")]), root, mode="append")
    assert read_iceberg(spark, root).df.count() == 3
    # time travel to the first snapshot
    assert read_iceberg(spark, root, snapshot_id=s0).df.count() == 2

    s2 = write_iceberg(_tf(spark, [(9, "z")]), root, mode="overwrite")
    now = read_iceberg(spark, root).collect()
    assert now[["id", "val"]].values.tolist() == [[9, "z"]]
    assert read_iceberg(spark, root, snapshot_id=s1).df.count() == 3

    with pytest.raises(ValueError, match="mode=error"):
        write_iceberg(_tf(spark, [(0, "x")]), root, mode="error")
    assert len({s0, s1, s2}) == 3


def test_field_ids_written_and_schema_enforced(spark, tmp_path):
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    write_iceberg(_tf(spark, [(1, "a")]), root)
    data = glob.glob(os.path.join(root, "data", "*.parquet"))
    assert data
    sch = pq.read_schema(data[0])
    ids = {f.name: f.metadata.get(b"PARQUET:field_id")
           for f in sch if f.metadata}
    assert ids == {"id": b"1", "val": b"2"}

    # metadata structure: v1, hadoop layout, sequence numbers
    meta = json.loads(open(os.path.join(
        root, "metadata", "v1.metadata.json")).read())
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 1
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]

    # schema drift refuses
    with pytest.raises(ValueError, match="schema"):
        write_iceberg(_tf(spark, [(1, "a", 2.0)],
                          "id long, val string, x double"), root)
    # maps still gate (struct/array write since r12 —
    # test_nested_types_roundtrip_with_field_ids)
    with pytest.raises(NotImplementedError, match="array and struct"):
        write_iceberg(
            TidyFrame(spark.createDataFrame(
                [(1, {"x": 2})], "id long, m map<string,long>")),
            str(tmp_path / "tbl2"))


def test_written_table_resolves_by_field_id(spark, tmp_path):
    """The written files carry field ids, so a RENAME done by editing
    the metadata (what a catalog would commit) projects correctly
    through the repo's field-id resolver — the writer/reader pair
    supports evolution even though the writer refuses to author it."""
    root = str(tmp_path / "tbl")
    write_iceberg(_tf(spark, [(1, "a"), (2, "b")]), root)
    mpath = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.loads(open(mpath).read())
    meta["schemas"][0]["fields"][1]["name"] = "renamed_val"
    with open(os.path.join(root, "metadata", "v2.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    crc = os.path.join(root, "metadata", ".version-hint.text.crc")
    if os.path.exists(crc):  # hadoop local-fs checksum of the old hint
        os.remove(crc)
    with open(os.path.join(root, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write("2")
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert list(got.columns) == ["id", "renamed_val"]
    assert got["renamed_val"].tolist() == ["a", "b"]


def test_multi_partition_write_many_files(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.range(0, 1000, 1, 8).selectExpr(
        "id", "concat('v', id) AS val")
    write_iceberg(TidyFrame(df), root)
    files = glob.glob(os.path.join(root, "data", "*.parquet"))
    assert len(files) == 8  # one per non-empty input partition
    got = read_iceberg(spark, root)
    assert got.df.count() == 1000
    assert got.df.selectExpr("sum(id)").first()[0] == 499500


def test_empty_batch_creates_empty_table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_iceberg(_tf(spark, [], "id long, val string"), root)
    tf = read_iceberg(spark, root)
    assert tf.df.count() == 0
    assert [f.name for f in tf.df.schema.fields] == ["id", "val"]


def test_avro_encoder_spec_differential():
    """The package Avro encoder (avro_lite.encode_avro_container) vs the
    spec: zigzag vectors, roundtrip through the spec-anchored decoder,
    and the INDEPENDENT test encoder decoding identically."""
    from avro_ref import write_container, zigzag
    from tidierdb_jl_spark.sources.avro_lite import (
        _zigzag, decode_avro_container, encode_avro_container,
    )

    for n in (0, -1, 1, -2, 2, -64, 64, 12345, -987654321, 1 << 40,
              -(1 << 62)):
        assert _zigzag(n) == zigzag(n), n

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "s", "type": "string"},
        {"name": "l", "type": "long"},
        {"name": "u", "type": ["null", "long", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "nest", "type": {"type": "record", "name": "n2",
                                  "fields": [{"name": "x",
                                              "type": "double"}]}}]}
    rows = [
        {"s": "héllo", "l": -7, "u": None, "arr": [1, -2],
         "m": {"k": "v"}, "nest": {"x": 2.5}},
        {"s": "", "l": 1 << 40, "u": "str", "arr": [], "m": {},
         "nest": {"x": -0.5}},
    ]
    for codec in ("null", "deflate"):
        _meta, got = decode_avro_container(
            encode_avro_container(schema, rows, codec=codec))
        assert got == rows, codec
        # both encoders produce value-identical containers
        _m2, got2 = decode_avro_container(
            write_container(schema, rows, codec=codec))
        assert got2 == got
    # deterministic bytes (retry-friendly commits)
    assert encode_avro_container(schema, rows) == \
        encode_avro_container(schema, rows)


def test_snapshots_listing(spark, tmp_path):
    from tidierdb_jl_spark.sources.iceberg_writer import snapshots_iceberg

    root = str(tmp_path / "tbl")
    s0 = write_iceberg(_tf(spark, [(1, "a")]), root)
    s1 = write_iceberg(_tf(spark, [(2, "b")]), root, mode="overwrite")
    snaps = snapshots_iceberg(spark, root)
    assert [s["snapshot_id"] for s in snaps] == [s1, s0]
    assert snaps[0]["is_current"] and not snaps[1]["is_current"]
    assert snaps[0]["operation"] == "overwrite"
    assert snaps[1]["operation"] == "append"
    assert snaps[0]["sequence_number"] == 2


# ---- r12: spec-required Avro fields + identity partitioning --------------

def _walk_avro_fields(schema, where=""):
    """Yield (path, field dict) for every record field in an Avro schema."""
    if isinstance(schema, dict) and schema.get("type") == "record":
        for f in schema.get("fields", []):
            yield f"{where}.{f['name']}".lstrip("."), f
            t = f["type"]
            branches = t if isinstance(t, list) else [t]
            for b in branches:
                yield from _walk_avro_fields(
                    b if isinstance(b, dict) else {},
                    f"{where}.{f['name']}".lstrip("."))


def test_manifest_avro_carries_spec_field_ids_and_counts(spark, tmp_path):
    """The r11-ADVICE interop gap: java Iceberg / pyiceberg resolve
    manifest columns by the Avro ``field-id`` properties and REQUIRE
    data_file.partition (field 102) plus the six v2 count fields on
    manifest_file entries — assert they are all present with the spec's
    ids (https://iceberg.apache.org/spec/#manifests)."""
    import glob
    import json

    from tidierdb_jl_spark.sources.avro_lite import decode_avro_container

    root = str(tmp_path / "tbl")
    write_iceberg(_tf(spark, [(1, "a"), (2, "b")], "id long, v string"),
                  root)

    man = glob.glob(os.path.join(root, "metadata", "manifest-*.avro"))[0]
    meta, records = decode_avro_container(open(man, "rb").read())
    sch = json.loads(meta["avro.schema"].decode())
    ids = {p: f.get("field-id") for p, f in _walk_avro_fields(sch)}
    assert ids["status"] == 0 and ids["snapshot_id"] == 1
    assert ids["data_file"] == 2 and ids["sequence_number"] == 3
    assert ids["data_file.content"] == 134
    assert ids["data_file.file_path"] == 100
    assert ids["data_file.file_format"] == 101
    assert ids["data_file.partition"] == 102
    assert ids["data_file.record_count"] == 103
    assert ids["data_file.file_size_in_bytes"] == 104
    # the required partition struct is present (empty record r102 when
    # unpartitioned) on every entry
    assert all("partition" in r["data_file"] for r in records)
    # manifest file metadata carries the iceberg schema + spec
    assert meta["format-version"] == b"2" and meta["content"] == b"data"
    assert b"fields" in meta["schema"]

    mlist = glob.glob(os.path.join(root, "metadata", "snap-*.avro"))[0]
    lmeta, lrecs = decode_avro_container(open(mlist, "rb").read())
    lsch = json.loads(lmeta["avro.schema"].decode())
    lids = {p: f.get("field-id") for p, f in _walk_avro_fields(lsch)}
    assert lids["manifest_path"] == 500 and lids["manifest_length"] == 501
    assert lids["partition_spec_id"] == 502 and lids["content"] == 517
    assert lids["sequence_number"] == 515
    assert lids["min_sequence_number"] == 516
    assert lids["added_snapshot_id"] == 503
    assert lids["added_data_files_count"] == 504
    assert lids["existing_data_files_count"] == 505
    assert lids["deleted_data_files_count"] == 506
    assert lids["added_rows_count"] == 512
    assert lids["existing_rows_count"] == 513
    assert lids["deleted_rows_count"] == 514
    e = lrecs[0]
    assert e["added_data_files_count"] >= 1
    assert e["added_rows_count"] == 2
    assert e["existing_data_files_count"] == 0
    assert e["deleted_rows_count"] == 0


def test_partitioned_write_roundtrip_and_time_travel(spark, tmp_path):
    """Identity-partitioned write: partition spec in the metadata,
    per-file partition struct in the manifest, conventional data/k=v/
    layout, readable back (partition columns live in the data files)
    with time travel intact; append must keep the same spec and
    repartitioning refuses."""
    import glob
    import json

    from tidierdb_jl_spark.sources.avro_lite import decode_avro_container

    root = str(tmp_path / "tbl")
    rows = [(i, f"t{i}", ["en", "fr", "de"][i % 3]) for i in range(30)]
    s_a = write_iceberg(_tf(spark, rows[:18], "id long, v string, "
                            "lang string"), root, partition_by="lang")
    write_iceberg(_tf(spark, rows[18:], "id long, v string, lang string"),
                  root, mode="append", partition_by="lang")

    meta = json.loads(open(sorted(glob.glob(
        os.path.join(root, "metadata", "v*.metadata.json")))[-1]).read())
    spec = meta["partition-specs"][0]["fields"]
    assert spec == [{"name": "lang", "transform": "identity",
                     "source-id": 3, "field-id": 1000}]
    assert meta["last-partition-id"] == 1000

    # manifest entries carry the typed partition tuple
    mans = glob.glob(os.path.join(root, "metadata", "manifest-*.avro"))
    pvals = set()
    for man in mans:
        _m, recs = decode_avro_container(open(man, "rb").read())
        for r in recs:
            pvals.add(r["data_file"]["partition"]["lang"])
    assert pvals == {"en", "fr", "de"}
    # conventional dirs
    assert {d for d in os.listdir(os.path.join(root, "data"))
            if not d.startswith(".")} == {"lang=en", "lang=fr", "lang=de"}

    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == list(range(30))
    assert got["lang"].tolist() == [["en", "fr", "de"][i % 3]
                                    for i in range(30)]
    old = read_iceberg(spark, root, snapshot_id=s_a).collect()
    assert sorted(old["id"]) == list(range(18))

    with pytest.raises(ValueError, match="partition"):
        write_iceberg(_tf(spark, rows[:3], "id long, v string, "
                          "lang string"), root, mode="append")
    with pytest.raises(NotImplementedError, match="identity"):
        write_iceberg(_tf(spark, [(1.5, 1)], "x double, id long"),
                      str(tmp_path / "t2"), partition_by="x")


def test_bucket_and_truncate_partitioned_write(spark, tmp_path):
    """bucket[N] + truncate[W] transforms (r12): the metadata carries
    the transform spec, every data_file's partition tuple holds the
    murmur3-exact bucket id / truncated prefix, one file per value
    tuple, and the roundtrip read returns the source rows unchanged."""
    import glob
    import json
    import struct

    from tidierdb_jl_spark.sources.avro_lite import decode_avro_container
    from tidierdb_jl_spark.sources.murmur3 import murmur3_32

    root = str(tmp_path / "tbl")
    rows = [(i, f"w{i % 7}suffix{i}") for i in range(200)]
    write_iceberg(_tf(spark, rows, "id long, word string"), root,
                  partition_by=["bucket(4, id)", "truncate(2, word)"])

    meta = json.loads(open(sorted(glob.glob(
        os.path.join(root, "metadata", "v*.metadata.json")))[-1]).read())
    assert meta["partition-specs"][0]["fields"] == [
        {"name": "id_bucket", "transform": "bucket[4]",
         "source-id": 1, "field-id": 1000},
        {"name": "word_trunc", "transform": "truncate[2]",
         "source-id": 2, "field-id": 1001},
    ]

    # every manifest partition tuple is spec-exact for its file's rows
    man = glob.glob(os.path.join(root, "metadata", "manifest-*.avro"))[0]
    _m, recs = decode_avro_container(open(man, "rb").read())
    assert recs, "manifest empty"
    import pyarrow.parquet as pq

    for r in recs:
        dfile = r["data_file"]
        pv = dfile["partition"]
        t = pq.read_table(dfile["file_path"].replace("file://", ""))
        for i_val, w_val in zip(t["id"].to_pylist(), t["word"].to_pylist()):
            assert pv["id_bucket"] == \
                (murmur3_32(struct.pack("<q", i_val)) & 0x7FFFFFFF) % 4
            assert pv["word_trunc"] == w_val[:2]

    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == list(range(200))
    # one file per distinct (bucket, prefix) tuple
    tuples = {(r["data_file"]["partition"]["id_bucket"],
               r["data_file"]["partition"]["word_trunc"]) for r in recs}
    assert len(recs) == len(tuples)

    # appending with a DIFFERENT spec refuses; with the same spec works
    with pytest.raises(ValueError, match="partition"):
        write_iceberg(_tf(spark, rows[:3], "id long, word string"), root,
                      mode="append", partition_by=["bucket(8, id)"])
    write_iceberg(_tf(spark, [(500, "zz500")], "id long, word string"),
                  root, mode="append",
                  partition_by=["bucket(4, id)", "truncate(2, word)"])
    assert read_iceberg(spark, root).df.count() == 201
    # unsupported transform source refuses loudly
    with pytest.raises(NotImplementedError, match="bucket"):
        write_iceberg(_tf(spark, [(1.5, "x")], "x double, w string"),
                      str(tmp_path / "t2"), partition_by=["bucket(4, x)"])


def test_temporal_transforms_and_expire_snapshots(spark, tmp_path):
    """year/month/day/hour transforms produce the spec's epoch ordinals
    in the partition tuples, and expire_snapshots_iceberg drops old
    snapshots plus ONLY the files no retained snapshot references."""
    import datetime
    import glob
    import json

    from tidierdb_jl_spark.sources.avro_lite import decode_avro_container
    from tidierdb_jl_spark.sources.iceberg_writer import (
        expire_snapshots_iceberg, snapshots_iceberg,
    )

    root = str(tmp_path / "tbl")
    rows = [(i, datetime.datetime(2017, 11, 16, 22, 31, 8)
             + datetime.timedelta(hours=40 * i)) for i in range(6)]
    write_iceberg(_tf(spark, rows, "id long, ts timestamp"), root,
                  partition_by=["day(ts)"])
    meta = json.loads(open(sorted(glob.glob(
        os.path.join(root, "metadata", "v*.metadata.json")))[-1]).read())
    assert meta["partition-specs"][0]["fields"][0]["transform"] == "day"
    man = glob.glob(os.path.join(root, "metadata", "manifest-*.avro"))[0]
    _m, recs = decode_avro_container(open(man, "rb").read())
    days = {r["data_file"]["partition"]["ts_day"] for r in recs}
    epoch = datetime.date(1970, 1, 1)
    expect = {(r[1].date() - epoch).days for r in rows}
    assert days == expect
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == list(range(6))

    # hour ordinal spot check through the parser + transform helper
    import pandas as pd

    from tidierdb_jl_spark.sources.iceberg_writer import _transform_values

    hpf = {"transform": "hour", "param": None, "ice_type": "timestamp"}
    hr = _transform_values(
        hpf, pd.Series([datetime.datetime(1970, 1, 1, 3, 30), None]))
    assert hr.iloc[0] == 3 and hr.iloc[1] is None
    ypf = {"transform": "year", "param": None, "ice_type": "timestamp"}
    assert _transform_values(
        ypf, pd.Series([datetime.datetime(2017, 1, 2)])).iloc[0] == 47

    # snapshot expiration: 2 overwrites -> 3 snapshots; retain last 1
    write_iceberg(_tf(spark, rows[:2], "id long, ts timestamp"), root,
                  mode="overwrite", partition_by=["day(ts)"])
    write_iceberg(_tf(spark, rows[2:4], "id long, ts timestamp"), root,
                  mode="overwrite", partition_by=["day(ts)"])
    assert len(snapshots_iceberg(spark, root)) == 3
    n_data_before = len(glob.glob(
        os.path.join(root, "data", "**", "*.parquet"), recursive=True))
    victims = expire_snapshots_iceberg(spark, root, retain_last=1)
    assert victims, "expired snapshots referenced files to collect"
    snaps = snapshots_iceberg(spark, root)
    assert len(snaps) == 1 and snaps[0]["is_current"]
    got2 = read_iceberg(spark, root).collect().sort_values("id")
    assert got2["id"].tolist() == [2, 3]
    n_data_after = len(glob.glob(
        os.path.join(root, "data", "**", "*.parquet"), recursive=True))
    assert n_data_after < n_data_before
    # the current snapshot's files all survive, by reference counting
    for f in glob.glob(os.path.join(root, "metadata", "manifest-*.avro")):
        pass  # deletion already proven by the re-read above


def test_nested_types_roundtrip_with_field_ids(spark, tmp_path):
    """array<float> (the embeddings-table shape) and struct columns
    write with nested PARQUET:field_id metadata and roundtrip exactly;
    declared arrow types are pinned (float stays float32)."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, [0.5, 1.5], {"w": 3, "h": 4}),
         (2, [2.5], {"w": 5, "h": 6}),
         (3, None, None)],
        "id long, emb array<float>, dims struct<w:int,h:int>")
    write_iceberg(TidyFrame(df), root)
    got = read_iceberg(spark, root).collect().sort_values("id")
    embs = [None if v is None else [float(x) for x in v]
            for v in got["emb"]]
    assert embs == [[0.5, 1.5], [2.5], None]
    assert [r["dims"] for _, r in got.iterrows()][:2] == \
        [{"w": 3, "h": 4}, {"w": 5, "h": 6}]

    f = glob.glob(os.path.join(root, "data", "*.parquet"))[0]
    sch = pq.read_schema(f)
    emb = sch.field("emb")
    assert str(emb.type) == "list<element: float>"
    assert emb.metadata[b"PARQUET:field_id"] == b"2"
    assert emb.type.value_field.metadata[b"PARQUET:field_id"] == b"4"
    dims = sch.field("dims")
    assert [dims.type.field(i).metadata[b"PARQUET:field_id"]
            for i in range(dims.type.num_fields)] == [b"5", b"6"]

    # metadata carries the nested iceberg schema
    meta = json.loads(open(os.path.join(
        root, "metadata", "v1.metadata.json")).read())
    emb_f = next(f for f in meta["schemas"][0]["fields"]
                 if f["name"] == "emb")
    assert emb_f["type"] == {"type": "list", "element-id": 4,
                             "element": "float",
                             "element-required": False}

    # appends re-derive the same nested numbering: schema check passes
    write_iceberg(
        TidyFrame(spark.createDataFrame(
            [(9, [9.0], {"w": 1, "h": 2})],
            "id long, emb array<float>, dims struct<w:int,h:int>")),
        root, mode="append")
    assert read_iceberg(spark, root).df.count() == 4

    # maps still refuse, loudly
    with pytest.raises(NotImplementedError, match="array and struct"):
        write_iceberg(
            TidyFrame(spark.createDataFrame(
                [(1, {"k": "v"})], "id long, m map<string,string>")),
            str(tmp_path / "m"))


def test_nested_row_ops(spark, tmp_path):
    """Copy-on-write DELETE/MERGE on a table with an array column —
    survivors carry their vectors bit-exactly."""
    from tidierdb_jl_spark.sources.iceberg_ops import (delete_iceberg,
                                                       merge_iceberg)

    root = str(tmp_path / "tbl")
    write_iceberg(
        TidyFrame(spark.createDataFrame(
            [(i, [float(i), float(i) + 0.5]) for i in range(6)],
            "id long, emb array<float>")),
        root)
    delete_iceberg(spark, root, "id IN (1, 3)")
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [0, 2, 4, 5]
    assert [float(x) for x in got["emb"].tolist()[1]] == [2.0, 2.5]
    merge_iceberg(
        spark, root,
        TidyFrame(spark.createDataFrame(
            [(2, [9.0, 9.5]), (7, [7.0, 7.5])],
            "id long, emb array<float>")),
        "id")
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [0, 2, 4, 5, 7]
    assert [float(x) for x in got.set_index("id")["emb"][2]] \
        == [9.0, 9.5]
