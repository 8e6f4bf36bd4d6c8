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
    # nested types gate
    with pytest.raises(NotImplementedError, match="primitive"):
        write_iceberg(
            TidyFrame(spark.createDataFrame(
                [(1, {"x": 2})], "id long, obj struct<x: long>")),
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
