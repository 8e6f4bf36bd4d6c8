"""RESTORE TABLE ... TO VERSION AS OF (sources/delta_writer.py
restore_delta): live set and metadata roll back as a NEW commit,
history stays intact, vacuumed targets refuse."""

import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources.delta_writer import (
    delete_delta, describe_history, restore_delta, vacuum_delta,
    write_delta,
)


def _tf(spark, rows, schema="id long, v string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def _ids(spark, root, **kw):
    return sorted(read_delta(spark, root, **kw).collect()["id"].tolist())


def test_restore_after_delete_and_overwrite(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a"), (2, "b")]), root)           # v0
    write_delta(_tf(spark, [(3, "c")]), root)                     # v1
    delete_delta(spark, root, "id = 2")                           # v2
    assert _ids(spark, root) == [1, 3]

    v = restore_delta(spark, root, 1)                             # v3
    assert v == 3
    assert _ids(spark, root) == [1, 2, 3]
    # history intact: every prior version still time-travels
    assert _ids(spark, root, version=2) == [1, 3]
    assert _ids(spark, root, version=0) == [1, 2]
    hist = describe_history(spark, root)
    assert hist[0]["operation"] == "RESTORE"
    assert hist[0]["operationParameters"] == {"version": "1"}

    # restore is itself restorable (back to the deleted state)
    restore_delta(spark, root, 2)                                 # v4
    assert _ids(spark, root) == [1, 3]

    with pytest.raises(ValueError, match="already at version"):
        restore_delta(spark, root, 4)


def test_restore_rolls_schema_back(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root)                     # v0
    write_delta(
        TidyFrame(spark.createDataFrame([(2, "b", 0.5)],
                                        "id long, v string, w double")),
        root, mode="overwrite", overwrite_schema=True)            # v1
    assert "w" in read_delta(spark, root).df.columns
    restore_delta(spark, root, 0)                                 # v2
    assert read_delta(spark, root).df.columns == ["id", "v"]
    assert _ids(spark, root) == [1]


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root)                     # v0
    write_delta(_tf(spark, [(2, "b")]), root, mode="overwrite")   # v1
    gone = vacuum_delta(spark, root, retain_hours=0.0)
    assert gone  # v0's files are off disk
    with pytest.raises(ValueError, match="no longer restorable"):
        restore_delta(spark, root, 0)
    # current state untouched by the refused restore
    assert _ids(spark, root) == [2]


def test_restore_append_only_gate(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root,
                configuration={"delta.appendOnly": "true"})       # v0
    write_delta(_tf(spark, [(2, "b")]), root)                     # v1
    with pytest.raises(ValueError, match="append-only"):
        restore_delta(spark, root, 0)


def test_describe_detail(spark, tmp_path):
    from tidierdb_jl_spark.sources.delta_writer import describe_detail

    root = str(tmp_path / "tbl")
    write_delta(
        TidyFrame(spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "fr")],
            "id long, v string, lang string")),
        root, partition_by="lang",
        configuration={"delta.appendOnly": "false"})
    write_delta(
        TidyFrame(spark.createDataFrame(
            [(3, "c", "en")], "id long, v string, lang string")),
        root, partition_by="lang")
    d = describe_detail(spark, root)
    assert d["format"] == "parquet"
    assert d["version"] == 1
    assert d["num_files"] >= 3  # one per (commit, partition value)
    assert d["size_in_bytes"] > 0
    assert d["partition_columns"] == ["lang"]
    assert d["configuration"] == {"delta.appendOnly": "false"}
    assert (d["min_reader_version"], d["min_writer_version"]) == (1, 2)
    assert d["num_deletion_vector_files"] == 0
