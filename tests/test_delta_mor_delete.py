"""Merge-on-read DELETE (delta_writer._delete_mor): deletion vectors
written per PROTOCOL.md — spec sidecar layout, table-feature protocol
upgrade with legacy-feature enumeration, DV union, vacuum protection."""

import json
import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources.delta_writer import (delete_delta,
                                                    vacuum_delta,
                                                    write_delta)


def _tf(spark, rows, schema="id long, v string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def _ids(spark, root, **kw):
    return sorted(read_delta(spark, root, **kw).collect()["id"].tolist())


def _log_actions(root, v):
    out = []
    with open(os.path.join(root, "_delta_log", f"{v:020d}.json")) as fh:
        for line in fh:
            if line.strip():
                out.append(json.loads(line))
    return out


def test_mor_delete_dv_descriptor_and_protocol(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(
        TidyFrame(spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)],
            "id long, v string").coalesce(1)), root)
    v = delete_delta(spark, root, "id IN (2, 5)", mode="merge-on-read")
    assert v == 1
    assert _ids(spark, root) == [0, 1, 3, 4, 6, 7, 8, 9]
    assert _ids(spark, root, version=0) == list(range(10))  # history

    acts = _log_actions(root, 1)
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) \
        == (3, 7)
    assert "deletionVectors" in proto["readerFeatures"]
    # legacy-implied features enumerated, not dropped
    assert {"appendOnly", "invariants", "deletionVectors"} \
        <= set(proto["writerFeatures"])
    add = next(a["add"] for a in acts if "add" in a)
    dv = add["deletionVector"]
    assert dv["storageType"] == "u" and dv["cardinality"] == 2
    assert len(dv["pathOrInlineDv"]) == 20  # bare z85 uuid
    # sidecar exists and follows the spec layout (version byte 1)
    sidecars = [f for f in os.listdir(root)
                if f.startswith("deletion_vector_")]
    assert len(sidecars) == 1
    with open(os.path.join(root, sidecars[0]), "rb") as fh:
        assert fh.read(1) == b"\x01"

    # no second protocol action on the next MOR delete
    delete_delta(spark, root, "id = 7", mode="merge-on-read")
    assert _ids(spark, root) == [0, 1, 3, 4, 6, 8, 9]  # DV union
    acts2 = _log_actions(root, 2)
    assert not any("protocol" in a for a in acts2)

    # vacuum keeps the LIVE sidecar (current snapshot references it)
    gone = vacuum_delta(spark, root, retain_hours=0.0)
    assert _ids(spark, root) == [0, 1, 3, 4, 6, 8, 9]
    live_sidecar = {f for f in os.listdir(root)
                    if f.startswith("deletion_vector_")}
    assert live_sidecar  # the current DV's sidecar survived

    # copy-on-write delete MATERIALIZES: descriptor retired with file
    delete_delta(spark, root, "id = 0")
    assert _ids(spark, root) == [1, 3, 4, 6, 8, 9]
    from tidierdb_jl_spark.sources.delta_writer import describe_detail

    assert describe_detail(spark, root)[
        "num_deletion_vector_files"] == 0


def test_mor_delete_partitioned_and_cdf(spark, tmp_path):
    from tidierdb_jl_spark.sources.delta_cdf import read_delta_cdf

    root = str(tmp_path / "tbl")
    write_delta(
        _tf(spark, [(1, "a", "en"), (2, "b", "en"), (3, "c", "fr")],
            "id long, v string, lang string"),
        root, partition_by="lang",
        configuration={"delta.enableChangeDataFeed": "true"})
    delete_delta(spark, root, "id = 2", mode="merge-on-read")
    assert _ids(spark, root) == [1, 3]
    # partition re-attach still healthy on the DV'd file
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["lang"].tolist() == ["en", "fr"]
    # exact cdc emitted (the batch CDF reader needs no derivation)
    cdf = read_delta_cdf(spark, root, starting_version=1).collect()
    assert [(r["id"], r["_change_type"]) for _, r in
            cdf.sort_values("id").iterrows()] == [(2, "delete")]

    # append-only tables refuse MOR deletes too
    root2 = str(tmp_path / "ao")
    write_delta(_tf(spark, [(1, "a")]), root2,
                configuration={"delta.appendOnly": "true"})
    with pytest.raises(ValueError, match="append-only"):
        delete_delta(spark, root2, "id = 1", mode="merge-on-read")
    with pytest.raises(ValueError, match="copy-on-write.merge-on-read"):
        delete_delta(spark, str(tmp_path / "tbl"), "id = 1",
                     mode="nonsense")


def test_mor_no_match_is_noop(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root)
    assert delete_delta(spark, root, "id = 99",
                        mode="merge-on-read") is None
    assert len([f for f in os.listdir(os.path.join(root, "_delta_log"))
                if f.endswith(".json")]) == 1


def test_mor_merge_upsert(spark, tmp_path):
    """merge-on-read MERGE: matched rows DV-delete, the batch appends;
    no data file rewrites; CDF emits pre/post/insert images."""
    from tidierdb_jl_spark.sources.delta_cdf import read_delta_cdf
    from tidierdb_jl_spark.sources.delta_writer import merge_delta

    root = str(tmp_path / "tbl")
    write_delta(
        TidyFrame(spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")],
            "id long, v string").coalesce(1)), root,
        configuration={"delta.enableChangeDataFeed": "true"})
    orig = {f for f in os.listdir(root) if f.endswith(".parquet")}

    merge_delta(spark, root, _tf(spark, [(2, "B"), (4, "d")]), "id",
                mode="merge-on-read")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "v"]].values.tolist() == [
        [1, "a"], [2, "B"], [3, "c"], [4, "d"]]
    # original data file still on disk, NOT rewritten (DV'd instead)
    assert orig <= {f for f in os.listdir(root)
                    if f.endswith(".parquet")}
    acts = _log_actions(root, 1)
    assert any("deletionVector" in a.get("add", {}) for a in acts)

    cdf = read_delta_cdf(spark, root, starting_version=1).collect()
    rows = sorted((r["id"], r["v"], r["_change_type"])
                  for _, r in cdf.iterrows())
    assert rows == sorted([
        (2, "b", "update_preimage"),
        (2, "B", "update_postimage"),
        (4, "d", "insert"),
    ])

    # a second MOR merge touching the same file unions its DV
    merge_delta(spark, root, _tf(spark, [(3, "C")]), "id",
                mode="merge-on-read")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "v"]].values.tolist() == [
        [1, "a"], [2, "B"], [3, "C"], [4, "d"]]
