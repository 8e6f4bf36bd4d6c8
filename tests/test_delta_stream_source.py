"""Streaming SOURCE over jar-free Delta (streaming/delta_source.py):
Python DataSource API, offsets = log versions, append-only semantics
with loud change-commit gates."""

import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.delta_writer import (delete_delta,
                                                    write_delta)
from tidierdb_jl_spark.streaming.delta_source import (
    read_stream_delta_source,
)


def _tf(spark, rows, schema="id long, v string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def _drain(spark, root, out, ckpt, **options):
    q = (read_stream_delta_source(spark, root, **options).df
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    if not os.path.isdir(out) or not any(
            f.endswith(".parquet") for f in os.listdir(out)):
        return []
    return sorted((r.id, r.v) for r in spark.read.parquet(out).collect())


def test_incremental_tail_exactly_once(spark, tmp_path):
    root = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_delta(_tf(spark, [(1, "a"), (2, "b")]), root)
    write_delta(_tf(spark, [(3, "c")]), root)
    assert _drain(spark, root, out, ckpt) == [(1, "a"), (2, "b"),
                                              (3, "c")]
    # restart from the same checkpoint: only the new commit streams
    write_delta(_tf(spark, [(4, "d")]), root)
    assert _drain(spark, root, out, ckpt) == [(1, "a"), (2, "b"),
                                              (3, "c"), (4, "d")]
    # no new commits: a drain is a no-op, not a duplicate
    assert _drain(spark, root, out, ckpt) == [(1, "a"), (2, "b"),
                                              (3, "c"), (4, "d")]


def test_partition_values_reattach_typed(spark, tmp_path):
    root = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_delta(
        TidyFrame(spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, v string, bucket int")),
        root, partition_by="bucket")
    q = (read_stream_delta_source(spark, root).df
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["bucket"] == "int"
    assert sorted((r.id, r.bucket) for r in got.collect()) \
        == [(1, 10), (2, 20)]


def test_change_commit_gate_and_skip(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a"), (2, "b")]), root)
    delete_delta(spark, root, "id = 1")
    write_delta(_tf(spark, [(3, "c")]), root)

    out, ckpt = str(tmp_path / "o1"), str(tmp_path / "c1")
    with pytest.raises(Exception, match="removed data"):
        _drain(spark, root, out, ckpt)
    # skipChangeCommits: the DELETE commit is skipped wholesale (its
    # rewritten survivor file too — delta-spark semantics), appends flow
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    assert _drain(spark, root, out2, ckpt2, skipChangeCommits=True) \
        == [(1, "a"), (2, "b"), (3, "c")]


def test_starting_version_options(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root)
    write_delta(_tf(spark, [(2, "b")]), root)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    assert _drain(spark, root, out, ckpt, startingVersion=1) \
        == [(2, "b")]
    # latest: nothing until a NEW commit lands
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    assert _drain(spark, root, out2, ckpt2, startingVersion="latest") \
        == []
    write_delta(_tf(spark, [(3, "c")]), root)
    assert _drain(spark, root, out2, ckpt2,
                  startingVersion="latest") == [(3, "c")]


def test_read_change_feed_stream(spark, tmp_path):
    """readChangeFeed: cdc commits replay exactly (delete rows +
    pre/post images from the row ops), appends derive as inserts,
    CDF columns carry version and timestamp."""
    from tidierdb_jl_spark.sources.delta_writer import merge_delta

    root = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_delta(_tf(spark, [(1, "a"), (2, "b")]), root,
                configuration={"delta.enableChangeDataFeed": "true"})
    delete_delta(spark, root, "id = 1")                        # cdc v1
    merge_delta(spark, root, _tf(spark, [(2, "B"), (3, "c")]),
                key="id")                                      # cdc v2

    q = (read_stream_delta_source(spark, root, readChangeFeed=True).df
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    rows = sorted((r.id, r.v, r._change_type, r._commit_version)
                  for r in got.collect())
    assert rows == sorted([
        (1, "a", "insert", 0),
        (1, "a", "delete", 1),
        (2, "b", "insert", 0),
        (2, "b", "update_preimage", 2),
        (2, "B", "update_postimage", 2),
        (3, "c", "insert", 2),
    ])
    assert got.where("_commit_timestamp IS NULL").count() == 0

    # a change commit WITHOUT cdc (CDF off) still gates in cdf mode
    root2 = str(tmp_path / "tbl2")
    write_delta(_tf(spark, [(1, "a")]), root2)
    delete_delta(spark, root2, "id = 1")
    with pytest.raises(Exception, match="enable "
                       "delta.enableChangeDataFeed"):
        q = (read_stream_delta_source(spark, root2,
                                      readChangeFeed=True).df
             .writeStream.format("parquet")
             .option("path", str(tmp_path / "o2"))
             .option("checkpointLocation", str(tmp_path / "c2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
