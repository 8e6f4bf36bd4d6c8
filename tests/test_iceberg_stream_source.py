"""Streaming SOURCE over jar-free Iceberg (streaming/iceberg_source.py):
offsets = snapshot sequence numbers, replace snapshots skipped,
change snapshots gated."""

import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.iceberg_ops import (
    delete_iceberg, rewrite_data_files_iceberg,
)
from tidierdb_jl_spark.sources.iceberg_writer import write_iceberg
from tidierdb_jl_spark.streaming.iceberg_source import (
    read_stream_iceberg_source,
)


def _tf(spark, rows, schema="id long, v string, lang string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def _drain(spark, root, out, ckpt, **options):
    q = (read_stream_iceberg_source(spark, root, **options).df
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    if not os.path.isdir(out) or not any(
            f.endswith(".parquet") for f in os.listdir(out)):
        return []
    return sorted((r.id, r.v) for r in spark.read.parquet(out).collect())


def test_incremental_tail_and_replace_skip(spark, tmp_path):
    root = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_iceberg(_tf(spark, [(1, "a", "en"), (2, "b", "fr")]), root,
                  partition_by="lang")
    write_iceberg(_tf(spark, [(3, "c", "en")]), root, mode="append",
                  partition_by="lang")
    assert _drain(spark, root, out, ckpt) == [(1, "a"), (2, "b"),
                                              (3, "c")]
    # compaction rewrites files but not rows: nothing re-streams
    assert rewrite_data_files_iceberg(spark, root,
                                      min_files=2) is not None
    write_iceberg(_tf(spark, [(4, "d", "de")]), root, mode="append",
                  partition_by="lang")
    assert _drain(spark, root, out, ckpt) == [(1, "a"), (2, "b"),
                                              (3, "c"), (4, "d")]
    # idempotent drain
    assert _drain(spark, root, out, ckpt) == [(1, "a"), (2, "b"),
                                              (3, "c"), (4, "d")]


def test_change_snapshot_gate_and_skip(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_iceberg(_tf(spark, [(1, "a", "en"), (2, "b", "en")]), root)
    delete_iceberg(spark, root, "id = 1")
    write_iceberg(_tf(spark, [(3, "c", "fr")]), root, mode="append")

    with pytest.raises(Exception, match="cannot express"):
        _drain(spark, root, str(tmp_path / "o1"), str(tmp_path / "c1"))
    assert _drain(spark, root, str(tmp_path / "o2"),
                  str(tmp_path / "c2"), skipChangeCommits=True) \
        == [(1, "a"), (2, "b"), (3, "c")]


def test_starting_sequence_latest(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_iceberg(_tf(spark, [(1, "a", "en")]), root)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    assert _drain(spark, root, out, ckpt,
                  startingSequence="latest") == []
    write_iceberg(_tf(spark, [(2, "b", "fr")]), root, mode="append")
    assert _drain(spark, root, out, ckpt,
                  startingSequence="latest") == [(2, "b")]
