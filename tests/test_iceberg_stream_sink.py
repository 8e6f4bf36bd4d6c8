"""Exactly-once streaming sink into jar-free Iceberg
(streaming/stream.py write_stream_iceberg): snapshot-summary
watermarks, restart idempotence, maintenance cadence."""

import os

from tidierdb_jl_spark.sources.iceberg import read_iceberg
from tidierdb_jl_spark.sources.iceberg_writer import (
    last_streaming_batch, snapshots_iceberg,
)
from tidierdb_jl_spark.streaming.stream import (read_stream,
                                                write_stream_iceberg)


def _run(spark, src, tbl, ckpt, **kw):
    q = write_stream_iceberg(read_stream(spark, src), tbl, ckpt,
                             trigger="availableNow", **kw)
    q.awaitTermination(300)


def _ids(spark, tbl):
    return sorted(read_iceberg(spark, tbl).collect()["id"].tolist())


def test_exactly_once_across_restarts(spark, tmp_path):
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "id long, v string"
    ).coalesce(2).write.mode("overwrite").parquet(src)

    _run(spark, src, tbl, ckpt, app_id="t-ice")
    assert _ids(spark, tbl) == [0, 1, 2, 3, 4, 5]
    hi = last_streaming_batch(spark, tbl, "t-ice")
    assert hi >= 0

    # restart with no new data: nothing re-commits
    _run(spark, src, tbl, ckpt, app_id="t-ice")
    assert _ids(spark, tbl) == [0, 1, 2, 3, 4, 5]
    assert last_streaming_batch(spark, tbl, "t-ice") == hi

    # new file, restart: exactly the new rows append, watermark moves
    spark.createDataFrame([(6, "v6")], "id long, v string") \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, tbl, ckpt, app_id="t-ice")
    assert _ids(spark, tbl) == [0, 1, 2, 3, 4, 5, 6]
    assert last_streaming_batch(spark, tbl, "t-ice") > hi
    # an unrelated app id has no watermark here
    assert last_streaming_batch(spark, tbl, "other") == -1


def test_sink_maintenance_cadence(spark, tmp_path):
    """rewrite_every compacts through a replace snapshot; rows stay
    exact; expire_keep_last bounds the snapshot log."""
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    os.makedirs(src)

    def drop(i):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string") \
            .coalesce(1).write.mode("append").parquet(src)

    drop(0)
    drop(1)
    _run(spark, src, tbl, ckpt, app_id="t-m", rewrite_every=1,
         expire_keep_last=3)
    drop(2)
    _run(spark, src, tbl, ckpt, app_id="t-m", rewrite_every=1,
         expire_keep_last=3)
    assert _ids(spark, tbl) == [0, 1, 2]
    assert any(s["operation"] == "replace"
               for s in snapshots_iceberg(spark, tbl))
    assert len(snapshots_iceberg(spark, tbl)) <= 4
