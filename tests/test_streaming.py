"""Structured-Streaming tests: file stream → watermark → windowed aggs →
memory sink, with batch-parity checks against the same computation done
in batch mode."""

import tempfile

import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.streaming.stream import (
    dedup_within_watermark,
    read_stream,
    run_to_memory,
    session_window,
    sliding_window,
    tumbling_window,
    with_watermark,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tables):
    d = tempfile.mkdtemp(prefix="events_stream_")
    tables["events"].df.write.mode("overwrite").parquet(d)
    return d


def test_tumbling_batch_parity(spark, tables, stream_dir):
    st = read_stream(spark, stream_dir)
    res = tumbling_window(
        with_watermark(st, "ts", "10 minutes"), "ts", "10 minutes", "event_type"
    ).summarize(n="n()", v="sum(value)")
    # complete mode: append would (correctly) withhold the final window,
    # which the watermark never closes on a finite file stream
    out = run_to_memory(res, "parity_win", mode="complete").toPandas()

    batch = (
        tumbling_window(tables["events"], "ts", "10 minutes", "event_type")
        .summarize(n="n()", v="sum(value)")
        .collect()
    )
    key = lambda pdf: sorted(  # noqa: E731
        (str(w), et, n, round(v, 6))
        for w, et, n, v in zip(pdf["window"], pdf["event_type"], pdf["n"], pdf["v"])
    )
    assert key(out) == key(batch)


def test_sliding_window(spark, stream_dir):
    st = read_stream(spark, stream_dir)
    res = sliding_window(
        with_watermark(st, "ts", "10 minutes"), "ts", "10 minutes", "5 minutes"
    ).summarize(n="n()")
    out = run_to_memory(res, "slide_out").toPandas()
    assert len(out) > 0
    # every event lands in exactly 2 sliding windows
    total_events = out["n"].sum()
    assert total_events % 2 == 0


def test_session_window(spark, stream_dir):
    st = read_stream(spark, stream_dir)
    res = session_window(
        with_watermark(st, "ts", "10 minutes"), "ts", "30 minutes", "user_id"
    ).summarize(n="n()")
    out = run_to_memory(res, "sess_out2").toPandas()
    assert len(out) > 0 and (out["n"] >= 1).all()


def test_stateful_dedup(spark, stream_dir, tables):
    st = read_stream(spark, stream_dir)
    dd = dedup_within_watermark(
        with_watermark(st, "ts", "1 hour"), "user_id", "event_type"
    )
    out = run_to_memory(dd, "dedup_out").toPandas()
    distinct_batch = (
        tables["events"].distinct("user_id", "event_type").collect().shape[0]
    )
    assert len(out) == distinct_batch
