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


def test_stateful_running_agg_across_batches(spark, tables):
    """applyInPandasWithState: state must accumulate across micro-batches
    (maxFilesPerTrigger=1 forces one batch per file)."""
    import os
    import tempfile

    from tidierdb_jl_spark.streaming.stream import stateful_running_agg

    d = tempfile.mkdtemp(prefix="stateful_stream_")
    # split deterministically into two file groups
    ev1 = tables["events"].df.filter("pmod(event_id, 2) = 0").select("user_id", "value")
    ev2 = tables["events"].df.filter("pmod(event_id, 2) = 1").select("user_id", "value")
    ev1.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "b1"))
    ev2.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "b2"))

    st = read_stream(
        spark, os.path.join(d, "*"), schema=ev1.schema, maxFilesPerTrigger="1"
    )
    res = stateful_running_agg(st, "user_id", "value")
    out = run_to_memory(res, "stateful_out", mode="update").toPandas()

    # last emitted row per key must equal the full-batch aggregate
    batch = (
        tables["events"]
        .group_by("user_id")
        .summarize(n="n()", total="sum(value)", vmin="min(value)", vmax="max(value)")
        .collect()
    )
    last = out.groupby("user_id").tail(1).set_index("user_id")
    b = batch.set_index("user_id")
    assert set(last.index) == set(b.index)
    for uid in b.index:
        assert last.loc[uid, "n"] == b.loc[uid, "n"]
        assert abs(last.loc[uid, "total"] - b.loc[uid, "total"]) < 1e-6
        assert abs(last.loc[uid, "vmin"] - b.loc[uid, "vmin"]) < 1e-12
        assert abs(last.loc[uid, "vmax"] - b.loc[uid, "vmax"]) < 1e-12
    # statefulness: with >1 batch, some key should appear twice in update mode
    assert len(out) > len(b)


def test_write_stream_file_sink_available_now(spark, tables, stream_dir):
    import os
    import tempfile

    from tidierdb_jl_spark.streaming.stream import write_stream

    st = read_stream(spark, stream_dir)
    out_dir = tempfile.mkdtemp(prefix="sink_")
    q = write_stream(
        st.filter("value > 0").select("event_id", "user_id", "value"),
        path=os.path.join(out_dir, "data"),
        checkpoint=os.path.join(out_dir, "ckpt"),
        trigger="availableNow",
    )
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(out_dir, "data")).count()
    want = tables["events"].filter("value > 0").df.count()
    assert got == want


def test_foreach_batch_sink(spark, stream_dir):
    from tidierdb_jl_spark.streaming.stream import foreach_batch

    seen = []

    def sink(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    st = read_stream(spark, stream_dir)
    q = foreach_batch(st.select("event_id"), sink)
    q.processAllAvailable()
    q.stop()
    assert seen and sum(n for _, n in seen) > 0


def test_transform_with_state_gated_or_runs(spark, stream_dir):
    """transformWithState (Spark 4.x arbitrary state API) needs protobuf;
    when absent the wrapper must fail fast with a clear message instead of
    crashing the streaming Python driver worker mid-query.  When protobuf
    IS present, the running top-k must match the batch top-k."""
    from tidierdb_jl_spark.streaming.stream import (
        _tws_available,
        run_to_memory,
        stateful_topk,
    )

    st = read_stream(spark, stream_dir)
    if not _tws_available():
        # explicit tws engine must fail fast with a clear message
        with pytest.raises(RuntimeError, match="protobuf"):
            stateful_topk(st, "user_id", "value", k=3, engine="tws")

    # auto engine always works: tws when protobuf exists, else classic
    # applyInPandasWithState running the identical fold
    res = stateful_topk(st, "user_id", "value", k=3)
    out = run_to_memory(res, "tws_topk", mode="update").toPandas()
    batch = (
        spark.table("events")
        .selectExpr("user_id", "value")
        .toPandas()
        .dropna()
        .groupby("user_id")["value"]
        .apply(lambda s: sorted(s, reverse=True)[:3])
    )
    last = out.groupby("user_id").tail(1).set_index("user_id")["topk"]
    for uid, want in batch.items():
        assert list(last.loc[uid]) == [float(v) for v in want]


def test_topk_fold_pure():
    """The per-batch fold used by stateful_topk, testable without the
    streaming runtime: merging batches must equal a global top-k."""
    from tidierdb_jl_spark.streaming.stream import _topk_fold

    cur = []
    for batch in ([5.0, 1.0], [9.0], [], [7.0, 8.0, 2.0]):
        cur = _topk_fold(cur, batch, 3)
    assert cur == [9.0, 8.0, 7.0]
    assert _topk_fold([3.0, 2.0, 1.0], [2.5], 3) == [3.0, 2.5, 2.0]


def test_stream_stream_join_batch_parity(spark, stream_dir, tables):
    """Watermarked stream-stream join within a time bound must equal the
    same join run on the batch frames."""
    from tidierdb_jl_spark.streaming.stream import stream_join

    def build(lhs, rhs):
        sig = lhs.filter("event_type = 'signup'").select("user_id", "ts")
        pur = (
            rhs.filter("event_type = 'purchase'")
            .select("user_id", "ts", "value")
            .rename(p_ts="ts")
        )
        return stream_join(sig, pur, "user_id", "ts", "p_ts", "30 minutes")

    # batch reference
    want = build(tables["events"], tables["events"]).collect()

    # streaming run (both sides watermarked)
    sl = with_watermark(read_stream(spark, stream_dir), "ts", "2 hours")
    sr = with_watermark(read_stream(spark, stream_dir), "ts", "2 hours")
    got = run_to_memory(build(sl, sr), "ssj_out").toPandas()

    assert len(got) == len(want)
    key = ["user_id", "ts", "p_ts"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert (g["value"].values == w["value"].values).all()


def test_join_strategy_hints(tables):
    from tidierdb_jl_spark.plans.show import show_query

    big, dim = tables["lineitem"], tables["supplier"]
    bc = big.inner_join(dim, by="l_suppkey == s_suppkey", strategy="broadcast")
    assert "BroadcastHashJoin" in show_query(bc)
    smj = big.inner_join(dim, by="l_suppkey == s_suppkey", strategy="merge")
    assert "SortMergeJoin" in show_query(smj)
    shj = big.inner_join(dim, by="l_suppkey == s_suppkey", strategy="shuffle_hash")
    assert "ShuffledHashJoin" in show_query(shj)
    # strategy must not change results
    assert bc.df.count() == smj.df.count() == big.df.count()
    import pytest

    with pytest.raises(ValueError, match="strategy"):
        big.inner_join(dim, by="l_suppkey == s_suppkey", strategy="bogus")


def test_stream_rollup_matches_batch_rollup(spark, tables, stream_dir):
    """The streaming rollup's output schema AND values must equal the
    batch time_rollup's, bucket for bucket — the continuous-aggregate
    contract that lets merge_rollup consume either."""
    from tidierdb_jl_spark.operators.timeagg import time_rollup
    from tidierdb_jl_spark.streaming.stream import stream_rollup

    st = read_stream(spark, stream_dir)
    live = stream_rollup(
        st, "ts", "1 hour", keys=["event_type"], n="n()", total="sum(value)"
    )
    out = run_to_memory(live, "roll_live", mode="complete").toPandas()

    batch = time_rollup(
        tables["events"], "ts", "1 hour", keys=["event_type"],
        n="n()", total="sum(value)",
    ).collect()

    assert sorted(out.columns) == sorted(batch.columns)
    key = lambda pdf: sorted(  # noqa: E731
        (str(b), et, int(n), round(v, 6))
        for b, et, n, v in zip(
            pdf["bucket"], pdf["event_type"], pdf["n"], pdf["total"]
        )
    )
    assert key(out) == key(batch)


def test_continuous_aggregate_live_head(spark, tables):
    """The full continuous-aggregate story: a batch rollup over history
    plus a stream_rollup over the live slice, unioned and merged coarser,
    must equal the rollup computed directly over all events — proving the
    two paths are interchangeable inputs to merge_rollup."""
    import os
    import tempfile

    from tidierdb_jl_spark.operators.timeagg import merge_rollup, time_rollup
    from tidierdb_jl_spark.streaming.stream import stream_rollup

    ev = tables["events"]
    cut = ev.df.selectExpr("date_add(min(to_date(ts)), 20)").first()[0]
    hist = ev.filter(f"to_date(ts) < '{cut}'")
    live = ev.filter(f"to_date(ts) >= '{cut}'")

    d = tempfile.mkdtemp(prefix="live_slice_")
    live.df.write.mode("overwrite").parquet(os.path.join(d, "ev"))
    live_stream = read_stream(spark, os.path.join(d, "ev"))

    batch_tail = time_rollup(
        hist, "ts", "1 hour", keys=["event_type"], n="n()", total="sum(value)"
    ).ungroup()
    stream_head = stream_rollup(
        live_stream, "ts", "1 hour", keys=["event_type"],
        n="n()", total="sum(value)",
    )
    head_df = run_to_memory(stream_head, "cagg_head", mode="complete")

    combined = TidyFrame(batch_tail.df.unionByName(head_df))
    daily = (
        merge_rollup(combined, "1 day", keys=["event_type"],
                     n="sum(n)", total="sum(total)")
        .ungroup().arrange("bucket", "event_type").collect()
    )
    direct = (
        time_rollup(ev, "ts", "1 day", keys=["event_type"],
                    n="n()", total="sum(value)")
        .ungroup().arrange("bucket", "event_type").collect()
    )
    assert (daily["bucket"].values == direct["bucket"].values).all()
    assert (daily["n"].values == direct["n"].values).all()
    assert abs(daily["total"] - direct["total"]).max() < 1e-6


def test_streaming_ingest_incremental_dedup_upsert(spark, tables, tmp_path):
    """End-to-end CDC ingest composition: file stream -> foreach_batch
    (exact_dedup_incremental against the accumulated store) ->
    merge_upsert into a parquet store. Two arriving file drops, where
    drop 2 repeats half of drop 1: the store must hold each fingerprint
    exactly once, keeping the first-seen doc."""
    import os

    from tidierdb_jl_spark.llm.dedup import exact_dedup_incremental
    from tidierdb_jl_spark.sources.writers import merge_upsert
    from tidierdb_jl_spark.streaming.stream import foreach_batch, read_stream

    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)

    docs = tables["documents"].select("doc_id", "text")
    drop1 = docs.filter("doc_id < 60").df
    drop2 = docs.filter("doc_id >= 30 AND doc_id < 100").df  # 30-59 repeat

    def ingest(batch_df, batch_id):
        batch = TidyFrame(batch_df)
        if os.path.exists(store) and any(
            not n.startswith(("_", ".")) for n in os.listdir(store)
        ):
            seen = TidyFrame(spark.read.parquet(store)).select("fingerprint")
            fresh = exact_dedup_incremental(batch, seen, "doc_id")
        else:
            fresh = exact_dedup_incremental(
                batch, TidyFrame(batch_df.limit(0)), "doc_id"
            )
        merge_upsert(spark, store, fresh, "doc_id")

    drop1.write.mode("append").parquet(inbox)
    st = read_stream(spark, inbox)
    q = foreach_batch(st, ingest, checkpoint=ckpt, mode="append")
    try:
        q.processAllAvailable()
        drop2.write.mode("append").parquet(inbox)
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(store).toPandas()
    # every fingerprint exactly once...
    assert got["fingerprint"].is_unique
    # ...and equal to a one-shot dedup over everything that arrived
    both = docs.filter("doc_id < 100").collect()
    import hashlib
    import re

    def fp(text):
        norm = re.sub(r"\s+", " ", text or "").strip().lower()
        return hashlib.md5(norm.encode()).hexdigest()

    first_seen = {}
    for r in sorted(both.itertuples(), key=lambda r: r.doc_id):
        first_seen.setdefault(fp(r.text), int(r.doc_id))
    assert sorted(got["doc_id"]) == sorted(first_seen.values())


def test_stateless_cleaning_pipeline_runs_on_stream(spark, tables):
    """The corpus-cleaning surface is stream-compatible where it should
    be: quality gates, PII scrub, HTML strip, hash split, k-fold, and
    importance-free mixing predicates are pure scan expressions, so the
    SAME TidyFrame code runs on a readStream and matches the batch
    result row-for-row."""
    import tempfile

    from tidierdb_jl_spark.llm.pipeline import kfold_by_hash, quality_filter, split_by_hash
    from tidierdb_jl_spark.llm.scrub import scrub_pii, strip_html

    d = tempfile.mkdtemp(prefix="docs_stream_")
    tables["documents"].df.write.mode("overwrite").parquet(d)

    def pipeline(tf):
        cleaned = quality_filter(tf, min_words=10)
        cleaned = scrub_pii(cleaned, "text")
        cleaned = strip_html(cleaned, "text")
        cleaned = split_by_hash(cleaned, "doc_id", 0.8)
        return kfold_by_hash(cleaned, "doc_id", k=5).select(
            "doc_id", "n_words", "split", "fold"
        )

    batch = pipeline(tables["documents"]).collect()
    st = read_stream(spark, d)
    streamed = run_to_memory(pipeline(st), "clean_stream")
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, batch.itertuples(index=False)))
    assert got == want
    assert len(got) > 0


def test_streaming_ingest_semantic_dedup_upsert(spark, tables, tmp_path):
    """Second E2E ingest composition, vector edition: file stream of
    embedding rows -> foreach_batch (embedding_dedup_incremental against
    the accumulated vector store) -> merge_upsert. Drop 2 re-sends a
    third of drop 1: every re-sent vector must be flagged as a duplicate
    of its stored self (cosine 1.0 >= any threshold) and never re-enter
    the store."""
    import os

    from tidierdb_jl_spark.llm.dedup import embedding_dedup_incremental
    from tidierdb_jl_spark.sources.writers import merge_upsert
    from tidierdb_jl_spark.streaming.stream import foreach_batch, read_stream

    inbox = str(tmp_path / "vec_inbox")
    store = str(tmp_path / "vec_store")
    ckpt = str(tmp_path / "vec_ckpt")
    os.makedirs(inbox)

    emb = tables["embeddings"].select("vec_id", "embedding")
    drop1 = emb.filter("vec_id < 60").df
    drop2 = emb.filter("vec_id >= 40 AND vec_id < 90").df  # 40-59 repeat

    def ingest(batch_df, batch_id):
        batch = TidyFrame(batch_df)
        if os.path.exists(store) and any(
            not n.startswith(("_", ".")) for n in os.listdir(store)
        ):
            seen = TidyFrame(spark.read.parquet(store))
            flagged = embedding_dedup_incremental(
                batch, seen, "vec_id", threshold=0.99
            )
        else:
            flagged = batch.mutate(dup_of="CAST(NULL AS BIGINT)")
        fresh = flagged.filter("dup_of IS NULL").select("vec_id", "embedding")
        merge_upsert(spark, store, fresh, "vec_id")

    drop1.write.mode("append").parquet(inbox)
    st = read_stream(spark, inbox)
    q = foreach_batch(st, ingest, checkpoint=ckpt, mode="append")
    try:
        q.processAllAvailable()
        drop2.write.mode("append").parquet(inbox)
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(store).toPandas()
    # re-sent ids 40-59 arrived as exact self-duplicates -> dropped;
    # the store holds exactly drop1 ∪ (drop2 minus the repeats)
    assert sorted(got["vec_id"]) == list(range(90))
    assert got["vec_id"].is_unique


# ---------------------------------------------------------------------------
# late-data / out-of-order semantics: the watermark boundary itself
# ---------------------------------------------------------------------------


def _write_batch(path, rows):
    """One parquet file = one micro-batch (files written between
    processAllAvailable() calls arrive as separate batches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np

    ts = pa.array(
        [np.datetime64(f"2024-01-01T{t}", "us") for t, _, _ in rows],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table({"ts": ts,
                  "k": pa.array([k for _, k, _ in rows]),
                  "v": pa.array([float(v) for _, _, v in rows])}),
        path,
    )


def test_watermark_drops_late_rows_exact_boundary(spark, tmp_path):
    """Deliberately-late events vs a 10-minute watermark on a 10-minute
    tumbling window, with controlled micro-batch boundaries.  Batch 1
    advances the watermark to 00:48; batch 2 then carries one row at
    00:07 (its window [00:00,00:10) closed at 00:10 <= 00:48 -> DROPPED)
    and one at 00:41 (window [00:40,00:50) still open: 00:50 > 00:48 ->
    KEPT).  Asserts the exact kept/dropped row sets via the per-batch
    update stream, not just end-state parity."""
    import os

    from pyspark.sql import types as T

    d = tmp_path / "late_tumbling"
    os.makedirs(d)
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    _write_batch(str(d / "b1.parquet"), [
        ("00:05:00", "a", 1.0),   # window 00:00
        ("00:12:00", "a", 1.0),   # window 00:10
        ("00:58:00", "a", 1.0),   # window 00:50; max ts -> watermark 00:48
    ])

    st = read_stream(spark, str(d), schema=schema)
    res = tumbling_window(
        with_watermark(st, "ts", "10 minutes"), "ts", "10 minutes"
    ).summarize(n="n()")

    q = (res.df.writeStream.outputMode("update")
         .format("memory").queryName("late_tumbling").start())
    try:
        q.processAllAvailable()
        batch1 = spark.sql("SELECT * FROM late_tumbling").collect()
        _write_batch(str(d / "b2.parquet"), [
            ("00:07:00", "a", 1.0),  # LATE: window end 00:10 <= wm 00:48
            ("00:41:00", "a", 1.0),  # window end 00:50 >  wm 00:48: kept
            ("00:59:00", "a", 1.0),  # on-time
        ])
        q.processAllAvailable()
        full = spark.sql("SELECT * FROM late_tumbling").collect()
    finally:
        q.stop()

    def winset(rows):
        return {(str(r["window"].start)[11:16], r["n"]) for r in rows}

    assert winset(batch1) == {("00:00", 1), ("00:10", 1), ("00:50", 1)}
    batch2 = full[len(batch1):]
    # the late 00:07 row updated NOTHING: window 00:00 absent from batch-2
    # updates; 00:41 survived (n=1); 00:59 joined 00:58 (n=2)
    assert winset(batch2) == {("00:40", 1), ("00:50", 2)}


def test_stream_join_state_eviction_late_probe(spark, tmp_path):
    """Stream-stream join state eviction: a right-side row arriving after
    the watermark passed its event time finds the matching left row's
    state evicted -> no output, while the identical data in BATCH mode
    does produce the pair.  The kept/dropped boundary follows watermark
    arithmetic: wm after batch 1 = 00:58 - 10 min = 00:48; the late probe
    at 00:06 < 00:48 is dropped, a probe inside the bound matches."""
    import os

    from pyspark.sql import types as T

    ld, rd = tmp_path / "sj_left", tmp_path / "sj_right"
    os.makedirs(ld), os.makedirs(rd)
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    _write_batch(str(ld / "b1.parquet"), [
        ("00:05:00", "k1", 1.0),   # state for this is evicted once wm>00:10
        ("00:55:00", "k2", 2.0),
        ("00:58:00", "clock", 0.0),
    ])
    _write_batch(str(rd / "b1.parquet"), [
        ("00:58:00", "k2", 20.0),  # within 5 min of left k2 -> match
        ("00:58:00", "clock2", 0.0),
    ])

    from tidierdb_jl_spark.streaming.stream import stream_join

    sl = with_watermark(read_stream(spark, str(ld), schema=schema), "ts", "10 minutes")
    sr = with_watermark(read_stream(spark, str(rd), schema=schema), "ts", "10 minutes")
    joined = stream_join(sl, sr, "k", "ts", "ts", "5 minutes")

    q = (joined.df.writeStream.outputMode("append")
         .format("memory").queryName("sj_late").start())
    try:
        q.processAllAvailable()
        _write_batch(str(rd / "b2.parquet"), [
            ("00:06:00", "k1", 10.0),  # 42 min late: left state evicted
        ])
        q.processAllAvailable()
        got = spark.sql("SELECT k, v, v_right FROM sj_late").collect()
    finally:
        q.stop()

    assert {(r.k, r.v, r.v_right) for r in got} == {("k2", 2.0, 20.0)}

    # contrast: batch mode (no watermark, infinite state) DOES pair k1
    lb = TidyFrame(spark.createDataFrame(
        [("2024-01-01 00:05:00", "k1", 1.0), ("2024-01-01 00:55:00", "k2", 2.0)],
        "ts string, k string, v double").selectExpr("CAST(ts AS TIMESTAMP) ts", "k", "v"))
    rb = TidyFrame(spark.createDataFrame(
        [("2024-01-01 00:06:00", "k1", 10.0), ("2024-01-01 00:58:00", "k2", 20.0)],
        "ts string, k string, v double").selectExpr("CAST(ts AS TIMESTAMP) ts", "k", "v"))
    from tidierdb_jl_spark.streaming.stream import stream_join as sj
    batch_pairs = sj(lb, rb, "k", "ts", "ts", "5 minutes").df
    assert {(r.k, r.v, r.v_right) for r in batch_pairs.collect()} == {
        ("k1", 1.0, 10.0), ("k2", 2.0, 20.0)}
