"""Structured-Streaming operators (beyond the reference — SURVEY §2.10:
the reference has no stream processing at all; its ``stream=true`` collect
is just chunked result fetching).

Thin tidy wrappers over readStream → watermark → windowed aggregation →
writeStream, plus stateful dedup.  Batch/stream parity: the same
``TidyFrame`` verbs work on a streaming DataFrame (Spark's unified API);
these helpers add the streaming-only pieces — watermarks, time windows,
session windows, within-watermark dedup — and a synchronous test harness
(memory sink + ``processAllAvailable``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import TidyFrame

__all__ = [
    "read_stream",
    "with_watermark",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "dedup_within_watermark",
    "stateful_running_agg",
    "run_to_memory",
    "write_stream",
    "foreach_batch",
]


def read_stream(
    spark: SparkSession, path: str, schema=None, fmt: str = "parquet", **options
) -> TidyFrame:
    """Streaming scan (files appearing under ``path``).  Schema is
    mandatory for file streams — pass one or give a sample path in
    options['sampleDir'] to borrow its schema."""
    if schema is None:
        sample = options.pop("sampleDir", path)
        schema = spark.read.format(fmt).load(sample).schema
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return TidyFrame(reader.load(path))


def with_watermark(tf: TidyFrame, ts_col: str, delay: str) -> TidyFrame:
    """Late-data bound, e.g. ``with_watermark(t, "ts", "10 minutes")``."""
    return TidyFrame(tf.df.withWatermark(ts_col, delay), groups=tf.groups)


def tumbling_window(
    tf: TidyFrame, ts_col: str, size: str, *keys: str
) -> TidyFrame:
    """Group by a tumbling time window (+ optional keys); follow with
    ``.summarize(...)``."""
    df = tf.df.groupBy(F.window(ts_col, size), *keys)
    return _grouped(df, tf, ["window", *keys])


def sliding_window(
    tf: TidyFrame, ts_col: str, size: str, slide: str, *keys: str
) -> TidyFrame:
    df = tf.df.groupBy(F.window(ts_col, size, slide), *keys)
    return _grouped(df, tf, ["window", *keys])


def session_window(tf: TidyFrame, ts_col: str, gap: str, *keys: str) -> TidyFrame:
    """Session windows with inactivity ``gap`` (e.g. "30 minutes")."""
    df = tf.df.groupBy(F.session_window(ts_col, gap), *keys)
    return _grouped(df, tf, ["session_window", *keys])


class _GroupedStream:
    """Minimal grouped handle so ``.summarize()`` works on windowed groups."""

    def __init__(self, gdf, parent: TidyFrame):
        self._gdf = gdf
        self._parent = parent

    def summarize(self, **named) -> TidyFrame:
        from ..functions.registry import rewrite

        aggs = [F.expr(rewrite(str(e), None, False)).alias(n) for n, e in named.items()]
        return TidyFrame(self._gdf.agg(*aggs))

    summarise = summarize


def _grouped(gdf, parent: TidyFrame, keys) -> _GroupedStream:
    return _GroupedStream(gdf, parent)


def dedup_within_watermark(tf: TidyFrame, *cols: str) -> TidyFrame:
    """Stateful streaming dedup bounded by the watermark
    (``dropDuplicatesWithinWatermark``) — state is evicted as the
    watermark advances, so memory stays bounded on unbounded streams."""
    return TidyFrame(tf.df.dropDuplicatesWithinWatermark(list(cols)))


def stateful_running_agg(
    tf: TidyFrame, keys, value_col: str
) -> TidyFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, sum, min, max) maintained in GroupState across
    micro-batches — the escape hatch for aggregations Spark's built-in
    streaming aggs can't express (SURVEY §2.10 north star).

    Emits one row per key per micro-batch with the state *after* folding
    that batch in.  State is a fixed-width tuple (~40 bytes/key); for
    unbounded key spaces pair with a watermark-driven timeout upstream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import types as T

    keys = [keys] if isinstance(keys, str) else list(keys)
    key_fields = [tf.df.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("vmin", T.DoubleType()),
            T.StructField("vmax", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("vmin", T.DoubleType()),
            T.StructField("vmax", T.DoubleType()),
        ]
    )

    def fold(key, pdfs, state):
        if state.exists:
            n, total, vmin, vmax = state.get
        else:
            n, total, vmin, vmax = 0, 0.0, None, None
        for pdf in pdfs:
            v = pdf[value_col].dropna()
            if len(v):
                n += int(v.count())
                total += float(v.sum())
                bmin, bmax = float(v.min()), float(v.max())
                vmin = bmin if vmin is None else min(vmin, bmin)
                vmax = bmax if vmax is None else max(vmax, bmax)
        state.update((n, total, vmin, vmax))
        row = dict(zip(keys, key))
        row.update(n=n, total=total, vmin=vmin, vmax=vmax)
        yield pd.DataFrame([row])

    out = tf.df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    return TidyFrame(out)


def write_stream(
    result: TidyFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    mode: str = "append",
    trigger: str | None = None,
    **options,
):
    """Durable streaming sink: file format + checkpoint directory for
    exactly-once output.  ``trigger`` accepts a processing-time interval
    (e.g. "10 seconds") or "availableNow" to drain what exists and stop.
    Returns the StreamingQuery — call ``.awaitTermination()`` or
    ``.processAllAvailable()`` yourself."""
    w = (
        result.df.writeStream.outputMode(mode)
        .format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    for k, v in options.items():
        w = w.option(k, v)
    if trigger == "availableNow":
        w = w.trigger(availableNow=True)
    elif trigger is not None:
        w = w.trigger(processingTime=trigger)
    return w.start()


def foreach_batch(
    result: TidyFrame, fn, checkpoint: str | None = None, mode: str = "update"
):
    """Arbitrary per-micro-batch sink: ``fn(batch_df, batch_id)`` runs on
    the driver with a *batch* DataFrame — the escape hatch for sinks with
    no streaming connector (JDBC upserts, dedup merges, multi-table
    writes).  Returns the StreamingQuery."""
    w = result.df.writeStream.outputMode(mode).foreachBatch(fn)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()


def run_to_memory(
    result: TidyFrame, name: str, mode: str = "append"
) -> DataFrame:
    """Test harness: run a streaming query to completion on currently
    available files via a memory sink; returns the batch DataFrame of
    results."""
    q = (
        result.df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = result.df.sparkSession
    return spark.sql(f"SELECT * FROM {name}")
