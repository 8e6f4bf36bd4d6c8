"""Hypertable-style time rollups: bucket events into fixed time intervals,
pre-aggregate per bucket, and re-aggregate ("merge") fine rollups into
coarser ones WITHOUT rescanning the raw table — TimescaleDB's continuous
aggregates, done Spark-first (beyond the reference, which has no time-series
operators; SURVEY §2 north-star family).

Scale design:
- ``time_bucket`` is a pure timestamp expression (floor of epoch seconds),
  so bucketing fuses into the scan; a rollup is one partial-agg shuffle on
  (bucket, keys) — the same shape Spark gives GROUP BY, with map-side
  combine doing most of the reduction before the exchange.
- Mergeability is the point at 100 TB: keep additive measures
  (count/sum/min/max) plus *mergeable sketches* (HyperLogLog via
  ``hll_sketch_agg``) in the fine rollup; coarser granularities then
  aggregate the tiny rollup table (``merge_rollup``), never the raw data.
  avg is derived as sum/count at read time; distinct counts merge via
  ``hll_union_agg`` — the one aggregate that is NOT re-aggregable exactly,
  which is exactly why the sketch, not the number, is stored.
"""

from __future__ import annotations

from ..core import TidyFrame

__all__ = [
    "time_bucket_expr",
    "time_rollup",
    "merge_rollup",
    "refresh_rollup",
    "gapfill",
    "kll_measure",
    "kll_merge",
    "kll_quantile",
]

_UNITS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _width_seconds(width: str) -> int:
    parts = width.strip().lower().split()
    if len(parts) == 1:
        n, unit = 1, parts[0]
    else:
        n, unit = int(parts[0]), parts[1]
    unit = unit.rstrip("s")
    if unit not in _UNITS:
        raise ValueError(
            f"unsupported bucket width {width!r}; units: {sorted(_UNITS)}"
        )
    return n * _UNITS[unit]


def time_bucket_expr(ts_col: str, width: str) -> str:
    """SQL expression flooring ``ts_col`` to a ``width`` bucket (e.g.
    '15 minutes', '1 hour', '1 day').  Epoch-seconds arithmetic, not
    ``window()``, so the result is a plain timestamp column usable as a
    join/group key and reproducible in any SQL dialect."""
    secs = _width_seconds(width)
    return (
        f"timestamp_seconds(CAST(floor(unix_timestamp({ts_col}) / {secs}) "
        f"AS BIGINT) * {secs})"
    )


def time_rollup(
    tf: TidyFrame,
    ts_col: str,
    width: str,
    keys=(),
    bucket_col: str = "bucket",
    **aggs: str,
) -> TidyFrame:
    """Aggregate into fixed time buckets: one shuffle on (bucket, *keys).
    ``aggs`` are summarize expressions (e.g. ``n="n()"``,
    ``uniq_sketch="hll_sketch_agg(user_id)"``).  Store sketches, not
    estimates, if the rollup will be merged coarser later."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out = tf.mutate(**{bucket_col: time_bucket_expr(ts_col, width)})
    return out.group_by(bucket_col, *keys).summarize(**aggs)


def refresh_rollup(
    raw: TidyFrame,
    path: str,
    ts_col: str,
    width: str,
    keys=(),
    lookback_days: int = 1,
    bucket_col: str = "bucket",
    **aggs: str,
) -> TidyFrame:
    """Incremental continuous-aggregate maintenance: keep a parquet rollup
    (day-partitioned) up to date by recomputing ONLY the recent time slice
    — never the full history.

    First call materializes the full rollup.  Subsequent calls find the
    newest day already rolled up, re-aggregate raw rows from
    ``lookback_days`` before it onward (the ``ts_col`` predicate pushes
    down to the raw scan, so old data is never read), and replace exactly
    those day partitions via dynamic partition overwrite.  At 100 TB this
    turns a daily refresh from a full-history scan into a scan of ~1 day
    of raw data + a rewrite of ~``lookback_days`` rollup partitions.
    ``lookback_days`` covers late-arriving data, like a watermark.

    Returns the refreshed rollup as a TidyFrame reading from ``path``.
    """
    import os

    from pyspark.sql import functions as F

    spark = raw.df.sparkSession

    def rollup_slice(tf):
        out = time_rollup(tf, ts_col, width, keys, bucket_col, **aggs)
        return out.mutate(
            bucket_day=f"date_format({bucket_col}, 'yyyy-MM-dd')"
        )

    exists = os.path.exists(path) and any(
        not n.startswith(("_", ".")) for n in os.listdir(path)
    )
    if not exists:
        rollup_slice(raw).df.write.partitionBy("bucket_day").mode(
            "overwrite"
        ).parquet(path)
        return TidyFrame(spark.read.parquet(path))

    existing = spark.read.parquet(path)
    max_day = existing.agg(F.max("bucket_day")).first()[0]
    # Align the recompute cutoff to a BUCKET boundary, not a day boundary:
    # for widths > 1 day ('1 week'), a day-aligned cutoff would re-aggregate
    # the bucket spanning it from only the rows after the cutoff and
    # dynamically overwrite its partition with an understated value.
    day_cutoff = f"date_sub(to_date('{max_day}'), {lookback_days})"
    cutoff = time_bucket_expr(f"CAST({day_cutoff} AS TIMESTAMP)", width)
    fresh = rollup_slice(raw.filter(f"CAST({ts_col} AS TIMESTAMP) >= {cutoff}"))
    (
        fresh.df.write.partitionBy("bucket_day")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    return TidyFrame(spark.read.parquet(path))


def kll_measure(col: str, k: int = 200) -> str:
    """Summarize expression storing a mergeable KLL quantile sketch of
    ``col`` (DataSketches, Spark 4.x) — quantiles join count/sum/HLL/theta
    as re-aggregable rollup measures.  Rank error ~1.65% at the default
    k=200; estimates are data values (no interpolation) and compaction is
    randomized, so treat outputs as approximate, not reproducible bits."""
    return f"kll_sketch_agg_double(CAST({col} AS DOUBLE), {k})"


def kll_merge(sketch_col: str) -> str:
    """Merge expression for ``merge_rollup``: Spark exposes KLL merge only
    as a 2-arg scalar (``kll_sketch_merge_double``), so the group's
    sketches fold via the ``aggregate`` HOF over ``collect_list``.  The
    repeated collect_list is ONE aggregate (Catalyst dedupes identical
    aggregate expressions); the fold is driver-free and size-bounded by
    the merge fan-in (e.g. 24 hourly sketches per daily group)."""
    lst = f"collect_list({sketch_col})"
    return (
        f"aggregate(slice({lst}, 2, size({lst}) - 1), {lst}[0], "
        f"(a, x) -> kll_sketch_merge_double(a, x))"
    )


def kll_quantile(sketch_col: str, q: float) -> str:
    """Read a quantile estimate out of a stored KLL sketch column."""
    return f"kll_sketch_get_quantile_double({sketch_col}, CAST({q} AS DOUBLE))"


def gapfill(
    tf: TidyFrame,
    bucket_col: str,
    width: str,
    keys=(),
    fill: dict | None = None,
) -> TidyFrame:
    """TimescaleDB-style ``time_bucket_gapfill``: densify a rollup so every
    (key, bucket) combination between the rollup's first and last bucket
    exists, then fill measure columns per ``fill``:

    - ``"locf"``  — last observation carried forward (NULL before the
      first observation, like TimescaleDB's ``locf()``);
    - ``"interp"`` — linear interpolation between the nearest observed
      neighbors (NULL outside the observed range, like ``interpolate()``);
    - any other value — constant fill via ``coalesce``.

    Scale shape: the bucket grid is generated JVM-side —
    ``sequence(lo, hi, interval)`` exploded against the DISTINCT key set
    crossed with a broadcast 1×1 bounds row — so grid size is
    #keys × #buckets and never touches the raw table.  All fills share ONE
    sort per key partition (the window frames differ, not the ordering).
    With no ``keys`` the window is a single partition — fine for a rollup,
    which is already tiny relative to the raw data.
    """
    from pyspark.sql import functions as F

    from ..sqlbatch import bq

    keys = [keys] if isinstance(keys, str) else list(keys)
    fill = fill or {}
    df = tf.df
    secs = _width_seconds(width)
    qb = bq(bucket_col)
    bounds = df.agg(
        F.expr(f"min({qb}) AS __lo"), F.expr(f"max({qb}) AS __hi")
    )
    grid = (
        df.select(*keys).distinct().crossJoin(F.broadcast(bounds))
        if keys
        else bounds
    )
    grid = grid.selectExpr(
        *[bq(k) for k in keys],
        f"explode(sequence(__lo, __hi, interval {secs} second)) AS {qb}",
    )
    out = grid.join(df, [bucket_col, *keys], "left")

    # Both fills use the unbounded-PRECEDING running frame (evaluated
    # incrementally, O(n) per partition).  The "next neighbor" lookup runs
    # over the DESCENDING bucket order instead of an unbounded-FOLLOWING
    # frame, which Spark recomputes per row (O(n²) on long time grids).
    # Window specs + fill expressions ship as SQL strings — the parsed
    # trees match the Column-API spelling (ASC defaults NULLS FIRST, DESC
    # defaults NULLS LAST in both), but the driver pays one py4j round
    # trip per projection instead of one per Column object (guide §7.3).
    part = f"PARTITION BY {', '.join(bq(k) for k in keys)} " if keys else ""
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    w_prev = f"OVER ({part}ORDER BY {qb} {frame})"
    w_next = f"OVER ({part}ORDER BY {qb} DESC {frame})"

    # Batch all same-direction window expressions into ONE select each, so
    # Spark plans exactly one Window (and one Sort) per direction.  The
    # earlier per-column withColumn chain split them into separate window
    # batches — three Sort+Window passes over the grid for locf+interp
    # instead of two (sequential withColumns end up in distinct batches
    # when a later column's final projection references an earlier one).
    asc_cols: dict = {}
    desc_cols: dict = {}
    for col, how in fill.items():
        qc = bq(col)
        if how == "locf":
            asc_cols[f"__locf_{col}"] = f"last({qc}, true) {w_prev}"
        elif how == "interp":
            # carry (t, v) of the nearest non-null neighbor each way; the
            # struct is NULL exactly when the measure is, so ignorenulls
            # walks to the right observation
            pair = (
                f"CASE WHEN {qc} IS NOT NULL THEN"
                f" struct(unix_timestamp({qb}) AS t,"
                f" CAST({qc} AS DOUBLE) AS v) END"
            )
            asc_cols[f"__prev_{col}"] = f"last({pair}, true) {w_prev}"
            desc_cols[f"__nxt_{col}"] = f"last({pair}, true) {w_next}"
    if asc_cols:
        out = out.selectExpr("*", *[f"{e} AS {bq(n)}" for n, e in asc_cols.items()])
    if desc_cols:
        out = out.selectExpr("*", *[f"{e} AS {bq(n)}" for n, e in desc_cols.items()])
    # One final projection computes every fill and drops the temp columns —
    # a withColumn per filled column would cost one analysis pass each.
    # Fill expressions ship as SQL strings in one flat selectExpr (plan
    # identical); a constant fill whose literal has no exact SQL spelling
    # (e.g. a Python float would parse as DECIMAL, not DOUBLE) falls back
    # to the Column form for the whole projection.
    def _fill_sql(col: str, how):
        qc = bq(col)
        if how == "locf":
            return bq(f"__locf_{col}")
        if how == "interp":
            prev, nxt = bq(f"__prev_{col}"), bq(f"__nxt_{col}")
            interp = (
                f"{prev}.v + ({nxt}.v - {prev}.v)"
                f" * (unix_timestamp({qb}) - {prev}.t)"
                f" / ({nxt}.t - {prev}.t)"
            )
            return (
                f"CASE WHEN {qc} IS NOT NULL THEN CAST({qc} AS DOUBLE)"
                f" WHEN {nxt}.t = {prev}.t THEN {prev}.v"
                f" ELSE {interp} END"
            )
        if isinstance(how, bool):
            return f"coalesce({qc}, {'TRUE' if how else 'FALSE'})"
        if isinstance(how, int):
            return f"coalesce({qc}, {how})"
        if isinstance(how, str):
            lit = how.replace("\\", "\\\\").replace("'", "\\'")
            return f"coalesce({qc}, '{lit}')"
        return None  # no exact SQL literal spelling — Column fallback

    def _fill_expr(col: str, how):
        if how in ("locf", "interp"):
            return F.expr(_fill_sql(col, how))
        return F.coalesce(F.col(col), F.lit(how))

    temps = set(asc_cols) | set(desc_cols)
    keep = [c for c in out.columns if c not in temps]
    sqls = {c: _fill_sql(c, fill[c]) for c in keep if c in fill}
    if all(s is not None for s in sqls.values()):
        out = out.selectExpr(
            *[f"({sqls[c]}) AS {bq(c)}" if c in sqls else bq(c) for c in keep]
        )
    else:
        out = out.select(
            *[_fill_expr(c, fill[c]).alias(c) if c in fill else c for c in keep]
        )
    return TidyFrame(out)


def merge_rollup(
    tf: TidyFrame,
    width: str,
    keys=(),
    bucket_col: str = "bucket",
    **aggs: str,
) -> TidyFrame:
    """Re-aggregate an existing rollup to a coarser granularity by
    re-bucketing ``bucket_col`` and merging the stored partials — the
    input here is the (tiny) rollup table, never the raw events.  Merge
    expressions operate on the rollup's columns: ``n="sum(n)"``,
    ``uniq="hll_sketch_estimate(hll_union_agg(uniq_sketch))"``."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out = tf.mutate(**{bucket_col: time_bucket_expr(bucket_col, width)})
    return out.group_by(bucket_col, *keys).summarize(**aggs)
