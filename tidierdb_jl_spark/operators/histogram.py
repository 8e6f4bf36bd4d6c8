"""Equi-width histograms for corpus/table profiling.

One pass for the bounds (a 1-row driver action, skipped when the caller
supplies them), one map-side-combined aggregation for the counts, and a
broadcast bucket grid so the output always has exactly ``bins`` rows —
empty buckets included (a histogram with silently-missing bars misleads).
Bucket assignment uses plain double arithmetic (no SQL dialect
``width_bucket``), so any engine evaluating the same expression produces
identical buckets — that is what makes the op differentially testable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["histogram", "equi_depth_histogram"]


def histogram(
    tf,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
):
    """Equi-width histogram of a numeric column/expression.

    Returns exactly ``bins`` rows: ``bucket`` (0-based), ``lo_edge``,
    ``hi_edge``, ``n``.  NULLs are excluded; values outside explicit
    ``[lo, hi]`` are clamped into the edge buckets (so provided bounds
    act as winsorization, matching the usual profiling need); ``x == hi``
    lands in the last bucket.  When bounds are not given they come from
    one ``min/max`` aggregate (a single-row driver action).
    """
    from ..core import TidyFrame

    if bins < 1:
        raise ValueError("bins must be >= 1")
    sdf = tf.df if hasattr(tf, "df") else tf
    c = F.expr(col) if isinstance(col, str) else col
    x = c.cast("double")
    if lo is None or hi is None:
        row = sdf.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).collect()[0]
        lo = row.lo if lo is None else lo
        hi = row.hi if hi is None else hi
    if lo is None:  # all-NULL or empty input: one empty bucket grid
        lo, hi = 0.0, 1.0
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        hi = lo + 1.0  # degenerate range: single-point data

    width_expr = (x - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(bins))
    bucket = (
        F.when(x.isNull(), None)
        .when(x >= hi, bins - 1)
        .when(x <= lo, 0)
        .otherwise(F.floor(width_expr).cast("int"))
    )
    counts = (
        sdf.where(x.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    spark = sdf.sparkSession
    grid = spark.range(bins).select(
        F.col("id").cast("int").alias("bucket"),
        (F.lit(lo) + F.col("id") * F.lit((hi - lo) / bins)).alias("lo_edge"),
        (F.lit(lo) + (F.col("id") + 1) * F.lit((hi - lo) / bins)).alias("hi_edge"),
    )
    out = (
        grid.join(counts, "bucket", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .select("bucket", "lo_edge", "hi_edge", "n")
    )
    return TidyFrame(out)


def equi_depth_histogram(
    tf,
    col: str,
    bins: int = 10,
    approx: bool | int = False,
):
    """Equi-DEPTH histogram: bucket edges at exact quantiles, so every
    bucket holds ~the same row count — the right profile for skewed
    columns, where equi-width collapses most mass into one bar.

    Returns ``bins`` rows (bucket, lo_edge, hi_edge, n).  Edges come from
    ONE aggregate (min, max, interior percentiles — a 1-row driver
    action, same cost as equi-width's bounds probe); bucket assignment
    is a pure fold over the edge list (count of interior edges strictly
    below x — ties collapse into the lower bucket, so heavy duplicate
    values leave later buckets legitimately empty).  Exact interpolated
    percentiles, hence engine-portable and oracle-checkable.
    """
    from ..core import TidyFrame

    if bins < 1:
        raise ValueError("bins must be >= 1")
    sdf = tf.df if hasattr(tf, "df") else tf
    x = (F.expr(col) if isinstance(col, str) else col).cast("double")
    fr = ", ".join(f"{i / bins}D" for i in range(1, bins))
    # approx: percentile_approx's bounded-memory sketch for corpus-scale
    # profiling (edges move by the sketch's rank error; oracles use exact)
    acc = 10000 if approx is True else int(approx) if approx else 0
    pfn = (
        f"percentile_approx(CAST(({col}) AS DOUBLE), array({fr}), {acc})" if acc
        else f"percentile(CAST(({col}) AS DOUBLE), array({fr}))"
    )
    cuts_expr = pfn if bins > 1 else None
    aggs = [F.min(x).alias("lo"), F.max(x).alias("hi")]
    if cuts_expr:
        aggs.append(F.expr(cuts_expr).alias("cuts"))
    row = sdf.agg(*aggs).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None:  # all-NULL or empty
        lo, hi = 0.0, 1.0
    # cuts round to 9 decimals BEFORE assignment: an interpolated cut that
    # lands on a duplicated data value can differ by 1 ulp across engines
    # ((1-g)*v + g*v evaluation order), which would flip every duplicate
    # of that value into the neighboring bucket on one engine only
    cuts = [round(float(c), 9) for c in row["cuts"]] if cuts_expr else []
    edges = [float(lo)] + cuts + [float(hi)]

    bucket_terms = " + ".join(f"IF(__x > {c!r}D, 1, 0)" for c in cuts) or "0"
    counts = (
        sdf.where(x.isNotNull())
        .select(x.alias("__x"))
        .selectExpr(f"CAST({bucket_terms} AS INT) AS bucket")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    spark = sdf.sparkSession
    grid = spark.createDataFrame(
        [(i, edges[i], edges[i + 1]) for i in range(bins)],
        "bucket INT, lo_edge DOUBLE, hi_edge DOUBLE",
    )
    out = (
        grid.join(counts, "bucket", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .select("bucket", "lo_edge", "hi_edge", "n")
    )
    return TidyFrame(out)
