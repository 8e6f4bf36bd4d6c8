"""Table/column profiling: the ``ANALYZE TABLE``-shaped statistics pass.

The reference exposes ``@summary`` for per-column describe output; this
is the planner-facing sibling — one row per column with the statistics a
query planner (or a skew pre-flight, see ``skew.py``) actually consumes:
row count, null count, distinct count, numeric min/max.  On a 100 TB
table these drive decisions like "is this join key near-unique (safe
hash join) or low-cardinality (broadcast the dim / pre-aggregate)?" and
"is this column's range tight enough for zorder bucketing?".

Scale shape: ONE aggregation job over the table computing every
column's stats in a single pass (no per-column scans), then a driver-side
unpivot of the single result row into the long report — the driver
action is 1 row regardless of table size, same bounded-scalar shape as
``zorder``'s min/max probe.  Distinct counts default to
``approx_count_distinct`` (HLL, mergeable, no expand); ``exact=True``
switches to real COUNT(DISTINCT), which Catalyst plans as an expand —
fine at test scale, deliberate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["column_stats", "with_outlier_scores", "psi_drift"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_stats(tf, cols=None, exact: bool = False):
    """Profile columns: one row per column with
    ``column, n_rows, n_null, n_distinct, min_num, max_num``.

    ``min_num``/``max_num`` are the numeric min/max cast to DOUBLE (NULL
    for non-numeric columns — string min/max is formatting-dependent and
    deliberately left out of the stable report).  ``n_distinct`` counts
    non-null distinct values; approximate (HLL) unless ``exact``.
    """
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    fields = {f.name: f.dataType for f in sdf.schema.fields}
    names = list(cols) if cols else list(fields)
    unknown = [c for c in names if c not in fields]
    if unknown:
        raise ValueError(f"column_stats: unknown columns {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in names:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        if exact:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))

    row = sdf.agg(*aggs).first().asDict()
    spark = sdf.sparkSession
    report = [
        (
            c,
            row["__n_rows"],
            row[f"__null_{c}"] or 0,
            row[f"__nd_{c}"],
            row.get(f"__min_{c}"),
            row.get(f"__max_{c}"),
        )
        for c in names
    ]
    schema = T.StructType([
        T.StructField("column", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_null", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
        T.StructField("min_num", T.DoubleType(), True),
        T.StructField("max_num", T.DoubleType(), True),
    ])
    return TidyFrame(spark.createDataFrame(report, schema))


def with_outlier_scores(
    tf,
    col: str,
    by=None,
    method: str = "zscore",
    out: str | None = None,
):
    """Per-row outlier score for a numeric column — the data-QA gate in
    front of a training pipeline ("drop rows whose value is implausible
    for its group").

    ``method="zscore"``: (x - mean) / stddev_samp.  ``method="mad"``: the
    robust variant 0.6745 * (x - median) / MAD (median absolute
    deviation) — insensitive to the outliers it is hunting.  ``by`` (a
    column name or list) scores within groups; ``None`` scores globally.

    Scale shape: grouped statistics come from a map-side-combined
    aggregation joined back on the group key (NOT a partitioned window —
    no per-group sort, and the stats side is tiny so Catalyst broadcasts
    it); the global case rides the same path with a constant key.  MAD
    needs two passes by definition (median, then median of deviations) —
    two aggregation shuffles, still zero sorts of the fact table.
    Degenerate groups (stddev/MAD = 0, e.g. single-row groups) score
    NULL rather than inf.
    """
    from pyspark.sql import functions as F

    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    name = out or f"{col}_outlier"
    keys = [by] if isinstance(by, str) else list(by or [])
    jkeys = keys or ["__g"]
    fact = sdf if keys else sdf.withColumn("__g", F.lit(1))

    if method == "zscore":
        stats = fact.groupBy(*jkeys).agg(
            F.avg(col).alias("__mu"), F.stddev_samp(col).alias("__sd")
        )
        scored = fact.join(stats, jkeys).withColumn(
            name,
            F.when(F.col("__sd") > 0, (F.col(col) - F.col("__mu")) / F.col("__sd")),
        )
        drop = ["__mu", "__sd"]
    elif method == "mad":
        med = fact.groupBy(*jkeys).agg(
            F.expr(f"percentile({col}, 0.5)").alias("__med")
        )
        with_med = fact.join(med, jkeys)
        mad = (
            with_med.withColumn("__ad", F.abs(F.col(col) - F.col("__med")))
            .groupBy(*jkeys)
            .agg(F.expr("percentile(__ad, 0.5)").alias("__mad"))
        )
        scored = with_med.join(mad, jkeys).withColumn(
            name,
            F.when(
                F.col("__mad") > 0,
                F.lit(0.6745) * (F.col(col) - F.col("__med")) / F.col("__mad"),
            ),
        )
        drop = ["__med", "__mad"]
    else:
        raise ValueError(f"method must be 'zscore'|'mad', got {method!r}")

    scored = scored.drop(*drop)
    if not keys:
        scored = scored.drop("__g")
    return TidyFrame(scored)


def psi_drift(
    expected,
    actual,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
):
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift alarm between a reference corpus (what
    the model trained on) and an incoming batch.

    Buckets are ``bins`` equi-width intervals over the EXPECTED side's
    [min, max] (one bounded 1-row driver action, same shape as
    ``histogram``); actual-side values outside that range clamp into the
    edge buckets, NULLs are excluded from both sides.  Returns one row
    per bucket: ``bucket, n_expected, n_actual, p_expected, p_actual,
    psi_contrib`` where ``psi_contrib = (p_a - p_e) * ln(p_a / p_e)``
    with ``eps``-flooring so empty buckets contribute a finite penalty.
    ``summarize(psi="sum(psi_contrib)")`` gives the scalar;
    rule of thumb: < 0.1 stable, > 0.25 drifted.

    Scale shape: each side is ONE map-side-combined aggregation on a
    computed bucket id (no join between the sides until the two
    ``bins``-row tables meet), and the bucket grid is generated on the
    driver so empty buckets always appear.
    """
    from pyspark.sql import functions as F

    from ..core import TidyFrame

    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    e_sdf = expected.df if hasattr(expected, "df") else expected
    a_sdf = actual.df if hasattr(actual, "df") else actual

    row = e_sdf.agg(
        F.min(F.col(col).cast("double")).alias("mn"),
        F.max(F.col(col).cast("double")).alias("mx"),
    ).first()
    mn = row["mn"] if row["mn"] is not None else 0.0
    mx = row["mx"] if row["mx"] is not None else 0.0
    span = (mx - mn) or 1.0

    def side(sdf, label):
        bucket = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(col).cast("double") - F.lit(mn))
                        / F.lit(span) * F.lit(bins)).cast("int"),
            ),
        )
        return (
            sdf.where(F.col(col).isNotNull())
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias(label))
        )

    spark = e_sdf.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    ecnt, acnt = side(e_sdf, "n_expected"), side(a_sdf, "n_actual")
    joined = (
        grid.join(ecnt, "bucket", "left").join(acnt, "bucket", "left")
        .fillna({"n_expected": 0, "n_actual": 0})
    )
    # side totals from the bins-row table itself (an unpartitioned window
    # over <= ``bins`` rows) — each corpus is scanned exactly once
    from pyspark.sql import Window

    w = Window.partitionBy()
    ne = F.greatest(F.lit(1), F.sum("n_expected").over(w)).cast("double")
    na = F.greatest(F.lit(1), F.sum("n_actual").over(w)).cast("double")
    pe = F.greatest(F.lit(float(eps)), F.col("n_expected") / ne)
    pa = F.greatest(F.lit(float(eps)), F.col("n_actual") / na)
    out = joined.withColumn("p_expected", pe).withColumn("p_actual", pa).withColumn(
        "psi_contrib",
        (F.col("p_actual") - F.col("p_expected"))
        * F.log(F.col("p_actual") / F.col("p_expected")),
    )
    return TidyFrame(out.orderBy("bucket"))
