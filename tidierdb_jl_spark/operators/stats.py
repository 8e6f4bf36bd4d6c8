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

__all__ = ["column_stats"]

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
