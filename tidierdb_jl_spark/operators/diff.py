"""Dataset snapshot diff — added / removed / changed / unchanged per key.

The audit primitive for an ingest pipeline built on ``merge_upsert``:
given two versions of a keyed dataset, classify every key and name the
columns that changed.  NULL-safe comparison throughout (a NULL→value
transition counts as a change; NULL==NULL does not).

Scale shape: ONE full-outer sort-merge join on the key columns — each
side shuffles once; the per-column comparison is a pure JVM expression
(no window, no second pass).  On bucketed/co-partitioned tables the
shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old_tf,
    new_tf,
    keys,
    compare: list | None = None,
    include_values: bool = False,
):
    """Classify every key across two dataset versions.

    Returns one row per key present in either version with:

    - ``status`` — ``'added'`` (new only), ``'removed'`` (old only),
      ``'changed'`` (both, ≥1 compared column differs), ``'unchanged'``
    - ``changed_cols`` — array of compared column names that differ
      (empty for added/removed/unchanged)
    - with ``include_values=True``, ``old_<c>`` / ``new_<c>`` for every
      compared column

    ``compare`` defaults to all non-key columns present in BOTH schemas.
    Duplicate keys within a version are the caller's contract to prevent
    (run :func:`~tidierdb_jl_spark.llm.dedup.exact_dedup` first) — a
    full-outer join on non-unique keys multiplies rows.
    """
    if isinstance(keys, str):
        keys = [keys]
    old, new = old_tf.df, new_tf.df
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise KeyError(f"key column {k!r} missing from one side")
    if compare is None:
        compare = [
            c for c in old.columns if c in set(new.columns) and c not in set(keys)
        ]
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in compare],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__n_{c}") for c in compare],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    if compare:
        changed = F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                    )
                    for c in compare
                ]
            )
        )
    else:
        changed = F.array().cast("array<string>")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(F.col("changed_cols")) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("changed_cols", changed).withColumn("status", status)
    cols = [*keys, "status", "changed_cols"]
    if include_values:
        cols += [F.col(f"__o_{c}").alias(f"old_{c}") for c in compare]
        cols += [F.col(f"__n_{c}").alias(f"new_{c}") for c in compare]
    # added/removed rows carry no diff detail — normalize to empty
    out = out.withColumn(
        "changed_cols",
        F.when(F.col("status") == "changed", F.col("changed_cols")).otherwise(
            F.array().cast("array<string>")
        ),
    )
    from ..core import TidyFrame

    return TidyFrame(out.select(*cols))
