"""Bucketed range join — the scale path for inequality (theta) joins.

A naive ``l.a BETWEEN r.lo AND r.hi`` or ``l.ts >= r.ts`` join plans as
BroadcastNestedLoopJoin (fine only when one side broadcasts).  The
standard distributed strategy buckets the range variable: each left row
maps to one bucket, each right interval replicates into every bucket it
overlaps, and the join becomes an **equi-join on (keys..., bucket)**
followed by an exact residual filter.  Shuffle volume scales with
interval-width / bucket_width replication instead of |L| × |R|.

(SURVEY §2.3: the reference leaves theta joins to its backends; this is
the Spark-native equivalent of the range-join optimizations those
backends apply.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    left,
    right,
    value_col: str,
    lo_col: str,
    hi_col: str,
    by=None,
    how: str = "inner",
    bucket_width: float | int = 1.0,
):
    """Join rows of ``left`` to intervals of ``right`` where
    ``right.lo_col <= left.value_col <= right.hi_col``, optionally with
    extra equi-keys ``by`` (string or list of ``"l == r"`` specs).

    ``bucket_width`` trades replication for selectivity: right intervals
    replicate ``ceil(width / bucket_width) + 1`` times; pick it near the
    typical interval width.  ``how`` is "inner" or "left" (left rows with
    no interval survive with NULL right columns).
    """
    from ..core import TidyFrame
    from .joins import parse_by

    rtf = right if isinstance(right, TidyFrame) else TidyFrame(right)
    eq = []
    if by is not None:
        conds = parse_by(by, left.df.columns, rtf.df.columns)
        if any(c.op != "==" or c.closest for c in conds):
            raise ValueError("range_join extra conditions must be equi-joins")
        eq = [(c.left, c.right) for c in conds]
    if how not in ("inner", "left"):
        raise ValueError("range_join supports how='inner'|'left'")

    w = float(bucket_width)
    l = left.df.withColumn("__rb", F.floor(F.col(value_col) / F.lit(w)).cast("long"))
    r = rtf.df.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    la, ra = l.alias("l"), r.alias("r")
    cond = F.col("l.__rb") == F.col("r.__rb")
    for lc, rc in eq:
        cond = cond & (F.col(f"l.{lc}") == F.col(f"r.{rc}"))
    residual = (F.col(f"l.{value_col}") >= F.col(f"r.{lo_col}")) & (
        F.col(f"l.{value_col}") <= F.col(f"r.{hi_col}")
    )

    right_drop = {rc for _, rc in eq}
    out_cols = [F.col(f"l.{c}").alias(c) for c in left.df.columns]
    out_cols += [
        F.col(f"r.{c}").alias(f"{c}_right" if c in left.df.columns else c)
        for c in rtf.df.columns
        if c not in right_drop
    ]

    if how == "inner":
        joined = la.join(ra, cond & residual, "inner")
        return TidyFrame(joined.select(*out_cols), groups=left.groups)

    # left join: bucket replication would duplicate unmatched left rows
    # (one per candidate bucket), so join inner first and re-attach misses.
    # Miss detection uses a per-row tag, not all-column equality: NULL !=
    # NULL would make any matched row with a NULL non-key column reappear
    # in the misses (and duplicate rows couldn't be told apart).
    # localCheckpoint pins the ids: monotonically_increasing_id is
    # assigned per task attempt, and the tagged frame feeds TWO subtrees
    # (inner match + anti-join miss detection) — without materialization a
    # task retry / speculative re-execution could re-evaluate the scan
    # with different ids, silently dropping real misses or resurrecting
    # matched rows.  eager=False defers the job to the first action.
    lid = "__rj_id"
    ltag = left.df.withColumn(lid, F.monotonically_increasing_id()).localCheckpoint(
        eager=False
    )
    la = ltag.withColumn(
        "__rb", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    ).alias("l")
    matched_raw = la.join(ra, cond & residual, "inner")
    matched = matched_raw.select(*out_cols)
    match_ids = matched_raw.select(F.col(f"l.{lid}").alias(lid)).distinct()
    misses = ltag.join(match_ids, lid, "left_anti").drop(lid)
    for c in rtf.df.columns:
        if c in right_drop:
            continue
        name = f"{c}_right" if c in left.df.columns else c
        misses = misses.withColumn(name, F.lit(None).cast(dict(rtf.df.dtypes)[c]))
    return TidyFrame(matched.unionByName(misses), groups=left.groups)
