"""Skew mitigation utilities for 100 TB workloads.

AQE handles sort-merge skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on by default in
``get_spark()``), and Spark's hash aggregation is already two-phase
(partial map-side combine), so most pipelines need nothing explicit.
``salted_join`` covers the remaining case: a shuffled equi-join where one
key dominates, the build side can't broadcast, and AQE's split isn't
available (e.g. shuffled-hash path, or a skewed *stream* side feeding a
stateful op).

The standard construction: the big/skewed side gets a uniform salt in
``[0, salt)``; the other side is replicated once per salt value; the join
key becomes ``(keys..., salt)`` so each hot key's rows spread over
``salt`` tasks.  Result is identical to the unsalted join for any row
distribution — salting only changes partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["salted_join", "semi_reduce", "diagnose_skew"]


def semi_reduce(big, small, by):
    """Semi-join reduction: shrink ``big`` to the rows whose keys appear in
    ``small`` BEFORE an expensive downstream stage (wide shuffle, pandas
    UDF, cross-product verify).  Implemented as ``LEFT SEMI`` against the
    small side's distinct keys with a broadcast hint — at scale this is a
    map-side filter (no shuffle of ``big``); Catalyst additionally injects
    a runtime bloom filter into the scan when the optimizer's thresholds
    hit (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by
    default).

    Equivalent to ``inner_join(big, small.distinct(keys))`` restricted to
    ``big``'s columns, but never duplicates rows when ``small`` has
    repeated keys.
    """
    from ..core import TidyFrame
    from .joins import parse_by

    stf = small if isinstance(small, TidyFrame) else TidyFrame(small)
    conds = parse_by(by, big.df.columns, stf.df.columns)
    if any(c.op != "==" or c.closest for c in conds):
        raise ValueError("semi_reduce supports only equi-join conditions")
    keys = stf.df.selectExpr(*[c.right for c in conds]).distinct()
    cond = None
    for c, kc in zip(conds, keys.columns):
        piece = big.df[c.left] == keys[kc]
        cond = piece if cond is None else (cond & piece)
    out = big.df.join(F.broadcast(keys), cond, "left_semi")
    return TidyFrame(out, groups=big.groups)


def salted_join(left, right, by, how: str = "inner", salt: int = 8, seed: int = 42):
    """Equi-join with key salting.  ``left`` is treated as the big/skewed
    side (salted); ``right`` is replicated ``salt``×, so keep it the
    smaller input.  Only equi conditions are supported — theta conditions
    can't split a hot key by salting.

    Cost model: replication multiplies the right side's shuffle volume by
    ``salt``; choose the smallest salt that levels your hottest key
    (hot_rows / salt ≲ rows-per-task target).
    """
    from ..core import TidyFrame
    from .joins import do_join, parse_by

    rtf = right if isinstance(right, TidyFrame) else TidyFrame(right)
    conds = parse_by(by, left.df.columns, rtf.df.columns)
    if any(c.op != "==" or c.closest for c in conds):
        raise ValueError("salted_join supports only equi-join conditions")
    # right/full would emit every unmatched right row `salt` times (each
    # replica fails the join independently) — silently wrong, so refuse.
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            "salted_join supports how='inner'|'left'|'semi'|'anti'; the "
            "replicated right side cannot express right/full outer results"
        )

    salted_l = TidyFrame(
        left.df.withColumn(
            "__tidy_salt", F.pmod(F.floor(F.rand(seed) * salt), F.lit(salt)).cast("int")
        ),
        groups=left.groups,
    )
    replicated_r = TidyFrame(
        rtf.df.withColumn(
            "__tidy_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
        )
    )
    spec = [f"{c.left} == {c.right}" for c in conds] + ["__tidy_salt"]
    out = do_join(salted_l, replicated_r, spec, how)
    return TidyFrame(out.df.drop("__tidy_salt"), groups=out.groups)


def diagnose_skew(tf, *keys, top: int = 10):
    """Pre-flight skew report for a join/aggregation key: the ``top``
    heaviest key groups, each with its share of all rows and the salt
    factor that would level it to the mean group size.  One aggregation
    + a bounded top-N collect — run it on a sample or the full frame
    before committing to a shuffle strategy.

    Returns a pandas DataFrame (count, share, suggested_salt per key).
    Rule of thumb: ``suggested_salt`` > ~8 on the heaviest key means
    ``salted_join`` / AQE skew-join territory.
    """
    from pyspark.sql import functions as F

    import pandas as pd

    counts = tf.df.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))
    total, n_groups = counts.agg(F.sum("count"), F.count(F.lit(1))).first()
    if not total:  # empty frame: no groups, nothing to report
        return pd.DataFrame(
            columns=[*keys, "count", "share", "suggested_salt"]
        )
    mean = total / max(n_groups, 1)
    pdf = (
        counts.orderBy(F.col("count").desc(), *keys)
        .limit(top)
        .toPandas()
    )
    pdf["share"] = pdf["count"] / total
    pdf["suggested_salt"] = (
        (pdf["count"] / mean).clip(lower=1.0).round().astype(int)
    )
    return pdf
