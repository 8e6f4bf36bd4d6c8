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

__all__ = ["salted_join"]


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
