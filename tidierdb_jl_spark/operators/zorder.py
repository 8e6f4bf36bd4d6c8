"""Z-order (Morton) clustering key — multi-column data skipping.

``cluster_by`` range-sorts lexicographically: parquet min/max stats then
bound only the FIRST sort column tightly; filters on the second column
alone skip nothing.  Interleaving the bits of several columns' normalized
values gives every listed column partial locality, so selective filters
on ANY of them prune files (what Delta's ``OPTIMIZE ZORDER BY`` does for
lakehouse tables, here for plain parquet).

Implementation is pure JVM expressions: one bounded min/max aggregate per
column (a single driver action on a 1-row frame), linear normalization to
``bits``-bit integers, and a bit-interleave fold (``aggregate`` HOF) —
no UDFs, no extra shuffle beyond the clustering sort itself.
"""

from __future__ import annotations

from ..core import TidyFrame

__all__ = ["with_zorder_key"]


def with_zorder_key(tf, cols, bits: int | None = None, out: str = "zorder_key"):
    """Add a Morton-interleave key over 2+ numeric/date/timestamp columns.

    ``bits`` is the per-column resolution (default: as many as fit a
    signed 64-bit key: ``63 // len(cols)``, capped at 16).  Normalization
    is linear min→max (computed once, one small driver action); heavy
    skew in a column degrades its pruning resolution but never
    correctness — the key only orders rows.  NULLs map to bucket 0.

    Write with ``write_file(..., cluster_by="zorder_key")`` (or
    ``create_table``) so each parquet file covers a small hyper-rectangle
    of the listed columns.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use cluster_by for one)")
    n = len(cols)
    bits = bits or min(16, 63 // n)
    if bits * n > 63:
        raise ValueError(f"bits={bits} x {n} cols exceeds a 64-bit key")

    from pyspark.sql import functions as F

    df = tf.df
    num = {c: f"CAST(CAST({c} AS TIMESTAMP) AS DOUBLE)" if t.startswith(("date", "timestamp"))
           else f"CAST({c} AS DOUBLE)"
           for c, t in df.dtypes if c in cols}
    missing = [c for c in cols if c not in num]
    if missing:
        raise KeyError(f"columns not found: {missing}")
    # one bounded action: global min/max per column
    aggs = []
    for c in cols:
        aggs += [F.expr(f"min({num[c]})").alias(f"__mn_{c}"),
                 F.expr(f"max({num[c]})").alias(f"__mx_{c}")]
    st = df.agg(*aggs).first()
    top = (1 << bits) - 1
    bucket_exprs = []
    for c in cols:
        mn, mx = st[f"__mn_{c}"], st[f"__mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        if mn is None:  # all-NULL column (or empty frame): every row buckets to 0
            mn = 0.0
        bucket_exprs.append(
            f"CAST(least(greatest(coalesce(({num[c]} - {mn!r}D) / {span!r}D, 0.0D), 0.0D), 1.0D) * {top} AS BIGINT)"
        )
    # interleave: key bit (i*n + j) = bit i of column j's bucket
    parts = []
    for j, b in enumerate(bucket_exprs):
        parts.append(
            f"aggregate(sequence(0, {bits - 1}), 0L, "
            f"(acc, i) -> acc | (shiftleft(shiftright({b}, i) & 1L, i * {n} + {j})))"
        )
    key = " | ".join(f"({p})" for p in parts)
    return TidyFrame(df.withColumn(out, F.expr(key)), groups=tf.groups)
