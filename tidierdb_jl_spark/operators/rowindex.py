"""Scale-safe global row indexing.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the classic
Spark scale trap: Catalyst plans a single-partition window — every row of
a 100 TB table funnels through ONE task.  The reference's ``rowid``
pseudocolumn (DuckDB storage order, ``/root/reference/docs/examples/
UserGuide/udfs_ex.jl:31-39``) has no shuffle cost because DuckDB is
single-node; a faithful port must NOT inherit the single-task plan.

``with_row_index`` produces a contiguous 0-based global index in full
parallelism with the two-pass construction Spark itself uses for
``zipWithIndex``:

1. range-partition + sort by the order keys (one shuffle — the same cost
   any global ordering pays), or keep current partitioning when
   ``order_by=None`` (then the index is partition-order based, like
   ``rowid``: stable for a given file layout, not a semantic ordering);
2. count rows per partition (a cheap action collecting ``n_partitions``
   longs to the driver) and prefix-sum the offsets;
3. enumerate locally inside each partition via ``mapInPandas`` with the
   broadcast offset table — no second shuffle, no single-task stage.

For a *sampled* or *skewed* order key the range partitioner handles
balance (it samples bounds).  Ties in ``order_by`` get an arbitrary but
deterministic-within-run order; pass unique keys for full determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["with_row_index"]


def with_row_index(
    tf,
    into: str = "row_index",
    order_by=None,
    num_partitions: int | None = None,
):
    """Append a contiguous 0-based BIGINT global row index.

    ``order_by``: column name / list of names defining the global order
    (range-partition + local sort; index follows that order).  ``None``
    indexes the existing partition layout (zipWithIndex semantics — the
    parallel analogue of the reference's ``rowid``).
    """
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    if order_by is not None:
        keys = [order_by] if isinstance(order_by, str) else list(order_by)
        cols = [F.col(k) for k in keys]
        sdf = (
            sdf.repartitionByRange(num_partitions, *cols)
            if num_partitions
            else sdf.repartitionByRange(*cols)
        ).sortWithinPartitions(*cols)

    # pin the partition layout: the count pass and the enumerate pass MUST
    # see byte-identical partitions, and AQE is free to re-plan a lazy
    # frame between jobs — persist (tracked; release_caches() frees it)
    from ..cache import track

    with_pid = track(sdf.withColumn("__rix_pid", F.spark_partition_id()))
    # pass 1: per-partition counts -> prefix-sum offsets (driver holds
    # n_partitions longs, nothing else)
    counts = {
        r["__rix_pid"]: r["n"]
        for r in with_pid.groupBy("__rix_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql import types as T

    # StructType.add mutates in place — never touch the frame's own schema
    out_schema = T.StructType(
        list(with_pid.schema.fields) + [T.StructField(into, T.LongType())]
    )

    def enumerate_partition(batches):
        import numpy as np
        import pandas as pd

        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{into: pd.Series([], dtype="int64")})
                continue
            if base is None:
                base = offsets[int(pdf["__rix_pid"].iloc[0])]
            pdf[into] = np.arange(base + seen, base + seen + len(pdf), dtype="int64")
            seen += len(pdf)
            yield pdf

    out = with_pid.mapInPandas(enumerate_partition, schema=out_schema).drop(
        "__rix_pid"
    )
    return TidyFrame(out, groups=getattr(tf, "groups", None))
