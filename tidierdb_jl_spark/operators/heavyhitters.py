"""Exact heavy hitters with BOUNDED state — two-pass Misra-Gries.

What the plain ``groupBy().count()`` actually costs at scale is not the
raw stream (map-side partial aggregation already collapses each
partition to its DISTINCT values before the exchange — measured in
``tools/bench_heavyhitters.py``): it is the *cardinality*.  The partial
hash map holds every distinct value per partition, so a high-cardinality
stream (n-grams, URLs, user-ids at 100 TB: billions of distincts)
degenerates it — the hash aggregate falls back to sort-based spill, and
the exchange carries ~every distinct value per partition.  ``heavy_
hitters`` bounds BOTH with the classic two-pass scheme (Misra & Gries
1982; the "MG summary" merge bound is Agarwal et al., PODS'12) — memory
``O(1/threshold_frac)`` per partition and a shuffle of candidate rows
only, REGARDLESS of cardinality.  For low-cardinality streams the plain
group-by is already cheap; this operator is for the heavy tail:

1. **Candidate pass (map-side only, zero shuffle of the stream)**: each
   partition keeps a Misra-Gries summary of capacity ``c = ceil(2 /
   threshold_frac)`` — a bounded dict, decremented whenever it
   overflows.  MG guarantees the summary's undercount is at most
   ``N_p / (c + 1)``, so any value with global frequency ≥
   ``threshold_frac`` survives in at least one partition's summary
   (if its local proportion were below the threshold in EVERY
   partition, its global proportion would be too).  The per-partition
   output is ≤ ``c`` candidate rows + 1 total-count row.
2. **Prefilter + exact recount (bounded shuffle)**: summing the MG
   counts across partitions undercounts by at most ``N / (c + 1) ≤
   threshold / 2``, so candidates whose merged MG count is below
   ``threshold - N/(c+1)`` are provably light and are dropped before
   the recount.  The survivors (a small set) broadcast into a semi
   join; only matching rows are re-counted — exact counts, map-side
   combined, shuffle bounded by ``candidates × partitions``.

The result is EXACT: precisely the values with ``count >= ceil(
threshold_frac * N)``, with their true counts — the sketch only decides
what gets recounted, never what is reported.  Per-partition memory is
``O(1/threshold_frac)``; asking for a very small threshold is refused
loudly rather than silently spilling.

The reference has no sketch surface (its closest is SQL ``count(*)``
group-bys, /root/reference/src/TidierDB.jl @summarize); this is
beyond-reference scale infrastructure for corpus vocabulary gates.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..core import TidyFrame

_MAX_CAPACITY = 2_000_000


def _mg_partition(col: str, capacity: int):
    """mapInPandas worker: one Misra-Gries summary per PARTITION (the
    dict accumulates across the iterator's Arrow batches), emitted as
    ≤ capacity candidate rows plus one total-row-count row."""

    def run(batches):
        import pandas as pd

        counters: dict = {}
        total = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            total += len(vals)
            for v, n in vals.value_counts().items():
                counters[v] = counters.get(v, 0) + int(n)
            over = len(counters) - capacity
            if over > 0:
                # decrement by the amount that kills the `over` lightest
                # counters; every surviving count drops by d, which is
                # the undercount MG's N_p/(c+1) bound accounts for
                d = sorted(counters.values())[over - 1]
                counters = {v: n - d for v, n in counters.items() if n > d}
        out = pd.DataFrame(
            {
                col: list(counters.keys()) + [None],
                "__mg": list(counters.values()) + [0],
                "__tot": [0] * len(counters) + [total],
            }
        )
        yield out.astype({"__mg": "int64", "__tot": "int64"})

    return run


def heavy_hitters(
    tf,
    col: str,
    threshold_frac: float = 0.001,
    max_capacity: int = _MAX_CAPACITY,
) -> TidyFrame:
    """All values of ``col`` with frequency ≥ ``threshold_frac`` of the
    non-null rows, with EXACT counts — computed without shuffling the
    stream (see module docstring).  Returns (``col``, ``count``).
    """
    if not (0.0 < threshold_frac <= 1.0):
        raise ValueError(f"threshold_frac must be in (0, 1], got {threshold_frac}")
    capacity = math.ceil(2.0 / threshold_frac)
    if capacity > max_capacity:
        raise ValueError(
            f"threshold_frac={threshold_frac} needs {capacity} counters per "
            f"partition (> {max_capacity}); per-partition memory is "
            "O(1/threshold_frac) — raise the threshold or max_capacity"
        )
    from pyspark.sql import types as T

    # NO repartition of the stream: the summary pass runs at the scan's
    # parallelism (the whole point is never shuffling the stream — a
    # "_spread" here would BE that shuffle; measured in
    # tools/bench_heavyhitters.py before this was removed).  Callers
    # with a single-file test corpus should spread the pre-explode rows
    # (token_heavy_hitters does).
    df = (tf.df if hasattr(tf, "df") else tf).select(col)
    field = df.schema[col]
    if not isinstance(
        field.dataType,
        (T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType),
    ):
        raise ValueError(
            f"heavy_hitters needs a string or integral column, got "
            f"{field.dataType.simpleString()} for {col!r}"
        )
    out_schema = f"`{col}` {field.dataType.simpleString()}, __mg long, __tot long"
    summary = df.mapInPandas(
        _mg_partition(col, capacity), schema=out_schema
    ).localCheckpoint(eager=True)

    # 1-row bounded driver action (the broadcast-attach convention)
    total = summary.agg(F.sum("__tot")).first()[0] or 0
    if not total:
        return TidyFrame(
            df.sparkSession.createDataFrame([], f"`{col}` "
                                                f"{field.dataType.simpleString()}, "
                                                "count long")
        )
    threshold = math.ceil(threshold_frac * total)
    # merged-MG undercount across partitions is ≤ total/(capacity+1)
    slack = total // (capacity + 1)
    cand = (
        summary.where(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.sum("__mg").alias("__mg"))
        .where(F.col("__mg") >= threshold - slack)
        .select(col)
    )
    counted = (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= threshold)
    )
    return TidyFrame(counted)


def token_heavy_hitters(
    tf,
    text_col: str = "text",
    threshold_frac: float = 0.001,
    tokenizer: str = "whitespace",
    max_capacity: int = _MAX_CAPACITY,
) -> TidyFrame:
    """Heavy-hitter TOKENS of a text column: JVM tokenize + explode
    (scan-fused, no shuffle) feeding :func:`heavy_hitters`.  Returns
    (``token``, ``count``) — exact counts of every token whose frequency
    is ≥ ``threshold_frac`` of all token occurrences."""
    from ..llm.dedup import _spread
    from ..llm.vocab import _token_array

    df = tf.df if hasattr(tf, "df") else tf
    # spread the DOCUMENT rows (cheap; no-op at real scale) so the
    # tokenize/explode/summary map stage runs at session parallelism on
    # single-file test corpora — never the exploded token stream
    toks = _spread(df.select(text_col)).select(
        F.explode(_token_array(text_col, tokenizer)).alias("token")
    )
    return heavy_hitters(TidyFrame(toks), "token", threshold_frac, max_capacity)
