"""Stack-safe IN-list scan filters.

Spark pushes an ``IN`` predicate to parquet-mr as a LEFT-DEEP chain of
``Or(Eq, Or(Eq, ...))`` whose recursive evaluation overflows the task
stack around ~1.5k values (measured on this image: 1200 ok, 1500
``StackOverflowError``; deeper codegen stages fail earlier).  The
session caps ``spark.sql.parquet.pushdown.inFilterThreshold`` at 512 so
a single ``isin`` can never build an unsafe chain — but that alone
would silently drop row-group skipping for the 512-4096-value verify
lists the persistent-state family ships (min/max stats are useless on
uniform hash keys; the point filters hit the files' column dictionaries
and bloom filters).

``isin_chunked`` restores the pushdown for those lists: it splits the
values into <=500-value ``isin`` chunks joined with ``|``.  Spark's
datasource translation pushes ``Or`` when both sides push, so parquet
receives ``Or(In(<=500), In(<=500), ...)`` — each inner chain is
shallow (evaluation depth ~= chunk size + #chunks) while row groups
whose dictionaries/blooms reject every chunk are still skipped.
Verified: a 3000-value chunked filter shows
``PushedFilters: [Or(In(...), ...)]`` and evaluates clean where the
plain ``isin`` stack-overflows.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# under both the 512 parquet-pushdown threshold and the ~1.5k
# parquet-mr recursion ceiling, with margin for the Or(...) spine
_CHUNK = 500

__all__ = ["isin_chunked"]


def isin_chunked(col, values, chunk: int = _CHUNK) -> Column:
    """``col.isin(values)`` as an OR of <=``chunk``-value IN chunks.

    Semantically identical to ``isin`` (for non-NULL probe values);
    use for data-dependent lists that can exceed the parquet pushdown
    threshold — bloom-positive fingerprints, band buckets, candidate
    ids.  Small lists pass through as a single ``isin``.
    """
    c = F.col(col) if isinstance(col, str) else col
    vals = list(values)
    if not vals:
        return F.lit(False)
    if len(vals) <= chunk:
        return c.isin(vals)
    cond = None
    for i in range(0, len(vals), chunk):
        part = c.isin(vals[i:i + chunk])
        cond = part if cond is None else cond | part
    return cond
