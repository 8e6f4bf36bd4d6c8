"""Zero-cost pipeline observability via ``DataFrame.observe``: named
aggregate metrics computed DURING an action, with no second pass over the
data — at 100 TB a separate ``count()`` for row-count bookkeeping doubles
the scan cost, while ``observe`` rides the existing one.

(Beyond the reference — its backends report nothing per-query; closest is
DuckDB's EXPLAIN ANALYZE, which the reference does not surface.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import TidyFrame
from ..functions.registry import rewrite

__all__ = ["with_metrics", "collect_with_metrics"]


def _metric_cols(metrics: dict):
    return [
        F.expr(rewrite(expr)).alias(alias) for alias, expr in metrics.items()
    ]


def with_metrics(tf: TidyFrame, name: str, **metrics: str):
    """Attach named observation metrics (tidy expressions, e.g.
    ``n="n()"``, ``null_keys="sum(as_integer(ismissing(l_orderkey)))"``)
    to the frame.  Metrics materialize when an action runs; read them with
    ``collect_with_metrics`` or ``spark``'s observation listener."""
    return TidyFrame(tf.df.observe(name, *_metric_cols(metrics)))


def collect_with_metrics(tf: TidyFrame, name: str, **metrics: str):
    """One-shot: run the query once, returning (pandas result, metrics
    dict).  The metrics come from the same job — no extra scan."""
    from pyspark.sql import Observation

    obs = Observation(name)
    df = tf.df.observe(obs, *_metric_cols(metrics))
    out = df.toPandas()
    return out, obs.get
