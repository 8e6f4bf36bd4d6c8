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

__all__ = ["with_metrics", "collect_with_metrics", "run_with_scan_metrics"]


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


def run_with_scan_metrics(tf: TidyFrame, action: str = "count"):
    """Execute the frame and return ``(result, scans)`` where ``scans``
    lists each file-scan's RUNTIME I/O from the SQL status store:
    ``{name, files, partitions, rows}``.  The read-side proof of data
    layout — a partitioned/clustered table is only paying off if the
    files-read number actually drops under a selective join or filter
    (dynamic partition pruning, min/max skipping).  Driver-side plan
    objects always report 0 for these metrics; the status store holds
    the post-execution truth.

    ``action``: "count" (default) or "collect"."""
    import time

    df = tf.df
    spark = df.sparkSession
    result = df.count() if action == "count" else df.collect()
    store = spark._jsparkSession.sharedState().statusStore()
    eid = store.executionsList().last().executionId()
    scans = []
    for _ in range(50):  # status-store updates are async; poll briefly
        vals = {}
        it = store.executionMetrics(eid).iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2()
        scans = []
        nodes = store.planGraph(eid).allNodes().iterator()
        while nodes.hasNext():
            n = nodes.next()
            if "Scan" not in n.name():
                continue
            mets, d = n.metrics().iterator(), {}
            while mets.hasNext():
                m = mets.next()
                if m.accumulatorId() in vals:
                    d[m.name()] = vals[m.accumulatorId()]

            def num(key):
                v = d.get(key)
                return int(v.replace(",", "")) if v is not None else None

            scans.append({
                "name": n.name().strip(),
                "files": num("number of files read"),
                "partitions": num("number of partitions read"),
                "rows": num("number of output rows"),
            })
        if any(s["files"] is not None for s in scans):
            break
        time.sleep(0.1)
    return result, scans
