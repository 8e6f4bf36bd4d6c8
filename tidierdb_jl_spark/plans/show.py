"""Plan inspection — the reference's ``@show_query``
(``/root/reference/src/TidierDB_macros.jl:508-569``) shows finalized SQL;
here the honest equivalent is the Catalyst plan.  ``show_query`` returns
the formatted physical plan as a string so callers (and tests) can assert
on pushdown / join strategy / codegen coverage.
"""

from __future__ import annotations

import contextlib
import io

__all__ = ["show_query", "plan_summary"]


def show_query(tf, mode: str = "formatted") -> str:
    df = tf.df
    try:
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )
    except Exception:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def plan_summary(tf) -> dict:
    """Quick scale-health summary of the physical plan: pushed filters,
    join strategies, exchanges (shuffles), whole-stage-codegen coverage."""
    import re

    text = show_query(tf, "formatted")
    simple = show_query(tf, "simple")
    return {
        "pushed_filters": "PushedFilters: [" in text and "PushedFilters: []" not in text,
        "broadcast_joins": text.count("BroadcastHashJoin"),
        "sortmerge_joins": text.count("SortMergeJoin"),
        "nested_loop_joins": text.count("BroadcastNestedLoopJoin"),
        "exchanges": text.count("Exchange"),
        "window_group_limits": text.count("WindowGroupLimit"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", simple))),
    }
