"""Plan inspection — the reference's ``@show_query``
(``/root/reference/src/TidierDB_macros.jl:508-569``) shows finalized SQL;
here the honest equivalent is the Catalyst plan.  ``show_query`` returns
the formatted physical plan as a string so callers (and tests) can assert
on pushdown / join strategy / codegen coverage.
"""

from __future__ import annotations

import contextlib
import io
import re

__all__ = ["show_query", "plan_summary", "lint_plan"]


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
        # dynamic partition pruning subqueries on partitioned scans — the
        # read-side payoff of create_table(partition_by=) at 100 TB
        "dpp_filters": text.lower().count("dynamicpruningexpression"),
    }


def lint_plan(tf) -> list[dict]:
    """Scale-health linter: scan the physical plan for the patterns that
    break at 100× the data and return findings as
    ``[{rule, severity, detail}, ...]`` (empty = clean).  The
    machine-checkable half of the "would this plan survive a scale-up"
    review — run it in CI against your pipeline's plans the same way
    ``tests/test_scale_ops.py`` guards this repo's contract queries.

    Rules:
    - ``cartesian``: CartesianProduct — O(|L|·|R|), almost never intended.
    - ``nested_loop``: BroadcastNestedLoopJoin — a non-equi join; fine for
      a bounded 1-row/scalar attach, quadratic against a real table
      (consider ``range_join`` or adding an equality key).
    - ``python_row_udf``: BatchEvalPython — row-at-a-time Python in the
      plan; switch to a pandas UDF (ArrowEvalPython) or a builtin.
    - ``no_pushdown``: a parquet scan whose PushedFilters is empty while
      the plan contains a Filter — the predicate didn't reach the scan
      (often a UDF or a cast around the filter column).
    - ``single_partition_exchange``: Exchange SinglePartition outside a
      final top-N/aggregate — serializes the whole dataset through one
      task.
    - ``unbounded_following_frame``: a window frame ending at UNBOUNDED
      FOLLOWING — Spark recomputes that frame from scratch per row, O(n²)
      per partition (a running UNBOUNDED-PRECEDING frame is incremental);
      express it as the mirrored fill over the DESCENDING order instead
      (see ``operators/asof.py``, measured 115 s → 4 s at sf1).
    """
    text = show_query(tf, "formatted")
    findings: list[dict] = []

    def add(rule, severity, detail):
        findings.append({"rule": rule, "severity": severity, "detail": detail})

    n = text.count("CartesianProduct")
    if n:
        add("cartesian", "error", f"{n} CartesianProduct node(s)")
    n = text.count("BroadcastNestedLoopJoin")
    if n:
        add(
            "nested_loop", "warn",
            f"{n} BroadcastNestedLoopJoin node(s) — bounded scalar attach is "
            "fine; a real table on both sides is quadratic",
        )
    n = text.count("BatchEvalPython")
    if n:
        add(
            "python_row_udf", "warn",
            f"{n} row-at-a-time Python eval node(s); use pandas_udf "
            "(ArrowEvalPython) or builtins",
        )
    if (
        "PushedFilters: []" in text
        and ("Filter (" in text or "Filter [" in text)
    ):
        add(
            "no_pushdown", "info",
            "a scan has empty PushedFilters while the plan filters — check "
            "for casts/UDFs around the filter column",
        )
    # frames ENDING at unbounded-following are per-row recomputed (O(n²)
    # per partition); whole-partition frames (unboundedpreceding →
    # unboundedfollowing) are computed once per partition and are fine
    n = len(
        re.findall(
            r"specifiedwindowframe\(\w+, (?!unboundedpreceding)[^,]+, unboundedfollowing",
            text,
        )
    )
    if n:
        add(
            "unbounded_following_frame", "warn",
            f"{n} window frame(s) ending at UNBOUNDED FOLLOWING — Spark "
            "recomputes these per row (O(n²) per partition); mirror the "
            "fill over the DESCENDING order to get the incremental "
            "running frame",
        )
    n = text.count("Exchange SinglePartition")
    if n > 1:
        add(
            "single_partition_exchange", "info",
            f"{n} single-partition exchanges — fine for final top-N/scalar "
            "aggregates, a serialization point otherwise",
        )
    return findings
