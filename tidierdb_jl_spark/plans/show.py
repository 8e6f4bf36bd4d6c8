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
    - ``tokenizer_in_lambda``: a higher-order-function lambda whose body
      contains ``split(`` — the pattern that turns shingling O(words²)
      per row once Catalyst inlines the tokenizer chain into the lambda
      (``InferFiltersFromGenerate`` + pushdown do this at every explode
      site; measured 33.5 s → ~1 s at sf1 on the t96 postings build).
      Hoist the tokenizer to a top-level reference
      (``textstats.ngram_array_expr``) or bind it to a lambda variable
      (``passages._window_array``).
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
    # a lambda body that re-evaluates a string tokenizer per array element
    # turns O(words) expressions into O(words²) per row the moment
    # Catalyst inlines the tokenizer chain (InferFiltersFromGenerate +
    # filter pushdown do this at every explode site).  Reference token
    # arrays only at top level (textstats.ngram_array_expr) or through a
    # let-binding lambda variable (passages._window_array).
    n = sum("split(" in body for body in _lambda_bodies(text))
    if n:
        add(
            "tokenizer_in_lambda", "warn",
            f"{n} higher-order lambda(s) whose body re-tokenizes "
            "(split(...) inside lambdafunction) — O(words²) per row once "
            "pushdown inlines the chain; hoist the tokenizer to a "
            "top-level reference (ngram_array_expr) or a let-binding",
        )
    return findings


def _lambda_bodies(text: str):
    """Balanced-paren spans of every ``lambdafunction(...)`` in a plan
    string (plans print expressions on one line, so a regex up to the
    next ``split(`` would cross into sibling expressions)."""
    start = 0
    while True:
        i = text.find("lambdafunction(", start)
        if i < 0:
            return
        depth, j = 0, i + len("lambdafunction")
        while j < len(text):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        yield text[i:j]
        start = i + 1
