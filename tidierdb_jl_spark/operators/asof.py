"""As-of (nearest-match) join — the reference's ``closest()`` join.

Reference semantics (``/root/reference/src/db_parsing.jl:483-501``,
exercised against DuckDB ``ASOF JOIN`` in
``/root/reference/test/comp_tests.jl:202-203``): for each left row, pick
the single right row with the closest ordering value satisfying the
inequality — ``l >= r`` (backward, the common case) matches the *largest*
right value ≤ the left value; ``l <= r`` (forward) the smallest ≥.

Spark has no ASOF JOIN.  A naive range-predicate join plans a
BroadcastNestedLoopJoin (quadratic, driver-killing at scale).  This
implementation is the **union + ordered window fill** algorithm:

1. tag left and right rows and union them by name (right's value columns
   are null on left rows and vice versa);
2. one window per equi-key partition, ordered by the as-of key with a
   tie-break that implements strict vs inclusive matching;
3. ``last(value, ignorenulls=True)`` fills each left row with the most
   recent right row's values (or ``first`` over the following frame for
   forward joins).

Cost at scale: exactly ONE shuffle (hash by equi keys) + one sort — the
same cost profile as a sort-merge join, linear in data size, skew handled
by AQE.  With no equi keys the window is a single global sort; for that
case prefer adding a coarse time-bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_L = "__asof_is_left"
_T = "__asof_t"
_HIT = "__asof_matched"


def asof_join(
    ldf: DataFrame,
    rdf: DataFrame,
    eq: list[tuple[str, str]],
    l_on: str,
    op: str,
    r_on: str,
    how: str = "left",
) -> DataFrame:
    if op not in (">=", ">", "<=", "<"):
        raise ValueError(f"unsupported as-of operator {op!r}")
    # Validate every referenced column up front: the union below uses
    # allowMissingColumns=True, which would otherwise null-fill a typo'd
    # key and silently match nothing instead of erroring.
    for c, df, side_name in (
        *[(lc, ldf, "left") for lc, _ in eq],
        *[(rc, rdf, "right") for _, rc in eq],
        (l_on, ldf, "left"),
        (r_on, rdf, "right"),
    ):
        if c not in df.columns:
            raise KeyError(f"asof_join: no column {c!r} on the {side_name} side")
    backward = op in (">=", ">")
    inclusive = op in (">=", "<=")

    # Right side: equi keys renamed onto the left names; every other column
    # kept (suffixed on collision) so the output mirrors DuckDB ASOF JOIN.
    rmap: dict[str, str] = {}  # output name -> right source col
    for lc, rc in eq:
        rmap[lc] = rc
    rvals: list[tuple[str, str]] = []  # (output_name, right_col)
    eq_right = {rc for _, rc in eq}
    for c in rdf.columns:
        if c in eq_right:
            continue
        out_name = f"{c}_right" if c in ldf.columns else c
        rvals.append((out_name, c))

    # Projections are assembled as SQL strings and shipped in ONE
    # selectExpr call per side (instead of 2 py4j round trips per column)
    # — same plan, build time only.
    def _bq(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    l_t_type = dict(ldf.dtypes)[l_on]
    r_sel = [f"{_bq(rc)} AS {_bq(out)}" for out, rc in rmap.items()]
    r_sel += [f"{_bq(rc)} AS {_bq(out)}" for out, rc in rvals]
    r_sel += [
        f"CAST({_bq(r_on)} AS {l_t_type}) AS {_T}",
        f"0 AS {_L}",
        f"1 AS {_HIT}",
    ]
    # A null as-of key can never satisfy the inequality (DuckDB ASOF JOIN
    # ignores such rows too) — and left out of the union it can't sit at a
    # sort boundary where the running fill would spuriously pick it up.
    r_part = rdf.selectExpr(*r_sel).filter(f"{_T} IS NOT NULL")

    l_part = ldf.selectExpr(
        "*",
        f"{_bq(l_on)} AS {_T}",
        f"1 AS {_L}",
        f"CAST(NULL AS INT) AS {_HIT}",
    )

    unioned = l_part.unionByName(r_part, allowMissingColumns=True)

    # Tie-break at equal as-of values: inclusive → right rows sort before
    # left rows (so the left row's running frame already contains them);
    # strict → after.  BOTH directions use the unbounded-PRECEDING running
    # frame: Spark evaluates it incrementally (O(n) per partition), whereas
    # an unbounded-FOLLOWING frame is recomputed from scratch per row —
    # O(n²) per partition, measured 115 s vs <2 s on a 1.5M-row forward
    # join at sf1.  A forward join is therefore expressed as a backward
    # fill over the DESCENDING as-of order.
    side_sql = "ASC" if inclusive else "DESC"
    t_dir = "ASC NULLS FIRST" if backward else "DESC NULLS FIRST"
    part_sql = (
        "PARTITION BY " + ", ".join(_bq(lc) for lc, _ in eq) + " " if eq else ""
    )
    over = (
        f"OVER ({part_sql}ORDER BY {_T} {t_dir}, {_L} {side_sql} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )

    filled = unioned.selectExpr(
        "*",
        *[
            f"last({_bq(out)}, true) {over} AS {_bq(f'__f_{out}')}"
            for out, _ in rvals
        ],
        f"last({_HIT}, true) {over} AS __f_hit",
    )

    out = filled.filter(f"{_L} = 1")
    if how == "inner":
        out = out.filter("__f_hit IS NOT NULL")

    final_cols = [_bq(c) for c in ldf.columns]
    final_cols += [
        f"{_bq(f'__f_{out_name}')} AS {_bq(out_name)}" for out_name, _ in rvals
    ]
    return out.selectExpr(*final_cols)
