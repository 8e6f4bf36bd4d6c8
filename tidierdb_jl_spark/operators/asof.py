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

from pyspark.sql import DataFrame, Window
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

    r_sel = [F.col(rc).alias(out) for out, rc in rmap.items()]
    r_sel += [F.col(rc).alias(out) for out, rc in rvals]
    r_sel += [
        F.col(r_on).cast("double" if dict(ldf.dtypes)[l_on] == "double" else dict(ldf.dtypes)[l_on]).alias(_T),
        F.lit(0).alias(_L),
        F.lit(1).alias(_HIT),
    ]
    # A null as-of key can never satisfy the inequality (DuckDB ASOF JOIN
    # ignores such rows too) — and left out of the union it can't sit at a
    # sort boundary where the running fill would spuriously pick it up.
    r_part = rdf.select(*r_sel).filter(F.col(_T).isNotNull())

    l_part = ldf.select(
        "*",
        F.col(l_on).alias(_T),
        F.lit(1).alias(_L),
        F.lit(None).cast("int").alias(_HIT),
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
    if backward:
        side = F.col(_L).asc() if inclusive else F.col(_L).desc()
        order = [F.col(_T).asc_nulls_first(), side]
    else:
        side = F.col(_L).asc() if inclusive else F.col(_L).desc()
        order = [F.col(_T).desc_nulls_first(), side]
    w = (
        Window.partitionBy(*[lc for lc, _ in eq])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731

    filled = unioned.select(
        "*",
        *[fill(out).alias(f"__f_{out}") for out, _ in rvals],
        fill(_HIT).alias("__f_hit"),
    )

    out = filled.filter(F.col(_L) == 1)
    if how == "inner":
        out = out.filter(F.col("__f_hit").isNotNull())

    final_cols = [F.col(c) for c in ldf.columns]
    final_cols += [F.col(f"__f_{out_name}").alias(out_name) for out_name, _ in rvals]
    return out.select(*final_cols)
