"""TidyFrame — the lazy tidy-relational wrapper over a Spark DataFrame.

The reference's central object is ``SQLQuery`` — SQL clause strings + a
schema-metadata DataFrame + CTE bookkeeping
(``/root/reference/src/structs.jl:13-45,100-136``).  Here the IR *is* the
Spark DataFrame (a Catalyst logical plan): every method applies one
DataFrame transformation and returns a new immutable ``TidyFrame``.  All of
the reference's CTE/flag machinery disappears — Catalyst handles scoping,
projection pruning, predicate placement, and physical planning.

State we do carry (the reference's tidy-specific fields):

- ``groups``   — current grouping expressions (``@group_by``)
- ``order``    — window ORDER BY items (``@window_order``)
- ``frame``    — window frame, reference sign convention (``@window_frame``)
- ``aggregated`` — whether a summarize has happened (the reference's
  ``is_aggregated`` flag) — decides whether filter treats aggregate
  functions as window functions (grouped filter) or plain references.

Everything stays JVM-side: expressions become ``F.expr(...)`` Catalyst
expressions; no Python UDFs on this path.
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.registry import (
    WindowState,
    over_sql,
    parse_order_spec,
    render_order_item,
    rewrite,
)
from .operators.selection import resolve_selection
from .sqlbatch import bq as _bq
from .sqlbatch import fast_expr, fast_sort_item, flat_select_expr

__all__ = ["TidyFrame"]

_ASSIGN_RE = re.compile(r"^\s*([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$", re.S)
_ACROSS_RE = re.compile(r"^\s*across\s*\(", re.S)


def _apply_pending(df: DataFrame, pending: dict) -> DataFrame:
    """Apply a ``{name: expr}`` batch with ``withColumns`` semantics —
    replaced columns keep their position, new columns append in dict
    order, every expression evaluated against the INPUT frame.

    Fast path: when every value is a SQL string, ship the whole thing as
    ONE full projection via :func:`flat_select_expr` (~5 py4j trips flat)
    instead of ``withColumns`` (~6 trips per column: F.expr + dict
    conversion).  Plan is identical — both resolve to a single Project.
    Falls back to ``withColumns`` for opaque Column values, duplicate
    column names, or a pending name that matches an existing column only
    case-insensitively (Spark's resolver treats that as a replacement;
    let it decide)."""
    if all(isinstance(v, str) for v in pending.values()):
        cols = df.columns
        # second guard: columns differing only in case ('A' and 'a') make
        # withColumns replace EVERY case-insensitive match while a flat
        # projection replaces only the exact-case one — let Spark decide.
        if len({c.lower() for c in cols}) == len(cols):
            lower: dict[str, str] = {c.lower(): c for c in cols}
            if all(lower.get(n.lower(), n) == n for n in pending):
                existing = set(cols)
                parts = [
                    f"({pending[c]}) AS {_bq(c)}" if c in pending else _bq(c)
                    for c in cols
                ]
                parts.extend(
                    f"({sql}) AS {_bq(n)}"
                    for n, sql in pending.items()
                    if n not in existing
                )
                return flat_select_expr(df, parts)
    return df.withColumns(
        {n: v if isinstance(v, Column) else F.expr(v) for n, v in pending.items()}
    )


def _split_assign(expr: str) -> tuple[str, str]:
    m = _ASSIGN_RE.match(expr)
    if not m:
        raise ValueError(f"expected 'name = expression', got {expr!r}")
    return m.group(1), m.group(2).strip()


def _expand_across(expr: str, columns: list[str]) -> list[tuple[str, str]]:
    """Expand ``across(cols, (fn1, fn2))`` into (name, expr) pairs.

    Reference: ``/root/reference/src/db_parsing.jl:367-402`` — names are
    ``{col}_{fn}``.
    """
    inner = expr.strip()[len("across") :].strip()
    assert inner.startswith("(") and inner.endswith(")")
    inner = inner[1:-1]
    # split at the top-level comma separating cols-spec from fns
    depth = 0
    split_at = None
    for i, ch in enumerate(inner):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            split_at = i
            break
    if split_at is None:
        raise ValueError(f"across needs (cols, fns): {expr!r}")
    cols_spec, fns_spec = inner[:split_at].strip(), inner[split_at + 1 :].strip()
    if fns_spec.startswith("(") and fns_spec.endswith(")"):
        fns_spec = fns_spec[1:-1]
    fns = [f.strip() for f in fns_spec.split(",") if f.strip()]
    cols = resolve_selection([cols_spec.strip("()")], columns)
    out = []
    for c in cols:
        for fn in fns:
            out.append((f"{c}_{fn}", f"{fn}({c})"))
    return out


class TidyFrame:
    """A lazy, chainable, dplyr-style frame over a Spark DataFrame."""

    def __init__(
        self,
        df: DataFrame,
        groups: tuple = (),
        order: tuple = (),
        frame: tuple | None = None,
        aggregated: bool = False,
    ):
        self._df = df
        self._groups = tuple(groups)
        self._order = tuple(order)
        self._frame = frame
        self._aggregated = aggregated

    # -- plumbing -----------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def groups(self) -> tuple:
        return self._groups

    def _with(self, df=None, *, groups=None, order=None, frame="keep", aggregated=None):
        return TidyFrame(
            df if df is not None else self._df,
            self._groups if groups is None else tuple(groups),
            self._order if order is None else tuple(order),
            self._frame if frame == "keep" else frame,
            self._aggregated if aggregated is None else aggregated,
        )

    def _ws(self, by=None, order=None, frame=None) -> WindowState:
        return WindowState(
            groups=tuple(by) if by is not None else self._groups,
            order=tuple(render_order_item(o) for o in order)
            if order is not None
            else self._order,
            frame=frame if frame is not None else self._frame,
        )

    def pipe(self, fn, *args, **kwargs):
        return fn(self, *args, **kwargs)

    def __repr__(self):
        g = f" groups={list(self._groups)}" if self._groups else ""
        return f"<TidyFrame cols={self.columns}{g}>"

    # -- projections / filters (SURVEY §2.2) --------------------------------

    def select(self, *specs) -> "TidyFrame":
        cols = resolve_selection(specs, self.columns)
        # flat-cost projection: one py4j trip for the whole column list
        # instead of one per column (sqlbatch; identical plan)
        return self._with(flat_select_expr(self._df, [_bq(c) for c in cols]))

    def filter(self, *conds) -> "TidyFrame":
        """Row predicate.  Pre-aggregation with active groups, aggregate
        functions become windows over the groups (grouped filter); after a
        summarize they are plain references (HAVING semantics) — mirrors
        the reference's WHERE/HAVING routing
        (``/root/reference/src/TidierDB_macros.jl:37-128``)."""
        windowed = bool(self._groups or self._order) and not self._aggregated
        df = self._df
        # Adjacent plain predicates combine into ONE filter call: same plan
        # (Catalyst merges consecutive Filters anyway) but one analysis pass
        # and one py4j round trip instead of one per condition — driver-side
        # build time, which multi-predicate scans (TPC-H Q6: 5 conds) pay
        # per bench run.
        plain: list[str] = []

        def _flush():
            nonlocal df
            if plain:
                df = df.filter(fast_expr(" AND ".join(f"({p})" for p in plain)))
                plain.clear()

        for c in conds:
            if isinstance(c, Column):
                _flush()
                df = df.filter(c)
                continue
            sql = rewrite(str(c), self._ws(), windowed=windowed)
            if " OVER (" in sql:
                # windows are illegal in WHERE: project the predicate into a
                # helper column, filter, drop (Catalyst prunes the extra
                # projection; same plan the reference gets via its CTE wrap)
                _flush()
                tmp = "__tidy_filter_cond"
                df = (
                    flat_select_expr(df, ["*", f"({sql}) AS {tmp}"])
                    .filter(tmp)
                    .drop(tmp)
                )
            else:
                plain.append(sql)
        _flush()
        return self._with(df)

    def mutate(self, *exprs, _by=None, _order=None, _frame=None, **named) -> "TidyFrame":
        """Add/replace columns.  Aggregate functions become windows over the
        active grouping/order/frame (or the inline ``_by/_order/_frame``
        kwargs — ``/root/reference/src/mutate_and_summ.jl:1-49,120-263``).
        Afterwards all grouping/window state clears (reference auto-ungroup,
        ``/root/reference/src/mutate_and_summ.jl:250-257``)."""
        pairs = self._collect_pairs(exprs, named)
        ws = self._ws(
            by=_resolve_by(_by, self.columns) if _by is not None else None,
            order=_as_tuple(_order) if _order is not None else None,
            frame=tuple(_frame) if _frame is not None else None,
        )
        df = self._df
        # Batch consecutive assignments into ONE _apply_pending call (a
        # single analysis pass, flat py4j cost, instead of one per
        # column).  dplyr lets a later expression reference an earlier one
        # from the same mutate — those must see the new value, so flush the
        # pending batch whenever a raw expression mentions a pending name
        # (token match on the raw string; over-matching only costs
        # batching, never correctness).  Opaque Column objects can't be
        # inspected — flush before them too.
        pending: dict = {}

        def _flush():
            nonlocal df
            if pending:
                df = _apply_pending(df, pending)
                pending.clear()

        for name, expr in pairs:
            if isinstance(expr, Column):
                _flush()
                pending[name] = expr
            else:
                s = str(expr)
                if pending and any(
                    re.search(rf"\b{re.escape(p)}\b", s) for p in pending
                ):
                    _flush()
                pending[name] = rewrite(s, ws, windowed=True)
        _flush()
        return self._with(df, groups=(), order=(), frame=None)

    def transmute(self, *exprs, _by=None, _order=None, _frame=None, **named) -> "TidyFrame":
        """mutate keeping only grouping vars + new columns
        (``/root/reference/src/mutate_and_summ.jl:509-654``)."""
        keep = [g for g in (self._groups or ()) if g in self.columns]
        if _by is not None:
            keep = _resolve_by(_by, self.columns)
        out = self.mutate(*exprs, _by=_by, _order=_order, _frame=_frame, **named)
        new_names = [n for n, _ in self._collect_pairs(exprs, named)]
        cols = list(dict.fromkeys(list(keep) + new_names))
        return out._with(out._df.select(*cols))

    def _collect_pairs(self, exprs, named) -> list[tuple[str, object]]:
        pairs: list[tuple[str, object]] = []
        for e in exprs:
            if isinstance(e, str) and _ACROSS_RE.match(e):
                pairs.extend(_expand_across(e, self.columns))
            else:
                pairs.append(_split_assign(str(e)))
        pairs.extend(named.items())
        return pairs

    def rename(self, *exprs, **named) -> "TidyFrame":
        """``new = old`` renames (``/root/reference/src/TidierDB_macros.jl:425-497``)."""
        mapping = {}
        for e in exprs:
            new, old = _split_assign(str(e))
            mapping[old.strip()] = new
        for new, old in named.items():
            mapping[str(old)] = new
        df = self._df.withColumnsRenamed(mapping)
        groups = tuple(mapping.get(g, g) for g in self._groups)
        return self._with(df, groups=groups)

    def relocate(self, *specs, before=None, after=None) -> "TidyFrame":
        """Reorder columns (``/root/reference/src/relocate.jl:45-115``).

        ``before=``/``after=`` accept full tidy selectors (names, ranges,
        ``starts_with(...)``, tuples), like the reference: the moved block
        lands before the LEFTMOST / after the RIGHTMOST surviving match
        (dplyr anchor semantics)."""
        cols = self.columns
        moved = resolve_selection(specs, cols)
        rest = [c for c in cols if c not in moved]

        def _anchors(sel):
            specs_ = (sel,) if isinstance(sel, str) else tuple(sel)
            got = [a for a in resolve_selection(specs_, cols) if a in rest]
            if not got:
                raise ValueError(
                    f"relocate anchor {sel!r} selects no column outside the "
                    "moved set"
                )
            return got

        if before is not None:
            i = min(rest.index(a) for a in _anchors(before))
            new = rest[:i] + moved + rest[i:]
        elif after is not None:
            i = max(rest.index(a) for a in _anchors(after)) + 1
            new = rest[:i] + moved + rest[i:]
        else:
            new = moved + rest
        return self._with(self._df.select(*new))

    def distinct(self, *specs) -> "TidyFrame":
        """SELECT DISTINCT.  With columns given, keeps **only** those columns
        (dbplyr semantics — ``/root/reference/src/TidierDB_macros.jl:343-368``)."""
        if specs:
            cols = resolve_selection(specs, self.columns)
            return self._with(self._df.select(*cols).distinct())
        return self._with(self._df.distinct())

    def drop_missing(self, *specs) -> "TidyFrame":
        subset = resolve_selection(specs, self.columns) if specs else None
        return self._with(self._df.na.drop(subset=subset))

    def head(self, n: int = 6) -> "TidyFrame":
        return self._with(self._df.limit(n))

    limit = head

    # -- grouping / aggregation (SURVEY §2.4) -------------------------------

    def group_by(self, *specs, **computed) -> "TidyFrame":
        """Set grouping.  ``alias=expr`` kwargs project a computed key first
        (``/root/reference/src/TidierDB_macros.jl:178-190,225-285``)."""
        df = self._df
        names: list[str] = []
        # Batch consecutive computed keys into one withColumns call (one
        # analysis pass instead of one per key) — same flush discipline as
        # mutate: a later raw expression that mentions a pending alias, an
        # opaque Column, or a plain selection (resolved against the
        # post-flush schema) forces the batch out first.
        pending: dict = {}

        def _flush():
            nonlocal df
            if pending:
                df = _apply_pending(df, pending)
                pending.clear()

        def _add(alias, expr):
            if isinstance(expr, Column):
                _flush()
                pending[alias] = expr
            else:
                s = str(expr)
                if pending and any(
                    re.search(rf"\b{re.escape(p)}\b", s) for p in pending
                ):
                    _flush()
                pending[alias] = rewrite(s, self._ws(), False)
            names.append(alias)

        for spec in specs:
            if isinstance(spec, str) and _ASSIGN_RE.match(spec) and "==" not in spec:
                _add(*_split_assign(spec))
            else:
                _flush()
                names.extend(resolve_selection([spec], df.columns))
        for alias, expr in computed.items():
            _add(alias, expr)
        _flush()
        return self._with(df, groups=tuple(dict.fromkeys(names)), aggregated=False)

    def ungroup(self) -> "TidyFrame":
        return self._with(groups=(), order=(), frame=None)

    def summarize(self, *exprs, _by=None, **named) -> "TidyFrame":
        """Aggregate.  Any Spark SQL aggregate passes through verbatim (open
        function surface — ``/root/reference/README.md:53-54``;
        ``/root/reference/src/mutate_and_summ.jl:304-495``)."""
        by = _resolve_by(_by, self.columns) if _by is not None else list(self._groups)
        pairs = self._collect_pairs(exprs, named)
        # alias inside the parsed expression ("(agg) AS `name`") and plain
        # key names as strings: one py4j round trip per aggregate instead
        # of two (F.expr + .alias), none per plain grouping key — build
        # time only, the resulting plan is identical.
        aggs = []
        for name, expr in pairs:
            if isinstance(expr, Column):
                aggs.append(expr.alias(name))
            else:
                sql = rewrite(str(expr), self._ws(by=by), False)
                aggs.append(fast_expr(f"({sql}) AS {_bq(name)}"))
        if by:
            keys = [
                g if re.match(r"^[A-Za-z_]\w*$", g) else F.expr(g) for g in by
            ]
            out = self._df.groupBy(*keys).agg(*aggs)
        else:
            out = self._df.agg(*aggs)
        return self._with(out, groups=tuple(by), order=(), frame=None, aggregated=True)

    summarise = summarize

    def count(self, *specs, sort: bool = False, name: str = "n") -> "TidyFrame":
        """Group + COUNT(*) (``/root/reference/src/TidierDB_macros.jl:373-419``)."""
        cols = resolve_selection(specs, self.columns) if specs else list(self._groups)
        # count(1) as one parsed expression — identical tree to
        # F.count(F.lit(1)).alias(name), fewer py4j round trips
        agg = fast_expr(f"count(1) AS {_bq(name)}")
        out = self._df.groupBy(*cols).agg(agg) if cols else self._df.agg(agg)
        if sort:
            out = out.orderBy(fast_sort_item(_bq(name), True))
        return self._with(out, groups=tuple(cols), aggregated=True)

    def summary(self) -> "TidyFrame":
        """Whole-table profile (reference DuckDB ``SUMMARIZE``,
        ``/root/reference/src/mutate_and_summ.jl:659-674``)."""
        return TidyFrame(self._df.summary())

    def rollup(self, *specs) -> "_SetsGrouped":
        """GROUP BY ROLLUP — hierarchical subtotals + grand total (NULL in
        a grouping column marks its subtotal rows).  Follow with
        ``.summarize(...)``.  Not in the reference (SURVEY §2.4 notes it as
        a free Spark capability we expose)."""
        return _SetsGrouped(self, "rollup", resolve_selection(specs, self.columns))

    def cube(self, *specs) -> "_SetsGrouped":
        """GROUP BY CUBE — aggregates over every grouping-column subset."""
        return _SetsGrouped(self, "cube", resolve_selection(specs, self.columns))

    def grouping_sets(self, *sets) -> "_SetsGrouped":
        """GROUP BY GROUPING SETS — explicit list of grouping-column
        subsets (each a str or list of str; ``[]`` is the grand total).
        The generalization of rollup/cube when only some subtotal
        combinations are wanted — one shuffle computes them all, vs one
        shuffle per combination if unioned by hand."""
        resolved = [
            resolve_selection(
                list(s) if isinstance(s, (list, tuple)) else [s], self.columns
            ) if s else []
            for s in sets
        ]
        all_cols = []
        for s in resolved:
            for c in s:
                if c not in all_cols:
                    all_cols.append(c)
        return _SetsGrouped(self, "grouping_sets", all_cols, sets=resolved)

    # -- scalar subqueries (SURVEY §2.9 "subquery" row) ---------------------

    def scalar(self):
        """Eagerly evaluate this query to a single scalar (first row, first
        column) for interpolation into another query's expressions — the
        reference embeds an ``SQLQuery`` as ``((SELECT ...))``
        (``/root/reference/src/parsing_duckdb.jl:2-4,180-181``).  Prefer
        :meth:`with_scalar` to keep everything in one lazy plan."""
        row = self._df.first()
        if row is None:
            return None
        return row[0]

    def with_scalar(self, **named) -> "TidyFrame":
        """Attach scalar-subquery results as columns without leaving the
        plan: each value is a 1×1 TidyFrame/DataFrame cross-joined with a
        broadcast hint, so there is no driver round-trip and Catalyst
        plans one job.  ``t.with_scalar(avg_q=li.summarize(m="mean(x)"))``
        then use ``avg_q`` in any later filter/mutate."""
        df = self._df
        for name, sub in named.items():
            sdf = _unwrap(sub)
            if len(sdf.columns) != 1:
                sdf = sdf.select(sdf.columns[0])
            df = df.crossJoin(F.broadcast(sdf.toDF(name)))
        return self._with(df)

    # -- sorting / slicing (SURVEY §2.6) ------------------------------------

    def arrange(self, *specs) -> "TidyFrame":
        """ORDER BY; ``desc(col)`` for descending.  NULLS LAST both ways to
        match DuckDB defaults (SURVEY §7)."""
        cols = []
        for s in specs:
            if isinstance(s, Column):
                cols.append(s)
                continue
            expr, desc = parse_order_spec(str(s))
            if expr.strip().isdigit():
                # numeric column positions, 1-based (NEWS v0.8.9) — a bare
                # integer literal would otherwise sort by a constant
                expr = self.columns[int(expr.strip()) - 1]
            # sort item built on the JVM side: ~2 py4j trips instead of
            # ~15 for F.expr(...).desc_nulls_last() (identical SortOrder)
            cols.append(fast_sort_item(rewrite(expr, self._ws(), False), desc))
        return self._with(self._df.orderBy(*cols))

    def _slice_ranked(self, col: str, n: int, desc: bool, with_ties: bool) -> "TidyFrame":
        fn = "rank" if with_ties else "row_number"
        order_item = render_order_item(f"desc({col})" if desc else col)
        ws = WindowState(groups=self._groups, order=(order_item,), frame=None)
        rank_col = "__tidy_rank"
        # rank projection + predicate as parsed strings (identical plan,
        # flat py4j cost — see sqlbatch)
        df = (
            flat_select_expr(
                self._df, ["*", f"{fn}() OVER ({over_sql(ws)}) AS {rank_col}"]
            )
            .filter(f"{rank_col} <= {int(n)}")
            .drop(rank_col)
        )
        return self._with(df)

    def slice_min(self, col: str, n: int = 1, with_ties: bool = True) -> "TidyFrame":
        """RANK-based, ties kept (``/root/reference/src/slices_sq.jl:4-72``)."""
        return self._slice_ranked(col, n, desc=False, with_ties=with_ties)

    def slice_max(self, col: str, n: int = 1, with_ties: bool = True) -> "TidyFrame":
        """(``/root/reference/src/slices_sq.jl:77-147``)."""
        return self._slice_ranked(col, n, desc=True, with_ties=with_ties)

    def slice_sample(self, n: int = 1, seed: int | None = None) -> "TidyFrame":
        """n rows per group via row_number over random order
        (``/root/reference/src/slices_sq.jl:152-208``).  Seeded for the
        differential harness."""
        rank_col = "__tidy_rand_rn"
        w_parts = []
        if self._groups:
            w_parts.append("PARTITION BY " + ", ".join(self._groups))
        rand = f"rand({seed})" if seed is not None else "rand()"
        over = " ".join(w_parts + [f"ORDER BY {rand}"])
        df = (
            flat_select_expr(
                self._df, ["*", f"row_number() OVER ({over}) AS {rank_col}"]
            )
            .filter(f"{rank_col} <= {int(n)}")
            .drop(rank_col)
        )
        return self._with(df)

    # -- windows (SURVEY §2.5) ----------------------------------------------

    def window_order(self, *specs) -> "TidyFrame":
        """(``/root/reference/src/windows.jl:4-54``)."""
        return self._with(order=tuple(render_order_item(str(s)) for s in specs))

    def window_frame(self, *bounds) -> "TidyFrame":
        """Reference sign convention (``/root/reference/src/windows.jl:59-177``):
        0 → CURRENT ROW, -n → n PRECEDING, +n → n FOLLOWING.
        One arg n: (n, 0) if n<0 else (0, n).  No args: unbounded both ways."""
        if len(bounds) == 0:
            frame = (None, None)
        elif len(bounds) == 1:
            b = bounds[0]
            frame = (b, 0) if b <= 0 else (0, b)
        else:
            frame = (bounds[0], bounds[1])
        return self._with(frame=frame)

    # -- set operations (SURVEY §2.7) ---------------------------------------

    def union(self, other: "TidyFrame", all: bool = False) -> "TidyFrame":
        """Positional UNION [ALL] (``/root/reference/src/union_intersect_setdiff.jl:79-117``)."""
        out = self._df.union(_unwrap(other))
        return self._with(out if all else out.distinct())

    def union_all(self, other: "TidyFrame") -> "TidyFrame":
        return self.union(other, all=True)

    def intersect(self, other: "TidyFrame", all: bool = False) -> "TidyFrame":
        o = _unwrap(other)
        return self._with(self._df.intersectAll(o) if all else self._df.intersect(o))

    def setdiff(self, other: "TidyFrame", all: bool = False) -> "TidyFrame":
        o = _unwrap(other)
        return self._with(self._df.exceptAll(o) if all else self._df.subtract(o))

    # -- joins (SURVEY §2.3) — implementation in operators/joins.py ---------

    def left_join(self, other, by=None, strategy=None) -> "TidyFrame":
        from .operators.joins import do_join

        return do_join(self, other, by, "left", strategy=strategy)

    def right_join(self, other, by=None, strategy=None) -> "TidyFrame":
        from .operators.joins import do_join

        return do_join(self, other, by, "right", strategy=strategy)

    def inner_join(self, other, by=None, strategy=None) -> "TidyFrame":
        from .operators.joins import do_join

        return do_join(self, other, by, "inner", strategy=strategy)

    def full_join(self, other, by=None, strategy=None) -> "TidyFrame":
        from .operators.joins import do_join

        return do_join(self, other, by, "full", strategy=strategy)

    def semi_join(self, other, by=None, strategy=None) -> "TidyFrame":
        from .operators.joins import do_join

        return do_join(self, other, by, "semi", strategy=strategy)

    def anti_join(self, other, by=None, strategy=None) -> "TidyFrame":
        from .operators.joins import do_join

        return do_join(self, other, by, "anti", strategy=strategy)

    def asof_join(self, other, by=None, how: str = "left") -> "TidyFrame":
        from .operators.joins import do_join

        return do_join(self, other, by, how, force_asof=True)

    # -- reshape (SURVEY §2.8) — implementation in operators/reshape.py -----

    def pivot_wider(self, names_from, values_from, values=None, id_cols=None) -> "TidyFrame":
        from .operators.reshape import pivot_wider

        return pivot_wider(self, names_from, values_from, values, id_cols)

    def pivot_longer(self, cols, names_to="variable", values_to="value") -> "TidyFrame":
        from .operators.reshape import pivot_longer

        return pivot_longer(self, cols, names_to, values_to)

    def unnest_wider(self, *cols, names_sep=None) -> "TidyFrame":
        from .operators.reshape import unnest_wider

        return unnest_wider(self, cols, names_sep)

    def unnest_longer(self, *cols) -> "TidyFrame":
        from .operators.reshape import unnest_longer

        return unnest_longer(self, cols)

    def separate(self, col, into, sep) -> "TidyFrame":
        from .operators.reshape import separate

        return separate(self, col, into, sep)

    def unite(self, new_col, cols, sep="_", remove=True) -> "TidyFrame":
        from .operators.reshape import unite

        return unite(self, new_col, cols, sep, remove)

    # -- actions / sinks ----------------------------------------------------

    def collect(self, stream: bool = False):
        """Materialize (``@collect`` — ``/root/reference/src/TidierDB_macros.jl:629-665``).
        ``stream=True`` → partition-at-a-time iterator (reference
        ``stream_collect``)."""
        if stream:
            return self._df.toLocalIterator()
        return self._df.toPandas()

    def show(self, n: int = 20, truncate: bool = True):
        self._df.show(n, truncate)
        return self

    def show_query(self, mode: str = "formatted") -> str:
        from .plans.show import show_query

        return show_query(self, mode)

    def explain(self, mode: str = "formatted"):
        self._df.explain(mode)
        return self

    def create_view(self, name: str, replace: bool = True) -> "TidyFrame":
        """(``/root/reference/src/view_compute.jl:13-34``)."""
        if replace:
            self._df.createOrReplaceTempView(name)
        else:
            self._df.createTempView(name)
        return self

    def write_file(self, path: str, mode: str = "overwrite") -> None:
        from .sources.writers import write_file

        write_file(self, path, mode)

    # -- partitioning knobs (100 TB path; no reference equivalent) ----------

    def repartition(self, n: int, *cols) -> "TidyFrame":
        return self._with(self._df.repartition(n, *cols) if cols else self._df.repartition(n))

    def repartition_by_range(self, n: int, *cols) -> "TidyFrame":
        return self._with(self._df.repartitionByRange(n, *cols))

    def coalesce(self, n: int) -> "TidyFrame":
        return self._with(self._df.coalesce(n))

    def broadcast(self) -> "TidyFrame":
        return self._with(F.broadcast(self._df))

    def cache(self) -> "TidyFrame":
        return self._with(self._df.cache())

    def persist(self, level: str = "MEMORY_AND_DISK") -> "TidyFrame":
        """Pin this frame's result across reuses (named StorageLevel, e.g.
        "MEMORY_AND_DISK", "DISK_ONLY") — use when a pipeline branches and
        both branches would otherwise recompute the shared prefix."""
        from pyspark import StorageLevel

        return self._with(self._df.persist(getattr(StorageLevel, level)))

    def unpersist(self) -> "TidyFrame":
        return self._with(self._df.unpersist())

    def checkpoint(self) -> "TidyFrame":
        """Truncate lineage (local checkpoint): materializes the frame and
        forgets its plan.  For iterative pipelines whose plans grow without
        bound (each iteration re-optimizes an ever-deeper tree)."""
        return self._with(self._df.localCheckpoint())

    def freq_items(self, *cols, support: float = 0.01):
        """Approximate frequent items per column (Karp-Papadimitriou-
        Shenker single-pass sketch via ``df.stat.freqItems``): every item
        with frequency > ``support`` is returned (may include false
        positives, never false negatives).  Returns a one-row pandas frame
        of item arrays — a driver-side summary, like ``summary()``."""
        names = resolve_selection(cols, self.columns)
        return self._df.stat.freqItems(names, support).toPandas()

    def approx_quantile(self, col: str, probs, rel_err: float = 0.01):
        """Greenwald-Khanna approximate quantiles in one pass
        (``df.stat.approxQuantile``).  ``rel_err=0`` computes exact
        quantiles (full sort).  Returns a list of floats (or list of lists
        when ``col`` is a list of columns)."""
        return self._df.stat.approxQuantile(col, list(probs), rel_err)


class _SetsGrouped:
    """Grouping-sets handle returned by ``rollup()`` / ``cube()``; terminate
    with ``.summarize(...)``."""

    def __init__(self, tf: TidyFrame, mode: str, cols: list, sets=None):
        self._tf = tf
        self._mode = mode
        self._cols = cols
        self._sets = sets

    def summarize(self, *exprs, **named) -> TidyFrame:
        pairs = self._tf._collect_pairs(exprs, named)
        aggs = []
        for name, expr in pairs:
            if isinstance(expr, Column):
                aggs.append(expr.alias(name))
            else:
                aggs.append(
                    F.expr(rewrite(str(expr), WindowState(), False)).alias(name)
                )
        if self._mode == "grouping_sets":
            grouped = self._tf.df.groupingSets(
                [[F.col(c) for c in s] for s in self._sets],
                *[F.col(c) for c in self._cols],
            )
        else:
            grouped = getattr(self._tf.df, self._mode)(*self._cols)
        gdf = grouped.agg(*aggs)
        return TidyFrame(gdf, groups=tuple(self._cols), aggregated=True)

    summarise = summarize


def _unwrap(x) -> DataFrame:
    return x.df if isinstance(x, TidyFrame) else x


def _as_tuple(x) -> tuple:
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)


def _resolve_by(by, columns) -> list[str]:
    if by is None:
        return []
    return resolve_selection(_as_tuple(by), columns)
