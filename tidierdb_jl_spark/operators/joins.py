"""Join operators: six join types, multi-key, inequality (theta), as-of.

The reference funnels all joins through ``do_join``
(``/root/reference/src/joins_sq.jl:159-316``) with a condition parser
supporting bare keys, ``a == b``, inequality operators, and ``closest()``
for as-of joins (``/root/reference/src/db_parsing.jl:474-527``).  Key
semantics replicated here:

- duplicated equi-join keys are dropped from the right side; for full
  joins the surviving key is ``COALESCE(l.k, r.k)``
  (``/root/reference/src/joins_sq.jl:101-137``);
- multiple conditions AND together (multi-key joins);
- ``closest(l_ts >= r_ts)`` → as-of join.

Scale design: equi/mixed joins go straight to ``DataFrame.join`` so
Catalyst + AQE pick broadcast / sort-merge / shuffled-hash and handle skew.
The as-of join is implemented as a **union + ordered window fill** — one
shuffle on the equi keys and one sort, instead of the broadcast-nested-loop
plan a naive range predicate would produce.  Pure theta joins (no equi key)
are BroadcastNestedLoop by construction; acceptable when one side is small,
flagged in docs otherwise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import functions as F

from ..sqlbatch import flat_select_expr

__all__ = ["do_join", "parse_by"]

_COND_RE = re.compile(
    r"^\s*(?P<l>[A-Za-z_][\w.]*)\s*(?P<op>==|=|>=|<=|!=|>|<)\s*(?P<r>[A-Za-z_][\w.]*)\s*$"
)
_CLOSEST_RE = re.compile(r"^\s*closest\s*\((?P<inner>.+)\)\s*$", re.S)


@dataclass
class JoinCond:
    left: str
    op: str
    right: str
    closest: bool = False


def parse_by(by, left_cols, right_cols) -> list[JoinCond]:
    """Parse the ``by`` spec (``/root/reference/src/db_parsing.jl:474-527``).

    ``None`` → natural join on common column names (dplyr behavior).
    """
    if by is None:
        common = [c for c in left_cols if c in right_cols]
        if not common:
            raise ValueError("no common columns for a natural join; pass `by=`")
        return [JoinCond(c, "==", c) for c in common]
    if isinstance(by, str):
        by = [by]
    conds = []
    for item in by:
        s = str(item).strip()
        m = _CLOSEST_RE.match(s)
        closest = False
        if m:
            s = m.group("inner").strip()
            closest = True
        m = _COND_RE.match(s)
        if m:
            op = "==" if m.group("op") == "=" else m.group("op")
            conds.append(JoinCond(m.group("l"), op, m.group("r"), closest))
        elif re.match(r"^[A-Za-z_]\w*$", s):
            conds.append(JoinCond(s, "==", s))
        else:
            raise ValueError(f"cannot parse join condition {item!r}")
    return conds


_HOW_MAP = {
    "left": "left",
    "right": "right",
    "inner": "inner",
    "full": "full",
    "semi": "left_semi",
    "anti": "left_anti",
}


# Spark join-strategy hints (Dataset.hint); applied to the RIGHT side —
# for broadcast/shuffle_hash that is the build side, which is the
# conventional "small" input in this API.
_STRATEGIES = {"broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"}


def do_join(left, right, by, how: str, force_asof: bool = False,
            strategy: str | None = None):
    from ..core import TidyFrame

    rtf = right if isinstance(right, TidyFrame) else TidyFrame(right)
    ldf, rdf = left.df, rtf.df
    if strategy is not None:
        if strategy not in _STRATEGIES:
            raise ValueError(
                f"unknown join strategy {strategy!r}; one of {sorted(_STRATEGIES)}"
            )
        rdf = rdf.hint(strategy)
    conds = parse_by(by, ldf.columns, rdf.columns)

    closest = [c for c in conds if c.closest]
    if closest or force_asof:
        if len(closest) != 1:
            raise ValueError("as-of join needs exactly one closest(...) condition")
        from .asof import asof_join

        eq = [(c.left, c.right) for c in conds if not c.closest]
        if how not in ("left", "inner"):
            raise ValueError("as-of join supports how='left'|'inner'")
        out = asof_join(ldf, rdf, eq, closest[0].left, closest[0].op, closest[0].right, how)
        return TidyFrame(out)

    la, ra = "__tidy_l", "__tidy_r"
    l, r = ldf.alias(la), rdf.alias(ra)

    # The condition ships as ONE F.expr and the output projection as ONE
    # flat_select_expr (sqlbatch).  The earlier per-column
    # F.col(...)/.alias(...) chain cost 2 driver round trips per output
    # column per join — ~50 round trips for a wide fact join, the dominant
    # cost of BUILDING a multi-join query (measured: q56's five joins
    # spent ~0.5 s in py4j chatter, ~45 DataFrame calls per join); the
    # intermediate selectExpr(*parts) form still paid one py4j
    # list-element trip per output column.
    def _bq(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    cond_parts = []
    equi_pairs: list[tuple[str, str]] = []
    for c in conds:
        op = "=" if c.op == "==" else c.op
        cond_parts.append(f"{_bq(la)}.{_bq(c.left)} {op} {_bq(ra)}.{_bq(c.right)}")
        if c.op == "==":
            equi_pairs.append((c.left, c.right))
    cond = F.expr(" AND ".join(cond_parts)) if cond_parts else None

    # 100 TB guard: a join with NO equality key plans as
    # BroadcastNestedLoopJoin — |L|x|R| work unless one side is small.
    # Surface it loudly; range-shaped predicates have a bucketed
    # alternative (operators.rangejoin.range_join), and an explicit
    # strategy hint acknowledges the small side.
    if not equi_pairs and strategy is None:
        import warnings

        warnings.warn(
            "join has no equality key: Spark will use a nested-loop plan "
            "(quadratic unless one side is small). For range predicates "
            "use range_join(); if one side is genuinely small, pass "
            "strategy='broadcast'.",
            stacklevel=3,
        )

    joined = l.join(r, cond, _HOW_MAP[how])

    if how in ("semi", "anti"):
        return TidyFrame(joined, groups=left.groups)

    # Projection: left columns (outer-join keys coalesced — the reference
    # emits COALESCE(l.k, r.k) for every join keeping both sides,
    # /root/reference/src/joins_sq.jl:101-137; without it a right join's
    # unmatched rows would lose their key values), right columns minus
    # dropped equi keys; right non-key name collisions get a `_right`
    # suffix.
    right_keys_dropped = {rc for _, rc in equi_pairs}
    out_cols = []
    for name in ldf.columns:
        lk = next((p for p in equi_pairs if p[0] == name), None)
        if how in ("full", "right") and lk is not None:
            out_cols.append(
                f"coalesce({_bq(la)}.{_bq(name)}, {_bq(ra)}.{_bq(lk[1])})"
                f" AS {_bq(name)}"
            )
        else:
            out_cols.append(f"{_bq(la)}.{_bq(name)} AS {_bq(name)}")
    for name in rdf.columns:
        if name in right_keys_dropped:
            continue
        alias = f"{name}_right" if name in ldf.columns else name
        out_cols.append(f"{_bq(ra)}.{_bq(name)} AS {_bq(alias)}")

    return TidyFrame(flat_select_expr(joined, out_cols), groups=left.groups)
