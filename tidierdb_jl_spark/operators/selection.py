"""Tidy column-selection resolver.

Mirrors the reference's ``parse_tidy_db``
(``/root/reference/src/db_parsing.jl:23-180``): bare names, ``a:b`` ranges,
``starts_with("x")`` / ``ends_with("x")`` / ``contains("x")`` /
``matches("re")`` helpers, negation ``!spec``, ``everything()``, and plain
lists.  Resolution is pure Python against ``df.columns`` — no Catalyst
involvement, matching the reference where selection is resolved against the
metadata DataFrame before SQL generation.
"""

from __future__ import annotations

import re

__all__ = ["resolve_selection"]

_HELPER_RE = re.compile(
    r"^(starts_with|ends_with|contains|matches|everything)\s*\(\s*(?:['\"](.*?)['\"])?\s*\)$"
)


def _expand_one(spec: str, columns: list[str]) -> list[str]:
    spec = spec.strip()
    m = _HELPER_RE.match(spec)
    if m:
        helper, arg = m.group(1), m.group(2) or ""
        if helper == "starts_with":
            return [c for c in columns if c.startswith(arg)]
        if helper == "ends_with":
            return [c for c in columns if c.endswith(arg)]
        if helper == "contains":
            return [c for c in columns if arg in c]
        if helper == "matches":
            rx = re.compile(arg)
            return [c for c in columns if rx.search(c)]
        return list(columns)  # everything()
    if ":" in spec and not spec.startswith("("):
        lo, hi = (p.strip() for p in spec.split(":", 1))
        if lo in columns and hi in columns:
            i, j = columns.index(lo), columns.index(hi)
            if i > j:
                i, j = j, i
            return columns[i : j + 1]
        raise KeyError(f"range {spec!r}: columns not found in {columns}")
    if spec in columns:
        return [spec]
    if spec == "all":
        # `@group_by(all)` / `_by = all` — every column (NEWS v0.8.9); a
        # real column named "all" wins above
        return list(columns)
    if "." in spec and spec.rsplit(".", 1)[1] in columns:
        # `table.col` qualifiers (/root/reference/src/db_parsing.jl:23-180,
        # test/comp_tests.jl:203) — our joins already dedup key columns, so
        # the qualifier reduces to the bare name
        return [spec.rsplit(".", 1)[1]]
    raise KeyError(f"column {spec!r} not found; available: {columns}")


def resolve_selection(specs, columns) -> list[str]:
    """Resolve tidy selection specs to an ordered list of column names.

    Negations (``!spec`` or ``-spec``) remove from the running selection;
    if the *first* spec is a negation, the selection starts from all
    columns (dplyr behavior).
    """
    columns = list(columns)
    flat: list[str] = []
    for s in specs:
        if isinstance(s, (list, tuple)):
            flat.extend(str(x) for x in s)
        else:
            flat.extend(p for p in _split_top(str(s)) if p)

    selected: list[str] = []
    started_negative = bool(flat) and flat[0].lstrip().startswith(("!", "-"))
    if started_negative or not flat:
        selected = list(columns)

    for spec in flat:
        spec = spec.strip()
        neg = spec.startswith(("!", "-"))
        if neg:
            spec = spec[1:].strip()
            if spec.startswith("(") and spec.endswith(")"):
                spec = spec[1:-1].strip()
        cols = _expand_one(spec, columns)
        if neg:
            selected = [c for c in selected if c not in cols]
        else:
            selected.extend(c for c in cols if c not in selected)
    return selected


def _split_top(s: str) -> list[str]:
    """Split a comma-separated spec string at top level (not inside parens)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts
