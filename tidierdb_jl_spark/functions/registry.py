"""Tidy-expression → Spark SQL rewriting registry.

The reference (TidierDB.jl) translates a Julia expression AST into backend
SQL with a per-dialect ``MacroTools.postwalk`` rewrite
(``/root/reference/src/parsing_duckdb.jl:1-185`` and 9 sibling dialect
files), leaving unknown function calls verbatim — the expression language
is *open* (``/root/reference/README.md:53-54``).

Here there is exactly one target dialect: **Spark SQL**. User expressions
are strings in Spark SQL syntax, plus the dplyr/TidierDB spellings below,
which are rewritten before being handed to ``F.expr`` — Spark's own parser
and analyzer then validate the result at plan-build time (earlier than the
reference's collect-time backend errors).

Design notes for scale: everything produced here is a Catalyst expression —
JVM-side, whole-stage-codegen'd. No Python UDFs are ever emitted by this
module.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = [
    "WindowState",
    "rewrite",
    "render_order_item",
    "over_sql",
    "AGG_FNS",
    "WINDOW_FNS",
]


# ---------------------------------------------------------------------------
# Window state carried by the TidyFrame wrapper
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WindowState:
    """Grouping / window-order / window-frame state.

    Mirrors the reference's ``SQLQuery.groupBy / window_order / windowFrame``
    fields (``/root/reference/src/structs.jl:13-45``) and its
    ``construct_window_clause`` (``/root/reference/src/db_parsing.jl:453-472``).
    ``frame`` uses the reference's sign convention
    (``/root/reference/src/windows.jl:59-177``): 0 → CURRENT ROW,
    -n → n PRECEDING, +n → n FOLLOWING, None → UNBOUNDED.
    """

    groups: tuple = ()          # tuple[str] of grouping expressions (SQL)
    order: tuple = ()           # tuple[str] of rendered ORDER BY items
    frame: tuple | None = None  # (lo, hi) per sign convention, or None


def _frame_bound(v, side: str) -> str:
    if v is None:
        return "UNBOUNDED PRECEDING" if side == "lo" else "UNBOUNDED FOLLOWING"
    if v == 0:
        return "CURRENT ROW"
    return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"


def frame_sql(frame: tuple) -> str:
    lo, hi = frame
    return f"ROWS BETWEEN {_frame_bound(lo, 'lo')} AND {_frame_bound(hi, 'hi')}"


def over_sql(ws: WindowState, frame_override: tuple | None = None) -> str:
    """Render the inside of an ``OVER (...)`` clause from window state."""
    parts = []
    if ws.groups:
        parts.append("PARTITION BY " + ", ".join(ws.groups))
    if ws.order:
        parts.append("ORDER BY " + ", ".join(ws.order))
    frame = frame_override if frame_override is not None else ws.frame
    if frame is not None:
        parts.append(frame_sql(frame))
    return " ".join(parts)


def parse_order_spec(spec: str) -> tuple[str, bool]:
    """Parse an arrange/window_order item: ``"x"`` or ``"desc(x)"``.

    Returns ``(expr, is_desc)``.
    """
    s = spec.strip()
    low = s.lower()
    if low.startswith("desc(") and s.endswith(")"):
        return s[5:-1].strip(), True
    if low.startswith("asc(") and s.endswith(")"):
        return s[4:-1].strip(), False
    if low.endswith(" desc"):
        return s[:-5].strip(), True
    if low.endswith(" asc"):
        return s[:-4].strip(), False
    return s, False


def render_order_item(spec: str) -> str:
    """Render an order item as SQL for OVER clauses.

    DuckDB's default null ordering is NULLS LAST for both directions while
    Spark defaults to NULLS FIRST for ASC — normalize to the DuckDB/dbplyr
    behavior so differential results agree (SURVEY §7 "genuinely hard" #1).
    """
    expr, desc = parse_order_spec(spec)
    return f"{expr} {'DESC' if desc else 'ASC'} NULLS LAST"


# ---------------------------------------------------------------------------
# Function registry
# ---------------------------------------------------------------------------

# Aggregates that become windows inside mutate (reference: agg fn inside
# @mutate → `FN(x) OVER (PARTITION BY groups ...)`,
# /root/reference/src/parsing_duckdb.jl:23-58).
AGG_FNS = {
    "avg", "sum", "min", "max", "count", "stddev", "stddev_samp",
    "stddev_pop", "variance", "var_samp", "var_pop", "median", "mode",
    "any_value", "first", "last", "first_value", "last_value",
    "approx_count_distinct", "collect_list", "collect_set", "skewness",
    "kurtosis", "corr", "covar_samp", "covar_pop", "percentile_approx",
    "bool_and", "bool_or", "bit_and", "bit_or", "bit_xor", "product",
    "regr_r2", "regr_slope", "regr_intercept", "regr_avgx", "regr_avgy",
}

# Ranking / analytic functions that always need an OVER clause
# (reference's user-extensible allowlist, /root/reference/src/TidierDB.jl:43).
WINDOW_FNS = {
    "lead", "lag", "dense_rank", "nth_value", "ntile", "rank",
    "row_number", "cume_dist", "percent_rank",
}


def _paren(a: str) -> str:
    a = a.strip()
    return a if _is_simple(a) else f"({a})"


def _is_simple(a: str) -> bool:
    # bare identifier / number / quoted literal / already-parenthesized call
    if not a:
        return True
    if a[0] in "'\"" and a[-1] == a[0]:
        return True
    return all(ch.isalnum() or ch in "_.*" for ch in a)


def _unquote(a: str) -> str:
    a = a.strip()
    if len(a) >= 2 and a[0] in "'\"" and a[-1] == a[0]:
        return a[1:-1]
    return a


# --- templates -------------------------------------------------------------
# Each template: (args: list[str]) -> str (Spark SQL).  Rewriting of args has
# already happened (the rewriter recurses before applying the template).


def _rename(new: str):
    return lambda args: f"{new}({', '.join(args)})"


def _t_n(args):
    return "count(*)"


def _t_n_distinct(args):
    return f"count(DISTINCT {', '.join(args)})"


def _t_if_else(args):
    # /root/reference/src/db_parsing.jl:183-246 — 3-arg plain CASE, 4-arg
    # wraps the CASE so a NULL result becomes the `missing` value.
    if len(args) == 3:
        return f"CASE WHEN {_paren(args[0])} THEN {args[1]} ELSE {args[2]} END"
    if len(args) == 4:
        core = f"CASE WHEN {_paren(args[0])} THEN {args[1]} ELSE {args[2]} END"
        return f"CASE WHEN ({core}) IS NULL THEN {args[3]} ELSE ({core}) END"
    raise ValueError("if_else expects 3 or 4 arguments")


def _t_case_when(args):
    # /root/reference/src/db_parsing.jl:250-303 — comma pairs with optional
    # trailing default, and/or TidierData-style `cond => value` arrow pairs
    # (both forms mix freely, like the reference's parser)
    flat: list[str] = []
    default = None
    i = 0
    while i < len(args):
        a = args[i]
        if "=>" in a and not _inside_string(a, a.index("=>")):
            cond, val = a.split("=>", 1)
            flat.extend([cond.strip(), val.strip()])
            i += 1
        elif i == len(args) - 1:
            default = a
            i += 1
        else:
            flat.extend([a, args[i + 1]])
            i += 2
    parts = ["CASE"]
    for j in range(0, len(flat), 2):
        parts.append(f"WHEN {_paren(flat[j])} THEN {flat[j + 1]}")
    if default is not None:
        parts.append(f"ELSE {default}")
    parts.append("END")
    return " ".join(parts)


def _inside_string(s: str, pos: int) -> bool:
    quote = None
    for i, ch in enumerate(s):
        if i >= pos:
            break
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
    return quote is not None


def _t_str_detect(args):
    # Reference parity (/root/reference/src/parsing_duckdb.jl:159-166): a
    # plain-string pattern is a LITERAL -> col LIKE '%pat%' (the reference
    # interpolates straight into LIKE, so % and _ keep their LIKE meaning);
    # regex matching requires the explicit regex('...') spelling (the
    # reference's r"..." literal).  Non-literal patterns (columns,
    # expressions) fall back to RLIKE, documented in SURVEY §4.3.
    col, pat = args[0].strip(), args[1].strip()
    if pat.startswith("regex(") and pat.endswith(")"):
        return f"({col} RLIKE {pat[len('regex('):-1]})"
    if len(pat) >= 2 and pat[0] in "'\"" and pat[-1] == pat[0]:
        # Re-quote the literal safely: unescape the source quoting, then
        # double embedded single quotes for the emitted SQL literal — a
        # pattern like "it's" must not produce LIKE '%it's%'.  % and _
        # intentionally keep their LIKE meaning (reference parity, see
        # above); use regex('\\%') style spelling to match them literally.
        q, inner = pat[0], pat[1:-1]
        inner = inner.replace(q + q, q)
        return f"({col} LIKE '%{inner.replace(chr(39), chr(39) * 2)}%')"
    return f"({col} RLIKE {pat})"


def _t_str_replace_first(args):
    # DuckDB regexp_replace replaces the FIRST match only; Spark's replaces
    # all.  Splice via regexp_instr/regexp_extract (Spark 3.4+) for parity.
    c, p, r = args
    pos = f"regexp_instr({c}, {p})"
    hit = f"regexp_extract({c}, {p}, 0)"
    return (
        f"CASE WHEN {pos} = 0 THEN {c} "
        f"ELSE concat(substring({c}, 1, {pos} - 1), {r}, "
        f"substring({c}, {pos} + length({hit}))) END"
    )


def _t_str_remove_first(args):
    return _t_str_replace_first([args[0], args[1], "''"])


def _t_difftime(args):
    # difftime(end, start, 'unit') → timestampdiff(UNIT, start, end)
    # (reference: date_diff(unit, start, end), parsing_duckdb.jl:128-129)
    end, start, unit = args
    return f"timestampdiff({_unquote(unit).upper()}, {start}, {end})"


def _t_floor_date(args):
    col, unit = args
    if not unit.strip().startswith("'"):
        unit = f"'{unit.strip()}'"
    return f"date_trunc({unit}, {col})"


def _interval(unit: str, spark_pos: int):
    # Year(n) … Second(n) interval constructors
    # (/root/reference/src/parsing_duckdb.jl:114-125).  make_interval keeps
    # column arguments legal (INTERVAL literals require constants).
    def t(args):
        vals = ["0"] * 7
        vals[spark_pos] = f"CAST({args[0]} AS INT)" if spark_pos < 6 else f"CAST({args[0]} AS DOUBLE)"
        return f"make_interval({', '.join(vals)})"

    return t


def _t_ymd(fmt):
    return lambda args: f"to_date({args[0]}, '{fmt}')"


REGISTRY: dict = {
    # aggregates (dplyr names → Spark SQL)
    "mean": _rename("avg"),
    "minimum": _rename("min"),
    "maximum": _rename("max"),
    "std": _rename("stddev_samp"),
    "sd": _rename("stddev_samp"),
    "var": _rename("var_samp"),
    "n": _t_n,
    "n_distinct": _t_n_distinct,
    # conditionals
    "if_else": _t_if_else,
    "ifelse": _t_if_else,
    "case_when": _t_case_when,
    # missing values
    "ismissing": lambda args: f"({args[0]} IS NULL)",
    "is_missing": lambda args: f"({args[0]} IS NULL)",
    "replace_missing": _rename("coalesce"),
    "missing_if": _rename("nullif"),
    # casts (reference TRY_CAST family, parsing_duckdb.jl:145-153)
    # Dialect note: Spark's try_cast(string->integral) NULLs decimal
    # strings ('4.5'); DuckDB rounds them (TRY_CAST('4.5' AS BIGINT)=5).
    # We keep Spark semantics — cast via as_float first to round.
    "as_integer": lambda args: f"TRY_CAST({args[0]} AS BIGINT)",
    "as_float": lambda args: f"TRY_CAST({args[0]} AS DOUBLE)",
    "as_numeric": lambda args: f"TRY_CAST({args[0]} AS DOUBLE)",
    "as_string": lambda args: f"TRY_CAST({args[0]} AS STRING)",
    "as_date": lambda args: f"TRY_CAST({args[0]} AS DATE)",
    # strings
    "str_detect": _t_str_detect,
    "str_starts": lambda args: f"startswith({args[0]}, {args[1]})",
    "str_ends": lambda args: f"endswith({args[0]}, {args[1]})",
    "str_contains": lambda args: f"contains({args[0]}, {args[1]})",
    "str_replace": _t_str_replace_first,
    "str_replace_all": _rename("regexp_replace"),
    "str_remove": _t_str_remove_first,
    "str_remove_all": lambda args: f"regexp_replace({args[0]}, {args[1]}, '')",
    "str_to_upper": _rename("upper"),
    "str_to_lower": _rename("lower"),
    "str_length": _rename("length"),
    "str_trim": _rename("trim"),
    "str_squish": lambda args: f"trim(regexp_replace({args[0]}, '\\\\s+', ' '))",
    "str_sub": lambda args: f"substring({', '.join(args)})",
    "str_c": _rename("concat"),
    # dates (reference STRPTIME formats, parsing_duckdb.jl:130-135)
    "ymd": _t_ymd("yyyy-MM-dd"),
    "mdy": _t_ymd("MM-dd-yyyy"),
    "dmy": _t_ymd("dd-MM-yyyy"),
    "floor_date": _t_floor_date,
    "difftime": _t_difftime,
    # intervals (make_interval arg order: years months weeks days hours mins secs)
    "Year": _interval("year", 0),
    "Month": _interval("month", 1),
    "Week": _interval("week", 2),
    "Day": _interval("day", 3),
    "Hour": _interval("hour", 4),
    "Minute": _interval("minute", 5),
    "Second": _interval("second", 6),
    # predicate helpers usable on values (not the selection helpers)
    "starts_with": lambda args: f"startswith({', '.join(args)})",
    "ends_with": lambda args: f"endswith({', '.join(args)})",
    "contains": lambda args: f"contains({', '.join(args)})",
}

# identifiers rewritten outside call position
IDENT_REWRITES = {
    "missing": "NULL",
    # DuckDB's rowid pseudocolumn (reference passthrough,
    # /root/reference/docs/examples/UserGuide/udfs_ex.jl:31-39).  Spark has
    # no stable row id; monotonically_increasing_id() is unique and
    # increasing per partition but NOT dense or reproducible across plans
    # (documented divergence, SURVEY §4.3).  For a dense, contiguous,
    # order-defined index use operators.rowindex.with_row_index — the
    # scale-safe two-pass construction (never a single-task global window).
    "rowid": "monotonically_increasing_id()",
}


# ---------------------------------------------------------------------------
# The rewriter
# ---------------------------------------------------------------------------


def _scan_string(s: str, i: int) -> int:
    """Return index one past the end of the quoted literal starting at i."""
    q = s[i]
    j = i + 1
    while j < len(s):
        if s[j] == "\\":
            j += 2
            continue
        if s[j] == q:
            # SQL doubled-quote escape
            if j + 1 < len(s) and s[j + 1] == q:
                j += 2
                continue
            return j + 1
        j += 1
    return j


def _split_args(s: str, open_paren: int) -> tuple[list[str], int]:
    """Split ``s`` starting at the '(' at ``open_paren`` into top-level
    comma-separated arguments.  Returns (args, index_after_close_paren)."""
    depth = 0
    args: list[str] = []
    cur: list[str] = []
    i = open_paren
    while i < len(s):
        c = s[i]
        if c in "'\"":
            j = _scan_string(s, i)
            cur.append(s[i:j])
            i = j
            continue
        if c in "([":
            depth += 1
            if depth > 1:
                cur.append(c)
        elif c in ")]":
            depth -= 1
            if depth == 0:
                arg = "".join(cur).strip()
                if arg:
                    args.append(arg)
                return args, i + 1
            cur.append(c)
        elif c == "," and depth == 1:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    raise ValueError(f"unbalanced parentheses in expression: {s!r}")


def rewrite(expr: str, ws: WindowState | None = None, windowed: bool = False) -> str:
    """Rewrite a tidy expression string into Spark SQL.

    ``windowed=True`` corresponds to mutate/transmute context: aggregate
    functions get an ``OVER (...)`` clause built from ``ws`` (grouped
    mutate, reference ``construct_window_clause``); ranking functions always
    get one.  In summarize context (``windowed=False``) aggregates stay
    plain.
    """
    ws = ws or WindowState()
    out: list[str] = []
    i = 0
    s = expr
    while i < len(s):
        c = s[i]
        if c in "'\"":
            j = _scan_string(s, i)
            out.append(s[i:j])
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < len(s) and (s[j].isalnum() or s[j] in "_."):
                j += 1
            name = s[i:j]
            k = j
            while k < len(s) and s[k].isspace():
                k += 1
            if k < len(s) and s[k] == "(":
                raw_args, end = _split_args(s, k)
                args = [rewrite(a, ws, windowed) for a in raw_args]
                out.append(_render_call(name, args, ws, windowed))
                i = end
            else:
                out.append(IDENT_REWRITES.get(name, name))
                i = j
            continue
        if c == "&" and i + 1 < len(s) and s[i + 1] == "&":
            out.append(" AND ")
            i += 2
            continue
        if c == "~":
            # `~fn(x)` — the reference's escape hatch marking any function
            # as an aggregate-over-window in mutate context
            # (/root/reference/src/parsing_duckdb.jl:68-91; NEWS v0.8.8)
            k = i + 1
            while k < len(s) and s[k].isspace():
                k += 1
            j2 = k
            while j2 < len(s) and (s[j2].isalnum() or s[j2] in "_."):
                j2 += 1
            m2 = j2
            while m2 < len(s) and s[m2].isspace():
                m2 += 1
            if j2 > k and m2 < len(s) and s[m2] == "(":
                fn = s[k:j2]
                raw_args, end = _split_args(s, m2)
                args = [rewrite(a, ws, windowed) for a in raw_args]
                rendered = f"{fn}({', '.join(args)})"
                if windowed:
                    out.append(f"({rendered} OVER ({over_sql(ws)}))")
                else:
                    out.append(rendered)
                i = end
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _render_call(name: str, args: list[str], ws: WindowState, windowed: bool) -> str:
    low = name.lower()

    if low == "cumsum":
        # SUM(x) OVER (... ROWS UNBOUNDED PRECEDING) — parsing_duckdb.jl:52-58
        over = over_sql(ws, frame_override=(None, 0))
        return f"sum({args[0]}) OVER ({over})"

    if name in REGISTRY:
        rendered = REGISTRY[name](args)
        base = rendered.split("(", 1)[0].strip().lower()
    elif low in REGISTRY and low not in ("year", "month", "day", "hour", "minute", "second", "week"):
        rendered = REGISTRY[low](args)
        base = rendered.split("(", 1)[0].strip().lower()
    else:
        rendered = f"{name}({', '.join(args)})"
        base = low

    if low in WINDOW_FNS or base in WINDOW_FNS:
        return f"{rendered} OVER ({over_sql(ws)})"
    if windowed and (base in AGG_FNS or low in AGG_FNS) and not base.startswith("case"):
        return f"({rendered} OVER ({over_sql(ws)}))"
    return rendered
