"""Flat-cost ``selectExpr`` for build paths (guide §7.3).

Every ELEMENT of a Python list passed to ``select``/``selectExpr``/``agg``
is a separate serialized py4j socket round trip (py4j auto-converts list
arguments one element at a time), re-paid on EVERY build of a query —
measured ~0.5-0.7 ms/trip on a quiet host and >5 ms/trip under the
sandbox's co-tenant load, so a 20-column projection costs 12-100+ ms of
pure driver chatter per build, and a five-join TPC-H query pays it five
times per bench rep.

:func:`flat_select_expr` produces the EXACT same DataFrame as
``df.selectExpr(*parts)`` — same analysis, same physical plan (verified
bit-identical), same use of the session cache — in ~5 round trips
regardless of width: the parts travel as ONE delimiter-joined string,
split JVM-side (guava ``Splitter.splitToList`` returns a
``java.util.List`` which py4j proxies by reference; ``String.split``'s
array return would be eagerly converted back element-per-trip), wrapped
to a Seq by the same ``PythonUtils.toSeq`` pyspark itself uses, and
handed to ``Dataset.selectExpr``.

A rejected earlier design — parameterized ``spark.sql("SELECT ... FROM
{df}", df=df)`` — was also plan-identical and ~7 trips flat, but the
temp-view ``View`` node it introduces blocks ``CacheManager``'s
cached-plan substitution, silently turning every cached-base-table read
back into a parquet scan.

:func:`install` (called from the package ``__init__``) additionally
patches ``DataFrame.selectExpr`` itself so every all-string call in the
engine — the ANN/dedup/gapfill builders ship whole projections as SQL
strings since r12 change 13 — takes the flat path with no call-site
edits.  Any surprise (a part containing the delimiter, a non-string
part, a missing guava class, a restarted JVM, an analysis error) falls
back to the stock method, which is behavior-identical including error
messages for invalid SQL.
"""

from __future__ import annotations

__all__ = [
    "flat_select_expr",
    "fast_expr",
    "fast_sort_item",
    "bq",
    "install",
    "register_udf_cached",
]

# ASCII record separator: never appears in generated SQL (parts that do
# contain it — only possible via user string literals — take the
# fallback path).
_DELIM = "\x1e"

_state: dict = {"key": None, "splitter": None, "toseq": None, "fexpr": None}
_orig_select_expr = None


def bq(name: str) -> str:
    """Backtick-quote an identifier."""
    return "`" + name.replace("`", "``") + "`"


def _flat(df, parts):
    """The flat path proper; raises on any surprise (caller falls back)."""
    spark = df.sparkSession
    # resolve JVM handles once per gateway (each jvm.X attribute access
    # is itself a py4j reflection round trip)
    _jvm_handles(spark.sparkContext._jvm)
    jlist = _state["splitter"].splitToList(_DELIM.join(parts))
    jdf = df._jdf.selectExpr(_state["toseq"](jlist))
    return type(df)(jdf, spark)


def flat_select_expr(df, parts):
    """``df.selectExpr(*parts)`` in ~5 py4j round trips, any width."""
    orig = _orig_select_expr or type(df).selectExpr
    if not parts or any(not isinstance(p, str) or _DELIM in p for p in parts):
        return orig(df, *parts)
    try:
        return _flat(df, parts)
    except Exception:
        # includes genuine analysis errors: re-raise them with the stock
        # message/behavior by re-running the plain path
        _state["key"] = None
        return orig(df, *parts)


def _jvm_handles(jvm):
    """Refresh the per-gateway cached JVM handles."""
    client = jvm._gateway_client
    if _state["key"] is not client:
        _state["splitter"] = jvm.com.google.common.base.Splitter.on(_DELIM)
        _state["toseq"] = jvm.PythonUtils.toSeq
        _state["fexpr"] = jvm.functions.expr
        _state["key"] = client


def register_udf_cached(spark, prefix: str, key, build) -> str:
    """Register the pandas UDF ``build()`` ONCE per (SparkSession, params)
    under a deterministic params-keyed temp-function name and return that
    SQL-callable name.

    The ANN/dedup builders construct a pandas UDF per query BUILD and
    apply it through the Column API: pyspark pickles the function and
    creates a fresh judf on every first apply (~38 py4j round trips,
    measured via tools/py4j_census.py), re-paid each time the same query
    is rebuilt — the dominant remaining build cost for s39/s40/d35/d36
    (guide §7.3 driver-bottleneck class).  Registering under a name
    keyed by md5(params) makes the warm path ONE catalog round trip, and
    lets call sites apply the UDF inside the SQL strings they already
    ship (flat selectExpr), dropping the Column-API apply trips too.

    Staleness is structurally impossible: the catalog probe asks the
    LIVE session, so a new session/JVM simply misses and re-registers.
    Different params hash to different names (the key must capture every
    closure parameter of the UDF — plain tuples/lists/floats only, so
    ``pickle.dumps`` is deterministic).  Per-session growth is bounded by
    the number of distinct param sets actually used.
    """
    import hashlib
    import pickle

    name = prefix + "_" + hashlib.md5(
        pickle.dumps(key, protocol=4)
    ).hexdigest()[:16]
    if not spark.catalog.functionExists(name):
        spark.udf.register(name, build())
    return name


def fast_expr(sql: str):
    """``F.expr(sql)`` via a cached JVM handle — 1 py4j round trip instead
    of 3 (stock F.expr re-resolves the ``functions`` object per call).
    Identical JVM call ⇒ identical Column/plan.  Falls back to F.expr on
    any surprise (no active context, restarted JVM)."""
    try:
        from pyspark import SparkContext
        from pyspark.sql.classic.column import Column as _CCol

        sc = SparkContext._active_spark_context
        _jvm_handles(sc._jvm)
        return _CCol(_state["fexpr"](sql))
    except Exception:
        _state["key"] = None
        from pyspark.sql import functions as F

        return F.expr(sql)


def fast_sort_item(sql: str, desc: bool):
    """``F.expr(sql).desc_nulls_last()`` / ``.asc_nulls_last()`` with the
    direction applied JVM-side — ~2 py4j round trips instead of ~15 (the
    Python Column wrapper's sort-direction methods alone cost ~12).
    Same JVM methods ⇒ identical SortOrder expression."""
    try:
        from pyspark import SparkContext
        from pyspark.sql.classic.column import Column as _CCol

        sc = SparkContext._active_spark_context
        _jvm_handles(sc._jvm)
        jc = _state["fexpr"](sql)
        jc = jc.desc_nulls_last() if desc else jc.asc_nulls_last()
        return _CCol(jc)
    except Exception:
        _state["key"] = None
        from pyspark.sql import functions as F

        c = F.expr(sql)
        return c.desc_nulls_last() if desc else c.asc_nulls_last()


def install() -> None:
    """Patch ``DataFrame.selectExpr`` to take the flat path when possible.

    Idempotent; classic (py4j) DataFrame only.  The patched method accepts
    exactly what the stock one accepts (varargs or a single list) and
    delegates to the stock implementation whenever the flat path does not
    apply or fails.
    """
    global _orig_select_expr
    import os

    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
    except ImportError:  # pragma: no cover - non-classic builds
        return
    if os.environ.get("TIDY_NO_FLAT_SELECTEXPR"):
        # opt-out: the patch is process-wide (all pyspark code in the
        # process takes the flat path), so give operators a kill switch.
        if getattr(_CDF.selectExpr, "_tidy_flat", False):
            _CDF.selectExpr = _CDF.selectExpr._tidy_orig  # unpatch
        _orig_select_expr = None
        return
    if getattr(_CDF.selectExpr, "_tidy_flat", False):
        # already patched (possibly by a previous load of this module —
        # a reload resets our global): recover the true original from
        # the stash on the patched function so the fallback path never
        # re-enters the patch.
        _orig_select_expr = _CDF.selectExpr._tidy_orig
        return
    _orig_select_expr = _CDF.selectExpr

    def selectExpr(self, *expr):  # noqa: N802 - pyspark API name
        if len(expr) == 1 and isinstance(expr[0], list):
            expr = tuple(expr[0])
        return flat_select_expr(self, expr)

    selectExpr._tidy_flat = True  # type: ignore[attr-defined]
    selectExpr._tidy_orig = _orig_select_expr  # type: ignore[attr-defined]
    selectExpr.__doc__ = _orig_select_expr.__doc__
    _CDF.selectExpr = selectExpr
