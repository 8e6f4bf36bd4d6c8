"""User-defined function registration (SURVEY §2.11).

The reference registers Julia functions into DuckDB
(``DuckDB.@create_scalar_function`` + ``register_scalar_function``,
``/root/reference/docs/examples/UserGuide/udfs_ex.jl:10-18``) after which
they are usable by name inside any ``@mutate`` expression; aggregate
names are an open passthrough, and users extend the window-function
allowlist with ``push!(TidierDB.window_agg_fxns, :fn)``
(``/root/reference/docs/examples/UserGuide/agg_window.jl:21-38``,
``/root/reference/src/TidierDB.jl:43``).

Spark equivalents, same ergonomics: register under a name with
``spark.udf.register`` and the open function passthrough in the tidy
expression rewriter picks it up everywhere (mutate/filter/summarize).
Vectorized (Arrow/pandas) registration is the default — row-at-a-time
Python UDFs are 10-100× slower and only used when asked.

Scale note: any Python UDF forces rows out of whole-stage codegen through
Arrow and back.  Prefer a Spark SQL expression when one exists; register
UDFs only for genuinely non-expressible logic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import AGG_FNS, WINDOW_FNS

__all__ = [
    "register_udf",
    "register_agg_udf",
    "register_udtf",
    "add_agg_fn",
    "add_window_fn",
]


def _resolve_type(return_type):
    from pyspark.sql.types import DataType

    if isinstance(return_type, DataType):
        return return_type
    # Spark accepts DDL strings ("double", "array<bigint>") directly
    return return_type


def register_udf(
    spark: SparkSession,
    name: str,
    fn,
    return_type="double",
    vectorized: bool = True,
):
    """Register a scalar UDF usable by ``name`` in any tidy expression.

    ``vectorized=True`` (default) wraps ``fn`` as an Arrow-batched pandas
    UDF: ``fn`` receives/returns ``pandas.Series`` (one per argument).
    ``vectorized=False`` registers a row-at-a-time Python UDF — the slow
    path, for logic that can't be written against Series.

    Returns the registered callable (also usable as a Column function).
    """
    rt = _resolve_type(return_type)
    if vectorized:
        import pandas

        # Annotations must be real classes: pyspark resolves them to pick
        # the UDF eval type, and stringified annotations from
        # `from __future__ import annotations` in the caller would fail.
        nargs = fn.__code__.co_argcount
        fn.__annotations__ = {
            **{a: pandas.Series for a in fn.__code__.co_varnames[:nargs]},
            "return": pandas.Series,
        }
        udf = F.pandas_udf(rt)(fn)
    else:
        udf = F.udf(fn, rt)
    spark.udf.register(name, udf)
    return udf


def register_agg_udf(spark: SparkSession, name: str, fn, return_type="double"):
    """Register a grouped-aggregate (pandas) UDF: ``fn`` maps one or more
    ``pandas.Series`` to a scalar.  Usable in ``summarize`` by name and —
    because the name is added to the aggregate allowlist — windowed
    automatically inside grouped ``mutate`` (Spark evaluates pandas UDAFs
    over unbounded window frames).

    Spark limitation (INVALID_PANDAS_UDF_PLACEMENT): a grouped-agg pandas
    UDF cannot share one ``summarize`` with JVM aggregates — split into
    two summarize calls and join, or compute both as grouped-mutate
    windows."""
    import pandas

    rt = _resolve_type(return_type)
    nargs = fn.__code__.co_argcount
    fn.__annotations__ = {
        **{a: pandas.Series for a in fn.__code__.co_varnames[:nargs]},
        "return": float if rt == "double" else object,
    }
    udf = F.pandas_udf(rt, F.PandasUDFType.GROUPED_AGG)(fn)
    spark.udf.register(name, udf)
    add_agg_fn(name)
    return udf


def register_udtf(spark: SparkSession, name: str, cls, return_type: str):
    """Register a Python user-defined *table* function (Spark ≥ 3.5): a
    class with an ``eval(self, ...)`` generator yielding output tuples.
    The reference has no UDTF surface (SURVEY §2.11 — closest is unnest);
    this exposes Spark's, usable as a table in SQL:

        class Explode3:
            def eval(self, x: int):
                for i in range(3):
                    yield (x, i)
        register_udtf(spark, "explode3", Explode3, "x int, i int")
        spark.sql("SELECT * FROM explode3(7)")
    """
    u = F.udtf(cls, returnType=return_type)
    spark.udtf.register(name, u)
    return u


def add_agg_fn(name: str) -> None:
    """Teach the expression rewriter that ``name`` is an aggregate: inside
    grouped ``mutate`` it gets an ``OVER (...)`` window like the
    built-ins.  Mirrors ``push!(TidierDB.window_agg_fxns, :fn)``."""
    AGG_FNS.add(name.lower())


def add_window_fn(name: str) -> None:
    """Teach the rewriter that ``name`` is a ranking/analytic function
    (always windowed, even ungrouped)."""
    WINDOW_FNS.add(name.lower())
