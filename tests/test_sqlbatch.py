"""sqlbatch.flat_select_expr — the flat-cost selectExpr (r12 change 14).

The contract is behavioral identity with stock ``DataFrame.selectExpr``:
same rows, same physical plan (modulo expression ids), same errors, same
session-cache use.  The cache assertion pins the pitfall that killed the
rejected design (parameterized ``spark.sql("... FROM {df}")``): a
temp-view ``View`` node blocks CacheManager substitution, silently
turning cached-base-table reads back into parquet scans.
"""

from __future__ import annotations

import re

import pytest

from tidierdb_jl_spark.sqlbatch import (
    _DELIM,
    _state,
    fast_expr,
    fast_sort_item,
    flat_select_expr,
    install,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(100).selectExpr(
        "id",
        "cast(id % 7 as string) AS g",
        "id * 2.5 AS v",
        "concat('x{', id, '}y') AS s",
    )


def _phys(d):
    plan = d._jdf.queryExecution().executedPlan().toString()
    plan = re.sub(r"#\d+L?", "#X", plan)
    return re.sub(r"plan_id=\d+", "plan_id=N", plan)


def _stock(d, parts):
    """selectExpr bypassing both the patch and the flat path."""
    from tidierdb_jl_spark import sqlbatch

    return sqlbatch._orig_select_expr(d, *parts)


PART_SETS = [
    ["`id`", "`g`"],  # plain projection (core.select shape)
    # windows + regex braces + replacement-in-place (mutate flush shape)
    [
        "id",
        "(sum(v) OVER (PARTITION BY g ORDER BY id ASC NULLS FIRST)) AS cum",
        "regexp_replace(s, '[a-z]{2}', '_') AS s",
    ],
    ["*", "(v + 1) AS w"],  # star-plus-new (builder shape)
]


@pytest.mark.parametrize("parts", PART_SETS)
def test_identical_rows_and_plan(df, parts):
    fast = flat_select_expr(df, parts)
    ref = _stock(df, parts)
    assert fast.collect() == ref.collect()
    assert _phys(fast) == _phys(ref)


def test_patch_installed_and_flat(spark, df):
    # install() is called from the package __init__; the patched method
    # must produce stock-identical results for both call conventions
    install()
    a = df.selectExpr("id", "(v * 2) AS v2")
    b = df.selectExpr(["id", "(v * 2) AS v2"])
    assert a.collect() == b.collect() == _stock(df, ["id", "(v * 2) AS v2"]).collect()


def test_delimiter_part_falls_back(df):
    # a part containing the record separator takes the stock path (and
    # here fails analysis identically to stock selectExpr)
    part = f"concat('a', '{_DELIM}') AS weird"
    fast = flat_select_expr(df, ["id", part])
    assert fast.columns == ["id", "weird"]


def test_error_parity(df):
    from pyspark.errors.exceptions.captured import CapturedException

    with pytest.raises(CapturedException) as fast_err:
        flat_select_expr(df, ["not_a_col + 1 AS x"]).collect()
    with pytest.raises(CapturedException) as ref_err:
        _stock(df, ["not_a_col + 1 AS x"]).collect()
    assert type(fast_err.value) is type(ref_err.value)


def test_cache_preserved(spark):
    # the whole point vs the rejected spark.sql("... FROM {df}") design
    base = spark.range(500).selectExpr("id", "id * 3 AS v").repartition(2).cache()
    try:
        base.count()
        out = flat_select_expr(base, ["id", "(v + 1) AS v"])
        assert "InMemoryTableScan" in _phys(out)
    finally:
        base.unpersist()


def test_fast_expr_identical(spark, df):
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    a = df.select(F.expr("(v * 2) AS w"))
    b = df.select(fast_expr("(v * 2) AS w"))
    assert isinstance(fast_expr("1"), Column)
    assert type(fast_expr("1")) is type(F.expr("1"))
    assert a.collect() == b.collect()
    assert _phys(a) == _phys(b)


@pytest.mark.parametrize("desc", [True, False])
def test_fast_sort_item_identical(df, desc):
    from pyspark.sql import functions as F

    c = F.expr("v")
    ref = df.orderBy(c.desc_nulls_last() if desc else c.asc_nulls_last())
    fast = df.orderBy(fast_sort_item("v", desc))
    assert fast.collect() == ref.collect()
    assert _phys(fast) == _phys(ref)


def test_stale_gateway_state_recovers(df):
    # a poisoned cached splitter handle must fall back, then self-heal
    _state["key"] = object()
    _state["splitter"] = None  # None.splitToList raises -> fallback path
    out = flat_select_expr(df, ["id", "(v + 1) AS w"])
    assert out.columns == ["id", "w"]
    # next call rebuilds the handles and takes the flat path again
    out2 = flat_select_expr(df, ["id", "(v + 2) AS w"])
    assert out2.columns == ["id", "w"]


def test_register_udf_cached_registers_once_and_keys_params(df):
    """register_udf_cached (r13): one registration per (session, params);
    a different param set registers a sibling name; the warm path is a
    catalog probe only (build() not called again); results are correct
    when applied inside a SQL string."""
    from tidierdb_jl_spark.sqlbatch import register_udf_cached

    spark = df.sparkSession
    calls = {"n": 0}

    def build(mult):
        def _build():
            import pandas
            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            calls["n"] += 1

            def f(v: pandas.Series) -> pandas.Series:
                return v * mult

            f.__annotations__ = {"v": pandas.Series,
                                 "return": pandas.Series}
            return F.pandas_udf(T.DoubleType())(f)

        return _build

    n2 = register_udf_cached(spark, "tidy_testmul", ("mul", 2.0), build(2.0))
    n2b = register_udf_cached(spark, "tidy_testmul", ("mul", 2.0), build(2.0))
    n3 = register_udf_cached(spark, "tidy_testmul", ("mul", 3.0), build(3.0))
    assert n2 == n2b and n2 != n3
    assert calls["n"] == 2  # warm path never rebuilt the 2.0 UDF
    got = df.selectExpr(f"{n2}(CAST(v AS DOUBLE)) AS a",
                        f"{n3}(CAST(v AS DOUBLE)) AS b").collect()
    for r, src in zip(got, df.select("v").collect()):
        if src["v"] is not None:
            assert r["a"] == float(src["v"]) * 2.0
            assert r["b"] == float(src["v"]) * 3.0


def test_register_udf_cached_fresh_session_reregisters(spark_factory=None):
    """A NEW session (fresh catalog — the restarted-JVM analogue py4j
    allows in-process) must miss the probe and re-register rather than
    serve a stale judf."""
    from pyspark.sql import SparkSession

    from tidierdb_jl_spark.sqlbatch import register_udf_cached

    base = SparkSession.builder.getOrCreate()
    fresh = base.newSession()  # separate temp-function registry
    calls = {"n": 0}

    def build():
        import pandas
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        calls["n"] += 1

        def f(v: pandas.Series) -> pandas.Series:
            return v + 1.0

        f.__annotations__ = {"v": pandas.Series, "return": pandas.Series}
        return F.pandas_udf(T.DoubleType())(f)

    n1 = register_udf_cached(base, "tidy_testinc", ("inc",), build)
    n2 = register_udf_cached(fresh, "tidy_testinc", ("inc",), build)
    assert n1 == n2  # same params -> same name...
    assert calls["n"] == 2  # ...but each session registered its own
    out = fresh.range(3).selectExpr(f"{n2}(CAST(id AS DOUBLE)) AS x")
    assert [r["x"] for r in out.collect()] == [1.0, 2.0, 3.0]
