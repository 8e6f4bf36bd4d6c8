"""UDF registration (SURVEY §2.11), scalar subqueries (§2.9), and
grouping sets — differential against DuckDB where SQL-expressible."""

import pytest

from tests.helpers import assert_matches_duckdb


def test_register_scalar_pandas_udf(spark, tables, ddb):
    from tidierdb_jl_spark.functions.udf import register_udf

    def tax_price(p, t):
        return p * (1.0 + t)

    register_udf(spark, "tax_price", tax_price)
    q = (
        tables["lineitem"]
        .mutate(tp="tax_price(l_extendedprice, l_tax)")
        .group_by("l_linestatus")
        .summarize(total="sum(tp)")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """SELECT l_linestatus, sum(l_extendedprice * (1.0 + l_tax)) AS total
           FROM lineitem GROUP BY l_linestatus""",
    )


def test_register_udf_row_at_a_time(tables, spark):
    from tidierdb_jl_spark.functions.udf import register_udf

    register_udf(spark, "row_twice", lambda x: x * 2, "bigint", vectorized=False)
    out = tables["nation"].mutate(k2="row_twice(n_nationkey)").collect()
    assert (out["k2"] == out["n_nationkey"] * 2).all()


def test_register_agg_udf_summarize_and_window(spark, tables):
    import numpy as np

    from tidierdb_jl_spark.functions.udf import register_agg_udf

    def q_p90(x):
        return float(np.quantile(x, 0.9))

    register_agg_udf(spark, "q_p90", q_p90)
    agg = (
        tables["lineitem"]
        .group_by("l_returnflag")
        .summarize(p90="q_p90(l_quantity)")
        .collect()
    )
    assert len(agg) == 3 and (agg["p90"] > 0).all()

    # the registered name is windowed inside grouped mutate
    win = (
        tables["lineitem"]
        .head(200)
        .mutate(p90="q_p90(l_quantity)", _by="l_returnflag")
        .collect()
    )
    per_flag = win.groupby("l_returnflag")["p90"].nunique()
    assert (per_flag == 1).all()


def test_scalar_eager(tables):
    v = tables["lineitem"].summarize(m="max(l_quantity)").scalar()
    assert v == 50


def test_with_scalar_lazy_broadcast(tables, ddb):
    li = tables["lineitem"]
    q = (
        li.with_scalar(avg_p=li.summarize(m="mean(l_extendedprice)"))
        .filter("l_extendedprice > avg_p")
        .summarize(n="n()")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT avg(l_extendedprice) FROM lineitem)""",
    )


def test_rollup(tables, ddb):
    q = tables["orders"].rollup("o_orderstatus", "o_orderpriority").summarize(
        n="n()", total="sum(o_totalprice)"
    )
    assert_matches_duckdb(
        q,
        ddb,
        """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                  sum(o_totalprice) AS total
           FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    )


def test_grouping_sets(tables, ddb):
    q = tables["orders"].grouping_sets(
        ["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []
    ).summarize(n="n()", total="sum(o_totalprice)")
    assert_matches_duckdb(
        q,
        ddb,
        """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                  sum(o_totalprice) AS total
           FROM orders
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderstatus), ())""",
    )


def test_cube(tables, ddb):
    q = tables["orders"].cube("o_orderstatus", "o_orderpriority").summarize(n="n()")
    assert_matches_duckdb(
        q,
        ddb,
        """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    )


def test_bucketed_tables_join_without_shuffle(spark, tables):
    from tidierdb_jl_spark import create_table, db_table, plan_summary

    create_table(tables["orders"], "orders_bkt", bucket_by="o_custkey", buckets=8, sort_by="o_custkey")
    create_table(tables["customer"], "cust_bkt", bucket_by="c_custkey", buckets=8, sort_by="c_custkey")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = db_table(spark, "orders_bkt").inner_join(
            db_table(spark, "cust_bkt"), by="o_custkey == c_custkey"
        )
        ps = plan_summary(j)
        # co-located bucketed scan: the equi-join needs NO exchange
        assert ps["exchanges"] == 0, ps
        plain = tables["orders"].inner_join(tables["customer"], by="o_custkey == c_custkey")
        assert len(j.collect()) == len(plain.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS cust_bkt")


def test_register_udtf(spark, tables):
    from tidierdb_jl_spark.functions.udf import register_udtf

    class WordSplit:
        def eval(self, text: str, doc_id: int):
            if text:
                for i, w in enumerate(text.split()[:3]):
                    yield (doc_id, i, w)

    register_udtf(spark, "word_split", WordSplit, "doc_id bigint, pos int, word string")
    out = spark.sql(
        """SELECT s.* FROM documents d,
           LATERAL word_split(d.text, d.doc_id) s
           WHERE d.doc_id < 5"""
    ).toPandas()
    assert len(out) > 0 and set(out.columns) == {"doc_id", "pos", "word"}
    assert (out["pos"] <= 2).all()
