"""Differential tests for the core verb set (SURVEY §2.2/2.4/2.6)."""

from helpers import assert_matches_duckdb


def test_flagship_q1(tables, ddb):
    q = (
        tables["lineitem"]
        .filter("l_shipdate <= '1998-09-02'")
        .group_by("l_returnflag", "l_linestatus")
        .summarize(
            sum_qty="sum(l_quantity)",
            sum_disc_price="sum(l_extendedprice * (1 - l_discount))",
            avg_qty="mean(l_quantity)",
            count_order="n()",
        )
        .arrange("l_returnflag", "l_linestatus")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               avg(l_quantity) AS avg_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
        "q1",
    )


def test_select_range_and_helpers(tables):
    li = tables["lineitem"]
    assert li.select("l_orderkey:l_suppkey").columns == [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
    ]
    assert li.select("starts_with('l_s')").columns == ["l_suppkey", "l_shipdate"]
    assert "l_tax" not in li.select("!l_tax").columns
    assert li.select("contains('flag')").columns == ["l_returnflag"]


def test_filter_mutate(tables, ddb):
    q = (
        tables["orders"]
        .filter("o_orderstatus == 'O'", "o_totalprice > 100000")
        .mutate(
            price_k="o_totalprice / 1000",
            big="if_else(o_totalprice > 300000, 'big', 'small')",
        )
        .select("o_orderkey", "price_k", "big")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o_orderkey, o_totalprice / 1000 AS price_k,
               CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS big
        FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000
        """,
        "filter+mutate",
    )


def test_mutate_case_when_and_strings(tables, ddb):
    q = (
        tables["customer"]
        .mutate(
            seg="case_when(c_acctbal < 0, 'neg', c_acctbal < 5000, 'mid', 'high')",
            nm="str_to_upper(c_name)",
            has5="str_detect(c_name, '5')",
        )
        .select("c_custkey", "seg", "nm", "has5")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS seg,
               upper(c_name) AS nm,
               regexp_matches(c_name, '5') AS has5
        FROM customer
        """,
        "case_when+strings",
    )


def test_grouped_mutate_window(tables, ddb):
    q = (
        tables["lineitem"]
        .group_by("l_orderkey")
        .mutate(order_qty="sum(l_quantity)", qty_share="l_quantity / sum(l_quantity)")
        .select("l_orderkey", "l_linenumber", "order_qty", "qty_share")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_orderkey, l_linenumber,
               sum(l_quantity) OVER (PARTITION BY l_orderkey) AS order_qty,
               l_quantity / sum(l_quantity) OVER (PARTITION BY l_orderkey) AS qty_share
        FROM lineitem
        """,
        "grouped mutate",
    )


def test_summarize_by_kwarg(tables, ddb):
    q = tables["orders"].summarize(
        n="n()", total="sum(o_totalprice)", _by="o_orderpriority"
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               sum(o_totalprice) AS total
        FROM orders GROUP BY o_orderpriority
        """,
        "_by",
    )


def test_grouped_filter_having(tables, ddb):
    q = (
        tables["orders"]
        .group_by("o_custkey")
        .summarize(n="n()", spend="sum(o_totalprice)")
        .filter("n >= 3")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3
        """,
        "having",
    )


def test_grouped_filter_window(tables, ddb):
    q = (
        tables["lineitem"]
        .group_by("l_orderkey")
        .filter("l_quantity > mean(l_quantity)")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_orderkey, l_linenumber, l_quantity FROM (
          SELECT l_orderkey, l_linenumber, l_quantity,
                 avg(l_quantity) OVER (PARTITION BY l_orderkey) AS m
          FROM lineitem
        ) WHERE l_quantity > m
        """,
        "grouped filter",
    )


def test_distinct_count(tables, ddb):
    q = tables["lineitem"].distinct("l_returnflag", "l_linestatus")
    assert_matches_duckdb(
        q, ddb, "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem", "distinct"
    )
    q2 = tables["orders"].count("o_orderstatus", sort=True)
    assert_matches_duckdb(
        q2,
        ddb,
        "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_orderstatus",
        "count",
    )


def test_arrange_head_limit(tables, ddb):
    q = tables["orders"].arrange("desc(o_totalprice)").head(10).select("o_orderkey", "o_totalprice")
    assert_matches_duckdb(
        q,
        ddb,
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC NULLS LAST LIMIT 10",
        "topk",
    )


def test_drop_missing_rename_relocate(tables):
    o = tables["orders"]
    r = o.rename(status="o_orderstatus")
    assert "status" in r.columns and "o_orderstatus" not in r.columns
    rl = o.relocate("o_totalprice", before="o_orderkey")
    assert rl.columns[0] == "o_totalprice"
    dm = o.drop_missing("o_totalprice")
    assert dm.collect().shape[0] == o.collect().shape[0]  # no NULLs in testdata


def test_across(tables, ddb):
    q = tables["lineitem"].group_by("l_returnflag").summarize(
        "across(l_quantity:l_extendedprice, (mean, sum))"
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_returnflag,
               avg(l_quantity) AS l_quantity_mean, sum(l_quantity) AS l_quantity_sum,
               avg(l_extendedprice) AS l_extendedprice_mean, sum(l_extendedprice) AS l_extendedprice_sum
        FROM lineitem GROUP BY l_returnflag
        """,
        "across",
    )


def test_dates_intervals(tables, ddb):
    q = (
        tables["orders"]
        .mutate(
            mo="floor_date(o_orderdate, 'month')",
            yr="year(o_orderdate)",
            due="o_orderdate + Day(30)",
        )
        .select("o_orderkey", "mo", "yr", "due")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o_orderkey, date_trunc('month', o_orderdate) AS mo,
               CAST(year(o_orderdate) AS INT) AS yr,
               o_orderdate + INTERVAL 30 DAY AS due
        FROM orders
        """,
        "dates",
    )


def test_missing_trio(tables, ddb):
    q = (
        tables["customer"]
        .mutate(
            nb="replace_missing(c_acctbal, 0.0)",
            z="missing_if(c_mktsegment, 'BUILDING')",
            isn="ismissing(c_acctbal)",
        )
        .select("c_custkey", "nb", "z", "isn")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT c_custkey, coalesce(c_acctbal, 0.0) AS nb,
               nullif(c_mktsegment, 'BUILDING') AS z,
               (c_acctbal IS NULL) AS isn
        FROM customer
        """,
        "missing trio",
    )


def test_select_table_qualified(tables):
    """`table.col` qualifiers resolve to the bare column (the reference's
    post-join ergonomics, test/comp_tests.jl:203)."""
    out = tables["customer"].select("customer.c_name", "c_custkey")
    assert out.columns == ["c_name", "c_custkey"]
    joined = tables["customer"].inner_join(
        tables["nation"], by="c_nationkey == n_nationkey"
    ).select("customer.c_name", "nation.n_name")
    assert joined.columns == ["c_name", "n_name"]


def test_relocate_selector_anchors(tables):
    """VERDICT r01 item 8: before=/after= accept tidy selectors (reference
    relocate.jl:45-115), anchored at the leftmost/rightmost match."""
    t = tables["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    got = t.relocate("starts_with('l_ship')", before="l_partkey:l_suppkey").columns
    assert got == ["l_orderkey", "l_shipdate", "l_partkey", "l_suppkey", "l_quantity"]
    got = t.relocate("l_orderkey", after="starts_with('l_s')").columns
    assert got == ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate", "l_orderkey"]
    import pytest

    with pytest.raises(ValueError, match="anchor"):
        t.relocate("l_orderkey", before="l_orderkey")


def test_group_by_computed_keys_batched(tables, ddb):
    # two computed keys where the second references the first (the batch
    # must flush so the later expression sees the new value), plus a plain
    # key resolved after a pending computed key
    q = (
        tables["orders"]
        .group_by(
            "yr = year(o_orderdate)",
            "yr2 = yr + 1",
            "o_orderpriority",
        )
        .summarize(n="n()")
        .arrange("yr", "yr2", "o_orderpriority")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT year(o_orderdate) AS yr, year(o_orderdate) + 1 AS yr2,
               o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY 1, 2, 3 ORDER BY yr, yr2, o_orderpriority
        """,
        "group_by_computed_batched",
    )
