"""Differential tests for windows (SURVEY §2.5) and slices (§2.6)."""

from helpers import assert_matches_duckdb


def test_window_order_rank_lead_lag(tables, ddb):
    q = (
        tables["lineitem"]
        .group_by("l_orderkey")
        .window_order("l_linenumber")
        .mutate(
            rn="row_number()",
            prev_qty="lag(l_quantity, 1)",
            next_qty="lead(l_quantity, 1)",
        )
        .select("l_orderkey", "l_linenumber", "rn", "prev_qty", "next_qty")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_orderkey, l_linenumber,
               CAST(row_number() OVER w AS INT) AS rn,
               lag(l_quantity, 1) OVER w AS prev_qty,
               lead(l_quantity, 1) OVER w AS next_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber ASC NULLS LAST)
        """,
        "rank/lead/lag",
    )


def test_cumsum(tables, ddb):
    q = (
        tables["lineitem"]
        .group_by("l_orderkey")
        .window_order("l_linenumber")
        .mutate(run_qty="cumsum(l_quantity)")
        .select("l_orderkey", "l_linenumber", "run_qty")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_orderkey, l_linenumber,
               sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
        FROM lineitem
        """,
        "cumsum",
    )


def test_window_frame_moving_avg(tables, ddb):
    q = (
        tables["lineitem"]
        .group_by("l_suppkey")
        .window_order("l_shipdate", "l_orderkey", "l_linenumber")
        .window_frame(-2, 0)
        .mutate(ma3="mean(l_extendedprice)")
        .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "ma3")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               avg(l_extendedprice) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3
        FROM lineitem
        """,
        "moving avg",
    )


def test_inline_by_order_frame_kwargs(tables, ddb):
    # equivalence of inline kwargs with the macro form
    # (/root/reference/test/comp_tests.jl:312-323)
    q = tables["lineitem"].mutate(
        ma3="mean(l_extendedprice)",
        _by="l_suppkey",
        _order=["l_shipdate", "l_orderkey", "l_linenumber"],
        _frame=(-2, 0),
    ).select("l_suppkey", "ma3")
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_suppkey,
               avg(l_extendedprice) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3
        FROM lineitem
        """,
        "inline kwargs",
    )


def test_ntile_cume_dist(tables, ddb):
    q = (
        tables["customer"]
        .window_order("c_acctbal", "c_custkey")
        .mutate(quartile="ntile(4)", cd="cume_dist()")
        .select("c_custkey", "quartile", "cd")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT c_custkey, CAST(ntile(4) OVER w AS INT) AS quartile,
               cume_dist() OVER w AS cd
        FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        """,
        "ntile",
    )


def test_slice_max_ties(tables, ddb):
    q = (
        tables["lineitem"]
        .group_by("l_returnflag")
        .slice_max("l_quantity", n=2)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity FROM (
          SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
                 rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC NULLS LAST) AS r
          FROM lineitem
        ) WHERE r <= 2
        """,
        "slice_max ties",
    )


def test_slice_min(tables, ddb):
    q = (
        tables["orders"]
        .slice_min("o_totalprice", n=3)
        .select("o_orderkey", "o_totalprice")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o_orderkey, o_totalprice FROM (
          SELECT o_orderkey, o_totalprice,
                 rank() OVER (ORDER BY o_totalprice ASC NULLS LAST) AS r
          FROM orders
        ) WHERE r <= 3
        """,
        "slice_min",
    )


def test_slice_sample_shape(tables):
    q = tables["orders"].group_by("o_orderstatus").slice_sample(n=5, seed=42)
    pdf = q.collect()
    counts = pdf.groupby("o_orderstatus").size()
    assert (counts <= 5).all() and len(counts) >= 1
