"""Differential tests for set ops (SURVEY §2.7) and reshape (§2.8)."""

from helpers import assert_matches_duckdb


def test_union_setops(tables, ddb):
    a = tables["orders"].filter("o_totalprice > 300000").select("o_custkey")
    b = tables["orders"].filter("o_orderstatus == 'F'").select("o_custkey")
    assert_matches_duckdb(
        a.union(b),
        ddb,
        """
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        """,
        "union",
    )
    assert_matches_duckdb(
        a.union_all(b),
        ddb,
        """
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        """,
        "union_all",
    )
    assert_matches_duckdb(
        a.intersect(b),
        ddb,
        """
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        """,
        "intersect",
    )
    assert_matches_duckdb(
        a.setdiff(b),
        ddb,
        """
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        """,
        "setdiff",
    )


def test_pivot_wider(tables, ddb):
    q = (
        tables["lineitem"]
        .summarize(qty="sum(l_quantity)", _by=["l_returnflag", "l_linestatus"])
        .pivot_wider(names_from="l_linestatus", values_from="qty")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_returnflag,
               any_value(qty) FILTER (WHERE l_linestatus = 'F') AS "F",
               any_value(qty) FILTER (WHERE l_linestatus = 'O') AS "O"
        FROM (SELECT l_returnflag, l_linestatus, sum(l_quantity) AS qty
              FROM lineitem GROUP BY 1, 2)
        GROUP BY l_returnflag
        """,
        "pivot_wider",
    )


def test_pivot_wider_explicit_values_no_eager_job(spark, tables):
    """VERDICT r03: pivot_wider(values=...) must not run the plan-build-time
    distinct job Spark schedules when the pivot domain is unknown — at
    scale that's a full extra pass over the fact table."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    q = (
        tables["lineitem"]
        .summarize(qty="sum(l_quantity)", _by=["l_returnflag", "l_linestatus"])
        .pivot_wider(names_from="l_linestatus", values_from="qty", values=["F", "O"])
    )
    assert set(tracker.getJobIdsForGroup()) == before  # build ran no job
    assert q.collect().shape[0] == 3

    # and the implicit-domain spelling DOES pay a job at build time
    (
        tables["lineitem"]
        .summarize(qty="sum(l_quantity)", _by=["l_returnflag", "l_linestatus"])
        .pivot_wider(names_from="l_linestatus", values_from="qty")
    )
    assert set(tracker.getJobIdsForGroup()) != before


def test_pivot_wider_multi_values(tables, ddb):
    """values_from as a list: output columns are {pivot_value}_{value_col}
    (/root/reference/src/pivots.jl:20-24 naming)."""
    q = (
        tables["lineitem"]
        .summarize(qty="sum(l_quantity)", rev="sum(l_extendedprice)",
                   _by=["l_returnflag", "l_linestatus"])
        .pivot_wider(names_from="l_linestatus", values_from=["qty", "rev"])
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_returnflag,
               any_value(qty) FILTER (WHERE l_linestatus = 'F') AS "F_qty",
               any_value(rev) FILTER (WHERE l_linestatus = 'F') AS "F_rev",
               any_value(qty) FILTER (WHERE l_linestatus = 'O') AS "O_qty",
               any_value(rev) FILTER (WHERE l_linestatus = 'O') AS "O_rev"
        FROM (SELECT l_returnflag, l_linestatus, sum(l_quantity) AS qty,
                     sum(l_extendedprice) AS rev
              FROM lineitem GROUP BY 1, 2)
        GROUP BY l_returnflag
        """,
        "pivot_wider_multi",
    )


def test_pivot_longer(tables, ddb):
    q = (
        tables["lineitem"]
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .pivot_longer(["l_quantity", "l_extendedprice"])
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        """,
        "pivot_longer",
    )


def test_unnest_wider_longer(spark, ddb):
    from tidierdb_jl_spark import TidyFrame

    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1, named_struct('lat', 1.0, 'lon', 2.0), array(1, 2, 3)),
          (2, named_struct('lat', 3.0, 'lon', 4.0), array(4, 5, 6))
        AS t(id, pos, xs)
        """
    )
    tf = TidyFrame(df)
    wide = tf.unnest_wider("pos")
    assert wide.columns == ["id", "lat", "lon", "xs"]
    assert wide.collect().shape == (2, 4)
    longer = tf.unnest_longer("xs").select("id", "xs")
    pdf = longer.collect().sort_values(["id", "xs"]).reset_index(drop=True)
    assert list(pdf["xs"]) == [1, 2, 3, 4, 5, 6]


def test_unnest_longer_parallel(spark):
    from tidierdb_jl_spark import TidyFrame

    df = spark.sql(
        "SELECT * FROM VALUES (1, array(1,2), array('a','b')) AS t(id, xs, ys)"
    )
    out = TidyFrame(df).unnest_longer("xs", "ys").collect()
    assert list(out["xs"]) == [1, 2]
    assert list(out["ys"]) == ["a", "b"]


def test_separate_unite(tables, ddb):
    q = (
        tables["part"]
        .select("p_partkey", "p_type")
        .separate("p_type", ["t1", "t2", "t3"], sep=" ")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT p_partkey,
               list_extract(parts, 1) AS t1,
               list_extract(parts, 2) AS t2,
               CASE WHEN len(parts) >= 3
                    THEN array_to_string(parts[3:], ' ') END AS t3
        FROM (SELECT p_partkey, string_split(p_type, ' ') AS parts FROM part)
        """,
        "separate",
    )
    q2 = (
        tables["part"]
        .select("p_partkey", "p_brand", "p_type")
        .unite("brand_type", ["p_brand", "p_type"], sep="|")
    )
    assert_matches_duckdb(
        q2,
        ddb,
        "SELECT p_partkey, concat_ws('|', p_brand, p_type) AS brand_type FROM part",
        "unite",
    )


def test_transmute(tables, ddb):
    q = tables["orders"].group_by("o_orderstatus").transmute(k="o_totalprice * 2")
    assert q.columns == ["o_orderstatus", "k"]
    assert_matches_duckdb(
        q,
        ddb,
        "SELECT o_orderstatus, o_totalprice * 2 AS k FROM orders",
        "transmute",
    )
