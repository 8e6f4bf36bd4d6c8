"""Differential tests for joins (SURVEY §2.3): six types, multi-key,
inequality, as-of (vs DuckDB's native ASOF JOIN)."""

from helpers import assert_matches_duckdb


def test_inner_join_projection(tables, ddb):
    q = (
        tables["orders"]
        .inner_join(tables["customer"], by="o_custkey == c_custkey")
        .select("o_orderkey", "c_name", "o_totalprice")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "inner",
    )


def test_left_join_key_dropped(tables, ddb):
    q = tables["customer"].left_join(tables["nation"], by="c_nationkey == n_nationkey")
    assert "n_nationkey" not in q.columns  # right equi key dropped
    q = q.select("c_custkey", "n_name")
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT c_custkey, n_name
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        """,
        "left",
    )


def test_full_join_coalesced_key(tables, ddb):
    lhs = tables["orders"].distinct("o_custkey")
    rhs = tables["customer"].filter("c_acctbal > 9000").distinct("c_custkey")
    q = lhs.full_join(rhs, by="o_custkey == c_custkey")
    assert q.columns == ["o_custkey"]  # key coalesced into left name
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT coalesce(l.o_custkey, r.c_custkey) AS o_custkey
        FROM (SELECT DISTINCT o_custkey FROM orders) l
        FULL JOIN (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000) r
          ON l.o_custkey = r.c_custkey
        """,
        "full",
    )


def test_semi_anti(tables, ddb):
    big = tables["orders"].filter("o_totalprice > 200000")
    q = tables["customer"].semi_join(big, by="c_custkey == o_custkey").select("c_custkey")
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        """,
        "semi",
    )
    q2 = tables["customer"].anti_join(big, by="c_custkey == o_custkey").select("c_custkey")
    assert_matches_duckdb(
        q2,
        ddb,
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        """,
        "anti",
    )


def test_multi_key_join(tables, ddb):
    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_quantity")
    q = li.inner_join(li, by=["l_orderkey", "l_partkey"]).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_quantity_right"
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT a.l_orderkey, a.l_partkey, a.l_quantity,
               b.l_quantity AS l_quantity_right
        FROM (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem) a
        JOIN (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey = b.l_partkey
        """,
        "multi-key self join",
    )


def test_inequality_join(tables, ddb):
    small = tables["region"]
    q = small.inner_join(tables["nation"], by="r_regionkey >= n_regionkey").select(
        "r_regionkey", "r_name", "n_nationkey", "n_name"
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT r_regionkey, r_name, n_nationkey, n_name
        FROM region JOIN nation ON r_regionkey >= n_regionkey
        """,
        "theta",
    )


def test_natural_join(tables, ddb):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    ords = tables["orders"].select("o_orderkey", "o_totalprice").rename(
        l_orderkey="o_orderkey"
    )
    q = li.inner_join(ords)  # natural on l_orderkey
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_orderkey, l_quantity, o_totalprice
        FROM (SELECT l_orderkey, l_quantity FROM lineitem) a
        JOIN (SELECT o_orderkey AS l_orderkey, o_totalprice FROM orders) b USING (l_orderkey)
        """,
        "natural",
    )


def test_asof_join_backward(tables, ddb):
    # for each order, the latest event by the same "user" (custkey % 50)
    # at or before the order date — classic as-of backward join
    lhs = tables["orders"].mutate(uid="o_custkey % 50").select(
        "o_orderkey", "uid", "o_orderdate"
    )
    rhs = (
        tables["events"]
        .select("user_id", "ts", "value")
        .rename(ev_value="value")
    )
    q = lhs.asof_join(rhs, by=["uid == user_id", "closest(o_orderdate >= ts)"])
    assert q.columns == ["o_orderkey", "uid", "o_orderdate", "ts", "ev_value"]
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o.o_orderkey, o.uid, o.o_orderdate, e.ts, e.value AS ev_value
        FROM (SELECT o_orderkey, o_custkey % 50 AS uid, o_orderdate FROM orders) o
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events) e
          ON o.uid = e.user_id AND o.o_orderdate >= e.ts
        """,
        "asof backward",
    )


def test_asof_join_inner_strict(tables, ddb):
    lhs = tables["orders"].mutate(uid="o_custkey % 50").select("o_orderkey", "uid", "o_orderdate")
    rhs = tables["events"].select("user_id", "ts", "value").rename(ev_value="value")
    q = lhs.asof_join(rhs, by=["uid == user_id", "closest(o_orderdate > ts)"], how="inner")
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o.o_orderkey, o.uid, o.o_orderdate, e.ts, e.value AS ev_value
        FROM (SELECT o_orderkey, o_custkey % 50 AS uid, o_orderdate FROM orders) o
        ASOF JOIN (SELECT user_id, ts, value FROM events) e
          ON o.uid = e.user_id AND o.o_orderdate > e.ts
        """,
        "asof strict inner",
    )


def test_asof_join_forward(tables, ddb):
    lhs = tables["orders"].mutate(uid="o_custkey % 50").select("o_orderkey", "uid", "o_orderdate")
    rhs = tables["events"].select("user_id", "ts", "value").rename(ev_value="value")
    q = lhs.asof_join(rhs, by=["uid == user_id", "closest(o_orderdate <= ts)"])
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o.o_orderkey, o.uid, o.o_orderdate, e.ts, e.value AS ev_value
        FROM (SELECT o_orderkey, o_custkey % 50 AS uid, o_orderdate FROM orders) o
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events) e
          ON o.uid = e.user_id AND o.o_orderdate <= e.ts
        """,
        "asof forward",
    )


def test_salted_join_matches_plain_join(tables):
    from tidierdb_jl_spark.operators.skew import salted_join

    plain = (
        tables["orders"]
        .inner_join(tables["customer"], by="o_custkey == c_custkey")
        .collect()
    )
    salted = salted_join(
        tables["orders"], tables["customer"], by="o_custkey == c_custkey", salt=4
    ).collect()
    assert len(plain) == len(salted)
    assert sorted(plain.columns) == sorted(salted.columns)
    key = lambda pdf: sorted(map(tuple, pdf[sorted(pdf.columns)].astype(str).values))  # noqa: E731
    assert key(plain) == key(salted)


def test_salted_join_rejects_theta(tables):
    import pytest

    from tidierdb_jl_spark.operators.skew import salted_join

    with pytest.raises(ValueError):
        salted_join(tables["orders"], tables["customer"], by="o_custkey >= c_custkey")


def test_range_join_matches_naive_theta(spark, tables):
    from pyspark.sql import functions as F

    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.rangejoin import range_join

    # intervals over o_totalprice: price bands per priority
    bands = TidyFrame(
        spark.createDataFrame(
            [(p, float(lo), float(lo + 50000)) for p in ["1-URGENT", "2-HIGH"]
             for lo in range(0, 500000, 50000)],
            "prio string, lo double, hi double",
        )
    )
    orders = tables["orders"].select("o_orderkey", "o_orderpriority", "o_totalprice")

    fast = range_join(
        orders, bands, "o_totalprice", "lo", "hi",
        by="o_orderpriority == prio", bucket_width=50000,
    ).collect()

    naive = (
        orders.df.alias("l")
        .join(
            bands.df.alias("r"),
            (F.col("l.o_orderpriority") == F.col("r.prio"))
            & (F.col("l.o_totalprice") >= F.col("r.lo"))
            & (F.col("l.o_totalprice") <= F.col("r.hi")),
        )
        .select("l.o_orderkey", "l.o_orderpriority", "l.o_totalprice", "r.lo", "r.hi")
        .toPandas()
    )
    assert len(fast) == len(naive)
    key = lambda pdf: sorted(  # noqa: E731
        map(tuple, pdf[["o_orderkey", "lo", "hi"]].values)
    )
    assert key(fast) == key(naive)


def test_range_join_left_keeps_misses(spark, tables):
    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.rangejoin import range_join

    bands = TidyFrame(
        spark.createDataFrame([(0.0, 1000.0)], "lo double, hi double")
    )
    orders = tables["orders"].select("o_orderkey", "o_totalprice")
    out = range_join(orders, bands, "o_totalprice", "lo", "hi", how="left").collect()
    n_orders = orders.collect().shape[0]
    assert len(out) == n_orders  # nothing dropped, misses have NULL bands
    assert out["lo"].isna().sum() > 0


def test_right_join_coalesced_key_unmatched(tables, ddb):
    """ADVICE r01: right joins must COALESCE the equi key like full joins —
    otherwise unmatched right rows come back with a NULL key."""
    lhs = tables["orders"].filter("o_totalprice > 300000").distinct("o_custkey")
    q = lhs.right_join(tables["customer"], by="o_custkey == c_custkey").select(
        "o_custkey", "c_acctbal"
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT coalesce(l.o_custkey, r.c_custkey) AS o_custkey, r.c_acctbal
        FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000) l
        RIGHT JOIN customer r ON l.o_custkey = r.c_custkey
        """,
        "right-coalesce",
    )


def test_range_join_left_nulls_no_duplicates(spark):
    """ADVICE r01: a matched left row with a NULL non-key column must not
    ALSO reappear among the misses (null-unsafe all-column anti join)."""
    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.rangejoin import range_join

    left = TidyFrame(
        spark.createDataFrame(
            [(1, 10.0, None), (2, 20.0, "x"), (3, 5000.0, "y")],
            "i long, v double, tag string",
        )
    )
    bands = TidyFrame(
        spark.createDataFrame([(0.0, 1000.0)], "lo double, hi double")
    )
    out = range_join(left, bands, "v", "lo", "hi", how="left").collect()
    assert len(out) == 3
    assert sorted(out["i"].tolist()) == [1, 2, 3]
    assert out["lo"].isna().sum() == 1  # only row 3 is a miss


def test_range_join_left_stable_under_replan(spark, tables):
    """ADVICE r03: the left-join miss tag (monotonically_increasing_id)
    feeds two subtrees; ids must be pinned (localCheckpoint) so plan
    re-evaluation — retry, speculation, different partitioning — cannot
    change which rows count as misses.  Evaluate the SAME build twice and
    a fresh build under perturbed shuffle partitions: identical results."""
    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.operators.rangejoin import range_join

    bands = TidyFrame(
        spark.createDataFrame(
            [(0.0, 100000.0), (200000.0, 300000.0)], "lo double, hi double"
        )
    )
    orders = tables["orders"].select("o_orderkey", "o_totalprice")

    def key(pdf):
        return sorted(
            (int(r.o_orderkey), None if pdf["lo"].isna()[i] else float(r.lo))
            for i, r in enumerate(pdf.itertuples())
        )

    built = range_join(orders, bands, "o_totalprice", "lo", "hi", how="left")
    first = key(built.collect())
    assert key(built.collect()) == first  # same plan, re-evaluated
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = range_join(orders, bands, "o_totalprice", "lo", "hi", how="left")
        assert key(again.collect()) == first
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_salted_join_rejects_outer(tables):
    """ADVICE r01: right/full would emit unmatched right rows salt× times."""
    import pytest

    from tidierdb_jl_spark.operators.skew import salted_join

    for how in ("right", "full"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(
                tables["orders"], tables["customer"],
                by="o_custkey == c_custkey", how=how,
            )


def test_salted_semi_anti_match_plain(tables):
    from tidierdb_jl_spark.operators.skew import salted_join

    for how in ("semi", "anti"):
        plain = getattr(tables["customer"], f"{how}_join")(
            tables["orders"].filter("o_totalprice > 250000"),
            by="c_custkey == o_custkey",
        ).collect()
        salted = salted_join(
            tables["customer"],
            tables["orders"].filter("o_totalprice > 250000"),
            by="c_custkey == o_custkey", how=how, salt=4,
        ).collect()
        assert sorted(plain["c_custkey"]) == sorted(salted["c_custkey"]), how


def test_theta_only_join_warns(tables):
    """VERDICT r01 item 6: theta-only joins must warn about the BNLJ plan
    unless an explicit strategy acknowledges the small side."""
    import warnings

    import pytest

    with pytest.warns(UserWarning, match="no equality key"):
        tables["region"].inner_join(tables["nation"], by="r_regionkey >= n_regionkey")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning when hinted
        tables["region"].inner_join(
            tables["nation"], by="r_regionkey >= n_regionkey", strategy="broadcast"
        )
