"""Dialect-parity edge cases SURVEY §7 flags as genuinely hard: NULL
ordering in sorts, try_cast failures, regex behavior, division semantics.
Constructed data (the driver tables contain no NULLs)."""

import os
import tempfile

import duckdb
import pandas as pd
import pytest

from tests.helpers import assert_frames_match


@pytest.fixture(scope="module")
def edge(spark):
    pdf = pd.DataFrame(
        {
            "i": [1, 2, 3, 4, 5, 6],
            "v": [10.0, None, 5.0, None, 20.0, 1.5],
            "s": ["12", "12abc", None, "-3", "4.5", ""],
            "g": ["a", "a", "b", "b", None, "a"],
        }
    )
    d = tempfile.mkdtemp(prefix="edge_")
    p = os.path.join(d, "edge.parquet")
    pdf.to_parquet(p)
    from tidierdb_jl_spark import TidyFrame

    tf = TidyFrame(spark.read.parquet(p))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW edge AS SELECT * FROM read_parquet('{p}')")
    return tf, con


def _check(tf, con, sql):
    ours = tf.collect()
    oracle = con.execute(sql).fetch_df()
    assert_frames_match(ours, oracle, sql)


def test_null_ordering_asc_and_desc(edge):
    tf, con = edge
    # our arrange pins NULLS LAST both directions (DuckDB's default),
    # overriding Spark's NULLS FIRST-for-asc default
    _check(
        tf.arrange("v").select("i", "v"),
        con,
        "SELECT i, v FROM edge ORDER BY v ASC NULLS LAST",
    )
    _check(
        tf.arrange("desc(v)").select("i", "v"),
        con,
        "SELECT i, v FROM edge ORDER BY v DESC NULLS LAST",
    )


def test_try_cast_failures_yield_null(edge):
    tf, con = edge
    # Known dialect divergence (documented in functions/registry.py):
    # DuckDB TRY_CAST('4.5' AS BIGINT) rounds to 5; Spark yields NULL.
    # Exclude decimal-string → integer; everything else must agree.
    _check(
        tf.filter("s IS NULL OR s NOT LIKE '%.%'")
        .mutate(n="as_integer(s)", f="as_float(s)")
        .select("i", "n", "f"),
        con,
        """SELECT i, TRY_CAST(s AS BIGINT) AS n, TRY_CAST(s AS DOUBLE) AS f
           FROM edge WHERE s IS NULL OR s NOT LIKE '%.%'""",
    )


def test_division_is_double(edge):
    tf, con = edge
    _check(
        tf.mutate(q="i / 2", r="i % 4").select("i", "q", "r"),
        con,
        "SELECT i, i / 2 AS q, i % 4 AS r FROM edge",
    )


def test_str_detect_literal_vs_regex(edge):
    """Reference parity (/root/reference/src/parsing_duckdb.jl:159-166 and
    test/comp_tests.jl filter testset): a plain-string pattern is a literal
    (LIKE '%s%'), so 'a.b' must NOT match 'axb'; regex needs regex(...)."""
    tf, con = edge
    _check(
        tf.mutate(
            lit="str_detect(s, 'a.b')",        # literal dot
            rex="str_detect(s, regex('a.b'))",  # regex dot
        ).select("i", "lit", "rex"),
        con,
        """SELECT i, s LIKE '%a.b%' AS lit,
                  regexp_matches(s, 'a.b') AS rex
           FROM edge""",
    )


def test_str_detect_quote_and_wildcard_literals(spark):
    """ADVICE r03: a quoted literal containing ' must emit well-formed SQL
    (doubled quote in the LIKE pattern), and %/_ keep their LIKE meaning
    (reference parity: the pattern interpolates straight into LIKE)."""
    import duckdb

    from tidierdb_jl_spark import TidyFrame

    pdf = pd.DataFrame(
        {"i": [1, 2, 3, 4, 5], "s": ["it's here", "its here", "100% sure", "a_b", "zero 0 zero"]}
    )
    d = tempfile.mkdtemp(prefix="quote_")
    p = os.path.join(d, "q.parquet")
    pdf.to_parquet(p)
    tf = TidyFrame(spark.read.parquet(p))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW q AS SELECT * FROM read_parquet('{p}')")
    _check(
        tf.mutate(
            apos='str_detect(s, "it\'s")',
            apos_sq="str_detect(s, 'it''s')",
            pct="str_detect(s, '0%')",
            und="str_detect(s, 'a_b')",
        ).select("i", "apos", "apos_sq", "pct", "und"),
        con,
        """SELECT i, s LIKE '%it''s%' AS apos, s LIKE '%it''s%' AS apos_sq,
                  s LIKE '%0%%' AS pct, s LIKE '%a_b%' AS und
           FROM q""",
    )


def test_regex_detect_and_replace(edge):
    tf, con = edge
    _check(
        tf.mutate(
            has_digit="str_detect(s, regex('[0-9]+'))",
            cleaned="str_remove_all(s, '[a-z]')",
        ).select("i", "has_digit", "cleaned"),
        con,
        """SELECT i, regexp_matches(s, '[0-9]+') AS has_digit,
                  regexp_replace(s, '[a-z]', '', 'g') AS cleaned
           FROM edge""",
    )


def test_grouped_agg_with_nulls(edge):
    tf, con = edge
    # NULL group keys form their own group; aggregates skip NULL inputs
    _check(
        tf.group_by("g").summarize(n="n()", m="mean(v)", nv="count(v)"),
        con,
        """SELECT g, CAST(count(*) AS BIGINT) AS n, avg(v) AS m,
                  CAST(count(v) AS BIGINT) AS nv
           FROM edge GROUP BY g""",
    )


def test_drop_missing_subset_and_all(edge):
    tf, con = edge
    _check(
        tf.drop_missing("v").select("i"),
        con,
        "SELECT i FROM edge WHERE v IS NOT NULL",
    )
    _check(
        tf.drop_missing().select("i"),
        con,
        "SELECT i FROM edge WHERE v IS NOT NULL AND s IS NOT NULL AND g IS NOT NULL",
    )


def test_full_join_key_coalesce_with_nulls(spark, edge):
    tf, con = edge
    from tidierdb_jl_spark import TidyFrame

    other = TidyFrame(
        spark.createDataFrame(
            pd.DataFrame({"g": ["a", None, "c"], "w": [1.0, 2.0, 3.0]})
        )
    )
    out = (
        tf.select("i", "g")
        .full_join(other, by="g")
        .collect()
    )
    # SQL NULL != NULL: the NULL-keyed rows must NOT match each other
    null_left = out[out["i"].notna() & out["g"].isna()]
    assert (null_left["w"].isna()).all()


def test_group_by_all_keyword(tables, ddb):
    """`group_by(all)` groups by every column (reference NEWS v0.8.9)."""
    from tests.helpers import assert_matches_duckdb

    q = (
        tables["lineitem"].select("l_returnflag", "l_linestatus")
        .group_by("all").count().arrange("l_returnflag", "l_linestatus")
    )
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY ALL ORDER BY 1, 2
        """,
    )


def test_arrange_numeric_positions(tables, ddb):
    """Numeric specs are 1-based column positions, not constant sorts."""
    from tests.helpers import assert_matches_duckdb

    q = (
        tables["nation"].select("n_name", "n_nationkey")
        .arrange("desc(2)").head(3)
    )
    assert_matches_duckdb(
        q,
        ddb,
        "SELECT n_name, n_nationkey FROM nation ORDER BY 2 DESC LIMIT 3",
    )


def test_tilde_agg_escape(tables):
    """`~fn(x)` forces window-aggregate treatment for any function in
    mutate (reference parsing_duckdb.jl:68-91); in summarize it renders
    plain."""
    r = (
        tables["lineitem"]
        .mutate(m="~kurtosis(l_quantity)", _by="l_returnflag")
        .select("l_returnflag", "m").distinct().collect()
    )
    assert len(r) == 3 and r["m"].notna().all()
    direct = (
        tables["lineitem"].group_by("l_returnflag")
        .summarize(m="~kurtosis(l_quantity)").collect()
    )
    merged = r.merge(direct, on="l_returnflag", suffixes=("_w", "_s"))
    assert (abs(merged["m_w"] - merged["m_s"]) < 1e-9).all()


def test_case_when_arrow_form(tables, ddb):
    """TidierData-style `cond => value` pairs (reference NEWS v0.8.7) are
    equivalent to comma pairs, and `=>` inside string literals is inert."""
    from tests.helpers import assert_matches_duckdb

    q = tables["orders"].mutate(
        b="case_when(o_totalprice > 200000 => 'high', "
          "o_totalprice > 50000 => 'mid', 'low')"
    ).select("o_orderkey", "b")
    assert_matches_duckdb(
        q,
        ddb,
        """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'low' END AS b
        FROM orders
        """,
    )
