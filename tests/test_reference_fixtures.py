"""Reference-fixture parity: reconstruct the fixtures from FIXTURES.md
(mirroring /root/reference/test/runtests.jl:19-42 and comp_tests.jl DDL)
and run the reference's own test scenarios differentially against DuckDB —
the same pipelines its comp_tests compare against TidierData."""

import os
import tempfile

import duckdb
import pandas as pd
import pytest

from tests.helpers import assert_frames_match


def _two_letter(i):
    return chr(ord("A") + i // 26) + chr(ord("A") + i % 26)


@pytest.fixture(scope="module")
def fx(spark):
    """FIXTURES.md tables, registered in Spark (TidyFrames) and DuckDB."""
    import numpy as np

    from tidierdb_jl_spark import TidyFrame

    rng = np.random.RandomState(42)
    test_df = pd.DataFrame(
        {
            "id": [_two_letter(i) for i in range(100)],
            "groups": ["aa" if (i + 1) % 2 == 0 else "bb" for i in range(100)],
            "value": [(i % 20) + 1 for i in range(100)],
            "percent": [(i + 1) / 200 for i in range(100)],
        }
    )
    df2 = pd.DataFrame(
        {
            "id2": [_two_letter(i) for i in range(80)],
            "category": (["X"] * 27 + ["Y"] * 27 + ["Z"] * 27)[:80],
            "score": (50 + rng.randint(1, 51, size=80)).astype("int64"),
        }
    )
    df4 = df2.rename(columns={"id2": "id"})
    unite_df = pd.DataFrame(
        {
            "b": ["1", "2", "3"],
            "c": ["1", "2", "3"],
            "d": [None, None, "3"],
            "cc": [1, 2, 3],
        }
    )
    separate_df = pd.DataFrame({"a": ["1-1", "2-2", "3-3-3"]})
    df_long = pd.DataFrame(
        {"id": [1, 1, 2, 2], "variable": ["A", "B", "A", "B"], "value": [1, 2, 3, 4]}
    )

    d = tempfile.mkdtemp(prefix="reffx_")
    con = duckdb.connect()
    out = {}
    for name, pdf in [
        ("test_df", test_df), ("df2", df2), ("df4", df4),
        ("unite_df", unite_df), ("separate_df", separate_df), ("df_long", df_long),
    ]:
        p = os.path.join(d, f"{name}.parquet")
        pdf.to_parquet(p)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
        out[name] = TidyFrame(spark.read.parquet(p))
    out["_con"] = con

    # nested tables built in-engine (struct/array types)
    out["nt1"] = TidyFrame(
        spark.sql(
            """SELECT * FROM VALUES
               (1, named_struct('lat', 10.1D, 'lon', 30.3D)),
               (2, named_struct('lat', 10.2D, 'lon', 30.2D)),
               (3, named_struct('lat', 10.3D, 'lon', CAST(NULL AS DOUBLE)))
               AS t(id, pos)"""
        )
    )
    out["nt2"] = TidyFrame(
        spark.sql(
            """SELECT * FROM VALUES
               (1, named_struct('a', array(1, 2), 'b', array(3, 4))),
               (2, named_struct('a', array(5, 6), 'b', array(7, 8))),
               (3, named_struct('a', array(10, 11), 'b', array(12, 13)))
               AS t(id, data)"""
        )
    )
    return out


def _check(tf, con, sql, ctx=""):
    assert_frames_match(tf.collect(), con.execute(sql).fetch_df(), ctx)


def test_tidy_selection_variants(fx):
    con = fx["_con"]
    t = fx["test_df"]
    _check(t.select("id:value"), con, "SELECT id, groups, value FROM test_df")
    _check(t.select("starts_with('per')"), con, "SELECT percent FROM test_df")
    _check(t.select("!groups"), con, "SELECT id, value, percent FROM test_df")


def test_group_summarize_across(fx):
    con = fx["_con"]
    q = fx["test_df"].group_by("groups").summarize(
        "across((value, percent), (mean, minimum, maximum))"
    )
    _check(
        q,
        con,
        """SELECT groups, avg(value) AS value_mean, avg(percent) AS percent_mean,
                  CAST(min(value) AS BIGINT) AS value_minimum, min(percent) AS percent_minimum,
                  CAST(max(value) AS BIGINT) AS value_maximum, max(percent) AS percent_maximum
           FROM test_df GROUP BY groups""",
        "across",
    )


def test_filter_regex_and_in(fx):
    con = fx["_con"]
    t = fx["test_df"]
    _check(
        t.filter("str_detect(id, regex('^A'))").select("id", "value"),
        con,
        "SELECT id, value FROM test_df WHERE regexp_matches(id, '^A')",
    )
    _check(
        t.filter("groups in ('aa')").select("id"),
        con,
        "SELECT id FROM test_df WHERE groups IN ('aa')",
    )


def test_window_mutate_by(fx):
    con = fx["_con"]
    q = fx["test_df"].mutate(gmax="maximum(value)", _by="groups").select(
        "id", "groups", "gmax"
    )
    _check(
        q,
        con,
        """SELECT id, groups, CAST(max(value) OVER (PARTITION BY groups) AS BIGINT) AS gmax
           FROM test_df""",
    )


def test_same_key_join_coalesce_semantics(fx):
    con = fx["_con"]
    q = fx["test_df"].left_join(fx["df4"], by="id").select(
        "id", "groups", "category", "score"
    )
    _check(
        q,
        con,
        """SELECT t.id, t.groups, j.category, j.score
           FROM test_df t LEFT JOIN df4 j USING (id)""",
        "shared-key join keeps one id column",
    )


def test_unnest_wider_null_field(fx, spark):
    out = fx["nt1"].unnest_wider("pos").collect()
    assert list(out.columns) == ["id", "lat", "lon"]
    assert out.loc[out["id"] == 3, "lon"].isna().all()
    assert abs(out.loc[out["id"] == 1, "lat"].iloc[0] - 10.1) < 1e-9


def test_unnest_struct_of_arrays_positional(fx):
    wide = fx["nt2"].unnest_wider("data")
    out = wide.unnest_longer("a", "b").collect()
    # parallel arrays explode positionally: 2 rows per id, zipped
    assert len(out) == 6
    row = out[(out["id"] == 1)].sort_values("a")
    assert list(row["a"]) == [1, 2] and list(row["b"]) == [3, 4]


def test_unite_skips_nulls(fx):
    con = fx["_con"]
    q = fx["unite_df"].unite("new_col", ["b", "c", "d"], sep="-")
    _check(
        q,
        con,
        """SELECT concat_ws('-', b, c, d) AS new_col, cc FROM unite_df""",
        "concat_ws NULL-skip parity",
    )


def test_separate_remainder(fx):
    out = fx["separate_df"].separate("a", ["c1", "c2"], sep="-").collect()
    assert list(out["c1"]) == ["1", "2", "3"]
    # last column keeps the remainder, reference semantics
    assert list(out["c2"]) == ["1", "2", "3-3"]


def test_pivot_roundtrip(fx):
    con = fx["_con"]
    wide = fx["df_long"].pivot_wider(names_from="variable", values_from="value")
    _check(
        wide,
        con,
        """SELECT id, CAST(any_value(value) FILTER (WHERE variable = 'A') AS BIGINT) AS A,
                  CAST(any_value(value) FILTER (WHERE variable = 'B') AS BIGINT) AS B
           FROM df_long GROUP BY id""",
        "pivot_wider",
    )
    back = wide.pivot_longer(["A", "B"], names_to="variable", values_to="value")
    assert len(back.collect()) == 4


def test_asof_join_stocks_example(spark, fx):
    """The reference's DuckDB ASOF demo (comp_tests.jl:202-203)."""
    from tidierdb_jl_spark import TidyFrame

    prices = TidyFrame(
        spark.createDataFrame(
            [
                ("APPL", "2001-01-01 00:00:00", 1.0),
                ("APPL", "2001-01-01 00:01:00", 2.0),
                ("APPL", "2001-01-01 00:02:00", 3.0),
                ("MSFT", "2001-01-01 00:00:00", 1.0),
                ("MSFT", "2001-01-01 00:01:00", 2.0),
            ],
            "ticker string, whent string, price double",
        ).selectExpr("ticker", "CAST(whent AS TIMESTAMP) AS whent", "price")
    )
    holdings = TidyFrame(
        spark.createDataFrame(
            [
                ("APPL", "2001-01-01 00:00:30", 5.0),
                ("APPL", "2001-01-01 00:01:30", 10.0),
                ("MSFT", "2001-01-01 00:00:30", 2.0),
            ],
            "ticker string, whent string, shares double",
        ).selectExpr("ticker", "CAST(whent AS TIMESTAMP) AS whent", "shares")
    )
    out = (
        holdings.asof_join(prices, by=["ticker", "closest(whent >= whent)"], how="inner")
        .mutate(val="price * shares")
        .collect()
        .sort_values(["ticker", "whent"])
    )
    # holdings at :30 take the :00 price, at 1:30 the 1:00 price
    assert list(out["val"]) == [5.0, 20.0, 2.0]
