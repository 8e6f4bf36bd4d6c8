"""histogram: differential vs DuckDB with the same bucket arithmetic,
count conservation, empty-bucket grid, clamped explicit bounds, and
degenerate inputs."""

import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.operators.histogram import histogram

from helpers import assert_matches_duckdb

_DUCK = """
    WITH b AS (SELECT min(CAST(value AS DOUBLE)) AS lo,
                      max(CAST(value AS DOUBLE)) AS hi FROM events),
    assigned AS (
      SELECT CASE WHEN v >= hi THEN {bins} - 1
                  WHEN v <= lo THEN 0
                  ELSE CAST(floor((v - lo) / (hi - lo) * {bins}) AS INT) END AS bucket
      FROM (SELECT CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL)
           CROSS JOIN b),
    counts AS (SELECT bucket, count(*) AS n FROM assigned GROUP BY bucket),
    grid AS (SELECT CAST(g AS INT) AS bucket,
                    lo + g * ((hi - lo) / {bins}) AS lo_edge,
                    lo + (g + 1) * ((hi - lo) / {bins}) AS hi_edge
             FROM generate_series(0, {bins} - 1) AS t(g) CROSS JOIN b)
    SELECT grid.bucket, lo_edge, hi_edge, COALESCE(counts.n, 0) AS n
    FROM grid LEFT JOIN counts USING (bucket)
"""


def test_histogram_vs_duckdb(tables, ddb):
    h = histogram(tables["events"], "value", bins=16)
    assert_matches_duckdb(h, ddb, _DUCK.format(bins=16), "histogram")


def test_count_conservation_and_grid(tables):
    h = histogram(tables["events"], "value", bins=7).collect()
    assert len(h) == 7 and list(h["bucket"]) == list(range(7))
    total = tables["events"].df.filter("value IS NOT NULL").count()
    assert h["n"].sum() == total


def test_explicit_bounds_clamp(tables):
    h = histogram(tables["events"], "value", bins=4, lo=0.0, hi=1.0).collect()
    total = tables["events"].df.filter("value IS NOT NULL").count()
    assert h["n"].sum() == total  # out-of-range values clamped, not dropped
    assert h["lo_edge"].iloc[0] == 0.0 and h["hi_edge"].iloc[-1] == 1.0


def test_degenerate_inputs(spark):
    one = TidyFrame(spark.sql("SELECT 5.0 AS v"))
    h = histogram(one, "v", bins=3).collect()
    assert h["n"].sum() == 1 and len(h) == 3
    empty = TidyFrame(spark.sql("SELECT CAST(NULL AS DOUBLE) AS v WHERE false"))
    h2 = histogram(empty, "v", bins=3).collect()
    assert h2["n"].sum() == 0 and len(h2) == 3
    with pytest.raises(ValueError):
        histogram(one, "v", bins=0)
