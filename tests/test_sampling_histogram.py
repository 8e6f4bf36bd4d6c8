"""equi_depth_histogram and importance_sample."""

import pytest

from tests.helpers import assert_matches_duckdb
from tidierdb_jl_spark.operators.histogram import equi_depth_histogram


def test_equi_depth_buckets_are_balanced(tables):
    out = equi_depth_histogram(tables["events"], "value", bins=8).collect()
    assert len(out) == 8
    total = tables["events"].df.selectExpr("count(value)").collect()[0][0]
    assert out["n"].sum() == total
    # equi-depth: no bucket wildly over/under target (continuous-ish value)
    target = total / 8
    assert out["n"].max() < 1.6 * target
    assert out["n"].min() > 0.4 * target
    # edges monotonic
    assert (out.sort_values("bucket")["lo_edge"].values[1:]
            == out.sort_values("bucket")["hi_edge"].values[:-1]).all()


def test_equi_depth_matches_duckdb(tables, ddb):
    bins = 5
    out = equi_depth_histogram(tables["events"], "value", bins=bins).mutate(
        lo_edge="round(lo_edge, 9)", hi_edge="round(hi_edge, 9)"
    )
    fr = ", ".join(str(i / bins) for i in range(1, bins))
    assert_matches_duckdb(
        out,
        ddb,
        f"""
        WITH c AS (SELECT min(CAST(value AS DOUBLE)) AS lo,
                          max(CAST(value AS DOUBLE)) AS hi,
                          quantile_cont(CAST(value AS DOUBLE), [{fr}]) AS cuts
                   FROM events),
        c2 AS (SELECT lo, hi, list_transform(cuts, e -> round(e, 9)) AS cuts FROM c),
        assigned AS (
          SELECT len(list_filter(c2.cuts, e -> CAST(value AS DOUBLE) > e)) AS bucket
          FROM events, c2 WHERE value IS NOT NULL),
        grid AS (
          SELECT i AS bucket,
                 round(CASE WHEN i = 0 THEN c2.lo ELSE c2.cuts[i] END, 9) AS lo_edge,
                 round(CASE WHEN i = {bins - 1} THEN c2.hi ELSE c2.cuts[i + 1] END, 9) AS hi_edge
          FROM range({bins}) t(i), c2)
        SELECT g.bucket, g.lo_edge, g.hi_edge,
               CAST(coalesce(a.n, 0) AS BIGINT) AS n
        FROM grid g LEFT JOIN (SELECT bucket, count(*) AS n
                               FROM assigned GROUP BY bucket) a USING (bucket)
        """,
    )


def test_equi_depth_edge_cases(tables):
    one = equi_depth_histogram(tables["events"], "value", bins=1).collect()
    assert len(one) == 1
    total = tables["events"].df.selectExpr("count(value)").collect()[0][0]
    assert one["n"].iloc[0] == total
    with pytest.raises(ValueError):
        equi_depth_histogram(tables["events"], "value", bins=0)


def test_importance_sample_behavior(tables):
    from tidierdb_jl_spark.llm.mixing import importance_sample

    docs = tables["documents"]
    out = importance_sample(docs, "n_chars", 0.5, "doc_id").collect()
    assert len(out) == docs.df.count()
    frac = out["sampled"].mean()
    assert 0.35 < frac < 0.65  # ~target_frac on a mild weight spread
    # high-weight docs kept more often than low-weight
    kept = out.groupby("sampled")["n_chars"].mean()
    assert kept[True] > kept[False]
    # deterministic; independent draw under a new salt
    again = importance_sample(docs, "n_chars", 0.5, "doc_id").collect()
    assert dict(zip(again["doc_id"], again["sampled"])) == dict(
        zip(out["doc_id"], out["sampled"])
    )
    other = importance_sample(docs, "n_chars", 0.5, "doc_id", salt="v2").collect()
    assert dict(zip(other["doc_id"], other["sampled"])) != dict(
        zip(out["doc_id"], out["sampled"])
    )
    with pytest.raises(ValueError):
        importance_sample(docs, "n_chars", 0.0, "doc_id")


def test_importance_sample_matches_duckdb(tables, ddb):
    from tidierdb_jl_spark.llm.mixing import importance_sample

    out = importance_sample(tables["documents"], "n_chars", 0.4, "doc_id").select(
        "doc_id", "sampled"
    )
    assert_matches_duckdb(
        out,
        ddb,
        """
        WITH m AS (SELECT CAST(sum(CAST(greatest(0.0, coalesce(CAST(n_chars AS DOUBLE), 0.0))
                                        AS DECIMAL(28,10))) AS DOUBLE) / count(*)
                          AS mw FROM documents)
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
               lpad(lower(to_hex(CAST(floor(
                 least(1.0, 0.4 * greatest(0.0, coalesce(CAST(n_chars AS DOUBLE), 0.0))
                       / m.mw) * 4294967295.0) AS BIGINT))), 8, '0') AS sampled
        FROM documents, m
        """,
    )


def test_approx_quantile_modes(tables):
    """approx=True swaps the exact value-buffering percentile for the
    bounded-memory sketch; results stay close and all plumbing holds."""
    from tidierdb_jl_spark.llm.mixing import curriculum_order
    from tidierdb_jl_spark.llm.pipeline import filter_by_quantile

    docs = tables["documents"]
    exact = filter_by_quantile(docs, "n_chars", 0.5, keep="above")
    approx = filter_by_quantile(docs, "n_chars", 0.5, keep="above", approx=True)
    ne, na = exact.df.count(), approx.df.count()
    assert abs(ne - na) <= 0.05 * docs.df.count()

    hist = equi_depth_histogram(tables["events"], "value", bins=8, approx=True).collect()
    assert len(hist) == 8 and hist["n"].sum() > 0

    cur = curriculum_order(docs, "n_chars", "doc_id", n_stages=4, approx=True).collect()
    sizes = cur.groupby("stage").size()
    assert sizes.min() > 0.15 * len(cur)
