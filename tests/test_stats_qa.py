"""Data-QA operators: per-group outlier scoring (z-score / MAD) and PSI
drift between corpus snapshots — differential against DuckDB plus edge
cases (degenerate groups, empty sides, validation)."""

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.operators.stats import psi_drift, with_outlier_scores

from helpers import assert_matches_duckdb


def test_zscore_grouped_vs_duckdb(tables, ddb):
    z = with_outlier_scores(
        tables["lineitem"].select("l_orderkey", "l_linenumber",
                                  "l_returnflag", "l_quantity"),
        "l_quantity", by="l_returnflag",
    ).mutate(z6="round(l_quantity_outlier, 6)").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "z6"
    )
    assert_matches_duckdb(
        z,
        ddb,
        """
        WITH s AS (
          SELECT l_returnflag, avg(l_quantity) AS mu,
                 stddev_samp(l_quantity) AS sd
          FROM lineitem GROUP BY l_returnflag)
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
               CASE WHEN s.sd > 0
                    THEN round((l.l_quantity - s.mu) / s.sd, 6) END AS z6
        FROM lineitem l JOIN s USING (l_returnflag)
        """,
        "zscore_grouped",
    )


def test_mad_global_vs_duckdb(tables, ddb):
    m = with_outlier_scores(
        tables["lineitem"].select("l_orderkey", "l_linenumber", "l_quantity"),
        "l_quantity", method="mad",
    ).mutate(m6="round(l_quantity_outlier, 6)").select(
        "l_orderkey", "l_linenumber", "l_quantity", "m6"
    )
    assert_matches_duckdb(
        m,
        ddb,
        """
        WITH med AS (SELECT quantile_cont(l_quantity, 0.5) AS md FROM lineitem),
        mad AS (SELECT quantile_cont(abs(l.l_quantity - med.md), 0.5) AS mv
                FROM lineitem l CROSS JOIN med)
        SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
               CASE WHEN mad.mv > 0
                    THEN round(0.6745 * (l.l_quantity - med.md) / mad.mv, 6)
               END AS m6
        FROM lineitem l CROSS JOIN med CROSS JOIN mad
        """,
        "mad_global",
    )


def test_outlier_degenerate_and_validation(spark):
    tf = TidyFrame(spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 9.0)],
        "id INT, g STRING, x DOUBLE",
    ))
    rows = {r["id"]: r["x_outlier"]
            for r in with_outlier_scores(tf, "x", by="g").df.collect()}
    assert rows[1] is None and rows[2] is None  # zero-variance group
    assert rows[3] is not None and rows[3] < 0 < rows[4]
    with pytest.raises(ValueError, match="method must be"):
        with_outlier_scores(tf, "x", method="nope")


_PSI_ORACLE = """
    WITH e AS (SELECT CAST(l_quantity AS DOUBLE) AS x FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_orderkey % 2 = 0),
    a AS (SELECT CAST(l_quantity + 10 AS DOUBLE) AS x FROM lineitem
          WHERE l_quantity IS NOT NULL AND l_orderkey % 2 = 1),
    b AS (SELECT min(x) AS mn,
                 CASE WHEN max(x) = min(x) THEN min(x) + 1.0 ELSE max(x) END AS mx
          FROM e),
    eb AS (SELECT least(7, greatest(0,
             CAST(floor((e.x - b.mn) / (b.mx - b.mn) * 8) AS INT))) AS bucket,
             count(*) AS n FROM e CROSS JOIN b GROUP BY 1),
    ab AS (SELECT least(7, greatest(0,
             CAST(floor((a.x - b.mn) / (b.mx - b.mn) * 8) AS INT))) AS bucket,
             count(*) AS n FROM a CROSS JOIN b GROUP BY 1),
    grid AS (SELECT CAST(unnest(range(8)) AS INT) AS bucket),
    j AS (SELECT g.bucket,
                 CAST(coalesce(eb.n, 0) AS BIGINT) AS n_expected,
                 CAST(coalesce(ab.n, 0) AS BIGINT) AS n_actual
          FROM grid g LEFT JOIN eb USING (bucket) LEFT JOIN ab USING (bucket)),
    tot AS (SELECT sum(n_expected) AS ne, sum(n_actual) AS na FROM j)
    SELECT j.bucket, j.n_expected, j.n_actual,
           round(greatest(1e-6, j.n_expected / tot.ne), 6) AS pe6,
           round(greatest(1e-6, j.n_actual / tot.na), 6) AS pa6,
           round((greatest(1e-6, j.n_actual / tot.na)
                  - greatest(1e-6, j.n_expected / tot.ne))
                 * ln(greatest(1e-6, j.n_actual / tot.na)
                      / greatest(1e-6, j.n_expected / tot.ne)), 6) AS psi6
    FROM j CROSS JOIN tot
"""


def test_psi_drift_vs_duckdb(tables, ddb):
    li = tables["lineitem"]
    expected = li.filter("l_orderkey % 2 = 0")
    actual = li.filter("l_orderkey % 2 = 1").mutate(l_quantity="l_quantity + 10")
    p = psi_drift(expected, actual, "l_quantity", bins=8).mutate(
        pe6="round(p_expected, 6)", pa6="round(p_actual, 6)",
        psi6="round(psi_contrib, 6)",
    ).select("bucket", "n_expected", "n_actual", "pe6", "pa6", "psi6")
    assert_matches_duckdb(p, ddb, _PSI_ORACLE, "psi_drift")


def test_psi_identical_corpora_near_zero(tables):
    li = tables["lineitem"]
    p = psi_drift(li, li, "l_quantity", bins=10)
    total = p.summarize(psi="sum(psi_contrib)").df.first()[0]
    assert abs(total) < 1e-12  # identical distributions -> PSI == 0
    assert p.df.count() == 10


def test_psi_empty_actual_and_validation(spark):
    e = TidyFrame(spark.createDataFrame([(float(i),) for i in range(20)], "x DOUBLE"))
    a = TidyFrame(spark.createDataFrame([], "x DOUBLE"))
    p = psi_drift(e, a, "x", bins=4)
    rows = p.df.collect()
    assert len(rows) == 4 and all(r["n_actual"] == 0 for r in rows)
    assert all(r["psi_contrib"] is not None for r in rows)  # eps floor, finite
    with pytest.raises(ValueError, match="bins must be"):
        psi_drift(e, a, "x", bins=0)


def test_resolve_duplicates_keep_best_vs_reference(tables):
    """resolve_duplicates picks the highest-score doc per transitive
    cluster (ties -> smallest id) — checked against a Python union-find
    over the same ngram-Jaccard pair list."""
    from tidierdb_jl_spark.llm.dedup import ngram_jaccard_pairs, resolve_duplicates

    docs = tables["documents"]
    pairs = ngram_jaccard_pairs(docs, "doc_id", threshold=0.5)
    res = resolve_duplicates(docs, pairs, "doc_id", score_col="n_chars")
    got = {r["doc_id"]: (r["cluster_id"], r["canonical_id"])
           for r in res.df.collect()}

    # python reference union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    plist = [(r["id_a"], r["id_b"]) for r in pairs.df.collect()]
    assert plist, "test corpus should contain near-dup pairs"
    for a, b in plist:
        union(a, b)
    chars = {r["doc_id"]: r["n_chars"] for r in docs.df.collect()}
    from collections import defaultdict
    members = defaultdict(list)
    for d in chars:
        members[find(d) if d in parent else d].append(d)
    for root, ids in members.items():
        best = max(chars[i] for i in ids)
        winner = min(i for i in ids if chars[i] == best)
        for i in ids:
            assert got[i] == (root, winner), (i, got[i], (root, winner))

    # score_col=None degenerates to min-id (dup_clusters semantics)
    res0 = resolve_duplicates(docs, pairs, "doc_id")
    got0 = {r["doc_id"]: r["canonical_id"] for r in res0.df.collect()}
    for root, ids in members.items():
        for i in ids:
            assert got0[i] == root
