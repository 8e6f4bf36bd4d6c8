"""Corpus vocabulary ops: frequency table and top-k vs DuckDB, coverage
accounting identity, BPE-ish tokenizer consistency with the per-doc
counter, and the TakeOrdered plan shape for top-k."""

import pytest

from tidierdb_jl_spark.llm.vocab import token_frequencies, top_tokens, vocab_coverage

from helpers import assert_matches_duckdb

_DUCK_TOKS = r"""
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
    FROM documents WHERE text IS NOT NULL AND trim(text) != ''
"""


def test_token_frequencies_vs_duckdb(tables, ddb):
    freq = token_frequencies(tables["documents"])
    assert_matches_duckdb(
        freq,
        ddb,
        f"""
        WITH toks AS ({_DUCK_TOKS}),
        tfreq AS (SELECT token, count(*) AS term_freq FROM toks GROUP BY token),
        dfreq AS (SELECT token, count(*) AS doc_freq
                  FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token)
        SELECT t.token, t.term_freq, d.doc_freq
        FROM tfreq t JOIN dfreq d USING (token)
        """,
        "token_frequencies",
    )


def test_top_tokens_vs_duckdb(tables, ddb):
    top = top_tokens(tables["documents"], k=50)
    assert_matches_duckdb(
        top,
        ddb,
        f"""
        WITH toks AS ({_DUCK_TOKS}),
        tfreq AS (SELECT token, count(*) AS term_freq FROM toks GROUP BY token),
        dfreq AS (SELECT token, count(*) AS doc_freq
                  FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token)
        SELECT t.token, t.term_freq, d.doc_freq
        FROM tfreq t JOIN dfreq d USING (token)
        ORDER BY term_freq DESC, token LIMIT 50
        """,
        "top_tokens",
    )


def test_min_count_filter(tables):
    all_freq = token_frequencies(tables["documents"])
    floor = token_frequencies(tables["documents"], min_count=5)
    assert floor.df.count() == all_freq.df.filter("term_freq >= 5").count()
    assert floor.df.filter("term_freq < 5").count() == 0


def test_vocab_coverage_accounting(tables):
    """Coverage of the FULL vocabulary must be exactly 1.0 with 0 OOV
    types, and in/out token counts must partition the total."""
    full = token_frequencies(tables["documents"])
    cov = vocab_coverage(tables["documents"], full).collect().iloc[0]
    assert cov["coverage"] == 1.0 and cov["oov_types"] == 0
    assert cov["in_vocab_tokens"] == cov["total_tokens"]

    top10 = top_tokens(tables["documents"], k=10)
    part = vocab_coverage(tables["documents"], top10).collect().iloc[0]
    assert 0.0 < part["coverage"] < 1.0
    assert part["total_tokens"] == cov["total_tokens"]


def test_bpeish_tokenizer_agrees_with_per_doc_counter(tables):
    """Corpus-wide BPE-ish token total == sum of the per-doc counter
    (t43's op) — the two surfaces must agree on what a token is."""
    from tidierdb_jl_spark.llm.textstats import with_bpe_token_count

    per_doc = (
        with_bpe_token_count(tables["documents"])
        .df.agg({"n_tokens_bpe": "sum"})
        .collect()[0][0]
    )
    corpus = (
        token_frequencies(tables["documents"], tokenizer="bpeish")
        .df.agg({"term_freq": "sum"})
        .collect()[0][0]
    )
    assert per_doc == corpus


def test_top_tokens_plan_uses_take_ordered(tables):
    plan = top_tokens(tables["documents"], k=10).df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bad_tokenizer_rejected(tables):
    with pytest.raises(ValueError, match="tokenizer"):
        token_frequencies(tables["documents"], tokenizer="nope")


_DUCK_TFIDF = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) != ''),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    per_doc AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
    SELECT p.doc_id, p.token, p.tf,
           round(ln((n.n_docs + 1.0) / (d.df + 1)) + 1.0, 6) AS idf,
           round(p.tf * (ln((n.n_docs + 1.0) / (d.df + 1)) + 1.0), 6) AS tfidf
    FROM per_doc p JOIN dfreq d USING (token) CROSS JOIN n
"""


def test_tfidf_vs_duckdb(tables, ddb):
    from tidierdb_jl_spark.llm.vocab import with_tfidf

    assert_matches_duckdb(
        with_tfidf(tables["documents"]), ddb, _DUCK_TFIDF, "tfidf"
    )


def test_tfidf_l2_normalized_unit_norm(tables):
    import pyspark.sql.functions as F

    from tidierdb_jl_spark.llm.vocab import with_tfidf

    l2 = with_tfidf(tables["documents"], l2_normalize=True, round_to=None).df
    worst = (
        l2.groupBy("doc_id")
        .agg(F.sum(F.col("tfidf") ** 2).alias("ss"))
        .selectExpr("max(abs(ss - 1)) AS m")
        .collect()[0].m
    )
    assert worst < 1e-9


_DUCK_COSINE = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) != ''),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    per_doc AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    w AS (SELECT p.doc_id, p.token,
                 p.tf * (ln((n.n_docs + 1.0) / (d.df + 1)) + 1.0) AS wt
          FROM per_doc p JOIN dfreq d USING (token) CROSS JOIN n),
    nrm AS (SELECT doc_id, sqrt(sum(wt*wt)) AS nn FROM w GROUP BY 1),
    l2 AS (SELECT w.doc_id, w.token, w.wt / nrm.nn AS wt
           FROM w JOIN nrm USING (doc_id)),
    c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(sum(a.wt*b.wt), 6) AS cosine
          FROM l2 a JOIN l2 b ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT * FROM c WHERE cosine >= {thr}
"""


def test_tfidf_cosine_pairs_exact_vs_duckdb(tables, ddb):
    from tidierdb_jl_spark.llm.vocab import tfidf_cosine_pairs

    pairs = tfidf_cosine_pairs(tables["documents"], threshold=0.9, max_doc_freq=None)
    assert_matches_duckdb(
        pairs, ddb, _DUCK_COSINE.format(thr=0.9), "tfidf_cosine_exact"
    )


def test_tfidf_cosine_cap_never_adds_pairs(tables):
    """Capping hot tokens only UNDERESTIMATES cosine: the capped pair set
    must be a subset of the exact one, and every surviving pair's capped
    cosine must be <= its exact cosine."""
    from tidierdb_jl_spark.llm.vocab import tfidf_cosine_pairs

    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(
            tables["documents"], threshold=0.5, max_doc_freq=None
        ).df.collect()
    }
    capped = tfidf_cosine_pairs(
        tables["documents"], threshold=0.5, max_doc_freq=50
    ).df.collect()
    for r in capped:
        assert (r.id_a, r.id_b) in exact
        assert r.cosine <= exact[(r.id_a, r.id_b)] + 1e-6


def test_token_cooccurrence_pmi_vs_duckdb(tables, ddb):
    from tidierdb_jl_spark.llm.vocab import token_cooccurrence

    co = token_cooccurrence(tables["documents"], max_vocab=20, min_pair_count=2)
    assert_matches_duckdb(
        co,
        ddb,
        f"""
        WITH rawtoks AS ({_DUCK_TOKS}),
        toks AS (SELECT DISTINCT doc_id, token FROM rawtoks),
        vocab AS (
          SELECT token FROM (
            SELECT token, count(*) AS df_ FROM toks GROUP BY token
            ORDER BY df_ DESC, token LIMIT 20)),
        ptoks AS (SELECT t.doc_id, t.token FROM toks t
                  WHERE t.token IN (SELECT token FROM vocab)),
        dfq AS (SELECT token, count(*) AS n_tok FROM ptoks GROUP BY token),
        nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        pr AS (SELECT a.token AS a, b.token AS b, count(*) AS n_ab
               FROM ptoks a JOIN ptoks b
                 ON a.doc_id = b.doc_id AND a.token < b.token
               GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT pr.a, pr.b, pr.n_ab, da.n_tok AS n_a, db.n_tok AS n_b,
               round(log2(pr.n_ab * nd.n * 1.0 / (da.n_tok * db.n_tok)), 6) AS pmi
        FROM pr JOIN dfq da ON pr.a = da.token
                JOIN dfq db ON pr.b = db.token CROSS JOIN nd
        """,
        "token_cooccurrence",
    )


def test_token_cooccurrence_caps(spark):
    from tidierdb_jl_spark.core import TidyFrame
    from tidierdb_jl_spark.llm.vocab import token_cooccurrence

    docs = TidyFrame(spark.createDataFrame(
        [(1, "x y rare1"), (2, "x y rare2"), (3, "x y"), (4, "x y")],
        "doc_id INT, text STRING",
    ))
    # vocab capped to the 2 hottest tokens: pairs only among {x, y}
    rows = token_cooccurrence(docs, max_vocab=2, min_pair_count=1).df.collect()
    assert [(r["a"], r["b"], r["n_ab"]) for r in rows] == [("x", "y", 4)]
    # min_pair_count prunes singleton pairs
    rows = token_cooccurrence(docs, max_vocab=None, min_pair_count=2).df.collect()
    assert {(r["a"], r["b"]) for r in rows} == {("x", "y")}


def test_token_divergence_vs_duckdb(tables, ddb):
    from tidierdb_jl_spark.llm.vocab import token_divergence

    docs = tables["documents"]
    e = docs.filter("doc_id % 2 = 0")
    a = docs.filter("doc_id % 2 = 1")
    d = token_divergence(e, a, max_vocab=50).mutate(
        pe9="round(p_expected, 9)", pa9="round(p_actual, 9)",
        kl9="round(kl_contrib, 9)", js9="round(js_contrib, 9)",
    ).select("token", "n_expected", "n_actual", "pe9", "pa9", "kl9", "js9")
    assert_matches_duckdb(
        d,
        ddb,
        r"""
        WITH etoks AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents WHERE text IS NOT NULL AND trim(text) != ''
            AND doc_id % 2 = 0),
        atoks AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents WHERE text IS NOT NULL AND trim(text) != ''
            AND doc_id % 2 = 1),
        ec AS (SELECT token, count(*) AS n_e FROM etoks GROUP BY 1),
        ac AS (SELECT token, count(*) AS n_a FROM atoks GROUP BY 1),
        m AS (SELECT coalesce(ec.token, ac.token) AS token,
                     CAST(coalesce(n_e, 0) AS BIGINT) AS n_expected,
                     CAST(coalesce(n_a, 0) AS BIGINT) AS n_actual
              FROM ec FULL JOIN ac ON ec.token = ac.token),
        tot AS (SELECT sum(n_expected) AS te, sum(n_actual) AS ta FROM m),
        cut AS (SELECT * FROM m
                ORDER BY (n_expected + n_actual) DESC, token LIMIT 50),
        p AS (SELECT c.token, c.n_expected, c.n_actual,
                     greatest(1e-9, c.n_expected / greatest(1, tot.te)) AS pe,
                     greatest(1e-9, c.n_actual / greatest(1, tot.ta)) AS pa
              FROM cut c CROSS JOIN tot)
        SELECT token, n_expected, n_actual,
               round(pe, 9) AS pe9, round(pa, 9) AS pa9,
               round(pe * ln(pe / pa), 9) AS kl9,
               round((pe * ln(pe / ((pe + pa) / 2))
                      + pa * ln(pa / ((pe + pa) / 2))) / 2, 9) AS js9
        FROM p
        """,
        "token_divergence",
    )


def test_token_divergence_identity_and_onesided(spark):
    from tidierdb_jl_spark.core import TidyFrame
    from tidierdb_jl_spark.llm.vocab import token_divergence

    docs = TidyFrame(spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id INT, text STRING"))
    same = token_divergence(docs, docs, max_vocab=None)
    tot = same.summarize(kl="sum(kl_contrib)", js="sum(js_contrib)").df.first()
    assert abs(tot["kl"]) < 1e-12 and abs(tot["js"]) < 1e-12
    only_a = TidyFrame(spark.createDataFrame([(3, "zzz")], "doc_id INT, text STRING"))
    d = token_divergence(docs, only_a, max_vocab=None)
    rows = {r["token"]: r for r in d.df.collect()}
    assert rows["zzz"]["n_expected"] == 0 and rows["zzz"]["n_actual"] == 1
    # one-sided tokens stay finite (eps floor), JS bounded by ln(2)
    import math
    assert all(r["js_contrib"] is not None and r["js_contrib"] <= math.log(2) + 1e-9
               for r in rows.values())
