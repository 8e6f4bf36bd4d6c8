"""Round-5b ops: bigram-LM perplexity scoring, repeated-passage
detection, column profiling, and quantile-threshold filtering — each
differentially tested against DuckDB running the same semantics."""

import pytest
from pyspark.sql import functions as F

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.llm.lm import score_perplexity, train_ngram_lm
from tidierdb_jl_spark.llm.passages import (
    filter_repeated_passages,
    passage_windows,
    repeated_passage_stats,
)
from tidierdb_jl_spark.llm.pipeline import filter_by_quantile
from tidierdb_jl_spark.operators.stats import column_stats

from helpers import assert_matches_duckdb

_DUCK_PAIRS = r"""
toks AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\s+') END AS a
  FROM documents),
padded AS (SELECT doc_id, list_prepend(chr(1) || 'bos', a) AS pad FROM toks),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(pad)),
                i -> struct_pack(c := pad[i], w := pad[i + 1]))) AS p
  FROM padded WHERE len(pad) >= 2),
px AS (SELECT doc_id, p.c AS c, p.w AS w FROM pairs)
"""


def test_lm_model_counts_vs_duckdb(tables, ddb):
    model, meta = train_ngram_lm(tables["documents"])
    assert meta["k"] == 0.5 and meta["vocab_size"] >= 1
    assert_matches_duckdb(
        model,
        ddb,
        f"""
        WITH {_DUCK_PAIRS},
        pc AS (SELECT c, w, count(*) AS pair_count FROM px GROUP BY c, w),
        cc AS (SELECT c, count(*) AS ctx_count FROM px GROUP BY c)
        SELECT pc.c, pc.w, pc.pair_count, cc.ctx_count
        FROM pc JOIN cc USING (c)
        """,
        "ngram_lm_model",
    )
    # vocab size scalar matches the oracle's too
    v = ddb.execute(f"WITH {_DUCK_PAIRS} SELECT count(DISTINCT w) FROM px").fetchone()[0]
    assert meta["vocab_size"] == v


def _perplexity_oracle(k: float, v: int) -> str:
    return f"""
        WITH {_DUCK_PAIRS},
        pc AS (SELECT c, w, count(*) AS pair_count FROM px GROUP BY c, w),
        cc AS (SELECT c, count(*) AS ctx_count FROM px GROUP BY c),
        scored AS (
          SELECT px.doc_id,
                 log2((coalesce(pc.pair_count, 0) + {k})
                      / (coalesce(cc.ctx_count, 0) + {k} * {v})) AS logp
          FROM px LEFT JOIN pc USING (c, w) LEFT JOIN cc USING (c)),
        agg AS (
          SELECT doc_id, count(*) AS n_bigrams,
                 CAST(sum(CAST(logp AS DECIMAL(28,10))) AS DOUBLE) AS s
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
               round(-a.s / a.n_bigrams, 6) AS ce6
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def test_perplexity_vs_duckdb(tables, ddb):
    docs = tables["documents"]
    model, meta = train_ngram_lm(docs)
    scored = score_perplexity(docs.select("doc_id", "text"), model, meta).mutate(
        ce6="round(cross_entropy, 6)"
    ).select("doc_id", "n_bigrams", "ce6")
    assert_matches_duckdb(
        scored, ddb, _perplexity_oracle(meta["k"], meta["vocab_size"]),
        "score_perplexity",
    )


def test_perplexity_broadcast_model_identical(tables):
    docs = tables["documents"]
    model, meta = train_ngram_lm(docs, min_count=2)
    a = score_perplexity(docs.select("doc_id", "text"), model, meta)
    b = score_perplexity(
        docs.select("doc_id", "text"), model, meta, broadcast_model=True
    )
    rows_a = {r["doc_id"]: r["cross_entropy"] for r in a.df.collect()}
    rows_b = {r["doc_id"]: r["cross_entropy"] for r in b.df.collect()}
    assert rows_a == rows_b  # decimal sum => bit-identical, not just close


def test_perplexity_degenerate_docs(spark):
    docs = TidyFrame(
        spark.createDataFrame(
            [(1, "hello world hello"), (2, ""), (3, None), (4, "single")],
            "doc_id INT, text STRING",
        )
    )
    model, meta = train_ngram_lm(docs)
    out = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in score_perplexity(docs, model, meta).df.collect()
    }
    assert out[1][0] == 3  # bos->hello, hello->world, world->hello
    assert out[1][1] is not None
    # empty / null text: zero bigrams, NULL scores (doc still present)
    assert out[2] == (0, None) and out[3] == (0, None)
    assert out[4][0] == 1  # bos->single counts as a scored bigram


def test_unseen_tokens_backoff(spark):
    train = TidyFrame(
        spark.createDataFrame([(1, "a b a b a")], "doc_id INT, text STRING")
    )
    model, meta = train_ngram_lm(train)
    test = TidyFrame(
        spark.createDataFrame([(9, "z q a b")], "doc_id INT, text STRING")
    )
    row = score_perplexity(test, model, meta).df.first()
    # unseen context 'z'/'q' -> uniform floor: finite, not NULL/inf
    assert row["n_bigrams"] == 4
    assert row["cross_entropy"] is not None and row["cross_entropy"] > 0


_DUCK_WINS5 = r"""
toks AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\s+') END AS a
  FROM documents),
wins AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(a) - 5 + 2),
                i -> array_to_string(a[i:i+4], ' '))) AS passage
  FROM toks WHERE len(a) >= 5)
"""


def test_passage_stats_vs_duckdb(tables, ddb):
    stats = repeated_passage_stats(tables["documents"], window=5).mutate(
        dup_frac6="round(dup_fraction, 6)"
    ).select("doc_id", "n_windows", "n_dup_windows", "dup_frac6")
    assert_matches_duckdb(
        stats,
        ddb,
        f"""
        WITH {_DUCK_WINS5},
        dup AS (
          SELECT passage FROM (SELECT DISTINCT doc_id, passage FROM wins)
          GROUP BY passage HAVING count(*) >= 2),
        agg AS (
          SELECT w.doc_id, count(*) AS n_windows, count(d.passage) AS n_dup_windows
          FROM wins w LEFT JOIN dup d USING (passage) GROUP BY w.doc_id)
        SELECT t.doc_id, coalesce(a.n_windows, 0) AS n_windows,
               coalesce(a.n_dup_windows, 0) AS n_dup_windows,
               coalesce(round(a.n_dup_windows * 1.0 / a.n_windows, 6), 0.0) AS dup_frac6
        FROM toks t LEFT JOIN agg a USING (doc_id)
        """,
        "repeated_passage_stats",
    )


def test_passage_windows_vs_duckdb(tables, ddb):
    pw = passage_windows(tables["documents"], window=5)
    assert_matches_duckdb(
        pw,
        ddb,
        f"""
        WITH {_DUCK_WINS5}
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id) - 1 AS INT) AS pos,
               passage
        FROM wins
        """,
        "passage_windows",
    )


def test_filter_repeated_passages_consistent(tables):
    docs = tables["documents"]
    stats = repeated_passage_stats(docs, window=5)
    expect = {
        r["doc_id"] for r in stats.df.collect() if r["dup_fraction"] <= 0.5
    }
    kept = filter_repeated_passages(docs, 0.5, window=5)
    got = {r["doc_id"] for r in kept.df.select("doc_id").collect()}
    assert got == expect
    assert kept.df.columns == docs.df.columns


def test_passage_short_and_stride(spark):
    docs = TidyFrame(
        spark.createDataFrame(
            [(1, "a b c"), (2, "a b c d e f g h"), (3, "a b c d e f g h")],
            "doc_id INT, text STRING",
        )
    )
    st = {r["doc_id"]: r for r in repeated_passage_stats(docs, window=4).df.collect()}
    assert (st[1]["n_windows"], st[1]["n_dup_windows"], st[1]["dup_fraction"]) == (0, 0, 0.0)
    assert st[2]["dup_fraction"] == 1.0 and st[3]["dup_fraction"] == 1.0
    # stride=4 tiles the 8 tokens into 2 non-overlapping windows
    pw = passage_windows(docs.filter("doc_id = 2"), window=4, stride=4)
    assert [r["passage"] for r in pw.df.orderBy("pos").collect()] == ["a b c d", "e f g h"]


def test_column_stats_vs_duckdb(tables, ddb):
    cs = column_stats(
        tables["orders"],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
        exact=True,
    ).mutate(min_num="round(min_num, 6)", max_num="round(max_num, 6)")
    assert_matches_duckdb(
        cs,
        ddb,
        """
        WITH s AS (SELECT * FROM orders)
        SELECT 'o_orderkey' AS column, count(*) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT o_orderkey) AS n_distinct,
               round(CAST(min(o_orderkey) AS DOUBLE), 6) AS min_num,
               round(CAST(max(o_orderkey) AS DOUBLE), 6) AS max_num FROM s
        UNION ALL
        SELECT 'o_custkey', count(*),
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_custkey),
               round(CAST(min(o_custkey) AS DOUBLE), 6),
               round(CAST(max(o_custkey) AS DOUBLE), 6) FROM s
        UNION ALL
        SELECT 'o_orderstatus', count(*),
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderstatus), NULL, NULL FROM s
        UNION ALL
        SELECT 'o_totalprice', count(*),
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_totalprice),
               round(CAST(min(o_totalprice) AS DOUBLE), 6),
               round(CAST(max(o_totalprice) AS DOUBLE), 6) FROM s
        """,
        "column_stats",
    )


def test_column_stats_null_and_unknown(spark):
    tf = TidyFrame(
        spark.createDataFrame(
            [(1, None), (2, 5.0), (None, 7.5)], "a INT, b DOUBLE"
        )
    )
    rows = {r["column"]: r for r in column_stats(tf, exact=True).df.collect()}
    assert rows["a"]["n_null"] == 1 and rows["a"]["n_distinct"] == 2
    assert rows["b"]["min_num"] == 5.0 and rows["b"]["max_num"] == 7.5
    with pytest.raises(ValueError, match="unknown columns"):
        column_stats(tf, ["nope"])


def test_filter_by_quantile_vs_duckdb(tables, ddb):
    kept = filter_by_quantile(
        tables["documents"].select("doc_id", "n_chars"), "n_chars", 0.25
    )
    assert_matches_duckdb(
        kept,
        ddb,
        """
        SELECT doc_id, n_chars FROM documents
        WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.25) FROM documents)
        """,
        "filter_by_quantile_above",
    )
    below = filter_by_quantile(
        tables["documents"].select("doc_id", "n_chars"), "n_chars", 0.75,
        keep="below", out="thr",
    ).mutate(thr="round(thr, 6)")
    assert_matches_duckdb(
        below,
        ddb,
        """
        SELECT doc_id, n_chars,
               round((SELECT quantile_cont(n_chars, 0.75) FROM documents), 6) AS thr
        FROM documents
        WHERE n_chars <= (SELECT quantile_cont(n_chars, 0.75) FROM documents)
        """,
        "filter_by_quantile_below",
    )


def test_filter_by_quantile_validation(tables):
    with pytest.raises(ValueError, match="q must be"):
        filter_by_quantile(tables["documents"], "n_chars", 1.5)
    with pytest.raises(ValueError, match="keep must be"):
        filter_by_quantile(tables["documents"], "n_chars", 0.5, keep="nope")


def test_r5b_ops_plans_are_scale_healthy(spark, tables):
    """lint_plan gate over the round-5b surface: LM train/score,
    passage stats, quantile filter — no cartesian, no row-at-a-time
    Python, no lost pushdown.  The quantile filter's 1-row broadcast
    scalar attach is the one place a nested-loop join IS the intended
    plan (same bounded shape as with_scalar / q76), so it is exempt
    from the nested-loop check but still must not go cartesian."""
    from tidierdb_jl_spark import lint_plan

    docs = tables["documents"]
    model, meta = train_ngram_lm(docs, min_count=2)
    plans = {
        "lm_model": model,
        "lm_score": score_perplexity(docs.select("doc_id", "text"), model, meta),
        "passage_stats": repeated_passage_stats(docs, window=5),
        "quantile_filter": filter_by_quantile(
            docs.select("doc_id", "n_chars"), "n_chars", 0.25
        ),
    }
    bounded_bnlj = {"quantile_filter"}
    for name, tf in plans.items():
        findings = lint_plan(tf)
        errors = [f for f in findings if f["severity"] == "error"]
        assert errors == [], (name, errors)
        if name not in bounded_bnlj:
            warns = [f for f in findings if f["rule"] == "nested_loop"]
            assert warns == [], (name, warns)


def test_perplexity_filter_composition(tables):
    """perplexity_filter == score -> drop NULLs -> keep ppl <= q-quantile,
    with original columns + perplexity and nothing else."""
    from tidierdb_jl_spark.llm.lm import perplexity_filter

    docs = tables["documents"]
    model, meta = train_ngram_lm(docs)
    kept = perplexity_filter(docs, model, meta, q=0.8)
    assert kept.df.columns == docs.df.columns + ["perplexity"]

    scored = score_perplexity(docs, model, meta)
    vals = sorted(r["perplexity"] for r in scored.df.collect()
                  if r["perplexity"] is not None)
    import math
    pos = (len(vals) - 1) * 0.8
    lo, hi = vals[math.floor(pos)], vals[math.ceil(pos)]
    thr = lo + (hi - lo) * (pos - math.floor(pos))
    expect = {r["doc_id"] for r in scored.df.collect()
              if r["perplexity"] is not None and r["perplexity"] <= thr}
    got = {r["doc_id"] for r in kept.df.select("doc_id").collect()}
    assert got == expect and len(got) > 0


def test_filter_by_quantile_grouped_vs_duckdb(tables, ddb):
    kept = filter_by_quantile(
        tables["documents"].select("doc_id", "lang", "n_chars"),
        "n_chars", 0.5, by="lang",
    )
    assert_matches_duckdb(
        kept,
        ddb,
        """
        WITH thr AS (SELECT lang, quantile_cont(n_chars, 0.5) AS t
                     FROM documents GROUP BY lang)
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d JOIN thr USING (lang)
        WHERE d.n_chars >= thr.t
        """,
        "filter_by_quantile_grouped",
    )
    # per-group bar keeps ~half of EVERY language, not half overall
    from collections import Counter
    langs_all = Counter(r["lang"] for r in tables["documents"].df.collect())
    langs_kept = Counter(r["lang"] for r in kept.df.collect())
    for lang, n in langs_all.items():
        assert 0.3 <= langs_kept[lang] / n <= 0.7, (lang, langs_kept[lang], n)


def test_lazy_vocab_identical_and_single_job(tables):
    """lazy_vocab folds the vocab-size scalar into the scoring plan:
    results bit-identical to the eager path, and building the plan
    triggers zero Spark jobs (no driver barrier)."""
    docs = tables["documents"]
    m_e, meta_e = train_ngram_lm(docs)
    sc = docs.df.sparkSession.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    m_l, meta_l = train_ngram_lm(docs, lazy_vocab=True)
    lazy_plan = score_perplexity(docs.select("doc_id", "text"), m_l, meta_l)
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert meta_l["vocab_size"] is None
    assert len(after) == len(before), "lazy train+plan ran a Spark job"
    eager = {r["doc_id"]: r["cross_entropy"]
             for r in score_perplexity(docs.select("doc_id", "text"), m_e, meta_e).df.collect()}
    lazy = {r["doc_id"]: r["cross_entropy"] for r in lazy_plan.df.collect()}
    assert eager == lazy  # decimal sums -> bit-identical, not just close
