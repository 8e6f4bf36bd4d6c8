"""Bloom-filter membership joins: exactness vs DuckDB anti/semi joins,
no-false-negative invariant, FPR sanity, merge==build-on-union, NULL-key
join semantics, and the zero-shuffle probe-plan guarantee."""

import math

import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.operators.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_mark,
    bloom_merge,
    bloom_semi_join,
    bloom_size,
)

from helpers import assert_matches_duckdb


@pytest.fixture(scope="module")
def seen(tables):
    return TidyFrame(tables["documents"].df.filter("doc_id % 7 = 0").select("doc_id"))


@pytest.fixture(scope="module")
def bf(seen):
    return bloom_build(seen, "cast(doc_id as string)", expected_items=100, fpp=0.01)


def test_bloom_size_math():
    m, k = bloom_size(1000, 0.01)
    # textbook optimum: m ≈ 9.585 n, k ≈ 7 at 1% FPR
    assert 9000 <= m <= 10000 and k == 7
    assert m % 64 == 0
    with pytest.raises(ValueError):
        bloom_size(0)
    with pytest.raises(ValueError):
        bloom_size(10, 1.5)


def test_no_false_negatives_and_fpr(tables, seen, bf):
    marked = bloom_mark(tables["documents"], "cast(doc_id as string)", bf)
    assert marked.df.filter("doc_id % 7 = 0 AND NOT bloom_hit").count() == 0
    # FPR over the non-member population stays within ~5x the design target
    # (small-sample slack; the invariant that matters is no-FN + bounded FP)
    nonmember = marked.df.filter("doc_id % 7 != 0")
    fpr = nonmember.filter("bloom_hit").count() / max(nonmember.count(), 1)
    assert fpr <= 0.05


def test_semi_and_anti_match_duckdb(tables, seen, bf, ddb):
    sj = bloom_semi_join(
        tables["documents"].select("doc_id", "lang"),
        seen,
        "cast(doc_id as string)",
        keys_key="cast(doc_id as string)",
        bloom=bf,
    )
    assert_matches_duckdb(
        sj,
        ddb,
        "SELECT doc_id, lang FROM documents WHERE doc_id % 7 = 0",
        "bloom_semi",
    )
    aj = bloom_anti_join(
        tables["documents"].select("doc_id", "lang"),
        seen,
        "cast(doc_id as string)",
        keys_key="cast(doc_id as string)",
        bloom=bf,
    )
    assert_matches_duckdb(
        aj,
        ddb,
        "SELECT doc_id, lang FROM documents WHERE doc_id % 7 != 0",
        "bloom_anti",
    )


def test_null_keys_follow_join_semantics(spark, seen, bf):
    df = spark.sql(
        "SELECT CASE WHEN id % 3 = 0 THEN NULL ELSE cast(id as string) END AS k "
        "FROM range(30)"
    )
    aj = bloom_anti_join(TidyFrame(df), seen, "k", keys_key="cast(doc_id as string)", bloom=bf)
    sj = bloom_semi_join(TidyFrame(df), seen, "k", keys_key="cast(doc_id as string)", bloom=bf)
    # left-anti keeps NULL-key rows; left-semi drops them
    assert aj.df.filter("k IS NULL").count() == 10
    assert sj.df.filter("k IS NULL").count() == 0
    # and together they partition the input exactly
    assert aj.df.count() + sj.df.count() == 30


def test_merge_equals_build_on_union(tables, seen, bf):
    docs = tables["documents"].df
    s1 = TidyFrame(docs.filter("doc_id % 7 = 0 AND doc_id % 2 = 0").select("doc_id"))
    s2 = TidyFrame(docs.filter("doc_id % 7 = 0 AND doc_id % 2 = 1").select("doc_id"))
    b1 = bloom_build(s1, "cast(doc_id as string)", num_bits=bf["m"], num_hashes=bf["k"])
    b2 = bloom_build(s2, "cast(doc_id as string)", num_bits=bf["m"], num_hashes=bf["k"])
    assert bloom_merge(b1, b2)["bits"] == bf["bits"]
    with pytest.raises(ValueError):
        bloom_merge(b1, {"bits": "0", "m": 64, "k": 2})


def test_probe_plan_is_scan_side_only(tables, bf):
    """The negative path must be a pure Filter over the scan: no shuffle,
    no join, and whole-stage codegen — that is the entire point at 100 TB."""
    marked = bloom_mark(tables["documents"], "cast(doc_id as string)", bf)
    plan = marked.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    # '*(n)' prefixes mark whole-stage-codegen'd operators in this string form
    assert plan.lstrip().startswith("*(")


def test_anti_join_verify_slice_is_bounded(tables, seen, bf):
    """Only the bloom-positive slice may reach the verifying join — the
    join's probe input must be ~|true hits| + FPR×|corpus|, not |corpus|."""
    docs = tables["documents"]
    marked = bloom_mark(docs, "cast(doc_id as string)", bf)
    positives = marked.df.filter("bloom_hit").count()
    total = docs.df.count()
    true_hits = docs.df.filter("doc_id % 7 = 0").count()
    assert positives <= true_hits + math.ceil(0.05 * total)


def test_broadcast_mode_matches_literal_exactly(tables, seen):
    """Literal and broadcast probes answer bit-for-bit identically — the
    artifact is mode-portable (same xxhash64 positions JVM-side)."""
    bf = bloom_build(seen, "cast(doc_id as string)", expected_items=5000)
    docs = tables["documents"]
    lit = bloom_mark(docs, "cast(doc_id as string)", bf, mode="literal")
    brd = bloom_mark(docs, "cast(doc_id as string)", bf, mode="broadcast")
    wjn = bloom_mark(docs, "cast(doc_id as string)", bf, mode="wordjoin")
    a = lit.df.select("doc_id", "bloom_hit").toPandas().sort_values("doc_id")
    b = brd.df.select("doc_id", "bloom_hit").toPandas().sort_values("doc_id")
    c = wjn.df.select("doc_id", "bloom_hit").toPandas().sort_values("doc_id")
    assert a.values.tolist() == b.values.tolist() == c.values.tolist()
    # wordjoin is pure JVM: no Python stage, k broadcast joins, original
    # columns restored
    qe = wjn.df._jdf.queryExecution().toString()
    assert "ArrowEvalPython" not in qe and "BatchEvalPython" not in qe
    assert qe.count("BroadcastHashJoin") == bf["k"]
    assert wjn.df.columns == docs.df.columns + ["bloom_hit"]
    with pytest.raises(ValueError, match="mode"):
        bloom_mark(docs, "cast(doc_id as string)", bf, mode="huge")


def test_big_filter_takes_broadcast_path_not_plan_literal(tables, seen):
    """Above the 2^26-bit cap, auto mode must NOT embed the bitmap in the
    plan: the plan string stays small and carries the Arrow probe stage;
    membership semantics (no false negatives; NULL -> False) hold."""
    from pyspark.sql import functions as F

    big = bloom_build(
        seen, "cast(doc_id as string)", num_bits=(1 << 27), num_hashes=5
    )
    assert big["m"] == (1 << 27) and len(big["bits"]) == (1 << 27) // 4
    docs = tables["documents"]
    marked = bloom_mark(docs, "cast(doc_id as string)", big)  # auto
    qe = marked.df._jdf.queryExecution().toString()
    assert len(qe) < 200_000, "plan embeds the 32 MB bitmap literal"
    assert "ArrowEvalPython" in qe  # vectorized probe stage, not row-UDF
    # no false negatives: every true member probes positive
    n_members = docs.df.filter("doc_id % 7 = 0").count()
    hits = marked.df.filter("bloom_hit AND doc_id % 7 = 0").count()
    assert hits == n_members
    # a NULL key probes definitively False
    nulled = bloom_mark(
        TidyFrame(docs.df.select(F.expr(
            "IF(doc_id % 2 = 0, NULL, cast(doc_id as string))").alias("k"))),
        "k", big,
    )
    assert nulled.df.filter("k IS NULL AND bloom_hit").count() == 0
    # literal mode on the same filter warns loudly
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        bloom_mark(docs, "cast(doc_id as string)", big, mode="literal")
    assert any("broadcast" in str(r.message) for r in rec)


def test_big_filter_merge_is_vectorized_and_exact(seen, tables):
    """OR-merging two >2^26-bit filters equals building over the union
    (numpy path) — the incremental-ingest contract at 10^8-key scale."""
    docs = tables["documents"].df
    s1 = TidyFrame(docs.filter("doc_id % 7 = 0 AND doc_id % 2 = 0").select("doc_id"))
    s2 = TidyFrame(docs.filter("doc_id % 7 = 0 AND doc_id % 2 = 1").select("doc_id"))
    kw = dict(num_bits=(1 << 27), num_hashes=5)
    b1 = bloom_build(s1, "cast(doc_id as string)", **kw)
    b2 = bloom_build(s2, "cast(doc_id as string)", **kw)
    ball = bloom_build(seen, "cast(doc_id as string)", **kw)
    assert bloom_merge(b1, b2)["bits"] == ball["bits"]
