"""Corpus-mixing operators (llm/mixing.py): domain caps, stratified
hash-sampling, weighted upsampling — deterministic, oracle-backed."""

import pytest

from helpers import assert_matches_duckdb
from tidierdb_jl_spark.llm.mixing import (
    cap_per_key,
    sample_strata,
    upsample_by_weight,
)


def test_cap_per_key_matches_duckdb(tables, ddb):
    capped = cap_per_key(tables["documents"], "source", 10, "doc_id")
    assert_matches_duckdb(
        capped.select("doc_id", "source"),
        ddb,
        """
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id) AS rn
          FROM documents)
        WHERE rn <= 10
        """,
    )


def test_cap_per_key_audit_column(tables):
    audited = cap_per_key(tables["documents"], "source", 10, "doc_id",
                          keep_col="kept")
    from pyspark.sql import functions as F

    pdf = (
        audited.df.groupBy("source")
        .agg(F.sum(F.col("kept").cast("int")).alias("n_kept"))
        .toPandas()
    )
    assert (pdf["n_kept"] <= 10).all()
    assert "__rn" not in audited.columns
    with pytest.raises(ValueError, match="cap"):
        cap_per_key(tables["documents"], "source", 0, "doc_id")


def test_sample_strata_matches_duckdb(tables, ddb):
    s = sample_strata(
        tables["documents"], "source", {"src0": 0.2, "src1": 0.6}, "doc_id"
    )
    t0 = format(int(0.2 * 0xFFFFFFFF), "08x")
    t1 = format(int(0.6 * 0xFFFFFFFF), "08x")
    assert_matches_duckdb(
        s.select("doc_id", "source"),
        ddb,
        f"""
        SELECT doc_id, source FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              < CASE WHEN source = 'src0' THEN '{t0}'
                     WHEN source = 'src1' THEN '{t1}'
                     ELSE 'ffffffff' END
        """,
    )
    with pytest.raises(ValueError, match="fraction"):
        sample_strata(tables["documents"], "source", {"src0": 1.5}, "doc_id")


def test_sample_strata_stable_under_repartition(tables):
    """The kept set must not depend on physical layout — the property
    sampleBy lacks."""
    docs = tables["documents"]
    s1 = sorted(
        r[0] for r in
        sample_strata(docs, "source", {"src0": 0.5}, "doc_id").df
        .select("doc_id").collect()
    )
    from tidierdb_jl_spark.core import TidyFrame

    reparted = TidyFrame(docs.df.repartition(13))
    s2 = sorted(
        r[0] for r in
        sample_strata(reparted, "source", {"src0": 0.5}, "doc_id").df
        .select("doc_id").collect()
    )
    assert s1 == s2


def test_upsample_by_weight_matches_duckdb(tables, ddb):
    u = upsample_by_weight(
        tables["documents"], "source",
        {"src0": 3.0, "src1": 2.5, "src2": 0.0}, "doc_id", salt="upsample",
    )
    thr = format(int(0.5 * 0xFFFFFFFF), "08x")
    assert_matches_duckdb(
        u.mutate(copy_n="CAST(copy_n AS BIGINT)")
        .select("doc_id", "source", "copy_n"),
        ddb,
        f"""
        WITH n AS (
          SELECT doc_id, source,
                 CASE WHEN source = 'src0' THEN 3
                      WHEN source = 'src1' THEN 2 +
                        CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                                  || 'upsample'), 1, 8) < '{thr}'
                             THEN 1 ELSE 0 END
                      WHEN source = 'src2' THEN 0
                      ELSE 1 END AS copies
          FROM documents)
        SELECT n.doc_id, n.source, g.c AS copy_n
        FROM n JOIN (SELECT unnest(generate_series(0, 3)) AS c) g
          ON g.c < n.copies
        """,
    )
    with pytest.raises(ValueError, match="weight"):
        upsample_by_weight(
            tables["documents"], "source", {"src0": -1.0}, "doc_id"
        )


def test_upsample_copy_numbering(tables):
    u = upsample_by_weight(
        tables["documents"], "source", {"src0": 3.0}, "doc_id"
    )
    pdf = u.df.filter("source = 'src0'").groupBy("copy_n").count().toPandas()
    assert sorted(pdf["copy_n"]) == [0, 1, 2]
    assert pdf["count"].nunique() == 1  # every copy index covers every row


def test_deterministic_shuffle_stable_and_seed_independent(tables):
    from tidierdb_jl_spark.llm.mixing import deterministic_shuffle

    docs = tables["documents"]
    a = deterministic_shuffle(docs, "doc_id", seed="ep1").collect()["doc_id"].tolist()
    # stable under re-evaluation and under repartitioning
    b = deterministic_shuffle(docs, "doc_id", seed="ep1").collect()["doc_id"].tolist()
    from tidierdb_jl_spark import TidyFrame

    c = (
        deterministic_shuffle(TidyFrame(docs.df.repartition(7)), "doc_id", seed="ep1")
        .collect()["doc_id"].tolist()
    )
    assert a == b == c
    # a different seed yields an independent order over the same rows
    d = deterministic_shuffle(docs, "doc_id", seed="ep2").collect()["doc_id"].tolist()
    assert sorted(a) == sorted(d) and a != d


def test_curriculum_order_stages_and_determinism(tables):
    from tidierdb_jl_spark.llm.mixing import curriculum_order

    docs = tables["documents"]
    out = curriculum_order(docs, "n_chars", "doc_id", n_stages=4).collect()
    assert len(out) == docs.df.count()
    assert set(out["stage"]) <= {0, 1, 2, 3}
    # roughly quartile-sized stages (exact quantiles; ties may skew a bit)
    sizes = out.groupby("stage").size()
    assert sizes.min() > 0.1 * len(out)
    # easy-first: stage means are monotonic in the score
    means = out.groupby("stage")["n_chars"].mean()
    assert means.is_monotonic_increasing
    # descending flips the stages exactly
    rev = curriculum_order(docs, "n_chars", "doc_id", n_stages=4, ascending=False).collect()
    flip = dict(zip(rev["doc_id"], rev["stage"]))
    for did, st in zip(out["doc_id"], out["stage"]):
        assert flip[did] == 3 - st
    # a new seed reshuffles within stages but never across them
    s2 = curriculum_order(docs, "n_chars", "doc_id", n_stages=4, seed="v2").collect()
    assert dict(zip(s2["doc_id"], s2["stage"])) == dict(zip(out["doc_id"], out["stage"]))
    assert list(s2["doc_id"]) != list(out["doc_id"])

    import pytest

    with pytest.raises(ValueError):
        curriculum_order(docs, "n_chars", "doc_id", n_stages=1)


def test_pack_documents_ffd_invariants(tables):
    from tidierdb_jl_spark.llm.packing import pack_documents_ffd

    docs = tables["documents"]
    block = 120
    out = pack_documents_ffd(docs, "doc_id", block, n_shards=4).collect()
    # every document assigned exactly once
    assert sorted(out["doc_id"]) == sorted(
        r[0] for r in docs.df.select("doc_id").collect()
    )
    # bin_fill is the exact sum of member lengths; never exceeds the cap
    # except flagged oversize singletons
    g = out.groupby(["shard", "bin_id"])
    for (sh, b), grp in g:
        assert grp["bin_fill"].nunique() == 1
        fill = grp["bin_fill"].iloc[0]
        assert fill == grp["n_tokens"].sum()
        if fill > block:
            assert len(grp) == 1 and grp["oversize"].all()
    # packing efficiency: bins within 1.5x the per-shard lower bound
    n_bins = g.ngroups
    lower = sum(
        -(-int(s) // block)
        for s in out.groupby("shard")["n_tokens"].sum()
    )
    assert n_bins <= 1.5 * lower + 4
    # deterministic
    again = pack_documents_ffd(docs, "doc_id", block, n_shards=4).collect()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, again.values.tolist())
    )

    import pytest

    with pytest.raises(ValueError):
        pack_documents_ffd(docs, "doc_id", 0)


def test_take_token_budget(spark, tables, ddb):
    """Greedy token-budget selection matches the global-window cumsum
    oracle at boundary-adjacent budgets, keeps the partition-parallel
    plan (no single-partition window), and releases its pinned cache."""
    from tidierdb_jl_spark import release_caches, show_query
    from tidierdb_jl_spark.llm.mixing import take_token_budget

    base = len(spark.sparkContext._jsc.getPersistentRDDs())

    def run(budget):
        return (
            take_token_budget(
                tables["documents"], budget, tokens="n_chars",
                order_by=["-n_chars", "doc_id"], into="cum",
            )
            .select("doc_id", "n_chars", "cum")
            .collect()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    oracle_sql = """
        SELECT doc_id, n_chars, cum FROM (
          SELECT doc_id, n_chars,
                 SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
          FROM documents) WHERE cum <= {b} ORDER BY doc_id"""
    total = int(ddb.execute("SELECT SUM(n_chars) FROM documents").fetchone()[0])
    # an exact-boundary budget: the cumsum of the first 7 kept docs
    edge = int(ddb.execute(
        "SELECT SUM(n_chars) FROM (SELECT n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 7)").fetchone()[0])
    for budget in (edge, edge - 1, 40_000, total, total + 1, 1):
        got = run(budget)
        want = ddb.execute(oracle_sql.format(b=budget)).df()
        assert len(got) == len(want), budget
        assert (got["doc_id"].values == want["doc_id"].values).all(), budget
        assert (got["cum"].astype("int64").values
                == want["cum"].astype("int64").values).all(), budget

    # plan shape: the cut runs per-partition — no single-partition window
    q = take_token_budget(tables["documents"], 10_000, tokens="n_chars",
                          order_by=["-n_chars", "doc_id"])
    assert "Window" not in show_query(q, "formatted")

    release_caches(blocking=True)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= base

    import pytest as _pytest

    with _pytest.raises(ValueError):
        take_token_budget(tables["documents"], 10, tokens="n_chars")


def test_temperature_mix_exact_replay(tables):
    """Deterministic exact replay in pandas: same counts -> same float
    weights -> same md5 whole+fractional replication rule, row by row."""
    import hashlib
    import math

    from tidierdb_jl_spark.llm.mixing import temperature_mix

    docs = tables["documents"].select("doc_id", "source")
    got = temperature_mix(docs, alpha=0.5, salt="tmix").collect()

    pdf = docs.collect()
    counts = pdf.groupby("source").size().to_dict()
    total = sum(counts.values())
    z = sum(n ** 0.5 for _, n in sorted(counts.items()))
    weights = {k: (total * (n ** 0.5) / z) / n
               for k, n in sorted(counts.items())}
    want = []
    for did, src in pdf.itertuples(index=False):
        w = weights[src]
        whole, frac = int(w), w - int(w)
        u = hashlib.md5(f"{did}tmix".encode()).hexdigest()[:8]
        n = whole + (1 if frac > 0 and u < format(
            int(frac * 0xFFFFFFFF), "08x") else 0)
        want.extend((did, src, c) for c in range(n))
    got_t = sorted(map(tuple, got[["doc_id", "source", "copy_n"]].values.tolist()))
    assert got_t == sorted(want)


def test_temperature_mix_shares_and_edges(tables):
    from tidierdb_jl_spark.llm.mixing import temperature_mix

    docs = tables["documents"].select("doc_id", "source")
    n_in = docs.df.count()
    # alpha=1: natural proportions -> per-source counts preserved (+-2
    # for the fractional-copy hash boundary)
    ident = temperature_mix(docs, alpha=1.0).collect()
    in_counts = docs.collect().groupby("source").size()
    out_counts = ident.groupby("source").size()
    for src, n in in_counts.items():
        assert abs(out_counts.get(src, 0) - n) <= 2, src
    # alpha=0: sources equalized around total/#sources
    flat = temperature_mix(docs, alpha=0.0).collect()
    fc = flat.groupby("source").size()
    expect = n_in / len(in_counts)
    for src in in_counts.index:
        assert abs(fc.get(src, 0) - expect) < 6 * (expect ** 0.5), src
    # target_total scales the output
    half = temperature_mix(docs, alpha=0.5, target_total=n_in // 2).collect()
    assert abs(len(half) - n_in // 2) < 6 * (n_in ** 0.5)
    # validation
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(docs, alpha=1.5)
    with pytest.raises(ValueError, match="distinct"):
        temperature_mix(docs, key="source", max_keys=2)


def test_mixture_keys_with_quotes_are_safe(spark, tables):
    """Data-derived mixture keys reach the CASE expressions unescaped in
    the wild (crawl metadata): a key containing quotes/backslashes must
    neither break parsing nor alter which rows replicate."""
    from pyspark.sql import functions as F

    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.llm.mixing import (
        sample_strata,
        temperature_mix,
        upsample_by_weight,
    )

    docs = tables["documents"].df.filter("doc_id < 300").select("doc_id")
    evil = "it's'; DROP--\\"
    df = TidyFrame(docs.withColumn(
        "source",
        F.expr("IF(doc_id % 3 = 0, \"it's'; DROP--\\\\\", "
               "IF(doc_id % 3 = 1, 'clean', 'other'))"),
    ))
    n_evil = df.df.filter(F.col("source") == evil).count()
    n_clean = df.df.filter(F.col("source") == "clean").count()
    assert n_evil > 0

    up = upsample_by_weight(df, "source", {evil: 3.0, "clean": 1.0},
                            "doc_id", default_weight=0.0)
    got = up.df.groupBy("source").count().collect()
    by = {r[0]: r[1] for r in got}
    assert by[evil] == 3 * n_evil       # exactly-3x, no silent rerouting
    assert by["clean"] == n_clean
    assert "other" not in by            # default_weight=0 drops it

    st = sample_strata(df, "source", {evil: 0.0}, "doc_id", default_frac=1.0)
    assert st.df.filter(F.col("source") == evil).count() == 0
    assert st.df.count() == docs.count() - n_evil

    # temperature_mix end-to-end over the hostile key (the ADVICE repro)
    tm = temperature_mix(df, key="source", id_col="doc_id", alpha=0.5)
    assert tm.df.filter(F.col("source") == evil).count() > 0
