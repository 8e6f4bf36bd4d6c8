"""Two-pass Misra-Gries heavy hitters (operators/heavyhitters.py):
exact answers from a bounded sketch.

Beyond-reference surface (the reference's closest is a full group-by,
/root/reference/src/TidierDB.jl @summarize), so correctness is
differential: every outcome is recomputed exactly in pandas over the
same inputs — including adversarially skewed layouts that try to hide a
heavy hitter from the per-partition summaries.
"""

import math

import pandas as pd
import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.operators.heavyhitters import (
    heavy_hitters,
    token_heavy_hitters,
)


def _exact(values, frac):
    s = pd.Series([v for v in values if v is not None])
    thr = math.ceil(frac * len(s))
    vc = s.value_counts()
    return {v: int(n) for v, n in vc.items() if n >= thr}


def _check(spark, values, frac, n_parts=7):
    df = spark.createDataFrame(
        [(v,) for v in values], "v string" if isinstance(
            next(v for v in values if v is not None), str) else "v long"
    ).repartition(n_parts)
    got = heavy_hitters(TidyFrame(df), "v", frac).collect()
    want = _exact(values, frac)
    assert dict(zip(got["v"], got["count"])) == want


def test_heavy_hitters_zipf_exact(spark):
    import random

    rng = random.Random(7)
    vals = [f"w{int(rng.paretovariate(1.1))}" for _ in range(20_000)]
    _check(spark, vals, 0.01)
    _check(spark, vals, 0.001)


def test_heavy_hitters_adversarial_layout(spark):
    """A value can be globally heavy while locally light in most
    partitions — scatter one heavy value thinly across partitions that
    are otherwise full of partition-local noise."""
    vals = []
    for p in range(16):
        vals.extend(f"noise_{p}_{i}" for i in range(900))
        vals.extend(["needle"] * 100)  # 10% locally, 10% globally
    _check(spark, vals, 0.05, n_parts=16)
    # and below the needle's frequency nothing else qualifies
    got = heavy_hitters(
        TidyFrame(
            spark.createDataFrame([(v,) for v in vals], "v string").repartition(16)
        ),
        "v",
        0.05,
    ).collect()
    assert got["v"].tolist() == ["needle"]
    assert got["count"].tolist() == [1600]


def test_heavy_hitters_edge_shapes(spark):
    # all identical -> one row with the full count
    _check(spark, ["x"] * 500, 0.5)
    # all distinct at a high threshold -> empty
    got = heavy_hitters(
        TidyFrame(spark.createDataFrame([(f"u{i}",) for i in range(500)], "v string")),
        "v",
        0.01,
    ).collect()
    assert len(got) == 0
    # nulls are ignored, not counted in N
    vals = ["a"] * 60 + [None] * 1000 + ["b"] * 40
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(5)
    got = heavy_hitters(TidyFrame(df), "v", 0.5).collect()
    assert dict(zip(got["v"], got["count"])) == {"a": 60}
    # integral column
    _check(spark, [1] * 80 + [2] * 15 + [3] * 5, 0.1)


def test_heavy_hitters_validation(spark, tables):
    with pytest.raises(ValueError, match="threshold_frac"):
        heavy_hitters(tables["documents"], "text", 0.0)
    with pytest.raises(ValueError, match="counters per"):
        heavy_hitters(tables["documents"], "text", 1e-9)
    with pytest.raises(ValueError, match="string or integral"):
        heavy_hitters(tables["embeddings"], "embedding", 0.1)
    # empty input -> empty result with the right schema
    got = heavy_hitters(tables["documents"].filter("doc_id < 0"), "text", 0.1)
    pdf = got.collect()
    assert len(pdf) == 0 and list(pdf.columns) == ["text", "count"]


def test_token_heavy_hitters_vs_exact(spark, tables):
    docs = tables["documents"].filter("doc_id < 300")
    got = token_heavy_hitters(docs, "text", 0.005).collect()
    toks = []
    for t in docs.select("text").collect()["text"]:
        if t is not None and t.strip():
            toks.extend(t.strip().lower().split())
    want = _exact(toks, 0.005)
    assert dict(zip(got["token"], got["count"])) == want


def test_heavy_hitters_plan_is_mapside(spark, tables):
    """The scale claim, plan-asserted: the recount joins the bounded
    candidate set by BROADCAST (never a sort-merge that would shuffle
    the stream).  The candidate pass itself is mapInPandas straight off
    the scan — its only exchange is the test-scale ``_spread``
    repartition, a no-op at real scale."""
    docs = tables["documents"].filter("doc_id < 200")
    out = token_heavy_hitters(docs, "text", 0.01)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    # the recount side is a broadcast semi join, never sort-merge
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
