"""SemDeDup (cluster-scoped embedding dedup) invariants.

The synthetic embeddings table plants near-dup pairs at cosine ~0.4-0.48,
so threshold 0.4 exercises real duplicate groups.  Invariants mirror the
d42 discipline: removals are exact-verified (zero false removals), one
survivor per duplicate group, and the keep policy is checked against the
reported centroid similarities.
"""

from tidierdb_jl_spark.llm.dedup import embedding_cosine_pairs, semantic_dedup


def _exact_pairs(emb, slack=1e-9):
    ex = embedding_cosine_pairs(
        emb, "vec_id", threshold=0.4 - slack, method="exact"
    ).collect()
    return set(zip(ex["id_a"], ex["id_b"]))


def test_semantic_dedup_invariants(tables):
    emb = tables["embeddings"]
    out = semantic_dedup(emb, "vec_id", threshold=0.4, nlist=8).collect()
    n = emb.df.count()
    assert len(out) == n
    assert out["vec_id"].nunique() == n

    eset = _exact_pairs(emb)
    edocs = {i for p in eset for i in p}

    removed = out[out["vec_id"] != out["canonical_id"]]
    # zero false removals: every removed doc is a genuine exact near-dup
    for vid in removed["vec_id"]:
        assert vid in edocs, f"{vid} removed but has no exact near-dup"
    # one survivor per cluster
    kept = out[out["vec_id"] == out["canonical_id"]]
    assert kept.groupby("cluster_id").size().max() == 1
    # every cluster's canonical is a member of the cluster
    for cid, grp in out.groupby("cluster_id"):
        canon = set(grp["canonical_id"])
        assert len(canon) == 1
        assert canon.pop() in set(grp["vec_id"])


def test_semantic_dedup_keep_policies(tables):
    emb = tables["embeddings"]
    far = semantic_dedup(emb, "vec_id", threshold=0.4, nlist=8, keep="farthest").collect()
    multi = far.groupby("cluster_id").filter(lambda g: len(g) > 1)
    assert len(multi) > 0, "synthetic corpus should contain duplicate groups"
    for cid, grp in multi.groupby("cluster_id"):
        canon = grp["canonical_id"].iloc[0]
        best = grp["centroid_sim"].min()
        winners = grp[grp["centroid_sim"] == best]["vec_id"]
        assert canon == winners.min()  # farthest from centroid, ties -> min id

    min_id = semantic_dedup(emb, "vec_id", threshold=0.4, nlist=8, keep="min_id").collect()
    for cid, grp in min_id.groupby("cluster_id"):
        if len(grp) > 1:
            assert grp["canonical_id"].iloc[0] == grp["vec_id"].min()


def test_semantic_dedup_deterministic_and_recall(tables):
    emb = tables["embeddings"]
    a = semantic_dedup(emb, "vec_id", threshold=0.4, nlist=8).collect()
    b = semantic_dedup(emb, "vec_id", threshold=0.4, nlist=8).collect()
    ka = dict(zip(a["vec_id"], a["canonical_id"]))
    kb = dict(zip(b["vec_id"], b["canonical_id"]))
    assert ka == kb
    # clustering recall: near-identical vectors should mostly share a cell,
    # so a healthy fraction of exact-dup docs actually get deduped
    eset = _exact_pairs(emb)
    edocs = {i for p in eset for i in p}
    n_removed = sum(1 for v, c in ka.items() if v != c)
    assert n_removed >= 0.3 * max(1, len(edocs) - len(eset))


def test_semantic_dedup_plan_is_equi_join(tables):
    plan = semantic_dedup(
        tables["embeddings"], "vec_id", threshold=0.4, nlist=8
    ).df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_input_guards(tables):
    """Empty frames degrade gracefully: no k-means/dim probes on nothing."""
    from tidierdb_jl_spark.llm.dedup import flag_contaminated_semantic

    empty = tables["embeddings"].filter("vec_id < 0")
    out = semantic_dedup(empty, "vec_id", threshold=0.4).collect()
    assert len(out) == 0
    assert {"cell", "centroid_sim", "cluster_id", "canonical_id"} <= set(out.columns)

    flagged = flag_contaminated_semantic(
        empty, tables["embeddings"].filter("vec_id < 10")
    ).collect()
    assert len(flagged) == 0
    assert {"is_contaminated", "matched_bench_id"} <= set(flagged.columns)

    # empty BENCH: everything is clean
    clean = flag_contaminated_semantic(tables["embeddings"], empty).collect()
    assert (~clean["is_contaminated"]).all()


def test_exact_cosine_zero_vectors_and_cap(spark, monkeypatch):
    """ADVICE r6: exact mode must (a) never emit pairs involving zero
    vectors — cosine is undefined, not 0.0, so even threshold <= 0 keeps
    them out — and (b) refuse driver-collect beyond EXACT_DRIVER_CAP with
    an error that points at method='lsh'."""
    import pytest

    from tidierdb_jl_spark import TidyFrame
    from tidierdb_jl_spark.llm import dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),        # exact dup of 1
        (3, [0.0, 0.0]),        # zero vector
        (4, [0.0, 0.0]),        # zero vector
        (5, [-1.0, 0.0]),       # anti-parallel to 1
    ]
    emb = TidyFrame(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    # threshold below zero would admit every defined pair — zero vectors
    # must still contribute none (neither (3,4) nor (3, anything))
    out = dedup.embedding_cosine_pairs(
        emb, "vec_id", threshold=-2.0, method="exact"
    ).collect()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert pairs == {(1, 2), (1, 5), (2, 5)}
    assert not any(3 in p or 4 in p for p in pairs)

    # the driver-collect cap raises a clear, actionable error
    monkeypatch.setattr(dedup, "EXACT_DRIVER_CAP", 3)
    with pytest.raises(ValueError, match="method='lsh'"):
        dedup.embedding_cosine_pairs(emb, "vec_id", method="exact")
