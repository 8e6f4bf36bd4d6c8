"""Large-vs-large kNN join (llm/simsearch.py:ivf_knn_join).

Beyond-reference surface; correctness is differential: the full-probe
join must EQUAL a float64 numpy brute-force kNN recomputation, and the
pruned probe keeps a recall floor against it.
"""

import numpy as np

from tidierdb_jl_spark.llm.simsearch import ivf_knn_join


def _emb(tables, lo, hi):
    return tables["embeddings"].filter(
        f"vec_id >= {lo} AND vec_id < {hi}"
    ).select("vec_id", "embedding")


def _brute(left_pdf, right_pdf, k, exclude_self=True):
    R = np.stack(right_pdf["embedding"].to_numpy()).astype(np.float64)
    Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    rids = right_pdf["vec_id"].to_numpy()
    out = {}
    for qid, qv in zip(left_pdf["vec_id"], left_pdf["embedding"]):
        q = np.asarray(qv, dtype=np.float64)
        sims = Rn @ (q / np.linalg.norm(q))
        order = sorted(range(len(rids)), key=lambda i: (-sims[i], rids[i]))
        ids = [rids[i] for i in order if not (exclude_self and rids[i] == qid)]
        out[qid] = ids[:k]
    return out


def test_knn_join_full_probe_is_exact(spark, tables):
    """nprobe >= nlist degrades to the brute-force kNN join for EVERY
    left row — including left rows absent from right."""
    left, right = _emb(tables, 0, 120), _emb(tables, 100, 400)
    got = ivf_knn_join(left, right, k=5, nlist=8, nprobe=8).collect()
    want = _brute(left.collect(), right.collect(), k=5)
    assert set(got["query_id"]) == set(want)  # every left row answered
    for qid, grp in got.groupby("query_id"):
        ids = grp.sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        )["vec_id"].tolist()
        assert ids == want[qid], qid


def test_knn_join_pruned_recall_floor(spark, tables):
    left, right = _emb(tables, 0, 50), _emb(tables, 0, 400)
    got = ivf_knn_join(left, right, k=10, nlist=8, nprobe=3).collect()
    want = _brute(left.collect(), right.collect(), k=10)
    recalls = []
    for qid, grp in got.groupby("query_id"):
        recalls.append(len(set(grp["vec_id"]) & set(want[qid])) / 10)
    assert sum(recalls) / len(recalls) >= 0.7
    # every left row answered with exactly k rows
    assert (got.groupby("query_id").size() == 10).all()


def test_knn_join_plan_is_equijoin(spark, tables):
    """The scale claim: candidate generation is an EQUI-join on the cell
    id — never a cartesian/nested-loop product, and neither side is
    collected to the driver (only the bounded centroid-training sample
    is)."""
    left, right = _emb(tables, 0, 200), _emb(tables, 0, 400)
    out = ivf_knn_join(left, right, k=5, nlist=8, nprobe=2)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_assignment_udf_evaluated_once_per_side(spark, tables):
    """Guide §4.4 regression pin: the cell equi-join infers an
    isnotnull(__cell) filter; with the cell computed via [0]-indexing,
    predicate pushdown copied that filter BELOW the projection and the
    assignment UDF ran twice over the whole corpus.  The explode_outer
    form keeps exactly one ArrowEvalPython per side."""
    from tidierdb_jl_spark.llm.simsearch import ivf_cosine_topk

    left, right = _emb(tables, 0, 50), _emb(tables, 0, 400)
    for out in (
        ivf_knn_join(left, right, k=5, nlist=8, nprobe=2),
        ivf_cosine_topk(right, left, k=5, nlist=8, nprobe=2),
    ):
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 2, plan
