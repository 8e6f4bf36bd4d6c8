"""Persistent IVF vector index (llm/vectorindex.py): add-once,
query-many ANN with partition-pruned probes.

The reference (TidierDB.jl) has no vector-index surface; this is
beyond-reference state, so correctness is differential: every query
outcome is recomputed independently in numpy (float64 unit-dot, the same
math) over the same inputs, and the full-probe case must EQUAL the
brute-force scan.
"""

import glob
import os

import numpy as np
import pytest

from tidierdb_jl_spark.llm.vectorindex import VectorIndexState


def _emb_batch(tables, lo, hi):
    return tables["embeddings"].filter(
        f"vec_id >= {lo} AND vec_id < {hi}"
    ).select("vec_id", "embedding")


def _brute_topk(corpus_pdf, query_pdf, k, exclude_self=True):
    """Independent recomputation: float64 unit vectors, cosine = dot,
    ties by vec_id ascending."""
    C = np.stack(corpus_pdf["embedding"].to_numpy()).astype(np.float64)
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    cids = corpus_pdf["vec_id"].to_numpy()
    out = {}
    for qid, qv in zip(query_pdf["vec_id"], query_pdf["embedding"]):
        q = np.asarray(qv, dtype=np.float64)
        q = q / np.linalg.norm(q)
        sims = C @ q
        order = sorted(range(len(cids)), key=lambda i: (-sims[i], cids[i]))
        ids = [cids[i] for i in order if not (exclude_self and cids[i] == qid)]
        out[qid] = ids[:k]
    return out


def test_vectorindex_full_probe_is_exact(spark, tables, tmp_path):
    """nprobe >= nlist probes every cell -> EXACTLY the brute-force
    ranking (the recall knob degrades to the oracle, not past it)."""
    st = VectorIndexState.create(spark, str(tmp_path / "ix"), nlist=8)
    st.add(_emb_batch(tables, 0, 300))
    queries = _emb_batch(tables, 0, 5)
    got = st.query(queries, k=10, nprobe=8).collect()
    want = _brute_topk(
        _emb_batch(tables, 0, 300).collect(), queries.collect(), k=10
    )
    for qid, grp in got.groupby("query_id"):
        ids = grp.sort_values("cosine", ascending=False)["vec_id"].tolist()
        assert ids == want[qid], qid


def test_vectorindex_multi_batch_equals_single_batch(spark, tables, tmp_path):
    """Three appends then full-probe query == one append then query:
    cell assignment is frozen at first-batch training, and the full
    probe reads everything, so batching cannot change the answer."""
    one = VectorIndexState.create(spark, str(tmp_path / "one"), nlist=8)
    one.add(_emb_batch(tables, 0, 100))  # same first batch -> same centroids
    one.add(_emb_batch(tables, 100, 300))
    many = VectorIndexState.create(spark, str(tmp_path / "many"), nlist=8)
    many.add(_emb_batch(tables, 0, 100))
    many.add(_emb_batch(tables, 100, 200))
    many.add(_emb_batch(tables, 200, 300))
    q = _emb_batch(tables, 0, 4)
    a = one.query(q, k=10, nprobe=8).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    b = many.query(q, k=10, nprobe=8).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert np.allclose(a["cosine"], b["cosine"])


def test_vectorindex_recall_floor_and_pruning(spark, tables, tmp_path):
    """The scale claim, measured: a small-nprobe query reads only the
    probed cell partitions (files-read from the SQL status store), and
    still recalls >= half of the exact top-10."""
    from tidierdb_jl_spark.plans.metrics import run_with_scan_metrics

    st = VectorIndexState.create(spark, str(tmp_path / "ix"), nlist=8)
    st.add(_emb_batch(tables, 0, 400))
    n_dirs = len(glob.glob(os.path.join(st.path, "vecs", "cell=*")))
    assert n_dirs >= 4  # the index genuinely spans many cells

    queries = _emb_batch(tables, 0, 3)
    out = st.query(queries, k=10, nprobe=2)
    rows, scans = run_with_scan_metrics(out, action="collect")
    want = _brute_topk(
        _emb_batch(tables, 0, 400).collect(), queries.collect(), k=10
    )
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    for qid, ids in got.items():
        assert len(set(ids) & set(want[qid])) >= 5, qid
    # 3 queries x 2 probes -> at most 6 distinct cells scanned
    pruned = [s for s in scans if (s["partitions"] or 0) > 0]
    assert pruned, scans
    assert max(s["partitions"] for s in pruned) <= 6, scans


def test_vectorindex_reopen_and_errors(spark, tables, tmp_path):
    path = str(tmp_path / "ix")
    st = VectorIndexState.create(spark, path, nlist=4)
    with pytest.raises(ValueError, match="empty"):
        st.query(_emb_batch(tables, 0, 2))
    st.add(_emb_batch(tables, 0, 200))
    with pytest.raises(ValueError, match="already exists"):
        VectorIndexState.create(spark, path)
    st2 = VectorIndexState.open(spark, path)
    assert st2.stats() == st.stats()
    assert st2.stats()["n_vecs"] == 200
    a = st.query(_emb_batch(tables, 0, 3), k=5, nprobe=4).collect()
    b = st2.query(_emb_batch(tables, 0, 3), k=5, nprobe=4).collect()
    assert sorted(map(tuple, a[["query_id", "vec_id"]].values.tolist())) == sorted(
        map(tuple, b[["query_id", "vec_id"]].values.tolist())
    )
    bad = _emb_batch(tables, 0, 5).mutate(embedding="slice(embedding, 1, 4)")
    with pytest.raises(ValueError, match="dim"):
        st2.add(bad)


def test_vectorindex_knn_join_full_probe_is_exact(spark, tables, tmp_path):
    """knn_join with nprobe=nlist equals the brute-force kNN join for
    every left row, including left rows not in the index; the pruned
    path keeps a recall floor and answers every left row with k rows."""
    st = VectorIndexState.create(spark, str(tmp_path / "ix"), nlist=8)
    st.add(_emb_batch(tables, 100, 400))
    left = _emb_batch(tables, 0, 150)
    got = st.knn_join(left, k=5, nprobe=8).collect()
    want = _brute_topk(
        _emb_batch(tables, 100, 400).collect(), left.collect(), k=5
    )
    assert set(got["query_id"]) == set(want)
    for qid, grp in got.groupby("query_id"):
        ids = grp.sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        )["vec_id"].tolist()
        assert ids == want[qid], qid
    pruned = st.knn_join(left, k=5, nprobe=3).collect()
    assert (pruned.groupby("query_id").size() == 5).all()
    recalls = [
        len(set(grp["vec_id"]) & set(want[qid])) / 5
        for qid, grp in pruned.groupby("query_id")
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_vectorindex_stream_add(spark, tables, tmp_path):
    """Embedding shards arriving as micro-batches build the same index
    as sequential batch adds: same stats, and full-probe queries return
    identical neighbors."""
    from tidierdb_jl_spark.streaming.stream import read_stream

    src = str(tmp_path / "src")
    _emb_batch(tables, 0, 150).df.coalesce(1).write.parquet(src)
    _emb_batch(tables, 150, 300).df.coalesce(1).write.mode("append").parquet(src)

    st = VectorIndexState.create(spark, str(tmp_path / "ix"), nlist=8)
    stream = read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1")
    q = st.stream_add(stream, str(tmp_path / "ck"), trigger="availableNow")
    q.awaitTermination(120)
    assert st.stats()["n_vecs"] == 300
    assert st.stats()["n_appends"] == 2

    ref = VectorIndexState.create(spark, str(tmp_path / "ref"), nlist=8)
    ref.add(_emb_batch(tables, 0, 150))
    ref.add(_emb_batch(tables, 150, 300))
    qs = _emb_batch(tables, 0, 4)
    a = st.query(qs, k=8, nprobe=8).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    b = ref.query(qs, k=8, nprobe=8).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_vectorindex_compact_preserves_results(spark, tables, tmp_path):
    st = VectorIndexState.create(spark, str(tmp_path / "ix"), nlist=4)
    for lo in range(0, 200, 40):  # several small appends -> many files
        st.add(_emb_batch(tables, lo, lo + 40))
    q = _emb_batch(tables, 0, 3)
    before = st.query(q, k=8, nprobe=4).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    files_before = len(glob.glob(os.path.join(st.path, "vecs", "*", "*.parquet")))
    st.compact()
    after = st.query(q, k=8, nprobe=4).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    files_after = len(glob.glob(os.path.join(st.path, "vecs", "*", "*.parquet")))
    assert before["vec_id"].tolist() == after["vec_id"].tolist()
    assert np.allclose(before["cosine"], after["cosine"])
    assert files_after < files_before


def test_compact_removes_replay_duplicates(spark, tables, tmp_path):
    """A replayed stream batch leaves exact duplicate (vec_id, unit)
    rows; compact() rewrites them out — the documented stream_add crash
    remedy — while a genuine id collision (same vec_id, DIFFERENT
    vector) is caller data and survives."""
    import pandas as pd

    st = VectorIndexState.create(spark, str(tmp_path / "ix"), nlist=4)
    st.add(_emb_batch(tables, 0, 120))
    st.add(_emb_batch(tables, 40, 80))  # simulate a replayed micro-batch
    dim = len(_emb_batch(tables, 0, 1).collect()["embedding"][0])
    collide = spark.createDataFrame(
        pd.DataFrame({"vec_id": [7, 7],
                      "embedding": [[1.0] * dim, [-1.0] * dim]})
    )
    from tidierdb_jl_spark.core import TidyFrame

    st.add(TidyFrame(collide))
    assert spark.read.parquet(st._vecs_path()).count() == 162  # 120+40+2
    st.compact()
    deduped = spark.read.parquet(st._vecs_path())
    assert deduped.count() == 122  # replays gone, collision rows kept
    assert deduped.filter("vec_id = 7").count() == 3  # 1 original + 2
    # post-compact full probe returns each REPLAYED neighbor once (the
    # id-colliding vec_id 7 may legitimately appear per distinct vector)
    got = st.query(_emb_batch(tables, 0, 3), k=6, nprobe=4).collect()
    reps = got[got["vec_id"] != 7]
    assert not reps.duplicated(["query_id", "vec_id"]).any()


def test_retrain_grows_cells_and_preserves_exactness(spark, tables, tmp_path):
    """retrain() re-clusters the CURRENT corpus: nlist can grow, the
    full-probe result is EXACTLY the pre-retrain full-probe (same
    vectors, brute-force-equal), the layout flip is atomic-by-meta
    (old dir gone, versioned dir live), and orphan layout dirs from a
    simulated crash are ignored by readers."""
    import os

    from tidierdb_jl_spark.llm.vectorindex import VectorIndexState

    emb = tables["embeddings"].select("vec_id", "embedding")
    path = str(tmp_path / "ivf")
    ix = VectorIndexState.create(spark, path, nlist=4, sample_cap=512)
    ix.add(emb.filter("vec_id < 200"))
    ix.add(emb.filter("vec_id >= 200 AND vec_id < 500"))
    q = emb.filter("vec_id < 8")
    before = ix.query(q, k=5, nprobe=999).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)

    stats = ix.retrain(nlist=16)
    assert stats["nlist"] == 16 and stats["n_cells"] == 16
    assert stats["n_vecs"] == 500
    after = ix.query(q, k=5, nprobe=999).collect().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    assert before.equals(after)

    # layout flipped: versioned dir live, original gone
    assert ix._meta["data_dir"].startswith("vecs_e")
    assert os.path.isdir(os.path.join(path, ix._meta["data_dir"]))
    assert not os.path.isdir(os.path.join(path, "vecs"))

    # reopen sees the committed layout; adds keep working post-retrain
    ix2 = VectorIndexState.open(spark, path)
    ix2.add(emb.filter("vec_id < 100").mutate(vec_id="vec_id + 100000"))
    assert ix2.stats()["n_vecs"] == 600

    # a crash-orphan layout dir (written but never committed to meta)
    # must be invisible to readers
    os.makedirs(os.path.join(path, "vecs_e99"))
    got = VectorIndexState.open(spark, path).query(q, k=5, nprobe=999)
    assert got.df.count() == 8 * 5

    # pruned probes after retrain: per-probe candidate pool shrank
    # (16 cells vs 4), recall floor vs brute force holds on this data
    brute = {
        (r[0], r[1])
        for r in ix2.query(q, k=5, nprobe=999).df.select(
            "query_id", "vec_id").collect()
    }
    pruned = {
        (r[0], r[1])
        for r in ix2.query(q, k=5, nprobe=8).df.select(
            "query_id", "vec_id").collect()
    }
    assert len(pruned & brute) / len(brute) >= 0.8


def test_drift_stat_triggers_retrain_and_recovers(spark, tables, tmp_path):
    """The r10 retrain trigger: stats()['drift'] — the EWMA of per-add
    mean distance-to-assigned-centroid relative to the training epoch's
    own value, maintained O(1) per add from the same job as the append —
    stays ~0 for on-distribution ingest, crosses DRIFT_RETRAIN_THRESHOLD
    under a drifted stream, and resets to ~0 after retrain() while the
    drifted queries' pruned recall recovers.

    Synthetic fixture (deterministic, no RNG): 8 tight clusters on axes
    0-7 of a 16-dim space (sin-based jitter, loose enough that the
    in-sample/out-of-sample fit gap stays inside the noise band); the
    drifted stream
    lives on axes 8-15, which the batch-0 centroids never saw — the
    unambiguous version of the sf1 drift bench's component-reversal."""
    from tidierdb_jl_spark.llm.vectorindex import DRIFT_RETRAIN_THRESHOLD

    def clustered(lo, hi, axis_off, id_off=0):
        return tables["embeddings"].df.sparkSession.range(lo, hi).selectExpr(
            f"id + {id_off} AS vec_id",
            "transform(sequence(0, 15), j -> "
            f" CAST(IF(j = {axis_off} + id % 8, 1.0,"
            "       0.25 * sin(CAST(id * (j + 3) AS DOUBLE))) AS DOUBLE)"
            ") AS embedding",
        )

    from tidierdb_jl_spark.core import TidyFrame

    ix = VectorIndexState.create(spark, str(tmp_path / "ix"), nlist=8)
    ix.add(TidyFrame(clustered(0, 400, 0)))
    s0 = ix.stats()
    assert s0["baseline_dist"] is not None and abs(s0["drift"]) < 1e-9

    # same-distribution adds hold the stat inside the measured noise band
    ix.add(TidyFrame(clustered(400, 700, 0)))
    assert abs(ix.stats()["drift"]) < DRIFT_RETRAIN_THRESHOLD / 2

    # drifted stream: clusters on axes 8-15 under fresh ids
    crossed = []
    for lo in (0, 200, 400):
        ix.add(TidyFrame(clustered(lo, lo + 200, 8, id_off=1_000_000)))
        crossed.append(ix.stats()["drift"])
    assert crossed[0] > DRIFT_RETRAIN_THRESHOLD, (
        f"drift should cross on the FIRST drifted add: {crossed}")

    # drifted queries against the stale centroids: record pruned recall
    q_drift = TidyFrame(clustered(0, 40, 8, id_off=1_000_000))

    def pruned_recall(nprobe=2, k=10):
        exact = {}
        for r in ix.query(q_drift, k=k, nprobe=10**9).df.select(
                "query_id", "vec_id").collect():
            exact.setdefault(r[0], set()).add(r[1])
        got = {}
        for r in ix.query(q_drift, k=k, nprobe=nprobe).df.select(
                "query_id", "vec_id").collect():
            got.setdefault(r[0], set()).add(r[1])
        return sum(len(got.get(q, set()) & exact[q]) / max(1, len(exact[q]))
                   for q in exact) / len(exact)

    before = pruned_recall()
    # grow nlist with the corpus (the documented retrain guidance): the
    # merged corpus now spans 16 cluster directions
    ix.retrain(nlist=16)
    s2 = ix.stats()
    assert abs(s2["drift"]) < 1e-9  # baseline reset to the new epoch
    after = pruned_recall()
    assert after >= before - 1e-9 and after >= 0.5, (before, after)
    # and the stat keeps working post-retrain: the formerly-drifted
    # distribution is now ON-distribution (the new centroids trained on
    # the full corpus including it), so another drifted-axes add reads
    # below the trigger
    ix.add(TidyFrame(clustered(600, 800, 8, id_off=1_000_000)))
    assert ix.stats()["drift"] < DRIFT_RETRAIN_THRESHOLD
