"""Incremental corpus preparation over persistent state
(llm/corpusstate.py).

Beyond-reference composition (the reference has no pipeline or state
surface), so correctness is differential: batch outcomes are recomputed
independently — per-row gates from the in-repo cleaned one-shot result
(gates commute with batching), cross-batch dedup by first-wins replay
in pandas, and the split from the documented md5 rule.
"""

import hashlib
import os
import re

import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.llm.corpusstate import CorpusPrepState
from tidierdb_jl_spark.llm.pipeline import clean_corpus


def _docs(tables, lo, hi):
    return tables["documents"].filter(
        f"doc_id >= {lo} AND doc_id < {hi}"
    ).select("doc_id", "text")


def _fp(text: str) -> str:
    return hashlib.md5(
        re.sub(r"\s+", " ", text).strip().lower().encode()
    ).hexdigest()


def _split(doc_id, frac=0.9) -> str:
    thr = format(int(frac * 0xFFFFFFFF), "08x")
    return "train" if hashlib.md5(str(doc_id).encode()).hexdigest()[:8] < thr \
        else "test"


def test_corpusstate_replay_matches_oneshot_semantics(spark, tables, tmp_path):
    """Three overlapping batches vs an independent replay: per-row gates
    from the one-shot clean_corpus (restricted per batch), first-wins
    exact dedup in pandas, md5 split."""
    st = CorpusPrepState.create(spark, str(tmp_path / "cp"), min_words=20,
                                expected_items=20_000, n_buckets=8)
    # the gate/lang reference: one-shot cleaning WITHOUT dedup
    ref = clean_corpus(
        tables["documents"].select("doc_id", "text"),
        lang="en", dedup=False, min_words=20,
    ).select("doc_id", "text", "n_words", "lang_pred").collect()
    ref = ref.set_index("doc_id")

    seen_fps: set = set()
    for lo, hi in [(0, 200), (120, 360), (300, 600)]:
        got = st.ingest(_docs(tables, lo, hi)).collect().sort_values("doc_id")
        surv = ref[(ref.index >= lo) & (ref.index < hi)].sort_index()
        want_rows = []
        batch_fps = []
        for did, row in surv.iterrows():
            fp = _fp(row["text"])
            if fp in seen_fps or fp in batch_fps:
                continue
            batch_fps.append(fp)
            want_rows.append((did, row["n_words"], row["lang_pred"], _split(did)))
        seen_fps |= set(batch_fps)
        assert list(
            got[["doc_id", "n_words", "lang_pred", "split"]].itertuples(
                index=False, name=None
            )
        ) == want_rows, (lo, hi)
    s = st.stats()
    assert s["n_batches"] == 3
    assert s["n_kept"] == len(seen_fps)
    assert s["exact"]["n_fingerprints"] == len(seen_fps)


def test_corpusstate_reopen_freezes_config(spark, tables, tmp_path):
    """open() must reapply the create-time gates — an operator cannot
    silently ingest with different thresholds."""
    path = str(tmp_path / "cp")
    st = CorpusPrepState.create(spark, path, min_words=40, train_frac=0.5,
                            expected_items=20_000, n_buckets=8)
    a = st.ingest(_docs(tables, 0, 100)).collect()
    st2 = CorpusPrepState.open(spark, path)
    assert st2._meta["gates"] == {"min_words": 40}
    assert st2._meta["train_frac"] == 0.5
    b = st2.ingest(_docs(tables, 0, 100)).collect()
    assert len(b) == 0  # everything already seen
    # all survivors obeyed the frozen gate
    assert (a["n_words"] >= 40).all()
    assert set(a["split"]) <= {"train", "test"}
    with pytest.raises(ValueError, match="already exists"):
        CorpusPrepState.create(spark, path)


def test_corpusstate_neardup_gate(spark, tables, tmp_path):
    """With neardup=True an exact-text copy under a DIFFERENT id (so the
    exact fingerprint differs only if text differs — here we perturb
    whitespace so the exact gate misses it) is dropped by the minhash
    gate on a later batch."""
    st = CorpusPrepState.create(
        spark, str(tmp_path / "cp"), neardup=True, neardup_threshold=0.9,
        min_words=5, expected_items=20_000, n_buckets=8,
    )
    b1 = st.ingest(_docs(tables, 0, 50))
    kept1 = set(b1.collect()["doc_id"])
    assert kept1
    # batch 2: the same docs renumbered, with a token appended so the
    # exact fingerprint changes but the shingle set barely moves
    twins = (
        _docs(tables, 0, 50)
        .mutate(doc_id="doc_id + 100000", text="concat(text, ' ')")
    )
    got2 = st.ingest(twins).collect()
    # every twin of a kept doc is near-dup-dropped (identical shingles)
    assert set(got2["doc_id"]).isdisjoint({d + 100000 for d in kept1})


def test_corpusstate_embdedup_gate(spark, tables, tmp_path):
    """Exact-copy vectors under new ids are dropped by the embedding
    gate; docs without vectors pass it."""
    st = CorpusPrepState.create(
        spark, str(tmp_path / "cp"), embdedup=True, cosine_threshold=0.99,
        min_words=5, expected_items=20_000, n_buckets=8,
    )
    emb = tables["embeddings"].select("vec_id", "embedding")
    b1 = st.ingest(_docs(tables, 0, 80), embeddings=emb)
    kept1 = set(b1.collect()["doc_id"])
    # batch 2: new ids 100000+i carrying the SAME text-distinct docs but
    # identical vectors to batch-1 keepers -> embedding near-dups
    twins = (
        _docs(tables, 0, 80)
        .mutate(doc_id="doc_id + 100000",
                text="concat(text, ' unique suffix ', CAST(doc_id AS STRING))")
    )
    twin_emb = emb.filter("vec_id < 80").mutate(vec_id="vec_id + 100000")
    got2 = st.ingest(twins, embeddings=twin_emb).collect()
    assert set(got2["doc_id"]).isdisjoint({d + 100000 for d in kept1})
    with pytest.raises(ValueError, match="embdedup"):
        st.ingest(_docs(tables, 200, 210))


def test_corpusstate_stream_ingest(spark, tables, tmp_path):
    """Streaming corpus prep: two overlapping crawl shards arrive as
    separate micro-batches; the accreted output must equal the
    sequential batch ingest over the same windows (cleaning + exact
    cross-batch dedup + split), with fingerprints carried for
    downstream at-least-once re-dedup."""
    from tidierdb_jl_spark.streaming.stream import read_stream

    src = str(tmp_path / "src")
    _docs(tables, 0, 150).df.coalesce(1).write.parquet(src)
    _docs(tables, 100, 300).df.coalesce(1).write.mode("append").parquet(src)

    st = CorpusPrepState.create(spark, str(tmp_path / "cp"), min_words=20,
                                expected_items=20_000, n_buckets=8)
    stream = read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1")
    out = str(tmp_path / "out")
    q = st.stream_ingest(
        stream, out, str(tmp_path / "ck"), trigger="availableNow"
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas().sort_values("doc_id")

    ref = CorpusPrepState.create(spark, str(tmp_path / "cp2"), min_words=20,
                                 expected_items=20_000, n_buckets=8)
    import pandas as pd

    want = pd.concat([
        ref.ingest(_docs(tables, 0, 150)).collect(),
        ref.ingest(_docs(tables, 100, 300)).collect(),
    ]).sort_values("doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got[["n_words", "lang_pred", "split"]].values.tolist() == \
        want[["n_words", "lang_pred", "split"]].values.tolist()
    assert got["fingerprint"].notna().all()
    # embdedup states refuse the stream path (the stream has no vectors)
    eb = CorpusPrepState.create(spark, str(tmp_path / "cp3"), embdedup=True,
                                expected_items=20_000, n_buckets=8)
    with pytest.raises(ValueError, match="embdedup=False"):
        eb.stream_ingest(stream, out, str(tmp_path / "ck3"))


def test_corpusstate_stream_ingest_neardup(spark, tables, tmp_path):
    """The near-dup gate works in streaming too (check/record split):
    two micro-batches where batch 2 carries whitespace-perturbed twins
    of batch 1 — the twins must be near-dup-dropped, and the accreted
    output must equal the sequential batch ingest."""
    from tidierdb_jl_spark.streaming.stream import read_stream

    src = str(tmp_path / "src")
    _docs(tables, 0, 120).df.coalesce(1).write.parquet(src)
    twins = (
        _docs(tables, 0, 120)
        .mutate(doc_id="doc_id + 100000", text="concat(text, ' ')")
    )
    twins.df.coalesce(1).write.mode("append").parquet(src)

    kw = dict(neardup=True, neardup_threshold=0.9, min_words=5,
              expected_items=20_000, n_buckets=8)
    st = CorpusPrepState.create(spark, str(tmp_path / "cpn"), **kw)
    stream = read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1")
    out = str(tmp_path / "outn")
    q = st.stream_ingest(
        stream, out, str(tmp_path / "ckn"), trigger="availableNow"
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).toPandas().sort_values("doc_id")

    ref = CorpusPrepState.create(spark, str(tmp_path / "cpn2"), **kw)
    import pandas as pd

    want = pd.concat([
        ref.ingest(_docs(tables, 0, 120)).collect(),
        ref.ingest(twins).collect(),
    ]).sort_values("doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got[["n_words", "lang_pred", "split"]].values.tolist() == \
        want[["n_words", "lang_pred", "split"]].values.tolist()
    # every kept batch-1 doc's twin was near-dup-dropped
    kept1 = {d for d in got["doc_id"] if d < 100000}
    assert set(got["doc_id"]).isdisjoint({d + 100000 for d in kept1})


def test_corpusstate_split_stability(spark, tables, tmp_path):
    """A document's split never changes across batches/states."""
    st1 = CorpusPrepState.create(spark, str(tmp_path / "a"), min_words=5,
                             expected_items=20_000, n_buckets=8)
    st2 = CorpusPrepState.create(spark, str(tmp_path / "b"), min_words=5,
                             expected_items=20_000, n_buckets=8)
    one = st1.ingest(_docs(tables, 0, 300)).collect()
    p1 = st2.ingest(_docs(tables, 0, 150)).collect()
    p2 = st2.ingest(_docs(tables, 150, 300)).collect()
    import pandas as pd

    both = pd.concat([p1, p2]).sort_values("doc_id").reset_index(drop=True)
    one = one.sort_values("doc_id").reset_index(drop=True)
    assert one.equals(both)


def test_stream_crash_between_output_and_append_replays_at_least_once(
    spark, tables, tmp_path
):
    """Failure injection for the documented stream_ingest crash window
    (exact gate only): kill the micro-batch AFTER the output parquet
    append but BEFORE the exact-state append, restart the stream on the
    SAME checkpoint, and verify the at-least-once contract — nothing
    dropped, duplicates exactly the crashed batch's keepers, each
    duplicated at most once (one replay)."""
    from tidierdb_jl_spark.streaming.stream import read_stream

    src = str(tmp_path / "src")
    _docs(tables, 0, 150).df.coalesce(1).write.parquet(src)
    _docs(tables, 100, 300).df.coalesce(1).write.mode("append").parquet(src)

    kw = dict(min_words=20, expected_items=20_000, n_buckets=8)
    st = CorpusPrepState.create(spark, str(tmp_path / "cp"), **kw)
    ex, _, _ = st._states()
    real_append = ex.append
    calls = {"n": 0}

    def bomb(df):
        calls["n"] += 1
        if calls["n"] == 2:  # second micro-batch: output already written
            raise RuntimeError("injected crash: output written, append not")
        return real_append(df)

    ex.append = bomb
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = st.stream_ingest(
        read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1"),
        out, ck, trigger="availableNow",
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
    assert calls["n"] == 2

    # restart on the same checkpoint: the uncommitted batch replays
    ex.append = real_append
    q2 = st.stream_ingest(
        read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1"),
        out, ck, trigger="availableNow",
    )
    q2.awaitTermination(120)

    ref = CorpusPrepState.create(spark, str(tmp_path / "cp2"), **kw)
    want1 = ref.ingest(_docs(tables, 0, 150)).collect()
    want2 = ref.ingest(_docs(tables, 100, 300)).collect()
    got = spark.read.parquet(out).toPandas()

    want_ids = sorted(want1["doc_id"].tolist() + want2["doc_id"].tolist())
    assert sorted(set(got["doc_id"])) == want_ids  # nothing dropped
    counts = got["doc_id"].value_counts()
    dup_ids = set(counts[counts > 1].index)
    # duplicates are exactly the crashed batch's keepers, each once more
    assert dup_ids == set(want2["doc_id"])
    assert (counts[list(dup_ids)] == 2).all()
    # downstream exactly-once recovery is one dedup on the carried key
    assert len(got.drop_duplicates("doc_id")) == len(want_ids)


def test_stream_crash_after_near_record_does_not_duplicate(
    spark, tables, tmp_path
):
    """Failure injection for the near-dup crash window: kill AFTER the
    near-state record but BEFORE the exact append.  On restart the
    replayed batch must self-match its own recorded bands and be
    dropped — zero duplicate output rows, nothing missing (the
    docstring's rationale for ordering NEAR before EXACT)."""
    from tidierdb_jl_spark.streaming.stream import read_stream

    src = str(tmp_path / "src")
    _docs(tables, 0, 150).df.coalesce(1).write.parquet(src)
    _docs(tables, 100, 300).df.coalesce(1).write.mode("append").parquet(src)

    kw = dict(neardup=True, neardup_threshold=0.9, min_words=20,
              expected_items=20_000, n_buckets=8)
    st = CorpusPrepState.create(spark, str(tmp_path / "cpn"), **kw)
    ex, _, _ = st._states()
    real_append = ex.append
    calls = {"n": 0}

    def bomb(df):
        calls["n"] += 1
        if calls["n"] == 2:  # near bands recorded, exact append killed
            raise RuntimeError("injected crash: near recorded, exact not")
        return real_append(df)

    ex.append = bomb
    out, ck = str(tmp_path / "outn"), str(tmp_path / "ckn")
    q = st.stream_ingest(
        read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1"),
        out, ck, trigger="availableNow",
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)

    ex.append = real_append
    q2 = st.stream_ingest(
        read_stream(spark, src, fmt="parquet", maxFilesPerTrigger="1"),
        out, ck, trigger="availableNow",
    )
    q2.awaitTermination(120)

    ref = CorpusPrepState.create(spark, str(tmp_path / "cpn2"), **kw)
    import pandas as pd

    want = pd.concat([
        ref.ingest(_docs(tables, 0, 150)).collect(),
        ref.ingest(_docs(tables, 100, 300)).collect(),
    ])
    got = spark.read.parquet(out).toPandas()
    # self-match on replay: zero duplicates AND zero drops
    assert not got["doc_id"].duplicated().any()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
