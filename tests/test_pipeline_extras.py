"""kfold_by_hash, corpus_report, flag_contaminated_semantic, BPE save/load."""

import numpy as np
import pytest

from tests.helpers import assert_matches_duckdb


def test_kfold_matches_duckdb_and_is_uniformish(tables, ddb):
    from tidierdb_jl_spark.llm.pipeline import kfold_by_hash

    out = kfold_by_hash(tables["documents"], "doc_id", k=5).select("doc_id", "fold")
    cuts = [format(int(i / 5 * 0xFFFFFFFF), "08x") for i in range(1, 5)]
    cases = " + ".join(
        f"CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '{c}' "
        "THEN 1 ELSE 0 END"
        for c in cuts
    )
    assert_matches_duckdb(
        out, ddb, f"SELECT doc_id, CAST({cases} AS INT) AS fold FROM documents"
    )
    pdf = out.collect()
    sizes = pdf.groupby("fold").size()
    assert set(pdf["fold"]) == {0, 1, 2, 3, 4}
    assert sizes.min() > 0.5 * sizes.max()  # rough uniformity at n=500

    with pytest.raises(ValueError):
        kfold_by_hash(tables["documents"], "doc_id", k=1)


def test_kfold_cluster_variant_keeps_pairs_together(tables):
    from tidierdb_jl_spark.llm.dedup import ngram_jaccard_pairs
    from tidierdb_jl_spark.llm.pipeline import kfold_by_hash

    docs = tables["documents"]
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3,
                                block_cols=("lang",))
    out = kfold_by_hash(docs, "doc_id", k=5, pairs_tf=pairs).collect()
    fold = dict(zip(out["doc_id"], out["fold"]))
    ppdf = pairs.collect()
    assert len(ppdf) > 0
    for a, b in zip(ppdf["id_a"], ppdf["id_b"]):
        assert fold[a] == fold[b]


def test_corpus_report_matches_recomputation(tables):
    from tidierdb_jl_spark.llm.pipeline import corpus_report

    docs = tables["documents"]
    rep = corpus_report(docs, lang_col="lang").collect()
    got = {(r.section, r.name): r.value for r in rep.itertuples()}
    pdf = docs.collect()
    n = len(pdf)
    assert got[("size", "n_docs")] == n
    words = pdf["text"].fillna("").str.strip().str.lower().str.split().map(len)
    assert got[("size", "total_words")] == words.sum()
    assert got[("size", "n_empty")] == (pdf["text"].fillna("").str.strip() == "").sum()
    # exact interpolated quantiles
    assert got[("length", "p50")] == pytest.approx(np.percentile(words, 50))
    assert got[("length", "p90")] == pytest.approx(np.percentile(words, 90))
    # lang counts partition the corpus
    langs = {k[1]: v for k, v in got.items() if k[0] == "lang"}
    assert sum(langs.values()) == n
    assert langs == pdf.groupby("lang").size().to_dict()
    # dup rate: fraction of docs whose normalized text repeats
    norm = pdf["text"].fillna("").str.replace(r"\s+", " ", regex=True).str.strip().str.lower()
    dup_rate = (n - norm.nunique()) / n
    assert got[("dup", "exact_dup_rate")] == pytest.approx(dup_rate)


def test_flag_contaminated_semantic_invariants(tables):
    from tidierdb_jl_spark.llm.dedup import flag_contaminated_semantic

    emb = tables["embeddings"]
    bench = emb.filter("vec_id < 50")
    out = flag_contaminated_semantic(emb, bench, threshold=0.4).collect()
    assert len(out) == emb.df.count()
    flagged = out[out["is_contaminated"]]
    # bench members are their own exact matches
    assert set(range(50)) <= set(flagged["vec_id"])
    assert (flagged[flagged["vec_id"] < 50]["matched_bench_id"]
            == flagged[flagged["vec_id"] < 50]["vec_id"]).all()
    # zero false positives: every flagged corpus doc really is >= threshold
    # close to its matched bench vector (exact cosine on float64)
    vecs = dict(zip(out["vec_id"], out["embedding"]))
    for r in flagged.itertuples():
        a = np.asarray(vecs[r.vec_id], dtype=np.float64)
        b = np.asarray(vecs[r.matched_bench_id], dtype=np.float64)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.4 - 1e-9
    # clean rows carry NULL match ids
    assert out[~out["is_contaminated"]]["matched_bench_id"].isna().all()


def test_bpe_save_load_roundtrip(tables, tmp_path):
    from tidierdb_jl_spark.llm.bpe import bpe_encode, bpe_load, bpe_save, bpe_train

    docs = tables["documents"]
    model = bpe_train(docs, num_merges=40)
    p = tmp_path / "tok.json"
    bpe_save(model, str(p))
    loaded = bpe_load(str(p))
    assert loaded == model
    a = bpe_encode(docs.head(20), model).collect()
    b = bpe_encode(docs.head(20), loaded).collect()
    assert list(map(list, a["bpe_tokens"])) == list(map(list, b["bpe_tokens"]))


def test_prepare_training_corpus_modern_options(tables):
    """The optional modern stages compose without changing the classic
    default path: classifier gate shrinks the corpus, sampling shrinks it
    further, and leakage_safe keeps pair-mates on one side."""
    from tidierdb_jl_spark.llm.classifier import train_quality_classifier
    from tidierdb_jl_spark.llm.pipeline import prepare_training_corpus

    docs, emb = tables["documents"], tables["embeddings"]
    classic = prepare_training_corpus(docs, emb, cosine_threshold=0.45)
    base_n = classic.df.count()
    assert base_n > 0

    pos = "array_contains(split(lower(trim(text)), '\\\\s+'), 'spark')"
    model = train_quality_classifier(
        docs.filter(pos), docs.filter(f"NOT ({pos})"), id_col="doc_id", dim=512,
        iters=500,
    )
    modern = prepare_training_corpus(
        docs, emb, cosine_threshold=0.45,
        classifier_model=model, classifier_threshold=0.2,
        sample_frac=0.8, leakage_safe=True,
    )
    pdf = modern.collect()
    assert 0 < len(pdf) <= base_n
    assert {"cluster_id", "split"} <= set(pdf.columns)
    # cluster members share a side by construction
    for cid, grp in pdf.groupby("cluster_id"):
        assert grp["split"].nunique() == 1
