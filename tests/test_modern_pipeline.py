"""End-to-end modern training-data pipeline composition.

The full contemporary recipe, every stage from this repo, run as ONE
composed lazy plan over the synthetic corpus:

  HTML strip → Unicode normalize → heuristic gates → classifier gate →
  near-dup pairs → leakage-safe split → curriculum stages → FFD packing

Assertions check cross-stage invariants (the things that break when
stages disagree about ids or ordering), not any single op's math — the
per-op oracles already cover that.
"""

import pytest


@pytest.fixture(scope="module")
def pipeline_result(spark, tables):
    from tidierdb_jl_spark.llm.classifier import (
        quality_classifier_filter,
        train_quality_classifier,
    )
    from tidierdb_jl_spark.llm.dedup import minhash_dedup_pairs
    from tidierdb_jl_spark.llm.packing import pack_documents_ffd
    from tidierdb_jl_spark.llm.pipeline import leakage_safe_split, quality_filter
    from tidierdb_jl_spark.llm.mixing import curriculum_order
    from tidierdb_jl_spark.llm.scrub import normalize_text, strip_html

    docs = tables["documents"]
    # the corpus arrives as "web pages"
    web = docs.mutate(text="concat('<html><body><p>', text, '</p></body></html>')")

    cleaned = strip_html(web, "text")
    cleaned = normalize_text(cleaned, "text", lowercase=True)
    cleaned = quality_filter(cleaned, min_words=10)

    pos_pred = "array_contains(split(lower(trim(text)), '\\\\s+'), 'spark')"
    model = train_quality_classifier(
        cleaned.filter(pos_pred), cleaned.filter(f"NOT ({pos_pred})"),
        id_col="doc_id", dim=512, iters=500,
    )
    gated = quality_classifier_filter(cleaned, model, threshold=0.2)

    pairs = minhash_dedup_pairs(gated, "doc_id", threshold=0.5, verify="exact")
    split = leakage_safe_split(gated, pairs, "doc_id", train_frac=0.8)
    train = split.filter("split = 'train'")
    ordered = curriculum_order(train, "n_words", "doc_id", n_stages=3)
    packed = pack_documents_ffd(ordered, "doc_id", block_size=120)
    return {
        "cleaned": cleaned.collect(),
        "gated": gated.collect(),
        "pairs": pairs.collect(),
        "split": split.collect(),
        "ordered": ordered.collect(),
        "packed": packed.collect(),
        "n_input": docs.df.count(),
    }


def test_stage_monotonicity(pipeline_result):
    r = pipeline_result
    assert len(r["cleaned"]) <= r["n_input"]
    assert 0 < len(r["gated"]) <= len(r["cleaned"])
    assert len(r["split"]) == len(r["gated"])
    assert 0 < len(r["ordered"]) < len(r["split"])


def test_html_and_case_are_gone(pipeline_result):
    texts = pipeline_result["cleaned"]["text"]
    assert not texts.str.contains("<").any()
    assert (texts == texts.str.lower()).all()


def test_ids_consistent_across_stages(pipeline_result):
    r = pipeline_result
    gated_ids = set(r["gated"]["doc_id"])
    assert set(r["split"]["doc_id"]) == gated_ids
    train_ids = set(r["split"][r["split"]["split"] == "train"]["doc_id"])
    assert set(r["ordered"]["doc_id"]) == train_ids
    assert set(r["packed"]["doc_id"]) == train_ids


def test_no_leakage_across_split(pipeline_result):
    r = pipeline_result
    side = dict(zip(r["split"]["doc_id"], r["split"]["split"]))
    n_pairs = 0
    for a, b in zip(r["pairs"]["id_a"], r["pairs"]["id_b"]):
        if a in side and b in side:
            assert side[a] == side[b], f"near-dups ({a},{b}) straddle the split"
            n_pairs += 1
    assert n_pairs > 0, "synthetic corpus should contain near-dup pairs"


def test_packing_covers_train_exactly(pipeline_result):
    r = pipeline_result
    packed = r["packed"]
    assert packed["doc_id"].is_unique
    fills = packed.groupby(["shard", "bin_id"])["bin_fill"].first()
    over = packed[packed["bin_fill"] > 120]
    assert over.empty or over["oversize"].all()
    assert fills.sum() == packed["n_tokens"].sum()
