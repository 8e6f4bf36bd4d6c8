"""fastText-style quality classifier: separability, determinism, gating.

The synthetic corpus shares ONE vocabulary across every metadata label
(lang is a label, not a content property), so the separable classes for
testing are content-defined: documents containing a marker token vs
documents without it — a signal a working linear BoW model must find.
"""

import numpy as np
import pytest

from tidierdb_jl_spark.llm.classifier import (
    quality_classifier_filter,
    score_quality,
    train_quality_classifier,
)

_POS = "array_contains(split(lower(trim(text)), '\\\\s+'), 'spark')"


@pytest.fixture(scope="module")
def marker_model(tables):
    docs = tables["documents"]
    return train_quality_classifier(
        docs.filter(_POS), docs.filter(f"NOT ({_POS})"),
        id_col="doc_id", dim=1024,
    )


def test_classifier_separates_marker_classes(tables, marker_model):
    docs = tables["documents"]
    out = score_quality(docs.mutate(is_pos=_POS), marker_model).collect()
    pos = out[out["is_pos"]]["quality_score"]
    neg = out[~out["is_pos"]]["quality_score"]
    assert pos.mean() > 0.8
    assert neg.mean() < 0.45
    acc = ((out["quality_score"] >= 0.5) == out["is_pos"]).mean()
    assert acc > 0.9, f"accuracy {acc}"


def test_classifier_deterministic(tables, marker_model):
    docs = tables["documents"]
    again = train_quality_classifier(
        docs.filter(_POS), docs.filter(f"NOT ({_POS})"),
        id_col="doc_id", dim=1024,
    )
    assert again == marker_model  # bit-identical weights

    a = score_quality(docs.head(50), marker_model).collect()
    b = score_quality(docs.head(50), marker_model).collect()
    assert list(a["quality_score"]) == list(b["quality_score"])


def test_classifier_gate_and_empty_docs(spark, tables, marker_model):
    from tidierdb_jl_spark.core import TidyFrame

    kept = quality_classifier_filter(
        tables["documents"], marker_model, threshold=0.5
    ).collect()
    assert 0 < len(kept) < tables["documents"].df.count()
    assert "quality_score" not in kept.columns

    empty = TidyFrame(
        spark.createDataFrame([(0, None), (1, "")], "doc_id INT, text STRING")
    )
    s = score_quality(empty, marker_model).collect()
    prior = 1.0 / (1.0 + np.exp(-marker_model.bias))
    assert np.allclose(s["quality_score"], prior)


def test_classifier_guards(tables):
    with pytest.raises(ValueError):
        train_quality_classifier(
            tables["documents"].filter("doc_id < 0"),
            tables["documents"],
        )
