"""Classifier-based quality filtering (beyond the reference).

The modern pipeline's third filter class after heuristics and
perplexity: train a LINEAR text classifier to distinguish a high-quality
seed corpus from ordinary/noisy text, then score every document and gate
on the score — the fastText-classifier recipe used by GPT-3-class data
pipelines and CCNet (Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification"; public method).  This implementation is a
mean-pooled hashed bag-of-words logistic model:

    score(doc) = sigmoid( mean_t w[h(t)] + b )

Scale shape mirrors the repo's other trainable ops (IVF/PQ/BPE):

- **Training is one bounded driver action per class** — a deterministic
  ``sample_cap`` collect (ordered by id), then full-batch logistic
  regression as driver-local numpy (seconds for 2×4096 docs × 2^12
  features).  Training cost does not grow with the corpus.
- **Scoring is ONE vectorized Arrow pass** — the weight vector (a few
  KB) broadcasts inside a ``pandas_udf``; hashing + pooling is numpy
  ``bincount``-style per batch.  No shuffle, no join: the gate fuses
  with the scan like ``quality_filter``.

Determinism: fixed zero-init + full-batch gradient descent (no RNG, no
data-order dependence — the gradient is a sum over the sample, computed
in float64), crc32 feature hashing, ordered sample collect.  The same
corpora always train the same weights on any cluster layout.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import functions as F

from .textstats import tokenize_expr

__all__ = [
    "QualityModel",
    "train_quality_classifier",
    "score_quality",
    "quality_classifier_filter",
]


class QualityModel(NamedTuple):
    """A trained linear quality model: hashed-BoW weights + bias.
    Plain data — picklable, broadcastable, JSON-serializable."""

    weights: list  # list[float], length dim
    bias: float
    dim: int


def _hash_tokens(tokens, dim: int):
    """crc32(token) % dim — deterministic, fast, and identical across
    processes (unlike Python's salted ``hash``)."""
    import zlib

    return [zlib.crc32(t.encode("utf-8", "ignore")) % dim for t in tokens]


def _featurize(docs, dim: int):
    """Mean-pooled hashed BoW matrix (n_docs, dim) as float64 numpy."""
    import numpy as np

    X = np.zeros((len(docs), dim))
    for i, toks in enumerate(docs):
        if not toks:
            continue
        idx = np.asarray(_hash_tokens(toks, dim), dtype=np.int64)
        np.add.at(X[i], idx, 1.0 / len(idx))
    return X


def train_quality_classifier(
    pos_tf,
    neg_tf,
    text_col: str = "text",
    id_col: str | None = None,
    dim: int = 4096,
    sample_cap: int = 4096,
    iters: int = 3000,
    lr: float = 10.0,
    l2: float = 1e-6,
) -> QualityModel:
    """Train the quality model from a positive (seed/high-quality) corpus
    and a negative (ordinary/noisy) corpus.

    Each side contributes a bounded deterministic sample (first
    ``sample_cap`` rows by ``id_col`` when given, else input order
    capped) — the same one-collect training recipe as IVF/PQ/BPE.  The
    logistic regression runs full-batch (deterministic; no shuffling,
    no minibatch RNG) with L2 regularization.
    """

    import numpy as np

    def sample(tf):
        sdf = tf.df.selectExpr(
            f"({tokenize_expr(text_col)}) AS __toks",
            *( [f"{id_col} AS __sid"] if id_col else [] ),
        )
        if id_col:
            sdf = sdf.orderBy("__sid")
        return [r["__toks"] for r in sdf.limit(sample_cap).collect()]

    pos, neg = sample(pos_tf), sample(neg_tf)
    if not pos or not neg:
        raise ValueError("both corpora must contribute at least one document")
    X = _featurize(pos + neg, dim)
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    w = np.zeros(dim)
    b = 0.0
    n = len(y)
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * ((X.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return QualityModel(weights=w.tolist(), bias=float(b), dim=dim)


def _make_score_udf(model: QualityModel):
    import numpy as np
    import pandas

    W = np.asarray(model.weights)
    bias, dim = model.bias, model.dim

    def score(toks: pandas.Series) -> pandas.Series:
        out = np.empty(len(toks))
        for i, tl in enumerate(toks.to_numpy()):
            if tl is None or len(tl) == 0:
                out[i] = bias
                continue
            idx = np.asarray(_hash_tokens(list(tl), dim), dtype=np.int64)
            out[i] = W[idx].mean() + bias
        return pandas.Series(1.0 / (1.0 + np.exp(-out)))

    score.__annotations__ = {"toks": pandas.Series, "return": pandas.Series}
    return F.pandas_udf("double")(score)


def score_quality(
    tf,
    model: QualityModel,
    text_col: str = "text",
    out: str = "quality_score",
):
    """Add ``out`` — the model's probability that a document belongs to
    the high-quality class (0..1).  One Arrow pass, broadcast weights;
    empty/NULL docs score ``sigmoid(bias)`` (the prior)."""
    udf = _make_score_udf(model)
    from ..core import TidyFrame

    return TidyFrame(
        tf.df.withColumn(out, udf(F.expr(tokenize_expr(text_col))))
    )


def quality_classifier_filter(
    tf,
    model: QualityModel,
    threshold: float = 0.5,
    text_col: str = "text",
    keep_score: bool = False,
):
    """Keep documents the model scores at or above ``threshold`` — the
    one-call classifier gate (compose after the heuristic gates, before
    dedup)."""
    scored = score_quality(tf, model, text_col)
    kept = scored.filter(f"quality_score >= {threshold}")
    return kept if keep_score else kept.select("!quality_score")
