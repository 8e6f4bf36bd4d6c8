"""Composed corpus-cleaning pipeline (C4/Gopher-style heuristics) for LLM
training-data preparation — the flagship composition of the text-analysis
operators (beyond the reference; BASELINE.json north star).

Single-pass design: every gate is a ``pyspark.sql.functions`` expression,
so the whole pipeline — stats, language ID, quality flags, fingerprint —
fuses into ONE whole-stage-codegen'd scan with zero shuffles; the only
shuffle in ``clean_corpus`` is the fingerprint window for dedup, which is
also the minimal possible (one hash-partitioned exchange on an 32-char
key).  At 100 TB that means: one pass over the corpus, one shuffle of
(doc_id, fingerprint) pairs — not the documents themselves — then a
semi-join back that AQE turns into a broadcast when the survivor set is
small.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import TidyFrame
from .textstats import with_language_id, with_text_stats

__all__ = [
    "quality_filter",
    "gopher_stats",
    "gopher_filter",
    "clean_corpus",
    "split_by_hash",
    "leakage_safe_split",
    "filter_by_quantile",
    "prepare_training_corpus",
]

# C4-style defaults (Raffel et al. 2020 §2.2 heuristics, adapted to the
# synthetic corpus: its documents are short keyword streams).
DEFAULT_GATES = dict(
    min_words=5,
    max_words=100_000,
    min_avg_word_len=2.0,
    max_avg_word_len=15.0,
    max_punct_ratio=0.30,
    max_digit_ratio=0.30,
)


# Gopher-style defaults (Rae et al. 2021 §A1.1, adapted to the synthetic
# corpus' short keyword-stream documents).
GOPHER_GATES = dict(
    min_words=30,
    max_words=100_000,
    min_avg_word_len=3.0,
    max_avg_word_len=10.0,
    max_dup_ngram_frac=0.05,
    min_stopword_frac=0.02,
    ngram=3,
)


def gopher_stats(tf: TidyFrame, col: str = "text", **gates) -> TidyFrame:
    """Gopher-style quality STATS (Rae et al. 2021 §A1.1): word-count and
    word-length stats, within-document duplicate n-gram fraction
    (boilerplate / keyword stuffing), stopword fraction (real prose
    contains function words; token salads don't), and a ``gopher_pass``
    boolean evaluating the gate predicate — without filtering, so callers
    can inspect/aggregate the rejects.

    Every stat is a JVM expression: stats, repetition and stopword
    fractions, and the predicate all fuse into a single
    whole-stage-codegen'd scan — zero shuffles at any corpus size.
    """
    from .textstats import (
        lang_score_expr,
        tokenize_expr,
        with_repetition_stats,
    )

    g = {**GOPHER_GATES, **gates}
    stats = with_repetition_stats(with_text_stats(tf, col), col, n=g["ngram"])
    stats = (
        stats.mutate(__toks=tokenize_expr(col))
        .mutate(stopword_frac=lang_score_expr("__toks", "en"))
        .select("!__toks")
    )
    return stats.mutate(
        gopher_pass=(
            f"n_words >= {g['min_words']} AND n_words <= {g['max_words']} "
            f"AND avg_word_len >= {g['min_avg_word_len']} "
            f"AND avg_word_len <= {g['max_avg_word_len']} "
            f"AND dup_ngram_frac <= {g['max_dup_ngram_frac']} "
            f"AND stopword_frac >= {g['min_stopword_frac']}"
        )
    )


def gopher_filter(tf: TidyFrame, col: str = "text", **gates) -> TidyFrame:
    """Keep documents passing the Gopher gates (see ``gopher_stats``)."""
    return gopher_stats(tf, col, **gates).filter("gopher_pass").select("!gopher_pass")


def split_by_hash(
    tf: TidyFrame,
    id_col: str,
    train_frac: float = 0.9,
    out: str = "split",
    salt: str = "",
) -> TidyFrame:
    """Deterministic train/test assignment by content hash — the correct
    way to split at scale: no global shuffle or sample() randomness, stable
    under re-runs, repartitions, and incremental appends (a document keeps
    its split forever; ``rand()``-based splits leak rows across sets when
    the pipeline re-executes).  ``salt`` derives independent splits from
    the same ids.

    Implementation: first 8 hex chars of md5(id||salt) compared against the
    fraction's hex threshold — a pure string comparison, identical in any
    engine with md5 (portable to the DuckDB oracle).
    """
    if not (0.0 <= train_frac <= 1.0):
        raise ValueError(f"train_frac must be in [0, 1], got {train_frac}")
    threshold = format(int(train_frac * 0xFFFFFFFF), "08x")
    prefix = f"substring(md5(concat(CAST({id_col} AS STRING), '{salt}')), 1, 8)"
    return tf.mutate(
        **{out: f"if_else({prefix} < '{threshold}', 'train', 'test')"}
    )


def leakage_safe_split(
    tf: TidyFrame,
    pairs_tf,
    id_col: str,
    train_frac: float = 0.9,
    out: str = "split",
    salt: str = "",
) -> TidyFrame:
    """Train/test split that NEVER separates near-duplicates — the guard
    against test-set contamination: a doc in test whose near-dup sits in
    train silently inflates eval scores.

    Mechanism: label each doc with its duplicate-cluster id (transitive
    closure of ``pairs_tf`` via
    :func:`~tidierdb_jl_spark.llm.dedup.dup_clusters`; singletons keep
    their own id), then hash-split on the CLUSTER id — every member of a
    dup group lands on the same side, with the same determinism and
    re-run stability as :func:`split_by_hash`.

    Pass any pair source: minhash/simhash pairs, embedding cosine pairs,
    or a pre-built edge list.  Returns the input columns plus
    ``cluster_id`` and ``out``.
    """
    from .dedup import dup_clusters

    clustered = dup_clusters(tf, pairs_tf, id_col).rename(cluster_id="keep_id")
    return split_by_hash(clustered, "cluster_id", train_frac, out, salt)


def filter_by_quantile(
    tf: TidyFrame,
    col: str,
    q: float,
    keep: str = "above",
    out: str | None = None,
    by=None,
) -> TidyFrame:
    """Keep rows whose ``col`` is above (or below) the q-quantile —
    the relative-threshold quality gate ("drop the bottom decile by
    quality score") that complements the absolute gates of
    ``quality_filter``/``gopher_filter``.  ``by`` (a column name or list)
    makes the threshold per-group — e.g. a per-language quality bar, so a
    low-resource language isn't wiped out by a global cutoff.

    Global case: the exact interpolated percentile is attached with the
    lazy-broadcast scalar pattern (:meth:`TidyFrame.with_scalar`): one
    aggregation job produces a 1-row frame that is broadcast-cross-joined
    into the filter, so Catalyst plans a single job and the corpus scan
    happens once — no driver round-trip, no second pass.  Grouped case:
    per-group percentiles come from one map-side-combined aggregation
    joined back on the (tiny, broadcast) group key — no partitioned
    window, no per-group sort.  ``keep="above"`` keeps
    ``col >= threshold`` (ties survive), ``"below"`` keeps
    ``col <= threshold``.  ``out`` optionally retains the threshold as a
    column for audit.
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above'|'below', got {keep!r}")
    name = out or "__quantile_thr"
    keys = [by] if isinstance(by, str) else list(by or [])
    if keys:
        thr = (
            tf.df.groupBy(*keys)
            .agg(F.expr(f"percentile({col}, {q})").alias(name))
        )
        joined = tf.df.join(thr, keys).select(*tf.df.columns, name)
        res = TidyFrame(joined).filter(
            f"{col} >= {name}" if keep == "above" else f"{col} <= {name}"
        )
    else:
        thr = tf.summarize(**{"__thr": f"percentile({col}, {q})"})
        res = tf.with_scalar(**{name: thr}).filter(
            f"{col} >= {name}" if keep == "above" else f"{col} <= {name}"
        )
    if out is None:
        res = res.select(f"!{name}")
    return res


def quality_filter(tf: TidyFrame, col: str = "text", **gates) -> TidyFrame:
    """Keep documents passing C4-style quality gates: word-count range,
    average word length range, punctuation and digit ratio caps.  Adds the
    stat columns (``with_text_stats``) and filters on them — Catalyst
    collapses the mutate+filter into the scan, so the predicate runs
    during the parquet read."""
    g = {**DEFAULT_GATES, **gates}
    return with_text_stats(tf, col).filter(
        f"n_words >= {g['min_words']} AND n_words <= {g['max_words']} "
        f"AND avg_word_len >= {g['min_avg_word_len']} "
        f"AND avg_word_len <= {g['max_avg_word_len']} "
        f"AND punct_ratio <= {g['max_punct_ratio']} "
        f"AND digit_ratio <= {g['max_digit_ratio']}"
    )


def clean_corpus(
    tf: TidyFrame,
    id_col: str = "doc_id",
    col: str = "text",
    lang: str | None = "en",
    dedup: bool = True,
    **gates,
) -> TidyFrame:
    """Full cleaning pass: quality gates → language filter → exact dedup
    (keep the lowest ``id_col`` per normalized-text fingerprint).  Returns
    the surviving documents with their quality stats and predicted
    language.

    The dedup keeps ``min(id) over (partition by fingerprint)`` rather
    than ``dropDuplicates`` so the survivor choice is deterministic —
    ``dropDuplicates`` keeps an arbitrary row per key, which breaks
    reproducible corpus builds across cluster runs.
    """
    out = quality_filter(tf, col, **gates)
    out = with_language_id(out, col)
    if lang is not None:
        out = out.filter(f"lang_pred = '{lang}'")
    if dedup:
        norm = f"lower(trim(regexp_replace({col}, '\\\\s+', ' ')))"
        out = out.mutate(fingerprint=f"md5({norm})")
        out = out.mutate(
            keep_id=f"min({id_col})", _by="fingerprint"
        ).filter(f"{id_col} = keep_id")
    return out


def prepare_training_corpus(
    docs: TidyFrame,
    embeddings: TidyFrame,
    id_col: str = "doc_id",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.9,
    train_frac: float = 0.9,
    lang: str | None = "en",
    pair_method: str = "lsh",
    **gates,
) -> TidyFrame:
    """End-to-end training-data preparation — the capstone composition:

    1. ``clean_corpus``: quality gates -> language filter -> exact dedup
       (one fused scan + one narrow shuffle);
    2. semantic near-dup removal: restrict embeddings to the cleaned
       survivors (``semi_reduce`` — map-side semi join), find cosine pairs
       above ``cosine_threshold``, drop every doc that duplicates a
       lower-id doc (greedy min-id rule, same convention as exact dedup);
    3. ``split_by_hash``: deterministic train/test assignment.

    Output: one row per surviving document with stats, language, and
    split.  Every stage is engine-side; the only data-dependent blowup
    (the pair join) runs on the *embedding* table after semi-join
    reduction, never on the corpus text — and with the default
    ``pair_method="lsh"`` the candidate set is LSH-bucketed, never
    all-pairs (``pair_method="exact"`` is the quadratic oracle path; use
    it only for small corpora / differential harnesses).
    """
    from ..operators.skew import semi_reduce
    from .dedup import embedding_cosine_pairs

    cleaned = clean_corpus(docs, id_col=id_col, lang=lang, **gates)
    emb_c = semi_reduce(embeddings, cleaned, f"{vec_id} == {id_col}")
    pairs = embedding_cosine_pairs(
        emb_c, vec_id, vec_col, threshold=cosine_threshold, method=pair_method
    )
    dupes = pairs.distinct("id_b")
    kept = cleaned.anti_join(dupes, by=f"{id_col} == id_b")
    return split_by_hash(kept, id_col, train_frac).select(
        id_col, "n_words", "lang_pred", "split"
    )
