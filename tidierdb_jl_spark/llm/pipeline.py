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
    "kfold_by_hash",
    "corpus_report",
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


def corpus_report(
    tf: TidyFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    quantiles: tuple = (0.1, 0.5, 0.9),
) -> TidyFrame:
    """One-call corpus datasheet — the numbers a dataset card starts from,
    in long format ``(section, name, value)``:

    - ``size``: n_docs, n_empty (NULL/blank), total_words, total_chars
    - ``length``: exact word-count quantiles (``p10``/``p50``/``p90`` …)
    - ``lang``: per-language doc counts (``lang_col``, or the built-in
      n-gram language ID when none is given)
    - ``dup``: exact_dup_rate — fraction of docs whose normalized-text
      fingerprint appears more than once

    Scale shape: three aggregation jobs over one cached stats scan — a
    global aggregate (quantiles ride in the same pass), a language
    group-count, and a fingerprint distinct-count; no windows, no joins
    back to the corpus.  Everything is exact (and hence oracle-checkable)
    — swap in sketches via ``time_rollup``-style measures when 100 TB
    exactness isn't worth the shuffle.
    """
    from ..cache import track
    from .textstats import with_fingerprint, with_language_id, with_text_stats

    lang = lang_col or "lang_pred"
    base = with_text_stats(tf, text_col)
    if lang_col is None:
        base = with_language_id(base, text_col)
    base = track(
        with_fingerprint(base, text_col, "__fp").df.select(
            text_col, "n_words", "n_chars", lang, "__fp"
        )
    )

    qs = ", ".join(f"{q}D" for q in quantiles)
    g = base.selectExpr(
        "CAST(count(*) AS DOUBLE) AS n_docs",
        f"CAST(sum(IF({text_col} IS NULL OR trim({text_col}) = '', 1, 0)) AS DOUBLE)"
        " AS n_empty",
        "CAST(sum(n_words) AS DOUBLE) AS total_words",
        "CAST(sum(n_chars) AS DOUBLE) AS total_chars",
        f"percentile(n_words, array({qs})) AS __q",
    )
    # every scalar metric leaves the 1-row aggregate in ONE stack()
    # projection — the aggregate is never recomputed per metric
    stack_args = [
        "'size'", "'n_docs'", "n_docs",
        "'size'", "'n_empty'", "n_empty",
        "'size'", "'total_words'", "total_words",
        "'size'", "'total_chars'", "total_chars",
    ]
    for i, q in enumerate(quantiles):
        stack_args += ["'length'", f"'p{int(q * 100)}'", f"element_at(__q, {i + 1})"]
    scalar_rows = g.selectExpr(
        f"stack({4 + len(quantiles)}, {', '.join(stack_args)}) "
        "AS (section, name, value)"
    )
    lang_rows = (
        base.groupBy(F.col(lang).alias("name"))
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .selectExpr("'lang' AS section", "coalesce(name, '<null>') AS name", "value")
    )
    dup = base.selectExpr(
        "'dup' AS section", "'exact_dup_rate' AS name",
        "CAST(count(*) - count(DISTINCT __fp) AS DOUBLE) / count(*) AS value",
    )
    return TidyFrame(scalar_rows.unionAll(lang_rows).unionAll(dup))


def kfold_by_hash(
    tf: TidyFrame,
    id_col: str,
    k: int = 5,
    out: str = "fold",
    salt: str = "",
    pairs_tf=None,
) -> TidyFrame:
    """Deterministic K-fold assignment (fold 0..k-1) — cross-validation's
    version of :func:`split_by_hash`: folds are equal-probability hash
    buckets of the id, stable under re-runs, repartitions, and appends.

    The fold is the count of k-1 equal-spaced hex thresholds at or below
    md5(id||salt) — the same portable string-comparison idiom as every
    split/sample op here (no engine-specific hex→int casts), so any
    engine with md5 reproduces the assignment.  ``pairs_tf`` makes the
    folds leakage-safe: ids are replaced by their duplicate-cluster label
    first (see :func:`leakage_safe_split`), so near-duplicates share a
    fold; the ``cluster_id`` column is kept for audit.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    key = id_col
    if pairs_tf is not None:
        from .dedup import dup_clusters

        tf = dup_clusters(tf, pairs_tf, id_col).rename(cluster_id="keep_id")
        key = "cluster_id"
    h = f"substring(md5(concat(CAST({key} AS STRING), '{salt}')), 1, 8)"
    cuts = [format(int(i / k * 0xFFFFFFFF), "08x") for i in range(1, k)]
    fold = " + ".join(f"if_else({h} >= '{c}', 1, 0)" for c in cuts)
    return tf.mutate(**{out: f"({fold})"})


def filter_by_quantile(
    tf: TidyFrame,
    col: str,
    q: float,
    keep: str = "above",
    out: str | None = None,
    by=None,
    approx: bool | int = False,
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

    ``approx``: exact ``percentile`` buffers every value of the
    aggregation group in executor memory — fine per-group or at test
    scale, but a GLOBAL exact quantile over 100 TB is a memory hazard.
    ``approx=True`` (or an int accuracy, default 10000 ≈ ±0.01%-ile
    rank error) switches to ``percentile_approx``'s bounded-memory
    KLL-style sketch — the setting a corpus-scale gate should run with;
    thresholds become engine-specific, so oracle rows keep exact mode.
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above'|'below', got {keep!r}")
    name = out or "__quantile_thr"
    acc = 10000 if approx is True else int(approx) if approx else 0
    pct = (
        f"percentile_approx({col}, {q}, {acc})" if acc
        else f"percentile({col}, {q})"
    )
    keys = [by] if isinstance(by, str) else list(by or [])
    if keys:
        thr = (
            tf.df.groupBy(*keys)
            .agg(F.expr(pct).alias(name))
        )
        joined = tf.df.join(thr, keys).select(*tf.df.columns, name)
        res = TidyFrame(joined).filter(
            f"{col} >= {name}" if keep == "above" else f"{col} <= {name}"
        )
    else:
        thr = tf.summarize(**{"__thr": pct})
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
    classifier_model=None,
    classifier_threshold: float = 0.5,
    sample_frac: float | None = None,
    sample_weight: str = "n_words",
    leakage_safe: bool = False,
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

    Optional modern-pipeline stages (defaults preserve the classic
    three-step recipe bit-for-bit):

    - ``classifier_model``: a trained
      :class:`~tidierdb_jl_spark.llm.classifier.QualityModel` gates the
      cleaned corpus at ``classifier_threshold`` (fastText-style third
      filter class);
    - ``sample_frac``: importance-sample the survivors to ~this
      fraction, keep-probability ∝ ``sample_weight`` (DSIR-style);
    - ``leakage_safe=True``: split on the duplicate-CLUSTER id derived
      from the cosine pairs instead of the doc id, so near-dups that
      survived the greedy drop can never straddle train/test.
    """
    from ..operators.skew import semi_reduce
    from .dedup import embedding_cosine_pairs

    cleaned = clean_corpus(docs, id_col=id_col, lang=lang, **gates)
    if classifier_model is not None:
        from .classifier import quality_classifier_filter

        cleaned = quality_classifier_filter(
            cleaned, classifier_model, classifier_threshold
        )
    if sample_frac is not None:
        from .mixing import importance_sample

        cleaned = (
            importance_sample(cleaned, sample_weight, sample_frac, id_col)
            .filter("sampled")
            .select("!sampled")
        )
    # ``cleaned`` feeds the semi-join reduction, the anti-join, and (with
    # leakage_safe) the cluster labeling — persist it once so the gated/
    # sampled corpus scan does not re-execute per consumer (tracked:
    # ``release_caches()`` returns the storage tier to baseline)
    from ..cache import track

    cleaned = TidyFrame(track(cleaned.df))
    emb_c = semi_reduce(embeddings, cleaned, f"{vec_id} == {id_col}")
    pairs = embedding_cosine_pairs(
        emb_c, vec_id, vec_col, threshold=cosine_threshold, method=pair_method
    )
    dupes = pairs.distinct("id_b")
    kept = cleaned.anti_join(dupes, by=f"{id_col} == id_b")
    if leakage_safe:
        return leakage_safe_split(kept, pairs, id_col, train_frac).select(
            id_col, "n_words", "lang_pred", "cluster_id", "split"
        )
    return split_by_hash(kept, id_col, train_frac).select(
        id_col, "n_words", "lang_pred", "split"
    )
