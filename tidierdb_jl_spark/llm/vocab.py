"""Corpus-level vocabulary statistics: token frequency tables, top-k
vocabularies, and vocabulary-coverage scoring.

The per-document token ops live in ``textstats``; this module is the
corpus-wide aggregation used to train/evaluate tokenizers and to build
frequency-filtered vocabularies for quality scoring.  Scale shape is the
canonical Spark word-count: explode multiplies rows by tokens-per-doc,
but partial (map-side) aggregation collapses each partition's counts
BEFORE the single hash shuffle on ``token``, so skewed tokens ("the",
"of") arrive pre-combined — one long per (partition, hot-token), not one
row per occurrence.  Top-k uses a global TakeOrdered (no full sort).

Tokenization reuses ``textstats.tokenize_expr`` (whitespace) or the
GPT-2-ish ``BPE_ISH_PATTERN`` pre-tokenizer so per-doc counts and corpus
vocab agree on what a token is.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .textstats import BPE_ISH_PATTERN, tokenize_expr

__all__ = [
    "token_frequencies",
    "top_tokens",
    "vocab_coverage",
    "with_tfidf",
    "tfidf_cosine_pairs",
    "token_cooccurrence",
    "token_divergence",
]


def _token_array(col: str, tokenizer: str):
    if tokenizer == "whitespace":
        return F.expr(tokenize_expr(col))
    if tokenizer == "bpeish":
        pat = BPE_ISH_PATTERN.replace("'", "''")
        return F.expr(
            f"CASE WHEN {col} IS NULL THEN array() "
            f"ELSE regexp_extract_all({col}, '{pat}', 0) END"
        )
    raise ValueError(f"unknown tokenizer {tokenizer!r}: use whitespace|bpeish")


def token_frequencies(
    tf,
    col: str = "text",
    tokenizer: str = "whitespace",
    min_count: int = 1,
):
    """Corpus frequency table: one row per distinct token with
    ``term_freq`` (total occurrences) and ``doc_freq`` (documents
    containing it).  Both aggregates shuffle once on ``token`` with
    map-side combine; the join between them reuses that partitioning, so
    the whole op is one logical shuffle of pre-combined counts."""
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    toks = _token_array(col, tokenizer)
    tfreq = (
        sdf.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("term_freq"))
    )
    dfreq = (
        sdf.select(F.explode(F.array_distinct(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
    )
    out = tfreq.join(dfreq, "token")
    if min_count > 1:
        out = out.where(F.col("term_freq") >= min_count)
    return TidyFrame(out)


def top_tokens(
    tf,
    k: int = 1000,
    col: str = "text",
    tokenizer: str = "whitespace",
):
    """Top-k vocabulary by term frequency (ties broken by token for
    determinism).  ``orderBy().limit()`` plans a TakeOrdered — each
    partition keeps only its local top-k, the driver merges k-sized
    heaps; no global sort materializes."""
    freq = token_frequencies(tf, col=col, tokenizer=tokenizer)
    out = freq.df.orderBy(F.desc("term_freq"), F.asc("token")).limit(k)
    from ..core import TidyFrame

    return TidyFrame(out)


def with_tfidf(
    tf,
    col: str = "text",
    doc_id: str = "doc_id",
    tokenizer: str = "whitespace",
    smooth: bool = True,
    l2_normalize: bool = False,
    round_to: int | None = 6,
    keep_doc_freq: bool = False,
):
    """Sparse TF-IDF in long format: one row per (doc, token) with
    ``tf`` (in-doc count), ``idf``, ``tfidf``.  ``smooth`` uses the
    sklearn-style ``ln((N+1)/(df+1)) + 1`` (never zero/negative);
    otherwise plain ``ln(N/df)``.  ``l2_normalize`` scales each document's
    weights to unit norm (ready for cosine similarity / dedup).

    Scale shape: explode → per-(doc,token) count (one shuffle, map-side
    combined) → join against the |vocab|-row doc-freq table keyed by
    token → per-doc norm via a window keyed by doc (co-partitioned with
    nothing extra when l2 off).  N (total docs) is a bounded driver
    action injected as a literal.  Long/sparse output — never a dense
    |vocab|-wide vector column.

    ``round_to`` rounds idf/tfidf for cross-engine bit-stability in
    differential tests (ln differs by ulps across runtimes); pass None
    for full precision.
    """
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    toks = _token_array(col, tokenizer)
    n_docs = sdf.select(doc_id).distinct().count()

    per_doc = (
        sdf.select(F.col(doc_id), F.explode(toks).alias("token"))
        .groupBy(doc_id, "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = (
        sdf.select(F.explode(F.array_distinct(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    if smooth:
        idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + F.lit(1.0)
    else:
        idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    joined = per_doc.join(dfreq, "token").withColumn("idf", idf)
    weight = F.col("tf") * F.col("idf")
    if l2_normalize:
        from pyspark.sql import Window

        norm = F.sqrt(F.sum(weight * weight).over(Window.partitionBy(doc_id)))
        weight = weight / norm
    out = joined.withColumn("tfidf", weight)
    if round_to is not None:
        out = out.withColumn("idf", F.round("idf", round_to)).withColumn(
            "tfidf", F.round("tfidf", round_to)
        )
    cols = [doc_id, "token", "tf", "idf", "tfidf"] + (
        ["df"] if keep_doc_freq else []
    )
    return TidyFrame(out.select(*cols))


def tfidf_cosine_pairs(
    tf,
    col: str = "text",
    doc_id: str = "doc_id",
    threshold: float = 0.8,
    tokenizer: str = "whitespace",
    max_doc_freq: int | None = 200,
    round_to: int | None = 6,
):
    """Document pairs with TF-IDF cosine similarity ≥ ``threshold`` —
    the real-valued complement to MinHash/SimHash dedup (graded
    similarity instead of set overlap).

    Inverted-index shape, NEVER all-pairs: L2-normalized weights join on
    ``token``, so each token contributes ``df²`` candidate rows and the
    per-pair sum of weight products IS the cosine.  ``max_doc_freq``
    (default 200, ``None`` opt-out) drops hotter tokens from the JOIN
    (not from the norms) — the one place this plan could go quadratic —
    and TF-IDF is the best-case setting for that cap: the dropped tokens
    are exactly the low-idf ones, so the computed cosine is a tight
    UNDERESTIMATE (missing only stop-token mass) and precision is never
    lost, only borderline recall.  With ``max_doc_freq=None`` the result
    is exact and a quadratic SQL oracle can verify it.

    Output: ``id_a < id_b``, ``cosine`` (rounded to ``round_to`` for
    cross-engine sum-order stability).
    """
    from ..core import TidyFrame

    w = with_tfidf(
        tf,
        col=col,
        doc_id=doc_id,
        tokenizer=tokenizer,
        l2_normalize=True,
        round_to=None,
        keep_doc_freq=True,
    ).df.select(F.col(doc_id).alias("__d"), "token", "tfidf", "df")
    postings = w if max_doc_freq is None else w.where(F.col("df") <= max_doc_freq)
    a = postings.select(
        F.col("__d").alias("id_a"), "token", F.col("tfidf").alias("w_a")
    )
    b = postings.select(
        F.col("__d").alias("id_b"), "token", F.col("tfidf").alias("w_b")
    )
    pairs = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("cosine"))
    )
    if round_to is not None:
        # round BEFORE thresholding: membership of borderline pairs must
        # not depend on summation order (ulp drift across engines/runs)
        pairs = pairs.withColumn("cosine", F.round("cosine", round_to))
    return TidyFrame(pairs.where(F.col("cosine") >= threshold))


def vocab_coverage(
    tf,
    vocab,
    col: str = "text",
    tokenizer: str = "whitespace",
):
    """One-row coverage report of a vocabulary over the corpus:
    ``total_tokens``, ``in_vocab_tokens``, ``coverage`` (fraction of
    token occurrences covered), ``oov_types`` (distinct uncovered
    tokens).  ``vocab`` is a DataFrame/TidyFrame whose FIRST column is
    the token — broadcast, so the corpus explode never shuffles."""
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    vdf = vocab.df if hasattr(vocab, "df") else vocab
    vtab = F.broadcast(
        vdf.selectExpr(f"{vdf.columns[0]} AS __v_token").distinct()
    )
    toks = sdf.select(F.explode(_token_array(col, tokenizer)).alias("token"))
    joined = toks.join(vtab, toks["token"] == F.col("__v_token"), "left")
    out = joined.agg(
        F.count("*").alias("total_tokens"),
        F.count("__v_token").alias("in_vocab_tokens"),
        (F.count("__v_token") / F.count("*")).alias("coverage"),
        F.count_distinct(
            F.when(F.col("__v_token").isNull(), F.col("token"))
        ).alias("oov_types"),
    )
    return TidyFrame(out)


def token_cooccurrence(
    tf,
    col: str = "text",
    tokenizer: str = "whitespace",
    max_vocab: int = 1000,
    min_pair_count: int = 2,
    id_col: str = "doc_id",
):
    """Document-level token co-occurrence with PMI (pointwise mutual
    information) — the corpus-association statistic behind collocation
    mining, topic drift checks, and contamination forensics ("which
    benchmark terms co-travel in my corpus?").

    One row per unordered token pair (``a < b``) appearing together in
    >= ``min_pair_count`` documents: ``a, b, n_ab, n_a, n_b, pmi`` where
    ``pmi = log2(n_ab * N / (n_a * n_b))`` over document frequencies.

    Scale shape: the per-document pair build is inherently quadratic in
    *distinct tokens per document*, so it is capped by construction:
    tokens are first semi-joined against the top-``max_vocab`` frequency
    vocabulary (broadcast — it is small by definition), bounding the
    per-doc fan-out at ``min(distinct_tokens, max_vocab)²`` and, far
    more importantly at corpus scale, bounding the *output* keyspace at
    ``max_vocab²`` so the (a, b) count aggregation map-side-combines into
    a small table no matter how many documents stream through.  Pass
    ``max_vocab=None`` only for oracle/differential runs.
    """
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    toks = _token_array(col, tokenizer)
    per_doc = sdf.select(
        F.col(id_col).alias("_doc"), F.explode(F.array_distinct(toks)).alias("tok")
    )
    if max_vocab is not None:
        vocab = (
            per_doc.groupBy("tok").agg(F.count("*").alias("df_"))
            .orderBy(F.desc("df_"), "tok").limit(int(max_vocab)).select("tok")
        )
        per_doc = per_doc.join(F.broadcast(vocab), "tok", "left_semi")

    dfreq = per_doc.groupBy("tok").agg(F.count("*").alias("n_tok"))
    n_docs = sdf.select(F.countDistinct(id_col).alias("n")).first()["n"] or 1

    left = per_doc.select("_doc", F.col("tok").alias("a"))
    right = per_doc.select("_doc", F.col("tok").alias("b"))
    pairs = (
        left.join(right, "_doc")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= int(min_pair_count))
    )
    out = (
        pairs.join(dfreq.withColumnRenamed("tok", "a")
                   .withColumnRenamed("n_tok", "n_a"), "a")
        .join(dfreq.withColumnRenamed("tok", "b")
              .withColumnRenamed("n_tok", "n_b"), "b")
        .withColumn(
            "pmi",
            F.round(
                F.log2(F.col("n_ab") * F.lit(float(n_docs))
                       / (F.col("n_a") * F.col("n_b"))),
                6,
            ),
        )
        .select("a", "b", "n_ab", "n_a", "n_b", "pmi")
    )
    return TidyFrame(out)


def token_divergence(
    expected,
    actual,
    col: str = "text",
    tokenizer: str = "whitespace",
    max_vocab: int = 10000,
    eps: float = 1e-9,
):
    """Token-distribution drift between two corpus snapshots: per-token
    probabilities under each side plus KL and Jensen-Shannon
    contributions — the vocabulary complement to ``psi_drift``'s numeric
    buckets ("did the incoming batch's language shift?").

    One row per token in the top-``max_vocab`` union vocabulary (ranked
    by combined count, ties on token asc): ``token, n_expected,
    n_actual, p_expected, p_actual, kl_contrib, js_contrib``.  Sum
    ``kl_contrib`` for KL(expected || actual) and ``js_contrib`` for the
    (symmetric, bounded) Jensen-Shannon divergence; both eps-floored so
    one-sided tokens stay finite.  Probabilities are over each side's
    total token count (not just the kept vocab), so truncation never
    inflates a probability.

    Scale shape: one map-side-combined token count per side, a
    full-outer join of the two (small) count tables, a TakeOrdered
    top-``max_vocab`` cut, and window totals over the tiny result —
    each corpus is scanned exactly once, and nothing bigger than the
    vocabulary ever reaches the driver or a single task.
    """
    from pyspark.sql import Window

    from ..core import TidyFrame

    e_sdf = expected.df if hasattr(expected, "df") else expected
    a_sdf = actual.df if hasattr(actual, "df") else actual

    def counts(sdf, label):
        toks = _token_array(col, tokenizer)
        return (
            sdf.select(F.explode(toks).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(label))
        )

    ec, ac = counts(e_sdf, "n_expected"), counts(a_sdf, "n_actual")
    merged = (
        ec.join(ac, "token", "full_outer")
        .fillna({"n_expected": 0, "n_actual": 0})
    )
    # totals BEFORE the vocab cut, so p is over the true corpus mass
    w = Window.partitionBy()
    merged = (
        merged.withColumn("__te", F.sum("n_expected").over(w))
        .withColumn("__ta", F.sum("n_actual").over(w))
    )
    if max_vocab is not None:
        merged = merged.orderBy(
            F.desc(F.col("n_expected") + F.col("n_actual")), "token"
        ).limit(int(max_vocab))

    pe = F.greatest(F.lit(float(eps)),
                    F.col("n_expected") / F.greatest(F.lit(1), F.col("__te")))
    pa = F.greatest(F.lit(float(eps)),
                    F.col("n_actual") / F.greatest(F.lit(1), F.col("__ta")))
    out = (
        merged.withColumn("p_expected", pe)
        .withColumn("p_actual", pa)
        .withColumn(
            "kl_contrib",
            F.col("p_expected") * F.log(F.col("p_expected") / F.col("p_actual")),
        )
        .withColumn("__m", (F.col("p_expected") + F.col("p_actual")) / 2)
        .withColumn(
            "js_contrib",
            (F.col("p_expected") * F.log(F.col("p_expected") / F.col("__m"))
             + F.col("p_actual") * F.log(F.col("p_actual") / F.col("__m"))) / 2,
        )
        .select("token", "n_expected", "n_actual",
                "p_expected", "p_actual", "kl_contrib", "js_contrib")
    )
    return TidyFrame(out)
