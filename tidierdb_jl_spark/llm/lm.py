"""Count-based n-gram language models for corpus quality filtering.

CCNet (Wenzek et al. 2020) and Gopher (Rae et al. 2021) filter web text
by language-model perplexity: documents whose tokens are poorly predicted
by a model trained on a trusted corpus are boilerplate, gibberish, or the
wrong language.  A full neural LM is out of scope for a SQL engine, but a
Kneser-Ney-shaped *count* LM is exactly the kind of thing Spark excels
at, and the resulting filter behaves the same way in practice: natural
prose scores low perplexity, keyboard-mash scores high.

Two ops:

``train_ngram_lm``
    bigram + context(unigram) counts with add-k smoothing parameters.
    Scale shape: the canonical word-count — explode adjacent-token pairs,
    partial (map-side) aggregation collapses each partition's counts
    before ONE hash shuffle on the (context, token) key.  The model is a
    DataFrame, so it can be written to parquet and reused across ingest
    batches like the MinHash signature store (``dedup.py``).

``score_perplexity``
    per-document cross-entropy / perplexity under a trained model.
    Scale shape: explode each document's bigrams (one narrow map), join
    to the model on the bigram key (broadcast when the model was trained
    with a capped vocab, else a hash join on the token key), then
    re-aggregate per document.  The log-prob sum is decimal-cast so the
    per-doc score is bit-identical regardless of partition order — the
    same stability pattern the TPC-H money sums use.

Smoothing: add-k over a closed vocabulary.  p(w | c) =
(count(c,w) + k) / (count(c) + k*V); unseen contexts back off to the
uniform 1/V.  Kneser-Ney would be better ranked, but add-k is exactly
SQL-expressible, which keeps the DuckDB oracle byte-comparable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .vocab import _token_array

__all__ = ["train_ngram_lm", "score_perplexity", "perplexity_filter"]

# Sentinel prepended to every document so the first real token has a
# context; kept out of the vocabulary.  The \x01 control-char prefix
# makes it collision-proof against any whitespace-tokenized real token
# (oracle side: chr(1) || 'bos').
_BOS = "bos"


def _with_pairs(sdf, col: str, tokenizer: str, n: int = 2):
    """Adds ``pairs``: array<struct<0,1>> of (context, token) where the
    context is the space-joined preceding ``n-1`` tokens over a
    (n-1)×BOS-padded token array.

    The n=2 path is a zip of two shifted slices, NOT a
    ``transform(sequence, named_struct(element_at(...)))`` lambda:
    project-collapse inlines the padded-array alias into every lambda
    element, making the indexed form O(tokens²) per document (measured
    ~10x slower at sf0.1).  For n>=3 contexts are (n-1)-token windows via
    ``array_join(slice(...))`` — a slice per element (the window shape
    the passage ops use, measured linear), zipped against the target
    slice.  Docs with no real tokens zip to [].
    """
    toks = _token_array(col, tokenizer)
    bos = F.array(*[F.lit(_BOS)] * (n - 1))
    sdf = sdf.withColumn("pad", F.concat(bos, toks))
    if n == 2:
        pairs = F.expr(
            "arrays_zip(slice(pad, 1, size(pad) - 1), "
            "slice(pad, 2, size(pad) - 1))"
        )
    else:
        m = n - 1
        # the context windows reference `pad` through a let-binding
        # (transform(array(pad), T -> ...)) so a pushed-down or inlined
        # copy of this expression still builds `pad` once per row, not
        # once per position (see textstats.ngram_array_expr)
        pairs = F.expr(
            f"arrays_zip("
            f"flatten(transform(array(pad), T -> "
            f"transform(sequence(1, greatest(0, size(T) - {m})), "
            f"i -> array_join(slice(T, i, {m}), ' ')))), "
            f"slice(pad, {n}, greatest(0, size(pad) - {m})))"
        )
    return sdf.withColumn(
        "pairs",
        F.when(F.size("pad") > (n - 1), pairs).otherwise(F.expr("array()")),
    ).drop("pad")




def train_ngram_lm(
    tf,
    col: str = "text",
    tokenizer: str = "whitespace",
    k: float = 0.5,
    min_count: int = 1,
    lazy_vocab: bool = False,
    n: int = 2,
):
    """Train an add-k n-gram LM (default bigram); returns
    ``(model_tf, meta)``.  ``n=3`` uses two-token contexts (trigram) —
    sharper scores at the cost of a bigger model; contexts are
    space-joined token windows, so the scale shape is unchanged.

    ``model_tf`` has one row per observed (context, token) bigram:
    ``c, w, pair_count, ctx_count`` — everything scoring needs except the
    two scalars in ``meta``: ``{"vocab_size": V, "k": k}``.  ``min_count``
    prunes rare bigrams (their mass falls into the smoothing floor),
    which bounds model size on a 100 TB corpus: the model then scales
    with the *distinct frequent* bigram count, not the corpus.

    One shuffle for the pair counts, one for the context counts, and the
    model join reuses the context hash partitioning.  By default the
    vocab size is an eager 1-row driver action (same bounded-scalar
    shape as ``zorder``'s min/max probe); ``lazy_vocab=True`` instead
    returns it as a 1-row frame in ``meta["vocab"]``
    (``meta["vocab_size"]`` is None) that :func:`score_perplexity`
    broadcast-cross-joins into the scoring plan — no separate job, no
    driver barrier, so train+score stays ONE Spark job end-to-end.
    """
    from ..core import TidyFrame

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    sdf = tf.df if hasattr(tf, "df") else tf
    # explode_outer, NOT explode: the plain generator plans an implicit
    # emptiness pre-check that re-evaluates the whole pairs transform()
    # expression per row (measured ~14x slower); outer + null-filter
    # evaluates it once
    pairs = (
        _with_pairs(sdf, col, tokenizer, n)
        .select(F.explode_outer("pairs").alias("p"))
        .select(F.col("p")["0"].alias("c"), F.col("p")["1"].alias("w"))
        .where(F.col("c").isNotNull())
    )

    pair_counts = pairs.groupBy("c", "w").agg(F.count("*").alias("pair_count"))
    if min_count > 1:
        pair_counts = pair_counts.where(F.col("pair_count") >= min_count)
    ctx_counts = pairs.groupBy("c").agg(F.count("*").alias("ctx_count"))
    model = pair_counts.join(ctx_counts, "c")

    # Vocabulary = distinct *tokens* (BOS is a context only).
    vocab = pairs.select(F.greatest(F.lit(1), F.countDistinct("w")).alias("__v"))
    if lazy_vocab:
        meta = {"vocab_size": None, "k": float(k), "n": int(n),
                "vocab": TidyFrame(vocab)}
    else:
        meta = {"vocab_size": int(vocab.first()["__v"]), "k": float(k),
                "n": int(n)}
    return TidyFrame(model), meta


def score_perplexity(
    tf,
    model,
    meta: dict,
    col: str = "text",
    tokenizer: str = "whitespace",
    out: str = "perplexity",
    broadcast_model: bool = False,
):
    """Per-document cross-entropy + perplexity under a trained bigram LM.

    Adds ``n_bigrams``, ``cross_entropy`` (bits/token, base-2) and
    ``out`` (2**cross_entropy) to ``tf``.  Documents with no bigrams
    (empty / 0-1 tokens after tokenization) score NULL.

    Unseen bigram under a seen context: (k) / (ctx_count + k*V).  Unseen
    context: uniform 1/V.  Both fall out of ONE left join on (c, w) plus
    a context-count lookup folded into the same model row — no second
    join against the context table, because ``train_ngram_lm`` already
    denormalized ``ctx_count`` onto every model row; for bigrams whose
    context was seen but pair wasn't, the context count is recovered via
    a (c)-keyed left join against the distinct contexts.

    Set ``broadcast_model=True`` when the model was pruned small enough
    (``min_count``/capped vocab) to broadcast — then the whole score is
    two broadcast hash joins and one re-aggregation shuffle on doc id.

    The per-doc sum of log-probs is decimal-cast (DECIMAL(28,10)) so the
    result is bit-stable under any partition order — sums of doubles are
    not associative; sums of decimals are.
    """
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    k = float(meta["k"])

    mdl = model.df if hasattr(model, "df") else model
    ctx = mdl.select("c", "ctx_count").distinct()
    if broadcast_model:
        mdl, ctx = F.broadcast(mdl), F.broadcast(ctx)

    row_cols = sdf.columns
    pairs = (
        _with_pairs(sdf, col, tokenizer, int(meta.get("n", 2)))
        .select(*row_cols, F.posexplode_outer("pairs").alias("_i", "p"))
        .select(*row_cols, F.col("p")["0"].alias("c"), F.col("p")["1"].alias("w"))
    )
    if meta.get("vocab_size") is None:
        # lazy vocab: 1-row broadcast cross join keeps train+score one job
        vdf = meta["vocab"]
        pairs = pairs.crossJoin(
            F.broadcast(vdf.df if hasattr(vdf, "df") else vdf)
        )
        kv = F.lit(k) * F.col("__v")
    else:
        kv = F.lit(k * int(meta["vocab_size"]))
    scored = (
        pairs.join(mdl.select("c", "w", "pair_count"), ["c", "w"], "left")
        .join(ctx, ["c"], "left")
        .withColumn(
            "_logp",
            F.when(
                F.col("c").isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.log2(
                    (F.coalesce(F.col("pair_count"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("ctx_count"), F.lit(0)) + kv)
                )
            ),
        )
    )
    agg = (
        scored.groupBy(*row_cols)
        .agg(
            F.count("_logp").alias("n_bigrams"),
            # decimal sum: order-independent, hence hash-stable
            F.sum(F.col("_logp").cast("decimal(28,10)")).alias("_sum_logp"),
        )
        .withColumn(
            "cross_entropy",
            F.when(
                F.col("n_bigrams") > 0,
                (-F.col("_sum_logp").cast("double")) / F.col("n_bigrams"),
            ),
        )
        .withColumn(
            out,
            F.when(F.col("n_bigrams") > 0, F.pow(F.lit(2.0), F.col("cross_entropy"))),
        )
        .drop("_sum_logp")
    )
    return TidyFrame(agg)


def perplexity_filter(
    tf,
    model,
    meta: dict,
    q: float = 0.9,
    col: str = "text",
    tokenizer: str = "whitespace",
    broadcast_model: bool = False,
):
    """The end-to-end CCNet gate: score every document's perplexity under
    a trained LM, then keep the docs at or below the corpus q-quantile
    (drop the worst (1-q) tail).  Composition of :func:`score_perplexity`
    and :func:`pipeline.filter_by_quantile` — still one lazy plan: the
    quantile threshold rides in as a broadcast scalar.  Documents with no
    bigrams (NULL perplexity) are dropped (nothing to judge them by).
    Returns the original columns plus ``perplexity``.
    """
    from .pipeline import filter_by_quantile

    scored = score_perplexity(
        tf, model, meta, col=col, tokenizer=tokenizer,
        broadcast_model=broadcast_model,
    ).filter("perplexity IS NOT NULL")
    return filter_by_quantile(scored, "perplexity", q, keep="below").select(
        "!n_bigrams", "!cross_entropy"
    )
