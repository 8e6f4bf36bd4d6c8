"""Repeated-passage detection: cross-document duplicate token windows.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") showed that much web-corpus duplication is *substring*-level —
boilerplate paragraphs shared across otherwise-distinct pages — which
document-level MinHash (``dedup.py``) and line-level segment dedup
(``segment_dedup``) both miss when the shared span doesn't dominate the
document or align with line breaks.  Their exact suffix-array approach
is inherently single-machine; the standard distributed approximation is
fixed-length token *windows*: a k-token window appearing in ≥2 distinct
documents marks a duplicated passage.

Scale shape (the same inverted-index discipline as ``ngram_jaccard`` /
``segment_dedup``): tokenize → slide k-windows (pure JVM array exprs,
narrow) → hash each window to a 64-bit key → ONE hash shuffle with
map-side combine for the window census → join the per-(doc, window)
postings back on the window key → re-aggregate per document.  No
all-pairs product anywhere: hot windows (the signal) make the census row
*larger*, never a join quadratic, because the census is an aggregate.

Window hashing uses ``xxhash64`` of the joined window text: 64-bit
collisions at corpus scale (~1e12 windows) are possible, so counts are
approximate at the 1e-6 level there; at test scale they are exact (the
DuckDB oracle groups by the window *string* and matches).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .vocab import _token_array

__all__ = ["passage_windows", "repeated_passage_stats", "filter_repeated_passages"]


def _window_array(col: str, tokenizer: str, window: int, stride: int):
    """array<string> of space-joined k-token windows at the given stride.

    The per-position ``slice`` references the token array through a
    let-binding (outer ``transform(array(__toks), T -> ...)`` binds the
    array to a lambda variable), not by name: when filter pushdown or
    project collapse substitutes the tokenizer chain for ``__toks`` —
    which ``InferFiltersFromGenerate`` does at the ``posexplode`` site —
    a by-name reference inside the position lambda would re-tokenize the
    text once per window position, O(words²/stride) per document at the
    scan's file parallelism (see textstats.ngram_array_expr).  The bound
    variable is a runtime value, so every substituted copy still
    tokenizes once per row.
    """
    toks = _token_array(col, tokenizer)
    return F.expr(
        f"CASE WHEN size(__toks) < {window} THEN array() ELSE "
        f"flatten(transform(array(__toks), T -> "
        f"transform(sequence(1, size(T) - {window} + 1, {stride}), "
        f"i -> array_join(slice(T, i, {window}), ' ')))) END"
    ), toks


def passage_windows(
    tf,
    id_col: str = "doc_id",
    col: str = "text",
    window: int = 8,
    stride: int = 1,
    tokenizer: str = "whitespace",
):
    """One row per (document, window position): ``id_col, pos, passage``.

    Narrow except the explode; the downstream census/join key should be
    ``xxhash64(passage)`` — kept as text here so callers can inspect the
    actual duplicated spans.
    """
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    warr, toks = _window_array(col, tokenizer, window, stride)
    out = (
        sdf.withColumn("__toks", toks)
        .select(id_col, F.posexplode(warr).alias("pos", "passage"))
    )
    return TidyFrame(out)


def repeated_passage_stats(
    tf,
    id_col: str = "doc_id",
    col: str = "text",
    window: int = 8,
    stride: int = 1,
    tokenizer: str = "whitespace",
    min_docs: int = 2,
):
    """Per-document duplication profile: ``n_windows`` (window positions in
    the doc), ``n_dup_windows`` (positions whose window text appears in
    ≥ ``min_docs`` distinct documents), ``dup_fraction``.

    Documents shorter than ``window`` tokens get 0 / 0 / 0.0 (nothing to
    share).  Two shuffles total: the window census (map-side combined on
    the 64-bit window hash) and the per-doc re-aggregation; the
    census→postings join is a plain equi-join on the hash key.
    """
    from ..core import TidyFrame

    sdf = tf.df if hasattr(tf, "df") else tf
    warr, toks = _window_array(col, tokenizer, window, stride)
    post = (
        sdf.withColumn("__toks", toks)
        .select(id_col, F.explode_outer(warr).alias("passage"))
        # xxhash64(NULL) is the (non-null) seed hash, so guard the NULL
        # passage rows explode_outer keeps for short docs
        .withColumn(
            "wkey",
            F.when(F.col("passage").isNotNull(), F.xxhash64("passage")),
        )
    )
    # census: windows appearing in >= min_docs distinct docs.  Two-step
    # distinct-then-count keeps the combine map-side (no count-distinct
    # expand).
    dup_keys = (
        post.where(F.col("wkey").isNotNull())
        .select(id_col, "wkey")
        .distinct()
        .groupBy("wkey")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("wkey")
    )
    marked = post.join(dup_keys.withColumn("__dup", F.lit(1)), ["wkey"], "left")
    agg = marked.groupBy(id_col).agg(
        F.count("wkey").alias("n_windows"),
        F.count("__dup").alias("n_dup_windows"),
    )
    out = agg.withColumn(
        "dup_fraction",
        F.when(F.col("n_windows") > 0,
               F.col("n_dup_windows") / F.col("n_windows")).otherwise(F.lit(0.0)),
    )
    return TidyFrame(sdf.select(id_col).join(out, [id_col], "left").fillna(
        {"n_windows": 0, "n_dup_windows": 0, "dup_fraction": 0.0}
    ))


def filter_repeated_passages(
    tf,
    max_dup_fraction: float = 0.3,
    id_col: str = "doc_id",
    col: str = "text",
    window: int = 8,
    stride: int = 1,
    tokenizer: str = "whitespace",
    min_docs: int = 2,
):
    """Drop documents whose duplicated-window fraction exceeds the cap —
    the passage-level analogue of ``clean_corpus``'s document gates.
    Join back on ``id_col`` (hash equi-join), keeping all original
    columns."""
    stats = repeated_passage_stats(
        tf, id_col=id_col, col=col, window=window, stride=stride,
        tokenizer=tokenizer, min_docs=min_docs,
    )
    sdf = tf.df if hasattr(tf, "df") else tf
    keep = stats.df.where(F.col("dup_fraction") <= max_dup_fraction).select(id_col)
    from ..core import TidyFrame

    return TidyFrame(sdf.join(keep, [id_col], "left_semi"))
