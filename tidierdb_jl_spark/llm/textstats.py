"""Text-analysis operators for LLM data pipelines (beyond the reference;
BASELINE.json north star): token counting, quality scoring, language ID,
document fingerprinting.

Everything here is built from ``pyspark.sql.functions`` / ``F.expr`` —
JVM-side, whole-stage-codegen'd, no Python UDFs — so it runs at full scan
speed on a 100 TB corpus.  Higher-order functions (``filter``,
``transform``, ``aggregate``) run per-row over token arrays inside
Tungsten; the stopword tables are literal arrays folded into the plan
(no broadcast join needed at their size).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = [
    "tokenize_expr",
    "with_token_count",
    "with_bpe_token_count",
    "with_text_stats",
    "with_repetition_stats",
    "with_language_id",
    "with_fingerprint",
    "with_rolling_fingerprint",
    "STOPWORDS",
    "sentence_expr",
    "split_sentences",
]

# GPT-2-style pre-tokenizer, ASCII flavor: a token is an optional leading
# space followed by a letter run, a digit run, or a punctuation run.  Kept
# ASCII so Java (Spark) and RE2 (DuckDB) agree exactly.
BPE_ISH_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

# Small public stopword lists (top function words per language) — enough
# for a coarse n-gram/stopword language heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
           "on", "with", "as", "this", "was", "are", "at", "be", "by", "or"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "por", "con", "para", "es", "al", "lo", "como", "mas", "pero", "sus"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "sich", "des", "auf", "fur", "ist", "im", "dem", "nicht", "ein",
           "eine", "als"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "pour", "qui", "dans", "par", "plus", "pas", "au",
           "sur"),
}


def tokenize_expr(col: str) -> str:
    """Whitespace tokenization of a trimmed, lowercased text column —
    returns a SQL expression producing array<string> (empty array for
    blank text, not [''])."""
    return (
        f"CASE WHEN trim({col}) = '' OR {col} IS NULL THEN array() "
        f"ELSE split(lower(trim({col})), '\\\\s+') END"
    )


def ngram_array_expr(toks: str, n: int, short: str = "empty") -> str:
    """Word ``n``-gram array over a token-array expression, with every
    reference to ``{toks}`` at TOP level — ``arrays_zip`` of ``n``
    shifted slices, mapped to joined strings.

    Never reference the token array inside a ``transform`` lambda
    (``transform(sequence(...), i -> slice({toks}, i, n))``): the moment
    Catalyst substitutes the tokenizer chain for ``{toks}`` — which
    ``InferFiltersFromGenerate`` + filter pushdown do at every explode
    site, and which any inline (non-column) ``toks`` does directly — the
    text is re-split once per n-gram position, O(words²) per document,
    usually executed at the scan's file parallelism.  Measured at sf1:
    the t96 postings build dropped 33.5s → ~1s from this rewrite.  In
    the zip form each derived/pushed/inlined copy evaluates ``{toks}``
    ~2n times per ROW — O(n·words), safe at any scale.

    ``short`` picks the ``size < n`` fallback: ``"empty"`` → ``array()``
    (stats/counting), ``"whole"`` → one whole-text shingle (dedup — so
    short near-identical docs still collide).
    """
    L = f"size({toks}) - {n - 1}"
    slices = ", ".join(f"slice({toks}, {i + 1}, {L})" for i in range(n))
    fields = ", ".join(f"s['{i}']" for i in range(n))
    fallback = f"array(concat_ws(' ', {toks}))" if short == "whole" else "array()"
    return (
        f"CASE WHEN size({toks}) < {n} THEN {fallback} "
        f"ELSE transform(arrays_zip({slices}), s -> concat_ws(' ', {fields})) END"
    )


def with_token_count(tf, col: str = "text", out: str = "n_tokens"):
    """Whitespace token count."""
    toks = tokenize_expr(col)
    return tf.mutate(**{out: f"as_integer(size({toks}))"})


def with_bpe_token_count(tf, col: str = "text", out: str = "n_tokens_bpe"):
    """Subword-style token count via a GPT-2-ish pre-tokenizer regex
    (letter runs / digit runs / punctuation runs, optional leading space):
    a far better LLM-token proxy than whitespace words — '42 tests!'
    counts 3 pieces, not 2.  One regexp_count per row, JVM-side."""
    pat = BPE_ISH_PATTERN.replace("'", "''")
    return tf.mutate(
        **{
            out: (
                f"CASE WHEN {col} IS NULL THEN 0 ELSE "
                f"as_integer(regexp_count({col}, '{pat}')) END"
            )
        }
    )


def with_text_stats(tf, col: str = "text"):
    """Quality-scoring features: char/word counts, average word length,
    punctuation/digit/whitespace ratios, uppercase ratio."""
    toks = tokenize_expr(col)
    n_chars = f"length({col})"
    return tf.mutate(
        n_chars=f"as_integer({n_chars})",
        n_words=f"as_integer(size({toks}))",
        avg_word_len=(
            f"CASE WHEN size({toks}) = 0 THEN 0.0 ELSE "
            f"CAST(aggregate({toks}, 0L, (acc, w) -> acc + length(w)) AS DOUBLE)"
            f" / size({toks}) END"
        ),
        punct_ratio=(
            f"CASE WHEN {n_chars} = 0 THEN 0.0 ELSE "
            f"CAST({n_chars} - length(regexp_replace({col}, '[.,;:!?]', '')) AS DOUBLE)"
            f" / {n_chars} END"
        ),
        digit_ratio=(
            f"CASE WHEN {n_chars} = 0 THEN 0.0 ELSE "
            f"CAST({n_chars} - length(regexp_replace({col}, '[0-9]', '')) AS DOUBLE)"
            f" / {n_chars} END"
        ),
        upper_ratio=(
            f"CASE WHEN {n_chars} = 0 THEN 0.0 ELSE "
            f"CAST({n_chars} - length(regexp_replace({col}, '[A-Z]', '')) AS DOUBLE)"
            f" / {n_chars} END"
        ),
    )


def lang_score_expr(col_tokens: str, lang: str) -> str:
    """Fraction of tokens that are stopwords of ``lang`` (0.0 when empty)."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CASE WHEN size({col_tokens}) = 0 THEN 0.0 ELSE "
        f"CAST(size(filter({col_tokens}, w -> array_contains(array({words}), w))) AS DOUBLE)"
        f" / size({col_tokens}) END"
    )


def with_language_id(tf, col: str = "text", out: str = "lang_pred"):
    """Stopword-ratio language heuristic over {en, es, de, fr} + a CJK
    character check for zh.  Deterministic; ties break by fixed language
    order (en, es, de, fr)."""
    toks = tokenize_expr(col)
    tf2 = tf.mutate(__toks=toks)
    scores = {lang: lang_score_expr("__toks", lang) for lang in STOPWORDS}
    tf3 = tf2.mutate(**{f"__s_{lang}": expr for lang, expr in scores.items()})
    order = list(STOPWORDS)
    best = "CASE "
    # zh: any CJK char wins outright
    best += f"WHEN {col} RLIKE '[\\\\x{{4e00}}-\\\\x{{9fff}}]' THEN 'zh' "
    best += f"WHEN greatest({', '.join('__s_' + l for l in order)}) = 0.0 THEN 'und' "
    for lang in order:
        others = [f"__s_{o}" for o in order if o != lang]
        best += f"WHEN __s_{lang} >= greatest({', '.join(others)}) THEN '{lang}' "
    best += "ELSE 'und' END"
    tf4 = tf3.mutate(**{out: best})
    return tf4.select(*[c for c in tf.columns], out)


def with_rolling_fingerprint(tf, col: str = "text", out: str = "rfp"):
    """Polynomial (Rabin-Karp) rolling hash over the characters of the
    whitespace-normalized, lowercased text:
    ``h = fold(h * 31 + ascii(c)) mod 1e9+7``.  Order-sensitive (unlike a
    bag-of-words hash), pure JVM expression, and exactly reproducible in
    DuckDB (``list_reduce`` + ``ord``) for the differential gate."""
    norm = f"lower(trim(regexp_replace({col}, '\\\\s+', ' ')))"
    return tf.mutate(
        **{
            out: (
                f"aggregate(transform(split({norm}, ''), c -> CAST(ascii(c) AS BIGINT)), "
                f"0L, (acc, c) -> (acc * 31 + c) % 1000000007)"
            )
        }
    )


def with_fingerprint(tf, col: str = "text", out: str = "fingerprint"):
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text.  (md5 is available in both
    Spark and DuckDB, so it is oracle-checkable — unlike xxhash64.)"""
    norm = f"lower(trim(regexp_replace({col}, '\\\\s+', ' ')))"
    return tf.mutate(**{out: f"md5({norm})"})


def with_repetition_stats(
    tf, col: str = "text", n: int = 3, prefix: str = ""
):
    """Gopher-style within-document repetition signal (Rae et al. 2021
    §A1.1): the fraction of word n-grams that are repeats of an earlier
    n-gram in the same document.  High ``dup_ngram_frac`` marks
    boilerplate / keyword-stuffed documents that survive per-corpus dedup
    because no other document matches them.  Adds ``{prefix}n_ngrams``
    and ``{prefix}dup_ngram_frac``; documents shorter than ``n`` words
    score 0.0.  Pure JVM array expressions — fuses into the scan."""
    toks = tokenize_expr(col)
    # ngram_array_expr keeps {toks} out of the lambda body: the inline
    # tokenizer otherwise re-splits the text once per n-gram position
    # (O(words²) per document — measured 4.6x slope at the sf0.1→1 step)
    grams = ngram_array_expr(toks, n, short="empty")
    tf2 = tf.mutate(__grams=grams)
    out = tf2.mutate(
        **{
            f"{prefix}n_ngrams": "size(__grams)",
            f"{prefix}dup_ngram_frac": (
                "CASE WHEN size(__grams) = 0 THEN 0.0 ELSE "
                "1.0 - CAST(size(array_distinct(__grams)) AS DOUBLE)"
                " / size(__grams) END"
            ),
        }
    )
    return out.select(
        *[c for c in tf.columns], f"{prefix}n_ngrams", f"{prefix}dup_ngram_frac"
    )


def sentence_expr(col: str) -> str:
    """SQL expression splitting text into sentences (array<string>):
    sentence-ending punctuation (. ! ?) followed by whitespace ends a
    sentence, keeping the punctuation with its sentence.  Implemented as
    capture-group replace to an ASCII record-separator then split — no
    lookbehind, so the same logic is expressible in RE2 engines (DuckDB
    spells the backreference ``\\1`` where Java spells it ``$1``).
    Blank/NULL text gives an empty array; whitespace around sentences is
    trimmed; empty fragments drop."""
    marked = f"regexp_replace({col}, '([.!?])\\\\s+', '$1\\u001E')"
    return (
        f"CASE WHEN {col} IS NULL THEN CAST(array() AS ARRAY<STRING>) ELSE "
        f"filter(transform(split({marked}, '\\u001E'), s -> trim(s)), s -> s != '') END"
    )


def split_sentences(tf, col: str = "text", out: str = "sentences"):
    """Add ``out`` (array<string> of sentences) — the segmenter for
    C4-style sentence-level dedup: pass ``sentence_expr(col)`` as
    ``segment_dedup(segments_expr=...)`` to dedup boilerplate at
    sentence granularity, or use this directly for per-sentence ops.
    Pure JVM expression, scan-fused."""
    return tf.mutate(**{out: sentence_expr(col)}).mutate(
        **{f"n_{out}": f"size({out})"}
    )
