"""Distributed BPE tokenizer TRAINING and encoding (beyond the reference).

The missing piece between the corpus ops (clean/dedup/mix) and a training
run: learn a byte-pair-encoding vocabulary FROM the corpus, then encode
documents with it.  Public algorithm throughout — Sennrich, Haddow &
Birch, "Neural Machine Translation of Rare Words with Subword Units"
(ACL 2016), with GPT-2's regex pre-tokenization style (our existing
``BPE_ISH_PATTERN``).

Scale shape (the part that matters at 100 TB):

- **Training never iterates over the corpus.**  The classic algorithm
  operates on the *word-frequency dictionary*, not the raw text: one
  distributed pre-tokenize + word count (map-side combined, ONE shuffle),
  then a capped ``TakeOrderedAndProject`` brings the top ``max_words``
  (word, count) rows to the driver — a bounded collect exactly like the
  IVF/PQ training sample (`simsearch.py`).  The merge loop then runs
  driver-local over that compressed dict (cost ∝ distinct words ×
  merges, independent of corpus size).  This is how production BPE
  trainers work: the 100 TB corpus contributes only word counts.

- **Encoding is one distributed Arrow pass.**  Pre-tokenization stays
  JVM-side (``regexp_extract_all``); the learned merge table broadcasts
  as a plain dict inside a vectorized ``pandas_udf`` that applies the
  GPT-2 merge procedure per word with an LRU word cache (corpora are
  Zipfian — the cache hit rate is ~word-frequency mass of the top 50k
  words, typically >95%).

Determinism: merge selection tie-breaks on (count DESC, pair ASC) — a
total order — and the capped word table orders by (count DESC, word
ASC), so the same corpus always learns the same merges on any cluster
layout.

Reference parity note: the reference (TidierDB.jl) has no tokenizer
training; this is part of the training-data-pipeline surface the brief
asks for on top of reference parity.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import functions as F

from .textstats import BPE_ISH_PATTERN

__all__ = [
    "BpeModel", "bpe_word_counts", "bpe_train", "bpe_encode",
    "bpe_save", "bpe_load",
]

_EOW = "</w>"


class BpeModel(NamedTuple):
    """A learned BPE tokenizer: ordered merge rules + the vocabulary they
    induce (initial characters ∪ merged symbols).  Plain data — picklable,
    broadcastable, JSON-serializable via ``_asdict``."""

    merges: list  # list[tuple[str, str]] in learned order
    vocab: list  # sorted list[str]


def _pretokens_expr(col: str) -> str:
    pat = BPE_ISH_PATTERN.replace("'", "''")
    return (
        f"CASE WHEN {col} IS NULL THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE regexp_extract_all({col}, '{pat}', 0) END"
    )


def bpe_word_counts(
    tf,
    text_col: str = "text",
    max_words: int = 50_000,
    min_count: int = 1,
):
    """Distributed (word, count) table over GPT-2-style pre-tokens,
    capped to the ``max_words`` most frequent (count DESC, word ASC —
    deterministic).  ONE token shuffle with map-side partial counts;
    the cap plans as ``TakeOrderedAndProject``, never a global sort."""
    df = (
        tf.df.select(F.explode(F.expr(_pretokens_expr(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        df = df.filter(F.col("count") >= min_count)
    from ..core import TidyFrame

    return TidyFrame(df.orderBy(F.desc("count"), F.asc("word")).limit(max_words))


def _merge_loop(word_counts, num_merges: int, min_pair_count: int):
    """Driver-local Sennrich merge loop over the compressed word dict.

    Incremental pair bookkeeping (pair counts + pair→word index) keeps
    each merge O(words containing the pair), not O(dict)."""
    from collections import Counter, defaultdict

    symbols = [list(w) + [_EOW] for w, _ in word_counts]
    counts = [c for _, c in word_counts]
    pair_counts: Counter = Counter()
    pair_words = defaultdict(set)
    for i, syms in enumerate(symbols):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(i)

    merges: list = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        (a, b), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        merged = a + b
        for i in sorted(pair_words[(a, b)]):
            syms, c = symbols[i], counts[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            symbols[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(i)

    vocab = set()
    for w, _ in word_counts:
        vocab.update(w)
    vocab.add(_EOW)
    vocab.update(a + b for a, b in merges)
    return merges, sorted(vocab)


def bpe_train(
    tf,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 50_000,
    min_count: int = 1,
    min_pair_count: int = 2,
) -> BpeModel:
    """Learn a BPE merge table from a corpus.

    The only driver-side action is the bounded top-``max_words`` word
    table collect (see module docstring); the merge loop itself never
    touches the corpus.  ``min_pair_count`` stops merging once the best
    pair is rarer than the floor (prevents memorizing singleton words).
    """
    rows = bpe_word_counts(tf, text_col, max_words, min_count).df.collect()
    merges, vocab = _merge_loop(
        [(r["word"], r["count"]) for r in rows], num_merges, min_pair_count
    )
    return BpeModel(merges=merges, vocab=vocab)


def apply_merges_to_word(word: str, ranks: dict) -> list:
    """GPT-2-style encoder for one pre-token: repeatedly merge the
    lowest-rank adjacent pair (all non-overlapping occurrences,
    left-to-right — the same application order training uses)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        merged, out, j = a + b, [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def _make_encode_udf(merges):
    import pandas
    from pyspark.sql import types as T

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def enc(pretok: pandas.Series) -> pandas.Series:
        cache: dict = {}

        def one_doc(words):
            if words is None:
                return []
            toks = []
            for w in words:
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = apply_merges_to_word(w, ranks)
                toks.extend(hit)
            return toks

        return pretok.map(one_doc)

    enc.__annotations__ = {"pretok": pandas.Series, "return": pandas.Series}
    return F.pandas_udf(T.ArrayType(T.StringType()))(enc)


def bpe_encode(
    tf,
    model: BpeModel,
    text_col: str = "text",
    out: str = "bpe_tokens",
):
    """Encode a text column with a learned :class:`BpeModel` — adds
    ``out`` (array<string> of subword tokens) and ``{out}_n`` (token
    count).  Pre-tokenization runs JVM-side; the merge table rides into
    ONE vectorized Arrow pass as a broadcast dict (a few hundred KB for
    a 50k-merge tokenizer)."""
    enc = _make_encode_udf(model.merges)
    df = tf.df.withColumn(out, enc(F.expr(_pretokens_expr(text_col)))).withColumn(
        f"{out}_n", F.size(F.col(out))
    )
    from ..core import TidyFrame

    return TidyFrame(df)


def bpe_save(model: BpeModel, path: str) -> None:
    """Persist a learned tokenizer as JSON — train once on the big corpus,
    reuse across ingest batches and sessions (the tokenizer must stay
    frozen for token counts/packing to be comparable over time)."""
    import json

    with open(path, "w") as fh:
        json.dump(
            {"merges": [list(p) for p in model.merges], "vocab": model.vocab}, fh
        )


def bpe_load(path: str) -> BpeModel:
    """Load a tokenizer saved by :func:`bpe_save`."""
    import json

    with open(path) as fh:
        d = json.load(fh)
    return BpeModel(merges=[tuple(p) for p in d["merges"]], vocab=d["vocab"])
