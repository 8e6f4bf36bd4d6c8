"""BPE tokenizer training/encoding vs a from-scratch naive reference.

The naive reference recounts pairs by scanning the word dict on every
merge iteration — O(merges × dict) but unarguably correct — so agreement
pins both the incremental bookkeeping in ``_merge_loop`` and the GPT-2
application order in ``apply_merges_to_word``.
"""

import re

import pytest
from hypothesis import given, settings, strategies as st

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.llm.bpe import (
    BpeModel,
    apply_merges_to_word,
    bpe_encode,
    bpe_train,
    bpe_word_counts,
)
from tidierdb_jl_spark.llm.textstats import BPE_ISH_PATTERN

_EOW = "</w>"


# ---------------------------------------------------------------- reference
def _naive_train(word_counts, num_merges, min_pair_count=2):
    """Recount-from-scratch Sennrich trainer (no incremental state)."""
    words = {i: (list(w) + [_EOW], c) for i, (w, c) in enumerate(word_counts)}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in words.values():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        for i, (syms, c) in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, c)
    return merges


def _naive_encode_corpus(texts, merges):
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out = []
    for t in texts:
        toks = []
        for w in re.findall(BPE_ISH_PATTERN, t or ""):
            toks.extend(apply_merges_to_word(w, ranks))
        out.append(toks)
    return out


def _docs(spark, texts):
    return TidyFrame(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
        )
    )


CORPUS = [
    "the lower the newer the wider",
    "low lower lowest new newer newest",
    "wide wider widest, lower and lower!",
    "newest stories of the new west",
    "",
]


def test_word_counts_capped_and_deterministic(spark):
    tf = _docs(spark, CORPUS)
    rows = bpe_word_counts(tf, max_words=5).df.collect()
    assert len(rows) == 5
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # ties broken by word ASC: stable across runs
    again = bpe_word_counts(tf, max_words=5).df.collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_train_matches_naive_reference(spark):
    tf = _docs(spark, CORPUS)
    wc = [(r["word"], r["count"]) for r in bpe_word_counts(tf).df.collect()]
    model = bpe_train(tf, num_merges=40)
    assert model.merges == _naive_train(wc, 40)
    # vocab contains every initial char and every merged symbol
    for a, b in model.merges:
        assert a + b in model.vocab
    assert _EOW in model.vocab


def test_encode_matches_naive_and_roundtrips(spark):
    tf = _docs(spark, CORPUS)
    model = bpe_train(tf, num_merges=30)
    got = {
        r["doc_id"]: (r["bpe_tokens"], r["bpe_tokens_n"])
        for r in bpe_encode(tf, model).df.collect()
    }
    want = _naive_encode_corpus(CORPUS, model.merges)
    for i, toks in enumerate(want):
        assert got[i][0] == toks
        assert got[i][1] == len(toks)
        # lossless round-trip: stripping the end-of-word marker restores
        # the concatenated pre-tokens
        detok = "".join(t for t in toks).replace(_EOW, "")
        assert detok == "".join(re.findall(BPE_ISH_PATTERN, CORPUS[i]))


def test_encode_null_and_empty(spark):
    tf = TidyFrame(
        spark.createDataFrame([(0, None), (1, "")], "doc_id INT, text STRING")
    )
    rows = bpe_encode(tf, BpeModel(merges=[("a", "b")], vocab=["a", "b", "ab"])).df.collect()
    for r in rows:
        assert r["bpe_tokens"] == []
        assert r["bpe_tokens_n"] == 0


def test_merges_reduce_token_count(spark):
    tf = _docs(spark, CORPUS)
    plain = bpe_encode(tf, BpeModel(merges=[], vocab=[]))
    model = bpe_train(tf, num_merges=50)
    merged = bpe_encode(tf, model)
    n0 = plain.df.agg({"bpe_tokens_n": "sum"}).collect()[0][0]
    n1 = merged.df.agg({"bpe_tokens_n": "sum"}).collect()[0][0]
    assert n1 < n0  # learned merges compress


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab cd.!", min_size=0, max_size=30), min_size=1, max_size=8
    ),
    st.integers(min_value=0, max_value=25),
)
def test_property_train_encode_vs_reference(texts, num_merges):
    """Driver-local property check (no Spark): the incremental trainer and
    the recount-from-scratch trainer learn identical merge tables on random
    corpora, and encoding round-trips losslessly."""
    wc = {}
    for t in texts:
        for w in re.findall(BPE_ISH_PATTERN, t):
            wc[w] = wc.get(w, 0) + 1
    word_counts = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    from tidierdb_jl_spark.llm.bpe import _merge_loop

    merges, vocab = _merge_loop(word_counts, num_merges, 2)
    assert merges == _naive_train(word_counts, num_merges)
    toks_per_doc = _naive_encode_corpus(texts, merges)
    for t, toks in zip(texts, toks_per_doc):
        assert "".join(toks).replace(_EOW, "") == "".join(
            re.findall(BPE_ISH_PATTERN, t)
        )
        for tok in toks:
            stripped = tok.replace(_EOW, "")
            assert tok in vocab or stripped == "" or len(tok) == 1
