"""Sequence packing for LLM pretraining (beyond the reference; north-star
family): concatenate tokenized documents in a deterministic order and cut
the stream into fixed-size token blocks — the GPT-style "pack then chunk"
batch layout.  Documents may split across block boundaries (standard for
causal-LM pretraining; span metadata lets the trainer mask attention
across document joins).

Scale design: packing is SHARD-LOCAL.  A global concatenation order would
serialize the whole corpus through one window partition; instead rows
shard by a key (default: hash of the id modulo ``n_shards``) and the
cumulative-offset window runs per shard — embarrassingly parallel, one
shuffle for the window plus one for the block regroup.  Block ids are
(shard, block) pairs; every stage is a JVM expression, no UDFs.
"""

from __future__ import annotations

from ..core import TidyFrame

__all__ = ["pack_sequences", "chunk_documents", "pack_documents_ffd"]


def pack_sequences(
    tf: TidyFrame,
    id_col: str,
    block_size: int,
    text_col: str = "text",
    tokens_col: str | None = None,
    shard_by: str | None = None,
    n_shards: int = 8,
) -> TidyFrame:
    """Pack documents into ``block_size``-token blocks.

    Tokens come from ``tokens_col`` (array<string>) when given, else from
    whitespace-tokenizing ``text_col``.  Output: one row per (shard,
    block_id) with the packed ``tokens`` array, ``n_tokens`` (==
    block_size except each shard's tail block), ``n_docs`` crossing the
    block, and ``spans`` — (doc id, start, end) offsets inside the block
    for attention masking.

    Deterministic: shard assignment is a hash of the id, concatenation
    order is id order within the shard — re-runs and repartitions produce
    identical blocks.
    """
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .textstats import tokenize_expr

    toks = tokens_col or tokenize_expr(text_col)
    # default shard: first two md5 nibbles of the id → uniform 0-255 →
    # mod n_shards.  Same portable-hash idiom as split_by_hash/mixing
    # (reproducible in any engine with md5; Spark's hash() is not).
    h = f"md5(CAST({id_col} AS STRING))"
    nib = "instr('0123456789abcdef', substring({h}, {i}, 1)) - 1"
    shard = shard_by or (
        f"pmod(({nib.format(h=h, i=1)}) * 16 + ({nib.format(h=h, i=2)}), "
        f"{n_shards})"
    )
    base = tf.df.selectExpr(
        f"{id_col} AS __id", f"{shard} AS shard", f"{toks} AS __toks"
    ).selectExpr("__id", "shard", "__toks", "size(__toks) AS __n").filter(
        "__n > 0"
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offs = base.withColumn("__off", F.sum("__n").over(w) - F.col("__n"))
    # (global position within shard, token) pairs; posexplode_outer keeps
    # the expression single-evaluated (see simsearch) though __toks here is
    # JVM-built anyway
    e = offs.select(
        "__id",
        "shard",
        "__off",
        F.posexplode_outer("__toks").alias("__p", "__tok"),
    ).selectExpr(
        "__id",
        "shard",
        "CAST(__off + __p AS BIGINT) AS __gpos",
        "__tok",
    )
    e = e.selectExpr(
        "__id",
        "shard",
        "__tok",
        f"CAST(__gpos DIV {block_size} AS BIGINT) AS block_id",
        f"CAST(__gpos % {block_size} AS INT) AS __bpos",
    )
    out = e.groupBy("shard", "block_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(__bpos, __tok))), s -> s.__tok)"
        ).alias("tokens"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("__id").alias("n_docs"),
    )
    # spans come from pure offset arithmetic on the un-exploded frame: a
    # doc occupying [off, off+n) intersects blocks off÷B .. (off+n-1)÷B —
    # only (doc × blocks-touched) rows shuffle, never tokens
    spans = (
        offs.selectExpr(
            "__id",
            "shard",
            "__off",
            "__n",
            f"explode(sequence(__off DIV {block_size}, "
            f"(__off + __n - 1) DIV {block_size})) AS block_id",
        )
        .selectExpr(
            "shard",
            "CAST(block_id AS BIGINT) AS block_id",
            f"CAST(greatest(__off - block_id * {block_size}, 0) AS INT) AS start",
            f"CAST(least(__off + __n - block_id * {block_size}, {block_size}) AS INT) AS end",
            "__id",
        )
        .groupBy("shard", "block_id")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(start, end, __id AS doc_id)))"
            ).alias("spans")
        )
    )
    return TidyFrame(out.join(spans, ["shard", "block_id"]))


def chunk_documents(
    tf: TidyFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 16,
) -> TidyFrame:
    """Split long documents into overlapping token-window chunks — the
    standard preprocessing for context-bounded training/embedding: chunk
    ``i`` covers tokens ``[1 + i*step, i*step + max_tokens]`` with
    ``step = max_tokens - overlap``.  Output: one row per chunk with
    ``chunk_id`` (0-based), ``chunk_start`` (1-based token offset),
    ``chunk_text``, and ``chunk_n_tokens``.  Empty documents produce one
    empty chunk (no rows silently dropped).

    Scale shape: pure JVM expressions (tokenize → start grid → slice) +
    one explode — fuses into the scan, zero shuffles; chunk ids are
    arithmetic, no window or ordinality needed.
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    from pyspark.sql import functions as F

    from .textstats import tokenize_expr

    step = max_tokens - overlap
    df = (
        tf.df.withColumn("__toks", F.expr(tokenize_expr(text_col)))
        .withColumn(
            "__start",
            F.explode(
                F.expr(f"sequence(1, greatest(size(__toks) - {overlap}, 1), {step})")
            ),
        )
        .withColumn("chunk_id", F.expr(f"CAST((__start - 1) DIV {step} AS INT)"))
        .withColumn("chunk_start", F.col("__start").cast("int"))
        .withColumn(
            "chunk_text",
            F.expr(f"concat_ws(' ', slice(__toks, __start, {max_tokens}))"),
        )
        .withColumn(
            "chunk_n_tokens",
            F.expr(f"CAST(size(slice(__toks, __start, {max_tokens})) AS INT)"),
        )
        .select(id_col, "chunk_id", "chunk_start", "chunk_text", "chunk_n_tokens")
    )
    return TidyFrame(df)


def pack_documents_ffd(
    tf: TidyFrame,
    id_col: str,
    block_size: int,
    text_col: str = "text",
    tokens_col: str | None = None,
    n_shards: int = 8,
):
    """Whole-document packing: assign each document to a block of at most
    ``block_size`` tokens WITHOUT ever splitting a document — the
    T5-style alternative to :func:`pack_sequences` for tasks where an
    example must stay contiguous (SFT, long-context eval).  Documents
    longer than ``block_size`` get a solo block flagged ``oversize``
    (chunk them first with ``chunk_documents`` if that's not acceptable).

    Algorithm: best-fit-DECREASING bin packing (sort by length desc, put
    each doc into the fullest bin it still fits; guaranteed ≤ 11/9·OPT+1
    bins — Johnson 1973, public result), run independently per hash
    shard so the packing parallelizes: memory per task is one shard's
    (id, length) pairs, never the corpus, and the bisect-based best-fit
    is O(d log d) per shard.  Deterministic: hash sharding, (length desc,
    id asc) order, smallest-remaining-then-smallest-bin tie-breaks.

    Returns (id, n_tokens, shard, bin_id, bin_fill, oversize) — join
    back on the id to materialize block contents.  One shuffle (the
    shard groupBy); lengths travel, documents don't.
    """
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    import pandas
    from pyspark.sql import functions as F

    from .textstats import tokenize_expr

    toks = tokens_col or tokenize_expr(text_col)
    h = f"md5(CAST({id_col} AS STRING))"
    nib = "instr('0123456789abcdef', substring({h}, {i}, 1)) - 1"
    shard = (
        f"pmod(({nib.format(h=h, i=1)}) * 16 + ({nib.format(h=h, i=2)}), "
        f"{n_shards})"
    )
    narrow = tf.df.selectExpr(
        f"{id_col} AS __id",
        f"CAST(size({toks}) AS BIGINT) AS n_tokens",
        f"CAST({shard} AS INT) AS shard",
    )
    id_type = narrow.schema["__id"].dataType.simpleString()
    out_schema = (
        f"__id {id_type}, n_tokens BIGINT, shard INT, bin_id BIGINT, "
        "bin_fill BIGINT, oversize BOOLEAN"
    )

    def pack(pdf: pandas.DataFrame) -> pandas.DataFrame:
        import bisect

        pdf = pdf.sort_values(["n_tokens", "__id"], ascending=[False, True])
        keys = []  # sorted (remaining, bin_id)
        fills: dict = {}
        assign = []
        next_bin = 0
        for n in pdf["n_tokens"].to_numpy():
            n = int(n)
            if n > block_size:
                b = next_bin
                next_bin += 1
                fills[b] = n
                assign.append(b)
                continue
            i = bisect.bisect_left(keys, (n, -1))
            if i < len(keys):
                rem, b = keys.pop(i)
                rem -= n
            else:
                b = next_bin
                next_bin += 1
                rem = block_size - n
            fills[b] = fills.get(b, 0) + n
            bisect.insort(keys, (rem, b))
            assign.append(b)
        pdf = pdf.assign(bin_id=assign)
        pdf["bin_fill"] = pdf["bin_id"].map(fills)
        pdf["oversize"] = pdf["n_tokens"] > block_size
        return pdf

    packed = narrow.groupBy("shard").applyInPandas(pack, out_schema)
    return TidyFrame(
        packed.selectExpr(
            f"__id AS {id_col}", "n_tokens", "shard", "bin_id", "bin_fill",
            "oversize",
        )
    )
