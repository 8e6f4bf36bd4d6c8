"""Deduplication operators for LLM data pipelines (beyond the reference).

Four families, each designed Spark-native for 100 TB:

- **exact**: fingerprint → one hash-shuffle → keep min-id per group.
- **n-gram Jaccard**: exact set similarity for candidate pairs inside
  cheap blocking buckets (never all-pairs).
- **MinHash + LSH**: per-doc signatures built entirely with JVM
  higher-order functions (no Python UDFs), banded into buckets; candidate
  pairs only ever form inside a bucket (the standard shingle→minhash→
  band→bucket-join pipeline).
- **SimHash**: 64-bit bit-vote signature, near-dup via pigeonhole banding
  on 16-bit chunks + Hamming verify.

Scale notes: every stage is a narrow map followed by one hash shuffle
(groupBy/join on bucket keys).  Signature arrays are tiny (k longs); the
band explode multiplies rows by #bands only.  Skewed buckets (boilerplate
shingles) are the known hazard — cap bucket size with a count filter
before pairing, exactly what `max_bucket` does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .textstats import tokenize_expr, with_fingerprint

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_dedup_pairs",
    "minhash_dedup",
    "simhash_signature",
    "simhash_pairs",
]

# Universal-hash parameters: h_j(x) = (a_j*x + b_j) mod p, p prime > 2^32.
# a is capped below 2^30 so a*h < 2^62 never overflows a signed 64-bit long
# under ANSI arithmetic; params come from a fixed xorshift so runs are
# deterministic.
_P = 4294967311
_A_MAX = 1 << 30


def _perm_params(k: int) -> list[tuple[int, int]]:
    params, state = [], 88172645463325252
    for _ in range(k):
        # xorshift64 — deterministic, no RNG dependency
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        a = (state % (_A_MAX - 1)) + 1
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        b = state % _P
        params.append((a, b))
    return params


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(tf, id_col: str, text_col: str = "text", keep_col: str = "keep_id"):
    """Exact near-identical dedup: fingerprint (md5 of normalized text) →
    min id per fingerprint.  Returns the input plus ``fingerprint`` and
    ``keep_id`` (the surviving representative); a row is a duplicate iff
    ``id != keep_id``.  One shuffle on the fingerprint."""
    fp = with_fingerprint(tf, text_col, "fingerprint")
    return fp.mutate(**{keep_col: f"min({id_col})"}, _by="fingerprint")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked)
# ---------------------------------------------------------------------------


def _shingle_expr(toks: str, n: int) -> str:
    return (
        f"CASE WHEN size({toks}) < {n} THEN array(concat_ws(' ', {toks})) "
        f"ELSE array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))) END"
    )


def ngram_jaccard_pairs(
    tf,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    block_cols: tuple = (),
):
    """Exact word-``n``-gram Jaccard similarity for all pairs inside a
    blocking bucket (``block_cols``; empty = all pairs — only for small
    tables).  Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold."""
    toks = tokenize_expr(text_col)
    docs = tf.mutate(__t=toks).mutate(__sh=_shingle_expr("__t", n)).df.selectExpr(
        f"{id_col} AS __id", "__sh", *block_cols
    )
    l = docs.alias("l")
    r = docs.alias("r")
    cond = F.col("l.__id") < F.col("r.__id")
    for c in block_cols:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    pairs = l.join(r, cond).select(
        F.col("l.__id").alias("id_a"),
        F.col("r.__id").alias("id_b"),
        (
            F.expr("size(array_intersect(l.__sh, r.__sh))")
            / F.expr("size(array_union(l.__sh, r.__sh))")
        ).alias("jaccard"),
    )
    from ..core import TidyFrame

    return TidyFrame(pairs.filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    tf, id_col: str, text_col: str = "text", num_perm: int = 64, shingle: int = 3
):
    """Add a ``minhash`` array<bigint> column (length ``num_perm``).

    Shingles are word ``shingle``-grams; base hashes are 32-bit murmur
    (`hash()`), lifted to [0, 2^32) so the universal-hash family
    (a*x+b) mod p stays within bigint range.  All JVM-side.
    """
    toks = tokenize_expr(text_col)
    sh = _shingle_expr("__toks", shingle)
    out = tf.mutate(__toks=toks).mutate(__sh=sh).mutate(
        __h=f"transform(__sh, s -> CAST(hash(s) AS BIGINT) + 2147483648L)"
    )
    mins = [
        f"array_min(transform(__h, h -> ({a}L * h + {b}L) % {_P}L))"
        for a, b in _perm_params(num_perm)
    ]
    out = out.mutate(minhash=f"array({', '.join(mins)})")
    return out.select(*[c for c in tf.columns], "minhash")


def minhash_dedup_pairs(
    tf,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 200,
):
    """Candidate pairs from banded LSH, verified by estimated Jaccard
    (fraction of equal minhash components).  Returns
    (id_a, id_b, est_jaccard >= threshold).

    Pipeline: signature (map) → explode bands (×bands) → self-join inside
    (band, hash) buckets → zip_with verify.  ``max_bucket`` drops
    degenerate buckets (boilerplate) to keep the join quadratic only in
    genuinely similar groups.
    """
    sig = minhash_signature(tf, id_col, text_col, num_perm, shingle)
    rows = num_perm // bands
    sdf = sig.df.select(F.col(id_col).alias("__id"), "minhash")
    banded = sdf.select(
        "__id",
        "minhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, hash(concat_ws(',', slice(minhash, b * {rows} + 1, {rows}))) AS bh))"
            )
        ).alias("bb"),
    ).select("__id", "minhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    # cap pathological buckets before pairing
    bucket_sizes = banded.groupBy("band", "bh").count()
    banded = (
        banded.join(F.broadcast(bucket_sizes.filter(F.col("count") > max_bucket)),
                    ["band", "bh"], "left_anti")
    )

    l = banded.alias("l")
    r = banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.expr(
                "CAST(size(filter(zip_with(l.minhash, r.minhash, (x, y) -> x = y), v -> v)) AS DOUBLE)"
                " / size(l.minhash)"
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("est_jaccard") >= threshold)
    )
    from ..core import TidyFrame

    return TidyFrame(pairs)


def minhash_dedup(tf, id_col: str, text_col: str = "text", **kwargs):
    """Greedy LSH dedup: each doc maps to the smallest id it pairs with
    (min-id propagation, one round — the standard approximation; full
    transitive closure would iterate this to a fixed point).  Returns
    (id, keep_id)."""
    pairs = minhash_dedup_pairs(tf, id_col, text_col, **kwargs).df
    best = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("keep_id")
    )
    ids = tf.df.select(id_col)
    out = ids.join(best, id_col, "left").select(
        id_col, F.coalesce("keep_id", F.col(id_col)).alias("keep_id")
    )
    from ..core import TidyFrame

    return TidyFrame(out)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signature(tf, text_col: str = "text", out: str = "simhash"):
    """64-bit SimHash: per-token xxhash64, bit-vote per position, sign →
    bit.  Entirely JVM-side expression (64 aggregates over the token-hash
    array)."""
    toks = tokenize_expr(text_col)
    tf2 = tf.mutate(__th=f"transform({toks}, t -> xxhash64(t))")
    votes = [
        f"(CASE WHEN aggregate(__th, 0L, (acc, h) -> acc + CASE WHEN shiftright(h, {k}) & 1 = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN shiftleft(1L, {k}) ELSE 0L END)"
        for k in range(64)
    ]
    tf3 = tf2.mutate(**{out: " + ".join(votes)})
    return tf3.select(*[c for c in tf.columns], out)


def simhash_pairs(tf, id_col: str, text_col: str = "text", max_hamming: int = 3):
    """Near-dup pairs by SimHash: band the 64-bit signature into four
    16-bit chunks (pigeonhole: hamming<=3 ⇒ at least one chunk equal),
    bucket-join, verify Hamming distance via bit_count(xor)."""
    sig = simhash_signature(tf, text_col).df.select(
        F.col(id_col).alias("__id"), "simhash"
    )
    banded = sig.select(
        "__id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct(b AS band, shiftright(simhash, b * 16) & 65535 AS chunk))"
            )
        ).alias("bb"),
    ).select("__id", "simhash", "bb.band", "bb.chunk")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.expr("bit_count(l.simhash ^ r.simhash)").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    from ..core import TidyFrame

    return TidyFrame(pairs)
