"""Deduplication operators for LLM data pipelines (beyond the reference).

Four families, each designed Spark-native for 100 TB:

- **exact**: fingerprint → one hash-shuffle → keep min-id per group.
- **n-gram Jaccard**: exact set similarity for candidate pairs inside
  cheap blocking buckets (never all-pairs).
- **MinHash + LSH**: shingling + base hashes as JVM expressions, the
  64-permutation min-fold as one vectorized Arrow batch (numpy matmul per
  batch — the sanctioned Pandas-UDF slow path, ~30× the interpreted
  higher-order-function version), banded into buckets; candidate pairs
  only ever form inside a bucket (the standard shingle→minhash→band→
  bucket-join pipeline).
- **SimHash**: 64-bit bit-vote signature (same hybrid JVM-hash +
  Arrow-fold split), near-dup via pigeonhole banding on 16-bit chunks +
  Hamming verify.

Scale notes: every stage is a narrow map followed by one hash shuffle
(groupBy/join on bucket keys).  Signature arrays are tiny (k longs); the
band explode multiplies rows by #bands only.  Skewed buckets (boilerplate
shingles) are the known hazard — cap bucket size with a count filter
before pairing, exactly what `max_bucket` does.
"""

from __future__ import annotations

import numpy as np
import pandas
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cache import track
from .textstats import tokenize_expr, with_fingerprint

# diagnostic: rounds the last connected_components call took to converge
# (min-label propagation converges in O(component diameter) rounds — this
# is the number to watch when asking "do rounds grow with corpus size?")
LAST_CC_ROUNDS = 0

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_dedup_pairs",
    "minhash_dedup",
    "connected_components",
    "dup_clusters",
    "resolve_duplicates",
    "exact_dedup_incremental",
    "minhash_dedup_incremental",
    "similarity_join",
    "simhash_signature",
    "simhash_pairs",
    "embedding_cosine_pairs",
    "embedding_dedup_incremental",
    "semantic_dedup",
    "segment_dedup",
    "flag_contaminated",
    "flag_contaminated_semantic",
]

# Universal-hash parameters: h_j(x) = (a_j*x + b_j) mod p, p prime > 2^32.
# a is capped below 2^30 so a*h < 2^62 never overflows a signed 64-bit long
# under ANSI arithmetic; params come from a fixed xorshift so runs are
# deterministic.
_P = 4294967311
_A_MAX = 1 << 30

# rows embedding_cosine_pairs(method="exact") will gather to the driver;
# beyond this the O(n·d) broadcast and O(n²) scoring are the wrong tool
EXACT_DRIVER_CAP = 200_000


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


def exact_dedup_incremental(
    new_tf, seen_tf, id_col: str, text_col: str = "text"
):
    """Incremental-ingestion dedup: keep rows of ``new_tf`` whose
    normalized-text fingerprint (a) does not appear in ``seen_tf`` (the
    already-ingested corpus — pass its text, or a stored one-column
    ``fingerprint`` frame to skip re-hashing history) and (b) is the
    min-id first within the new batch itself.

    Scale shape: one fingerprint shuffle over the NEW batch + one
    LEFT ANTI join against the seen set — history is never re-grouped,
    which is what makes per-batch ingestion O(batch), not O(corpus).
    """
    if "fingerprint" in seen_tf.columns:
        seen_fp = seen_tf.df.select("fingerprint")
    else:
        seen_fp = with_fingerprint(seen_tf, text_col, "fingerprint").df.select(
            "fingerprint"
        )
    batch = exact_dedup(new_tf, id_col, text_col).filter(f"{id_col} == keep_id")
    from ..core import TidyFrame

    return TidyFrame(
        batch.df.join(seen_fp, "fingerprint", "left_anti")
    ).select(*new_tf.columns, "fingerprint")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked)
# ---------------------------------------------------------------------------


def _spread(df):
    """Raise a frame to the session's default parallelism when it has
    fewer partitions — a single-file corpus scan (1-2 partitions) would
    otherwise pin every downstream map-side stage (shingle explode,
    candidate join, partial aggregation) to 1-2 tasks on a 32-core
    session.  A no-op at real scale, where scans already carry more
    partitions than cores."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par) if df.rdd.getNumPartitions() < par else df


def _shingle_expr(toks: str, n: int) -> str:
    """Word-``n``-gram shingles of a token-array expression.

    The token array is referenced only at TOP level (``arrays_zip`` of
    ``n`` shifted slices), never inside the ``transform`` lambda.  The
    earlier formulation — ``transform(sequence(...), i -> concat_ws(' ',
    slice({toks}, i, n)))`` — referenced ``{toks}`` per lambda element,
    which is harmless while ``{toks}`` is a materialized column but
    quadratic the moment Catalyst inlines the tokenizer into it: explode
    sites trigger exactly that (``InferFiltersFromGenerate`` derives
    ``size(shingles) > 0`` from the Generate, filter pushdown carries it
    below every exchange to the scan, and the pushed copy substitutes the
    full ``split(...)`` chain for ``{toks}`` inside the lambda — the text
    is re-split once per shingle, O(words²) per document, executed at the
    scan's file parallelism).  Measured at sf1 (50k docs): the postings
    build for t96 dropped 33.5s → ~1s from this rewrite alone.  With the
    zip form every derived/pushed/inlined copy stays O(n·words) per row.

    Delegates to :func:`~tidierdb_jl_spark.llm.textstats.ngram_array_expr`
    (the shared top-level-reference-only formulation) and adds the
    ``array_distinct`` set semantics Jaccard needs; short docs fall back
    to one whole-text shingle so near-identical short docs still collide.
    """
    from .textstats import ngram_array_expr

    return f"array_distinct({ngram_array_expr(toks, n, short='whole')})"


def similarity_join(
    left_tf,
    right_tf,
    left_id: str,
    right_id: str,
    left_col: str = "text",
    right_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None | str = "auto",
):
    """Fuzzy CROSS-TABLE match by word-``n``-gram Jaccard — the entity-
    matching primitive (align documents across two sources, match titles
    to references, ...).  Same shingle-inverted-index shape as
    :func:`ngram_jaccard_pairs` but across two tables: explode postings
    on both sides, equi-join on the shingle, count common shingles per
    (left, right) pair, score ``common / (|a| + |b| - common)``.

    Work scales with shingle co-occurrence, never |L| x |R| — PROVIDED no
    shingle is hot on both sides: a boilerplate shingle with document
    frequency ``d`` contributes O(d_l x d_r) candidate pairs and ~zero
    signal, the one way this plan goes quadratic.  So ``max_doc_freq``
    (drop shingles whose combined document frequency exceeds it, BOTH
    sides) defaults ON at 200 — the same skew cap as minhash's
    ``max_bucket`` — which bounds any one shingle's candidates at ~200
    x its rarer side.  Pass ``None`` for the exact result (identical to
    the quadratic cross join minus zero-overlap pairs); with the cap,
    pairs whose overlap is mostly stop-shingles score lower or drop.
    Returns (left_id, right_id, jaccard) with jaccard >= threshold.
    """
    if max_doc_freq == "auto":
        max_doc_freq = 200
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if left_id == right_id:
        raise ValueError(
            f"left_id and right_id must differ in the output (both {left_id!r}); "
            "rename one side first"
        )

    def postings(tf, id_col, col, alias):
        # spread the SCAN side, not the exploded result: otherwise the
        # tokenize/shingle/explode chain below the exchange runs at the
        # source's file parallelism (1-2 tasks for a single-file corpus)
        toks = tokenize_expr(col)
        return (
            _spread(tf.df)
            .selectExpr("*", f"{toks} AS __t")
            .selectExpr(f"{id_col} AS {alias}", f"{_shingle_expr('__t', n)} AS __sh")
            .selectExpr(alias, f"size(__sh) AS {alias}_sz", "__sh")
            .select(alias, f"{alias}_sz", F.explode("__sh").alias("__s"))
        )

    lp = postings(left_tf, left_id, left_col, "__lid")
    rp = postings(right_tf, right_id, right_col, "__rid")
    if max_doc_freq is not None:
        stop = (
            lp.select("__s").unionAll(rp.select("__s"))
            .groupBy("__s").count()
            .filter(F.col("count") > max_doc_freq)
            .select("__s")
        )
        lp = lp.join(F.broadcast(stop), "__s", "left_anti")
        rp = rp.join(F.broadcast(stop), "__s", "left_anti")
    common = (
        lp.join(rp, "__s")
        .groupBy("__lid", "__lid_sz", "__rid", "__rid_sz")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    out = common.select(
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        (
            F.col("__common").cast("double")
            / (F.col("__lid_sz") + F.col("__rid_sz") - F.col("__common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    from ..core import TidyFrame

    return TidyFrame(out)


def ngram_jaccard_pairs(
    tf,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    block_cols: tuple = (),
    max_doc_freq: int | None = None,
):
    """Exact word-``n``-gram Jaccard pairs via a **shingle inverted
    index**: explode (doc, shingle) postings, equi-join on the shingle,
    count common shingles per pair, then
    ``jaccard = common / (|a| + |b| - common)``.

    Identical result to the naive all-pairs-within-block product except
    that zero-overlap pairs (jaccard exactly 0) are never emitted, but
    the join is an equi-join on the shingle — work scales with shingle
    co-occurrence, not block size².  ``block_cols`` adds extra equality
    constraints; ``max_doc_freq`` (optional) drops stop-shingles whose
    document frequency exceeds it — each contributes O(df²) candidate
    pairs and ~zero signal; set it at scale, leave None for exactness.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    Algorithm note (measured, sf1, 50k docs / 2.65M postings, dense
    31-token vocab): a full PPJoin rewrite (df-ordered prefix filter +
    positional filter + ``array_intersect`` verify, Xiao et al. WWW'08)
    was tried and REJECTED — at threshold 0.3 the prefix is 70% of every
    doc, candidates only dropped 27.4M → 11.0M, and verification then
    shipped two ~53-string arrays per candidate through two joins (~29 GB
    + one hash-set allocation per row: 138 s vs 7 s for this count-based
    verify, whose per-candidate cost is one shuffled 25-byte row).
    Prefix filtering pays at high thresholds; the corpus-dedup operating
    point (0.3) is exactly where counting wins.  What DOES matter is
    parallelism of the postings build: the ``_spread`` below sits on the
    SCAN side of the shingle explode so tokenize/shingle/explode never
    run at single-file parallelism (was: spread after explode — the whole
    postings build pinned to 1-2 tasks, 25 s of the old 30 s total).
    """
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    t = float(threshold)
    toks = tokenize_expr(text_col)
    # spread the scan FIRST: a single-file corpus arrives in 1-2
    # partitions, and everything below the first exchange (tokenize,
    # shingle, explode, the map side of the candidate join) would
    # otherwise run at that file parallelism
    base = _spread(tf.df if hasattr(tf, "df") else tf)
    docs = base.selectExpr(
        f"{id_col} AS __id", f"{_shingle_expr(toks, n)} AS __sh", *block_cols
    ).selectExpr("__id", "size(__sh) AS __sz", "__sh", *block_cols)
    post = docs.select(
        "__id", "__sz", *block_cols, F.explode("__sh").alias("__s")
    )
    post = track(post)  # read by both sides of the self-join
    if max_doc_freq is not None:
        stop = post.groupBy("__s").count().filter(F.col("count") > max_doc_freq)
        post = post.join(F.broadcast(stop.select("__s")), "__s", "left_anti")
    l, r = post.alias("l"), post.alias("r")
    cond = (F.col("l.__s") == F.col("r.__s")) & (F.col("l.__id") < F.col("r.__id"))
    for c in block_cols:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    if t > 0:
        # exact length filter (Arasu/Bayardo similarity-join standard):
        # J(a,b) >= t  =>  t·max(|a|,|b|) <= min(|a|,|b|) — prunes
        # size-mismatched candidates before the pair-count shuffle
        cond = cond & (F.col("l.__sz") * t <= F.col("r.__sz"))
        cond = cond & (F.col("r.__sz") * t <= F.col("l.__sz"))
    common = (
        l.join(r, cond)
        .groupBy(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.col("l.__sz").alias("__sza"),
            F.col("r.__sz").alias("__szb"),
        )
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    pairs = common.select(
        "id_a",
        "id_b",
        (
            F.col("__common").cast("double")
            / (F.col("__sza") + F.col("__szb") - F.col("__common"))
        ).alias("jaccard"),
    )
    from ..core import TidyFrame

    return TidyFrame(pairs.filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _make_minhash_udf(num_perm: int):
    """(a*h+b) mod p folded over all permutations, vectorized ACROSS the
    Arrow batch: documents are packed into groups of ~16M (shingle, perm)
    cells, hashed in one numpy expression per group, and the per-document
    minima come from one ``np.minimum.reduceat`` over the group's doc
    boundaries.  The earlier per-document loop paid ~100 µs of numpy
    dispatch per doc on (53, num_perm)-sized operands — overhead, not
    math — which dominated the signature stage at 500k docs (sf10).
    Deterministic (fixed params, no RNG); a*h < 2^30 · 2^32 = 2^62, so
    int64 never overflows (same bound as the _A_MAX comment)."""
    params = _perm_params(num_perm)
    A = np.array([a for a, _ in params], dtype=np.int64)  # (k,)
    B = np.array([b for _, b in params], dtype=np.int64)
    # ~1M (shingle, perm) cells per vector op: the (chunk, num_perm)
    # temporaries stay ~8 MB — inside L3 — where a 16M-cell chunk's
    # 128 MB temporaries ran 7x slower on pure memory traffic
    chunk = max(1, 1_000_000 // num_perm)

    def mh(h: pandas.Series) -> pandas.Series:
        arrs = [np.asarray(a, dtype=np.int64) for a in h]
        empty = np.full(num_perm, _P, np.int64)
        out: list = [None] * len(arrs)
        i = 0
        while i < len(arrs):
            j, tot = i, 0
            while j < len(arrs) and (tot == 0 or tot + len(arrs[j]) <= chunk):
                tot += len(arrs[j])
                j += 1
            seg = [a for a in arrs[i:j] if len(a)]
            if seg:
                flat = np.concatenate(seg)
                hashed = (flat[:, None] * A + B) % _P  # (tot, k)
                lens = np.fromiter((len(a) for a in seg), np.int64,
                                   count=len(seg))
                starts = np.zeros(len(seg), np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                mins = np.minimum.reduceat(hashed, starts, axis=0)
            mi = 0
            for idx in range(i, j):
                if len(arrs[idx]):
                    out[idx] = mins[mi]
                    mi += 1
                else:
                    out[idx] = empty
            i = j
        return pandas.Series(out)

    mh.__annotations__ = {"h": pandas.Series, "return": pandas.Series}
    return F.pandas_udf(T.ArrayType(T.LongType()))(mh)


def _minhash_udf_name(spark, num_perm: int) -> str:
    """Session-registered, params-keyed name for the MinHash fold UDF
    (see simsearch._sig_udf_name): warm builds pay one catalog probe
    instead of re-pickling the judf (~51 py4j trips/build)."""
    from ..sqlbatch import register_udf_cached

    return register_udf_cached(
        spark, "tidy_minhash", ("minhash", int(num_perm)),
        lambda: _make_minhash_udf(num_perm),
    )


def minhash_signature(
    tf, id_col: str, text_col: str = "text", num_perm: int = 64, shingle: int = 3
):
    """Add a ``minhash`` array<bigint> column (length ``num_perm``).

    Shingles are word ``shingle``-grams; base hashes are 32-bit murmur
    (`hash()`), lifted to [0, 2^32) so the universal-hash family
    (a*x+b) mod p stays within bigint range.  Shingling + base hashing are
    JVM expressions; the ``num_perm``-way min-fold is one vectorized Arrow
    batch per task (deterministic — fixed params, no RNG).
    """
    from ..core import TidyFrame

    toks = tokenize_expr(text_col)
    sh = _shingle_expr("__toks", shingle)
    # _spread: the tokenize/shingle/base-hash chain and the Arrow min-fold
    # run at the corpus scan's parallelism; a single documents.parquet
    # (2-3 partitions) would pin the whole signature build to 3 cores
    out = TidyFrame(_spread(tf.df)).mutate(__toks=toks).mutate(__sh=sh).mutate(
        __h=f"transform(__sh, s -> CAST(hash(s) AS BIGINT) + 2147483648L)"
    )
    name = _minhash_udf_name(tf.df.sparkSession, num_perm)
    out_df = out.df.withColumn("minhash", F.expr(f"{name}(__h)"))
    return TidyFrame(out_df).select(*[c for c in tf.columns], "minhash")


def _band_explode(sdf, bands: int, rows: int):
    """(__id, minhash) → one NARROW row per LSH band: (__id, band, bh).

    The signature array is deliberately NOT carried: the bucket self-join
    shuffles ``bands`` rows per doc, and at num_perm=128 the array is
    ~1 KB/row — carrying it turned the candidate join into a
    multi-gigabyte shuffle (measured 16 GB at sf10) for data only needed
    per CANDIDATE.  Verification joins signatures back from the persisted
    (id, minhash) frame instead — fan-in |candidates|, not |corpus|·bands.
    ``bh`` hashes the band's slice STRUCTURALLY (Spark's hash() over the
    array) — no per-band string building."""
    return sdf.selectExpr(
        "__id",
        f"explode(transform(sequence(0, {bands - 1}), "
        f"b -> struct(b AS band, hash(slice(minhash, b * {rows} + 1, {rows})) AS bh)))"
        " AS bb",
    ).selectExpr("__id", "bb.band AS band", "bb.bh AS bh")


def minhash_dedup_pairs(
    tf,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 200,
    verify: str = "est",
):
    """Candidate pairs from banded LSH, verified per candidate.  Returns
    (id_a, id_b, est_jaccard) with ``verify="est"`` (fraction of equal
    minhash components — cheap, approximate) or (id_a, id_b, jaccard) with
    ``verify="exact"`` (true shingle-set Jaccard of each candidate — the
    production pattern: banding only generates candidates, the exact
    metric makes the final call, so the output equals the exact all-pairs
    result whenever banding recall is complete; deterministic, no RNG).

    Pipeline: signature (map) → explode bands (×bands) → self-join inside
    (band, hash) buckets → per-candidate verify.  ``max_bucket`` drops
    degenerate buckets (boilerplate) to keep the join quadratic only in
    genuinely similar groups.
    """
    if verify not in ("est", "exact"):
        raise ValueError(f"unknown verify mode {verify!r} (expected 'est' or 'exact')")
    rows = num_perm // bands
    # Persist the narrow (id, signature) projection: it is read three times
    # (bucket-size census + both sides of the self-join) and each read would
    # otherwise recompute shingling + hashing over the full text.  At scale
    # the signature frame is ~0.5 KB/doc — orders of magnitude below the
    # corpus — so MEMORY_AND_DISK is safe.
    shf = None
    if verify == "exact":
        # The exact verify needs the shingle sets anyway — build the
        # (id, shingles) frame FIRST and derive the signatures from it, so
        # the corpus text is tokenized + shingled ONCE instead of twice
        # (the signature subtree and the verify subtree are not identical,
        # so Spark cannot share them; the cached shingle frame can).
        # Expression chain matches minhash_signature exactly ⇒ identical
        # signatures.
        base = _spread(tf.df).selectExpr(
            f"{id_col} AS __id", f"{tokenize_expr(text_col)} AS __toks"
        )
        shf = track(
            base.selectExpr("__id", f"{_shingle_expr('__toks', shingle)} AS __sh")
        )
        hashed = shf.selectExpr(
            "__id",
            "transform(__sh, s -> CAST(hash(s) AS BIGINT) + 2147483648L) AS __h",
        )
        name = _minhash_udf_name(tf.df.sparkSession, num_perm)
        sdf = track(hashed.selectExpr("__id", f"{name}(__h) AS minhash"))
    else:
        sig = minhash_signature(tf, id_col, text_col, num_perm, shingle)
        sdf = track(sig.df.select(F.col(id_col).alias("__id"), "minhash"))
    banded = _band_explode(sdf, bands, rows)

    # cap pathological buckets before pairing.  The hot-bucket list is
    # persisted: the anti-join's broadcast subtree appears on BOTH sides of
    # the self-join and Spark does not reuse the exchange across them
    # (verified: ReusedExchange absent from the executed plan), so an
    # unpersisted census — a full shuffle of the banded frame — would run
    # twice.  The list itself is near-empty (only buckets > max_bucket).
    bucket_sizes = banded.groupBy("band", "bh").count()
    hot = track(bucket_sizes.filter(f"`count` > {max_bucket}").select("band", "bh"))
    banded = banded.join(F.broadcast(hot), ["band", "bh"], "left_anti")

    l = banded.alias("l")
    r = banded.alias("r")
    cand = (
        l.join(
            r,
            F.expr("l.band = r.band AND l.bh = r.bh AND l.__id < r.__id"),
        )
        .selectExpr("l.__id AS id_a", "r.__id AS id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    from ..core import TidyFrame

    if verify == "est":
        sa = sdf.selectExpr("__id AS id_a", "minhash AS __ma")
        sb = sdf.selectExpr("__id AS id_b", "minhash AS __mb")
        pairs = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .selectExpr(
                "id_a",
                "id_b",
                "CAST(size(filter(zip_with(__ma, __mb, (x, y) -> x = y), v -> v)) AS DOUBLE)"
                " / size(__ma) AS est_jaccard",
            )
            .filter(F.col("est_jaccard") >= threshold)
        )
        return TidyFrame(pairs)

    # exact verify: join each candidate pair back to its shingle sets and
    # score true Jaccard.  The shingle frame is narrow (id + distinct
    # shingles), already cached above (it also fed the signatures), and
    # the join fan-in is |candidates|, not |corpus|².
    a = shf.selectExpr("__id AS id_a", "__sh AS __sha")
    b = shf.selectExpr("__id AS id_b", "__sh AS __shb")
    pairs = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .selectExpr("*", "size(array_intersect(__sha, __shb)) AS __common")
        .selectExpr(
            "id_a",
            "id_b",
            "CAST(__common AS DOUBLE)"
            " / (size(__sha) + size(__shb) - __common) AS jaccard",
        )
        .filter(F.col("jaccard") >= threshold)
    )
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


def minhash_dedup_incremental(
    new_tf,
    seen_sig,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 200,
):
    """Near-dup dedup of a NEW batch against the ingested corpus' stored
    MinHash **signature frame** (``seen_sig``: the (id, minhash) output of
    :func:`minhash_signature`, persisted at ingest time) plus within-batch
    pairs — the MinHash twin of :func:`exact_dedup_incremental`.

    Returns the new batch plus ``minhash`` and ``dup_of`` (NULL → keep;
    else the smallest paired id, history or batch — with monotonically
    growing ids this equals what a full-corpus :func:`minhash_dedup`
    would assign).  Verification is the est-Jaccard (signature-component
    agreement): history TEXT is never stored or re-read, so an ingest
    costs O(batch) signatures + one banded equi-join against the
    signature store (~0.5 KB/doc at num_perm=64).
    """
    rows = num_perm // bands
    new_sig = minhash_signature(new_tf, id_col, text_col, num_perm, shingle)
    nsd = track(new_sig.df.selectExpr(f"{id_col} AS __id", "minhash"))
    nb = _band_explode(nsd, bands, rows)
    sb = _band_explode(
        seen_sig.df.selectExpr(f"{id_col} AS __id", "minhash"), bands, rows
    )
    # joint bucket census (same cap a full-corpus run would apply).
    # Persisted for the same reason as the batch path: two broadcast
    # anti-joins each rebuild the census shuffle otherwise.
    allb = nb.unionAll(sb)
    hot = track(
        allb.groupBy("band", "bh").count()
        .filter(f"`count` > {max_bucket}").select("band", "bh")
    )
    nb = nb.join(F.broadcast(hot), ["band", "bh"], "left_anti")
    sb = sb.join(F.broadcast(hot), ["band", "bh"], "left_anti")

    est = (
        "CAST(size(filter(zip_with(__ml, __mr, (x, y) -> x = y), v -> v)) AS DOUBLE)"
        " / size(__ml)"
    )
    ssd = seen_sig.df.selectExpr(f"{id_col} AS __id", "minhash")

    def partners(left, right, left_sig, right_sig, cond):
        # band rows are narrow (see _band_explode); signatures join back
        # per CANDIDATE from the (id, minhash) frames.  ``cond`` is a SQL
        # fragment — the whole join condition ships as one expr (§7.3).
        l, r = left.alias("l"), right.alias("r")
        cand = (
            l.join(r, F.expr(f"l.band = r.band AND l.bh = r.bh AND {cond}"))
            .selectExpr("l.__id AS __nid", "r.__id AS __pid")
            .dropDuplicates(["__nid", "__pid"])
        )
        ml = left_sig.selectExpr("__id AS __nid", "minhash AS __ml")
        mr = right_sig.selectExpr("__id AS __pid", "minhash AS __mr")
        return (
            cand.join(ml, "__nid")
            .join(mr, "__pid")
            .selectExpr("__nid", "__pid", f"{est} AS __est")
            .filter(F.col("__est") >= threshold)
        )

    vs_seen = partners(nb, sb, nsd, ssd, "true")
    within = partners(nb, nb, nsd, nsd, "r.__id < l.__id")
    best = (
        vs_seen.unionAll(within)
        .groupBy("__nid")
        .agg(F.min("__pid").alias("dup_of"))
    )
    out = (
        new_sig.df.join(best, F.col(id_col) == F.col("__nid"), "left")
        .drop("__nid")
    )
    from ..core import TidyFrame

    return TidyFrame(out)


def connected_components(
    pairs_tf,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
):
    """Connected components over a duplicate-pair edge list by min-label
    propagation: every node starts labeled with its own id; each round a
    node takes the minimum label among itself and its neighbors;
    convergence in O(component diameter) rounds gives the transitive
    closure that one-round min-id dedup approximates.  Returns
    (id, comp) for every node that appears in an edge.

    Scale shape: per round one equi-join (edges ⋈ labels on the source)
    plus one groupBy min — the distributed union-find workhorse for
    dedup-cluster construction.  ``localCheckpoint`` each round truncates
    the lineage, so plans stay O(1) deep regardless of iterations; the
    convergence probe is a count on the changed-label frame.  Duplicate
    clusters in a real corpus have tiny diameters (a few hops), so the
    loop exits after 2-4 rounds.
    """
    global LAST_CC_ROUNDS
    pdf = pairs_tf.df if hasattr(pairs_tf, "df") else pairs_tf
    # both edge directions from ONE pass over the pair list: a
    # union(pairs, pairs.swapped) re-executes the (often expensive —
    # similarity-join) pair pipeline once per branch; exploding a
    # two-element struct array symmetrizes in the same scan
    edges = (
        pdf.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("__src"), F.col(id_b).alias("__dst")),
                    F.struct(F.col(id_b).alias("__src"), F.col(id_a).alias("__dst")),
                )
            ).alias("__e")
        )
        .select("__e.__src", "__e.__dst")
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("__src").alias("__id"))
        .distinct()
        .select("__id", F.col("__id").alias("__comp"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["__src"] == labels["__id"])
            .groupBy("__dst")
            .agg(F.min("__comp").alias("__nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels["__id"] == nbr_min["__dst"], "left")
            .select(
                "__id",
                F.least(
                    F.col("__comp"), F.coalesce("__nbr", F.col("__comp"))
                ).alias("__comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "__id")
            .filter("n.__comp != o.__comp")
            .count()
        )
        labels = new_labels
        LAST_CC_ROUNDS = it + 1
        if changed == 0:
            break
    from ..core import TidyFrame

    return TidyFrame(
        labels.select(F.col("__id").alias("id"), F.col("__comp").alias("comp"))
    )


def dup_clusters(tf, pairs_tf, id_col: str, id_a: str = "id_a", id_b: str = "id_b"):
    """Assign every document its duplicate-cluster id: the transitive
    closure of the pair list (``connected_components``), with singletons
    keeping their own id.  Returns the input columns plus ``keep_id`` —
    filter ``id == keep_id`` to keep one canonical doc per cluster."""
    # Reserved aliases: if the caller's id_col is literally "id"/"comp",
    # dropping by bare name would drop both same-named columns.
    cc = connected_components(pairs_tf, id_a, id_b).df.select(
        F.col("id").alias("__cc_id"), F.col("comp").alias("__cc_comp")
    )
    out = (
        tf.df.join(cc, tf.df[id_col] == cc["__cc_id"], "left")
        .drop("__cc_id")
        .withColumn("keep_id", F.coalesce("__cc_comp", F.col(id_col)))
        .drop("__cc_comp")
    )
    from ..core import TidyFrame

    return TidyFrame(out)


def resolve_duplicates(
    tf,
    pairs_tf,
    id_col: str,
    score_col: str | None = None,
    keep: str = "max",
    id_a: str = "id_a",
    id_b: str = "id_b",
):
    """Pick ONE canonical document per duplicate cluster by a quality
    policy — the production refinement of min-id dedup: when a cluster
    holds a clean original and three truncated mirrors, keep the best
    one, not the smallest id.

    Returns the input columns plus ``cluster_id`` (transitive-closure
    label from :func:`connected_components`; singletons get their own
    id) and ``canonical_id`` (the chosen survivor's id) — filter
    ``{id} == canonical_id`` to materialize the deduped corpus.
    ``score_col=None`` keeps the smallest id (same survivor set as
    :func:`dup_clusters`); otherwise the cluster's ``max`` (or ``min``)
    score wins, ties broken deterministically by smallest id.

    Scale shape: after clustering, one aggregation for the per-cluster
    best score, one membership equi-join, and one aggregation for the
    deterministic tie-break — everything keyed on ``cluster_id``, no
    windows, no sorts of the corpus.
    """
    from ..core import TidyFrame

    if keep not in ("max", "min"):
        raise ValueError(f"keep must be 'max'|'min', got {keep!r}")
    clustered = dup_clusters(tf, pairs_tf, id_col, id_a, id_b).df.withColumnRenamed(
        "keep_id", "cluster_id"
    )
    if score_col is None:
        out = clustered.withColumn("canonical_id", F.col("cluster_id"))
        return TidyFrame(out)

    agg = F.max(score_col) if keep == "max" else F.min(score_col)
    best = clustered.groupBy("cluster_id").agg(agg.alias("__best"))
    winners = (
        clustered.join(best, "cluster_id")
        .where(F.col(score_col) == F.col("__best"))
        .groupBy("cluster_id")
        .agg(F.min(id_col).alias("canonical_id"))
    )
    out = clustered.join(winners, "cluster_id").select(
        *[c for c in clustered.columns if c != "cluster_id"],
        "cluster_id", "canonical_id",
    )
    return TidyFrame(out)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(
    tf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    nbits: int = 4,
    bands: int = 16,
):
    """Near-duplicate pairs by embedding cosine similarity: (id_a, id_b,
    cosine) with id_a < id_b and cosine >= threshold.

    ``method="exact"`` scores every pair — quadratic, for oracles and small
    corpora.  ``method="lsh"`` (default, the 100 TB path) generates
    candidates from random-hyperplane LSH buckets (same AND-OR
    construction as :func:`~tidierdb_jl_spark.llm.simsearch.lsh_cosine_topk`)
    and exact cosine verifies only bucket-mates — near-identical vectors
    agree on nearly all sign bits, so recall at a 0.95-ish threshold is
    high while the join stays an equi-join on (band, signature).
    """
    from .simsearch import _dot, _norm, _to_double, _hyperplanes, _sig_udf_name

    vec = tf.df.select(
        F.col(id_col).alias("__id"), F.expr(_to_double(vec_col)).alias("__v")
    )
    vec = track(vec)

    if method == "exact":
        # BLAS-tiled exact scoring.  The obvious theta-join formulation
        # (l.__id < r.__id, per-pair interpreted array HOFs) measured 15
        # MINUTES at 50k vectors; the same O(n²d) flops as block matrix
        # multiplies against a broadcast row-normalized matrix run in
        # seconds.  Exact mode is the oracle/small-corpus path by
        # contract — its broadcast is O(n·d) — so gathering the vectors
        # once to the driver is its bounded action; at corpus scale use
        # method="lsh" (banded equi-join, never all-pairs).
        import numpy as np

        from ..core import TidyFrame

        spark = tf.df.sparkSession
        id_type = vec.schema["__id"].dataType.simpleString()
        out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"
        cap = EXACT_DRIVER_CAP
        capped = vec.limit(cap + 1).collect()
        if len(capped) > cap:
            raise ValueError(
                f"embedding_cosine_pairs(method='exact') gathers all "
                f"vectors to the driver; input exceeds {cap} rows — "
                f"use method='lsh' (distributed banded equi-join) for "
                f"corpus-scale inputs"
            )
        rows = capped
        if not rows:
            return TidyFrame(spark.createDataFrame([], out_schema))
        order = sorted(range(len(rows)), key=lambda i: rows[i]["__id"])
        ids = [rows[i]["__id"] for i in order]
        M = np.array([rows[i]["__v"] for i in order], dtype=np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        nz = norms.ravel() > 0  # zero vectors match nothing (no pair, not 0)
        norms[norms == 0] = 1.0
        M /= norms
        n = len(ids)
        bc = spark.sparkContext.broadcast((ids, M, nz))
        par = spark.sparkContext.defaultParallelism
        block = max(128, -(-n // max(1, 2 * par)))
        starts = list(range(0, n, block))
        blocks_df = spark.createDataFrame(
            [(s,) for s in starts], "start long"
        ).repartition(len(starts))

        thr = float(threshold)

        def score(batches):
            import pandas as pd

            b_ids, b_M, b_nz = bc.value
            nn = len(b_ids)
            for pdf in batches:
                for s in pdf["start"]:
                    s = int(s)
                    e = min(s + block, nn)
                    sims = b_M[s:e] @ b_M.T  # (e-s, n) one BLAS call
                    for li in range(e - s):
                        gi = s + li
                        if not b_nz[gi]:
                            continue  # zero vector: cosine undefined
                        js = np.nonzero(
                            (sims[li, gi + 1 :] >= thr) & b_nz[gi + 1 :]
                        )[0] + gi + 1
                        if len(js):
                            yield pd.DataFrame(
                                {
                                    "id_a": [b_ids[gi]] * len(js),
                                    "id_b": [b_ids[j] for j in js],
                                    "cosine": sims[li, js],
                                }
                            )

        return TidyFrame(blocks_df.mapInPandas(score, out_schema))

    if method != "lsh":
        raise ValueError(f"unknown method {method!r} (expected 'exact' or 'lsh')")

    dim = len(tf.df.select(vec_col).first()[0])
    sig_name = _sig_udf_name(
        tf.df.sparkSession, _hyperplanes(dim, nbits * bands), nbits, bands
    )
    # pre-normalize once so the per-candidate verify is a single dot
    # product (three interpreted array passes -> one)
    # let-binding: naming the norm inside the element lambda would
    # re-run aggregate() once per component (O(d²) per row) after
    # Catalyst inlines it; binding (vector, norm) to a lambda variable
    # keeps it one aggregate per row
    norm = vec.select(
        "__id",
        F.expr(
            "flatten(transform("
            "array(struct(__v AS v, sqrt(aggregate(__v, 0.0D, (a, y) -> a + y * y)) AS n)), "
            "s -> transform(s.v, x -> x / s.n)))"
        ).alias("__u"),
    )
    norm = track(norm)
    # _outer: plain posexplode's implicit size>0 filter pushes below the
    # projection and double-evaluates the pandas UDF; signatures are never
    # empty, so outer is identical.  The (id, sigs) frame is persisted
    # BEFORE the explode: the banded frame feeds both sides of the
    # self-join and Spark re-executes unpersisted subtrees per side, so
    # without the persist the hyperplane-sign pandas UDF would cross the
    # Python boundary twice over the full corpus (same reason the minhash
    # path persists its signature frame).  ~bands ints per row — far
    # narrower than the vectors.
    sigs = track(norm.selectExpr("__id", f"{sig_name}(__u) AS __sigs"))
    banded = sigs.select(
        "__id", F.posexplode_outer("__sigs").alias("__band", "__sig")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__sig") == F.col("r.__sig"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    la = norm.select(F.col("__id").alias("id_a"), F.col("__u").alias("__ua"))
    rb = norm.select(F.col("__id").alias("id_b"), F.col("__u").alias("__ub"))
    out = (
        cand.join(la, "id_a")
        .join(rb, "id_b")
        .select("id_a", "id_b", F.expr(_dot("__ua", "__ub")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    from ..core import TidyFrame

    return TidyFrame(out)


def embedding_dedup_incremental(
    new_tf,
    seen_tf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 4,
    bands: int = 16,
):
    """Near-dup dedup of a NEW embedding batch against the ingested
    corpus' stored vectors — the embedding twin of
    :func:`minhash_dedup_incremental` and the third leg of the
    incremental-ingest family (exact / minhash / embedding).

    Candidates come from the same deterministic random-hyperplane LSH
    banding both frames share (hyperplanes are seeded literals, so
    signatures computed at different ingest times still collide for
    near-identical vectors); exact cosine verifies every candidate, so
    there are NO false positives.  Returns the new batch plus ``dup_of``
    (NULL → keep; else the smallest paired id, history or batch — with
    monotonically growing ids this equals a full-corpus
    :func:`embedding_cosine_pairs`-based dedup).

    Scale shape: O(batch) signatures + one banded equi-join against the
    seen side; the seen side contributes only (id, band, sig) postings
    and unit vectors for verification — never a quadratic product.
    """
    from .simsearch import _dot, _to_double, _hyperplanes, _sig_udf_name

    dim = len(new_tf.df.select(vec_col).first()[0])
    sig_name = _sig_udf_name(
        new_tf.df.sparkSession, _hyperplanes(dim, nbits * bands), nbits, bands
    )
    unit = (
        "transform(__v, x -> x / sqrt(aggregate(__v, 0.0D, (a, y) -> a + y * y)))"
    )

    def prep(tf):
        vec = tf.df.select(
            F.col(id_col).alias("__id"), F.expr(_to_double(vec_col)).alias("__v")
        ).select("__id", F.expr(unit).alias("__u"))
        sigs = vec.selectExpr("__id", f"{sig_name}(__u) AS __sigs")
        return vec, sigs

    def explode_sigs(sigs):
        return sigs.select(
            "__id", F.posexplode_outer("__sigs").alias("__band", "__sig")
        )

    nvec, nsigs = prep(new_tf)
    nvec = track(nvec)  # read by banding + both verify joins
    # the NEW batch's postings feed THREE join sides (vs-seen left,
    # within-batch l and r); persist the pre-explode (id, sigs) frame so
    # the sign-bit pandas UDF runs once over the batch, not three times.
    # The SEEN side's postings are used once — deliberately NOT persisted
    # (at scale that side is the full corpus; one streamed pass is the
    # documented shape).
    nsigs = track(nsigs)
    nb = explode_sigs(nsigs)
    svec, ssigs = prep(seen_tf)
    sb = explode_sigs(ssigs)

    def partners(left, right, rvecs, cond):
        l, r = left.alias("l"), right.alias("r")
        cand = (
            l.join(r, (F.col("l.__band") == F.col("r.__band"))
                   & (F.col("l.__sig") == F.col("r.__sig")) & cond)
            .select(F.col("l.__id").alias("__nid"), F.col("r.__id").alias("__pid"))
            .dropDuplicates(["__nid", "__pid"])
        )
        la = nvec.select(F.col("__id").alias("__nid"), F.col("__u").alias("__ua"))
        rb = rvecs.select(F.col("__id").alias("__pid"), F.col("__u").alias("__ub"))
        return (
            cand.join(la, "__nid")
            .join(rb, "__pid")
            .select("__nid", "__pid", F.expr(_dot("__ua", "__ub")).alias("__cos"))
            .filter(F.col("__cos") >= threshold)
        )

    vs_seen = partners(nb, sb, svec, F.lit(True))
    within = partners(nb, nb, nvec, F.col("r.__id") < F.col("l.__id"))
    best = (
        vs_seen.unionAll(within)
        .groupBy("__nid")
        .agg(F.min("__pid").alias("dup_of"))
    )
    out = (
        new_tf.df.join(best, F.col(id_col) == F.col("__nid"), "left")
        .drop("__nid")
    )
    from ..core import TidyFrame

    return TidyFrame(out)


def _make_cell_sim_udf(centroids):
    """Assign each unit vector to its argmax-cosine centroid AND return the
    cosine to that centroid — one numpy matmul per Arrow batch."""

    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def assign(v: pandas.Series) -> pandas.DataFrame:
        X = np.stack(v.to_numpy())
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        cell = np.argmax(sims, axis=1)
        return pandas.DataFrame(
            {"cell": cell.astype("int32"), "sim": sims[np.arange(len(X)), cell]}
        )

    assign.__annotations__ = {"v": pandas.Series, "return": pandas.DataFrame}
    return F.pandas_udf("cell INT, sim DOUBLE")(assign)


def _cell_sim_udf_name(spark, centroids) -> str:
    """Session-registered, params-keyed name (see _minhash_udf_name)."""
    from ..sqlbatch import register_udf_cached

    key = (
        "cell_sim",
        tuple(tuple(float(x) for x in row) for row in centroids),
    )
    return register_udf_cached(
        spark, "tidy_cell_sim", key, lambda: _make_cell_sim_udf(centroids)
    )


def semantic_dedup(
    tf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nlist: int = 16,
    refine_iters: int = 5,
    sample_cap: int = 4096,
    keep: str = "farthest",
):
    """**SemDeDup** — semantic deduplication by cluster-scoped embedding
    similarity (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"; public method).

    Pipeline: spherical k-means clusters the embeddings (FAISS-style
    bounded-sample training — see ``simsearch._train_centroids_sample``),
    exact cosine runs ONLY within a cluster (pairs form via an equi-join
    on the cell id, never all-pairs), and each duplicate group keeps one
    representative:

    - ``keep="farthest"`` (the paper's policy): the member with the
      LOWEST cosine to its centroid survives — prune prototypical
      redundancy, keep the most diverse example.
    - ``keep="closest"``: highest centroid cosine survives.
    - ``keep="min_id"``: smallest id (bit-deterministic baseline).

    Returns the input columns plus ``cell`` (cluster), ``centroid_sim``,
    ``cluster_id`` (transitive duplicate-group label; singletons keep
    their own id) and ``canonical_id`` — filter ``{id} == canonical_id``
    to materialize the deduped corpus.

    Scale shape: ONE bounded driver collect (the training sample), one
    Arrow assignment pass, and a self-equi-join keyed on ``cell`` whose
    cost is Σ|cell|² — with ``nlist ∝ corpus_size / target_cell_size``
    (the paper uses ~√n clusters) each cell stays small and the join
    shuffles on a dense int key.  Ties in every policy break on smallest
    id, so results are engine-deterministic.
    """
    from .simsearch import _dot, _to_double, _train_centroids_sample

    if keep not in ("farthest", "closest", "min_id"):
        raise ValueError(f"keep must be farthest|closest|min_id, got {keep!r}")

    vec = tf.df.select(
        F.col(id_col).alias("vec_id"), F.expr(_to_double(vec_col)).alias("__cv")
    )
    if vec.isEmpty():  # no training sample exists; k-means would crash
        from ..core import TidyFrame

        out = (
            tf.df.withColumn("cell", F.lit(None).cast("int"))
            .withColumn("centroid_sim", F.lit(None).cast("double"))
            .withColumn("cluster_id", F.col(id_col))
            .withColumn("canonical_id", F.col(id_col))
        )
        return TidyFrame(out)
    centroids = _train_centroids_sample(vec, nlist, refine_iters, sample_cap)
    assign = _cell_sim_udf_name(vec.sparkSession, centroids)
    unit = vec.selectExpr(
        "vec_id",
        "transform(__cv, x -> x / sqrt(aggregate(__cv, 0.0D, (a, y) -> a + y * y)))"
        " AS __u",
        f"{assign}(__cv) AS __a",
    ).selectExpr(
        "vec_id", "__u", "__a.cell AS cell", "__a.sim AS centroid_sim"
    )
    unit = track(unit)

    l, r = unit.alias("l"), unit.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.cell") == F.col("r.cell"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("id_a"),
            F.col("r.vec_id").alias("id_b"),
            F.expr(_dot("l.__u", "r.__u")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

    annotated = tf.df.join(
        unit.select("vec_id", "cell", "centroid_sim"),
        tf.df[id_col] == F.col("vec_id"),
    ).drop("vec_id") if id_col != "vec_id" else tf.df.join(
        unit.select("vec_id", "cell", "centroid_sim"), "vec_id"
    )
    from ..core import TidyFrame

    score = {"farthest": "min", "closest": "max", "min_id": None}[keep]
    return resolve_duplicates(
        TidyFrame(annotated),
        TidyFrame(pairs),
        id_col,
        score_col="centroid_sim" if score else None,
        keep=score or "max",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_udf():
    """Bit-vote over all 64 positions in one numpy pass per Arrow batch
    (replaces 64 interpreted ``aggregate(...)`` expressions, same result)."""
    shifts = np.arange(64, dtype=np.uint64)

    def sh(h: pandas.Series) -> pandas.Series:
        out = np.zeros(len(h), dtype=np.int64)
        for i, arr in enumerate(h):
            if len(arr):
                hv = np.asarray(arr, dtype=np.int64).astype(np.uint64)[:, None]
                votes = (((hv >> shifts) & 1).astype(np.int64) * 2 - 1).sum(axis=0)
                out[i] = ((votes >= 0).astype(np.uint64) << shifts).sum().astype(np.int64)
        return pandas.Series(out)

    sh.__annotations__ = {"h": pandas.Series, "return": pandas.Series}
    return F.pandas_udf(T.LongType())(sh)


def _simhash_udf_name(spark) -> str:
    """Session-registered name (parameterless; see _minhash_udf_name)."""
    from ..sqlbatch import register_udf_cached

    return register_udf_cached(spark, "tidy_simhash", ("simhash",), _simhash_udf)


def simhash_signature(tf, text_col: str = "text", out: str = "simhash"):
    """64-bit SimHash: per-token xxhash64 (JVM), bit-vote per position,
    sign → bit — the vote fold is one vectorized Arrow batch per task."""
    from ..core import TidyFrame

    toks = tokenize_expr(text_col)
    tf2 = TidyFrame(_spread(tf.df)).mutate(
        __th=f"transform({toks}, t -> xxhash64(t))"
    )
    name = _simhash_udf_name(tf.df.sparkSession)
    df = tf2.df.withColumn(out, F.expr(f"{name}(__th)"))
    return TidyFrame(df).select(*[c for c in tf.columns], out)


def simhash_pairs(tf, id_col: str, text_col: str = "text", max_hamming: int = 3):
    """Near-dup pairs by SimHash: band the 64-bit signature into four
    16-bit chunks (pigeonhole: hamming<=3 ⇒ at least one chunk equal),
    bucket-join, verify Hamming distance via bit_count(xor)."""
    # persisted for the same reason as minhash_dedup_pairs: the self-join
    # reads the signature frame twice, 8 bytes/doc vs recomputing the hash
    sig = track(simhash_signature(tf, text_col).df.selectExpr(
        f"{id_col} AS __id", "simhash"
    ))
    banded = sig.selectExpr(
        "__id",
        "simhash",
        "explode(transform(sequence(0, 3), "
        "b -> struct(b AS band, shiftright(simhash, b * 16) & 65535 AS chunk)))"
        " AS bb",
    ).select("__id", "simhash", "bb.band", "bb.chunk")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            F.expr(
                "l.band = r.band AND l.chunk = r.chunk AND l.__id < r.__id"
            ),
        )
        .selectExpr(
            "l.__id AS id_a",
            "r.__id AS id_b",
            "bit_count(l.simhash ^ r.simhash) AS hamming",
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(f"hamming <= {max_hamming}")
    )
    from ..core import TidyFrame

    return TidyFrame(pairs)


# ---------------------------------------------------------------------------
# segment-level (C4 "line") dedup
# ---------------------------------------------------------------------------


def segment_dedup(
    tf,
    id_col: str = "doc_id",
    col: str = "text",
    delim: str = "\\n",
    segments_expr: str | None = None,
    min_chars: int = 1,
    joiner: str | None = None,
    out_col: str = "text_dedup",
):
    """C4-style corpus-global segment dedup: split every document into
    segments (lines by default — ``segments_expr`` swaps in any segmenter,
    e.g. sentence or fixed-token-window chunking), keep exactly ONE
    occurrence of each normalized segment across the WHOLE corpus (the one
    with the lexicographically smallest ``(id, position)``), and rebuild
    each document from its surviving segments in original order.  C4
    (Raffel et al. 2020 §2.2) applies this at three-sentence granularity
    to strip boilerplate (headers, nav bars, license blurbs).

    Returns one row per surviving document: ``(id, out_col, n_seg_total,
    n_seg_kept)``; documents whose every segment was claimed elsewhere
    drop out.  Join back on ``id`` for the other columns.

    Scale shape: two hash shuffles, both on narrow rows — (hash, id, pos,
    segment) for the global keep-first window, then (id, pos, segment)
    for the rebuild — never the full document row.  Skew hazard: a
    boilerplate segment occurring millions of times lands in one window
    partition; the rows are tiny (the window only orders (id, pos)), and
    ``row_number`` short-circuits to one survivor, so the partition stays
    bandwidth-bound, not memory-bound.
    """
    seg_src = segments_expr or f"split({col}, '{delim}')"
    join_sep = joiner if joiner is not None else ("\n" if delim == "\\n" else " ")
    # spread the scan: segmentation + posexplode + md5 are the map side of
    # the keep-first window shuffle and would otherwise run at the
    # source's file parallelism (1-2 tasks for a single-file corpus)
    base = _spread(tf.df).selectExpr(
        f"{id_col}", f"{seg_src} AS __segs"
    ).selectExpr(id_col, "size(__segs) AS n_seg_total", "__segs")
    e = base.selectExpr(
        id_col, "n_seg_total", "posexplode(__segs) AS (pos, __seg)"
    ).filter(f"length(trim(__seg)) >= {min_chars}")
    e = e.selectExpr("*", "md5(lower(trim(__seg))) AS __h")
    # keep-first as a rank-1 window, NOT a min(struct) aggregate.  The
    # aggregate variant was tried in optimization round 12 (partial
    # aggregation collapses local duplicates before the exchange), but
    # Spark plans a struct-valued min as SortAggregate (struct buffers
    # are not hash-aggregable) on BOTH sides of the shuffle, while the
    # window form plans Sort + WindowGroupLimit — a top-1-per-key
    # short-circuit that also collapses duplicates map-side.  Measured
    # head-to-head: neutral at sf0.1/sf1, and the aggregate was 1.11x
    # SLOWER at sf10 (interleaved A/B, matched calibrations) — the
    # wide-struct sort costs more than the rank machinery saves.
    kept = e.selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY __h ORDER BY {id_col}, pos) AS __rn",
    ).filter("__rn = 1")
    rebuilt = kept.groupBy(id_col).agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, __seg))),"
            " s -> s.__seg), '" + join_sep + "') AS " + out_col
        ),
        F.expr("first(n_seg_total) AS n_seg_total"),
        F.expr("CAST(count(*) AS INT) AS n_seg_kept"),
    )
    from ..core import TidyFrame

    return TidyFrame(rebuilt)


# ---------------------------------------------------------------------------
# benchmark contamination check
# ---------------------------------------------------------------------------


def flag_contaminated(
    corpus_tf,
    bench_tf,
    id_col: str = "doc_id",
    col: str = "text",
    bench_col: str = "text",
    n: int = 8,
    out: str = "is_contaminated",
):
    """Train/test contamination check (GPT-3 appendix C / PaLM style):
    flag every corpus document sharing at least one word ``n``-gram with a
    benchmark/eval set.  Documents shorter than ``n`` words fall back to
    whole-text shingles on both sides (consistent, so short exact matches
    still flag).

    Scale shape: the corpus side explodes to narrow ``(id, shingle)``
    rows; the benchmark shingle set (eval suites are tiny relative to a
    training corpus) is distinct-ed and BROADCAST into a left-semi join —
    no corpus shuffle at all.  The flagged-id set is again broadcast for
    the final flag join, so the full pass is: one corpus scan for
    shingling + one for flagging, zero wide exchanges.
    """
    from ..core import TidyFrame
    from .textstats import tokenize_expr

    csh = _shingle_expr(f"({tokenize_expr(col)})", n)
    bsh = _shingle_expr(f"({tokenize_expr(bench_col)})", n)
    ce = corpus_tf.df.selectExpr(id_col, f"explode({csh}) AS __g")
    b = bench_tf.df.selectExpr(f"explode({bsh}) AS __g").distinct()
    bad = (
        ce.join(F.broadcast(b), "__g", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__bad", F.lit(True))
    )
    flagged = (
        corpus_tf.df.join(F.broadcast(bad), id_col, "left")
        .withColumn(out, F.coalesce(F.col("__bad"), F.lit(False)))
        .drop("__bad")
    )
    return TidyFrame(flagged)


def flag_contaminated_semantic(
    corpus_tf,
    bench_tf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    threshold: float = 0.95,
    nbits: int = 4,
    bands: int = 16,
    out: str = "is_contaminated",
):
    """SEMANTIC train/test contamination: flag corpus docs whose embedding
    is near-identical (cosine >= threshold) to any benchmark example —
    catches the paraphrased/reformatted eval leakage the 8-gram check
    (:func:`flag_contaminated`) misses.

    Adds ``out`` (bool) and ``matched_bench_id`` (smallest matching
    benchmark id, NULL when clean).  Candidates come from the shared
    deterministic random-hyperplane banding (same planes both sides —
    near-identical vectors agree on nearly every sign bit), then exact
    cosine verifies every candidate: zero false positives at the stated
    threshold.

    Scale shape: the benchmark side (tiny vs a training corpus) is
    BROADCAST twice — banded signatures into the candidate join, vectors
    into the verify — so the corpus shuffles nothing: one signature pass
    + one flag join.  Same contract as ``embedding_dedup_incremental``,
    with roles fixed (bench = seen, corpus = new).
    """
    from .simsearch import _dot, _hyperplanes, _sig_udf_name, _to_double

    bid = bench_id_col or id_col
    first = corpus_tf.df.select(vec_col).first()
    if first is None:  # empty corpus: nothing to flag, dim unknowable
        from ..core import TidyFrame

        bid_type = dict(
            (f.name, f.dataType) for f in bench_tf.df.schema.fields
        ).get(bid, corpus_tf.df.schema[id_col].dataType)
        clean = corpus_tf.df.withColumn(
            "matched_bench_id", F.lit(None).cast(bid_type)
        ).withColumn(out, F.lit(False))
        return TidyFrame(clean)
    dim = len(first[0])
    sig_name = _sig_udf_name(
        corpus_tf.df.sparkSession, _hyperplanes(dim, nbits * bands),
        nbits, bands,
    )

    def prep(df, idc, alias):
        unit = df.select(
            F.col(idc).alias(alias),
            F.expr(
                f"transform({_to_double(vec_col)}, "
                f"x -> x / sqrt(aggregate({_to_double(vec_col)}, 0.0D, (a, y) -> a + y * y)))"
            ).alias(f"__u_{alias}"),
        )
        banded = unit.selectExpr(
            alias,
            f"posexplode_outer({sig_name}(__u_{alias})) AS (__band, __sig)",
        )
        return unit, banded

    cu, cb = prep(corpus_tf.df, id_col, "__cid")
    bu, bb = prep(bench_tf.df, bid, "__bid")
    cand = (
        cb.join(F.broadcast(bb), ["__band", "__sig"])
        .select("__cid", "__bid")
        .dropDuplicates(["__cid", "__bid"])
    )
    hits = (
        cand.join(cu, "__cid")
        .join(F.broadcast(bu), "__bid")
        .where(F.expr(_dot("__u___cid", "__u___bid")) >= threshold)
        .groupBy("__cid")
        .agg(F.min("__bid").alias("matched_bench_id"))
    )
    flagged = (
        corpus_tf.df.join(
            F.broadcast(hits), corpus_tf.df[id_col] == F.col("__cid"), "left"
        )
        .drop("__cid")
        .withColumn(out, F.col("matched_bench_id").isNotNull())
    )
    from ..core import TidyFrame

    return TidyFrame(flagged)
