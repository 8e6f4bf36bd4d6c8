"""Similarity search over embedding columns (beyond the reference).

Two strategies:

- ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  one scan of the corpus, dot products via JVM higher-order functions
  (``zip_with`` + ``aggregate``), per-query top-k with a rank window.
  Linear in corpus size, no shuffle of the corpus itself; the only
  shuffle is the tiny (n_queries × corpus) → top-k aggregation.

- ``lsh_cosine_topk`` — random-hyperplane LSH: deterministic seeded
  hyperplanes folded into the plan as literals, sign-bit signature →
  bucket; candidates only form inside a bucket, then exact cosine
  re-ranks.  The scale path when the query set is large: turns the
  all-pairs product into a bucket-local join.

Vectors are cast to double before any arithmetic so results are
reproducible against a float64 oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["cosine_topk", "lsh_cosine_topk"]


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _norm(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"


def _to_double(col: str) -> str:
    return f"transform({col}, v -> CAST(v AS DOUBLE))"


def cosine_topk(
    corpus_tf,
    query_tf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_id_col: str | None = None,
):
    """Exact top-k cosine neighbors of each query vector.

    Returns (query_id, vec_id, cosine) with rank ties kept.  The query
    side is broadcast — never shuffle the corpus for a lookup workload.
    """
    qid = query_id_col or id_col
    q = query_tf.df.select(
        F.col(qid).alias("query_id"), F.expr(_to_double(vec_col)).alias("__qv")
    )
    c = corpus_tf.df.select(
        F.col(id_col).alias("vec_id"), F.expr(_to_double(vec_col)).alias("__cv")
    )
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    scored = joined.select(
        "query_id",
        "vec_id",
        (
            F.expr(_dot("__qv", "__cv"))
            / (F.expr(_norm("__qv")) * F.expr(_norm("__cv")))
        ).alias("cosine"),
    )
    ranked = scored.select(
        "*",
        F.expr(
            "rank() OVER (PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, vec_id ASC)"
        ).alias("__r"),
    )
    from ..core import TidyFrame

    return TidyFrame(ranked.filter(F.col("__r") <= k).drop("__r"))


def _make_sig_udf(planes: list[list[float]], nbits: int, bands: int):
    # pandas must be importable at type-hint-resolution time, so bind it
    # where pyspark's signature inspection can see it
    import numpy as np
    import pandas
    from pyspark.sql import types as T

    P = np.asarray(planes, dtype=np.float64).T  # (dim, bands*nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)

    def sig(v: pandas.Series) -> pandas.Series:
        X = np.stack(v.to_numpy())  # (n, dim)
        bits = (X @ P >= 0).astype(np.int64)  # (n, bands*nbits)
        buckets = bits.reshape(len(X), bands, nbits) @ weights  # (n, bands)
        return pandas.Series(list(buckets))

    sig.__annotations__ = {"v": pandas.Series, "return": pandas.Series}
    return F.pandas_udf(T.ArrayType(T.LongType()))(sig)


def _hyperplanes(dim: int, nbits: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (xorshift64 → uniform in
    [-1, 1]); no numpy dependency, identical across runs/executors."""
    state = 2463534242
    planes = []
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append((state % 2000001) / 1000000.0 - 1.0)
        planes.append(row)
    return planes


def lsh_cosine_topk(
    corpus_tf,
    query_tf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nbits: int = 4,
    bands: int = 16,
    dim: int | None = None,
    query_id_col: str | None = None,
):
    """Approximate top-k cosine via random-hyperplane LSH, standard AND-OR
    construction: ``bands`` independent signatures of ``nbits`` sign bits
    each.  A pair is a candidate when ANY band's full signature matches
    (OR across bands, AND within a band); exact cosine then re-ranks the
    candidates.  Recall rises with ``bands``, precision/cost with
    ``nbits``.

    Scale shape: corpus signatures are a narrow map; the candidate join is
    an equi-join on (band, signature) — shuffle-friendly, never all-pairs.
    """
    qid = query_id_col or id_col
    if dim is None:
        import pyspark.sql.types as T

        dt = corpus_tf.df.schema[vec_col].dataType
        assert isinstance(dt, T.ArrayType)
        dim = len(corpus_tf.df.select(vec_col).first()[0])

    # Signatures via a vectorized Pandas UDF: per Arrow batch one numpy
    # matmul (n, dim) @ (dim, bands*nbits) → sign bits → per-band bucket
    # ids.  The interpreted higher-order-function dot product is ~1000×
    # slower here (measured); this is the sanctioned Arrow slow path.
    sig_udf = _make_sig_udf(_hyperplanes(dim, nbits * bands), nbits, bands)

    def banded(df, id_alias, out_id):
        sigs = df.select(
            F.col(id_alias).alias(out_id),
            sig_udf(F.expr(_to_double(vec_col))).alias("__sigs"),
        )
        # explode carries only (id, band, sig) — vectors join back later,
        # so the band fan-out never duplicates the embedding payload
        return sigs.select(out_id, F.posexplode("__sigs").alias("__band", "__sig"))

    c = banded(corpus_tf.df, id_col, "vec_id")
    q = banded(query_tf.df, qid, "query_id")
    cand = (
        c.alias("c")
        .join(
            F.broadcast(q.alias("q")),
            (F.col("c.__band") == F.col("q.__band"))
            & (F.col("c.__sig") == F.col("q.__sig"))
            & (F.col("c.vec_id") != F.col("q.query_id")),
        )
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cvec = corpus_tf.df.select(
        F.col(id_col).alias("vec_id"), F.expr(_to_double(vec_col)).alias("__cv")
    )
    qvec = query_tf.df.select(
        F.col(qid).alias("query_id"), F.expr(_to_double(vec_col)).alias("__qv")
    )
    scored = (
        cand.join(cvec, "vec_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                F.expr(_dot("__qv", "__cv"))
                / (F.expr(_norm("__qv")) * F.expr(_norm("__cv")))
            ).alias("cosine"),
        )
    )
    ranked = scored.select(
        "*",
        F.expr(
            "rank() OVER (PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, vec_id ASC)"
        ).alias("__r"),
    )
    from ..core import TidyFrame

    return TidyFrame(ranked.filter(F.col("__r") <= k).drop("__r"))
