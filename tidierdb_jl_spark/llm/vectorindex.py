"""Persistent IVF vector index for cosine ANN over embedding corpora.

The in-repo ANN searches (:func:`~tidierdb_jl_spark.llm.simsearch
.ivf_cosine_topk` and friends) rebuild their index per call — the right
shape for one-shot analytics, the wrong one for a serving corpus that is
ingested once and queried thousands of times.  ``VectorIndexState`` is
the persistent form, and the fourth member of the round-8 state family
(exact :class:`~tidierdb_jl_spark.llm.dedupstate.DedupState`, text
:class:`~tidierdb_jl_spark.llm.dedupstate.NearDupState`, vector near-dup
:class:`~tidierdb_jl_spark.llm.dedupstate.EmbeddingDedupState`; this one
answers *queries* instead of gating *ingest*).

On disk it is the FAISS IVF layout re-expressed as a lake table:

- ``vecs/cell=<i>/*.parquet`` — UNIT-normalized vectors, directory-
  partitioned by their nearest-centroid cell, so a probe of ``nprobe``
  cells is **static partition pruning** (an ``IN`` on the partition
  column; only ``~nprobe/nlist`` of the corpus bytes are ever read).
- ``_vecindex.json`` — the spherical-k-means centroids plus counters.
  Centroids live driver-side (``nlist × dim`` doubles — ~8 MB at
  nlist=1024, dim=1024; the practical driver bound is nlist ≲ 64k).

``add`` is one Arrow-batched assignment pass + one partitioned append —
per-batch cost is O(batch), never O(corpus).  ``query`` broadcasts the
(bounded) query set into the pruned cells and exact-cosine re-ranks, so
the expensive side — the corpus — is read once, shuffled never.  With
``nprobe >= nlist`` the probe covers every cell and the result is
EXACTLY the brute-force scan (tested; the recall knob degrades to the
oracle, not past it).

Centroids are trained once, FAISS-style, on a bounded deterministic
sample of the FIRST ``add`` batch (see
:func:`~tidierdb_jl_spark.llm.simsearch._train_centroids_sample`) —
training cost is independent of corpus size, and later batches reuse the
frozen centroids so cell assignment is stable across the index's life.
The index is append-only (re-adding an id stores both copies — dedup is
an ingest concern: compose with ``EmbeddingDedupState``).  Data and
metadata go through the Hadoop FileSystem API
(:mod:`tidierdb_jl_spark.sources.fsio`) — a state path can be local,
``file://``, ``hdfs://`` or ``s3a://``; meta updates are
write-tmp-then-swap with fsio's per-scheme atomicity contract.
Concurrent writers are out of scope (same contract as a
non-transactional parquet table).  ``retrain`` is the growth escape
hatch: an index that outgrows its first batch re-clusters on a fresh
sample and rewrites the layout (see the method docstring).

Reference parity: the reference (TidierDB.jl) has no vector-index
surface at all; this is beyond-reference, mirroring its persistent-table
verbs (src/TidierDB.jl ``@create_table``) applied to ANN state.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ..core import TidyFrame
from ..sources.fsio import (
    fs_delete,
    fs_exists,
    fs_mkdirs,
    join_path,
    read_text,
    write_text_atomic,
)
from .simsearch import _assign_udf_name, _to_double, _train_centroids_sample

_UNIT = "transform(__v, x -> x / sqrt(aggregate(__v, 0.0D, (a, y) -> a + y * y)))"
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"

# EWMA weight for the per-add mean distance-to-assigned-centroid: recent
# batches dominate (a drifting stream shows within ~1/0.3 batches) while
# one noisy batch cannot flip the stat
_DRIFT_ALPHA = 0.3
# measured advisory threshold (BENCH_VECTORINDEX.md r10, sf1 fixture):
# on-distribution ingest holds drift within ±~0.05; the first fully
# drifted add already reads +0.134 with pruned recall down 0.86 → 0.39 —
# so the trigger sits just above the noise band, not at the damage level
DRIFT_RETRAIN_THRESHOLD = 0.10


def _make_assign_sim_udf(centroids):
    """argmax-cosine assignment PLUS its similarity — struct(cell, sim) —
    so the drift stat rides the same Arrow batch as the assignment (one
    matmul, no second pass)."""
    import numpy as np
    import pandas
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def assign(v: pandas.Series) -> pandas.DataFrame:
        X = np.stack(v.to_numpy())
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        best = np.argmax(sims, axis=1)
        return pandas.DataFrame({
            "cell": best.astype(np.int32),
            "sim": sims[np.arange(len(best)), best],
        })

    assign.__annotations__ = {"v": pandas.Series, "return": pandas.DataFrame}
    return F.pandas_udf(
        T.StructType([
            T.StructField("cell", T.IntegerType()),
            T.StructField("sim", T.DoubleType()),
        ])
    )(assign)


def _assign_sim_udf_name(spark, centroids) -> str:
    """Session-registered, params-keyed name for the struct(cell, sim)
    assignment UDF (see simsearch._sig_udf_name): warm ingest paths skip
    the per-build judf pickling."""
    from ..sqlbatch import register_udf_cached

    key = (
        "assign_sim",
        tuple(tuple(float(x) for x in row) for row in centroids),
    )
    return register_udf_cached(
        spark, "tidy_assign_sim", key,
        lambda: _make_assign_sim_udf(centroids),
    )


class VectorIndexState:
    """Persistent IVF index: ``create`` → ``add`` batches → ``query``."""

    _META = "_vecindex.json"

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = str(path)
        self._meta = meta

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        nlist: int = 64,
        refine_iters: int = 5,
        sample_cap: int = 4096,
    ) -> "VectorIndexState":
        path = str(path)
        if fs_exists(spark, join_path(path, cls._META)):
            raise ValueError(f"VectorIndexState already exists at {path}")
        meta = {
            "nlist": int(nlist),
            "refine_iters": int(refine_iters),
            "sample_cap": int(sample_cap),
            "dim": None,  # captured at first add
            "centroids": None,  # trained at first add
            "n_vecs": 0,
            "n_appends": 0,
        }
        fs_mkdirs(spark, path)
        st = cls(spark, path, meta)
        st._write_meta()
        return st

    @classmethod
    def open(cls, spark, path: str) -> "VectorIndexState":
        meta = json.loads(
            read_text(spark, join_path(str(path), cls._META), tmp_fallback=True)
        )
        return cls(spark, str(path), meta)

    def _write_meta(self) -> None:
        write_text_atomic(
            self.spark, join_path(self.path, self._META), json.dumps(self._meta)
        )

    def stats(self) -> dict:
        c = self._meta["centroids"]
        base = self._meta.get("baseline_dist")
        ewma = self._meta.get("drift_ewma")
        drift = None
        if base is not None and ewma is not None:
            # relative rise of the (EWMA) mean distance-to-assigned-
            # centroid over its value at the current centroids' training
            # epoch: ~0 on-distribution, grows as the add stream drifts.
            # Advisory trigger: retrain() past DRIFT_RETRAIN_THRESHOLD
            # (measured curves in BENCH_VECTORINDEX.md r10)
            drift = round(ewma / max(base, 1e-12) - 1.0, 6)
        return {
            "n_vecs": self._meta["n_vecs"],
            "n_appends": self._meta["n_appends"],
            "nlist": self._meta["nlist"],
            "n_cells": len(c) if c else 0,
            "dim": self._meta["dim"],
            "baseline_dist": base,
            "mean_dist_ewma": ewma,
            "drift": drift,
        }

    def _vecs_path(self) -> str:
        """The CURRENT cell layout's directory.  Versioned
        (``vecs_e<epoch>`` after a retrain/compact): the layout and the
        centroids that define it must flip TOGETHER, and the atomic meta
        write is the only commit primitive fsio guarantees on every
        scheme — so the meta points at the directory instead of the
        directory being swapped in place.  A crash mid-retrain leaves an
        orphan directory (garbage, collected by the next retrain) and a
        fully consistent index."""
        return join_path(self.path, self._meta.get("data_dir", "vecs"))

    def _unit_vecs(self, tf, id_col: str, vec_col: str):
        """(id, unit-normalized double vector) projection of a batch."""
        return tf.df.select(
            F.col(id_col).alias("__id"), F.expr(_to_double(vec_col)).alias("__v")
        ).select("__id", F.expr(_UNIT).alias("__u"))

    def add(self, tf, id_col: str = "vec_id", vec_col: str = "embedding") -> dict:
        """Assign the batch to cells and append it to the index.

        The first ``add`` trains the centroids (bounded deterministic
        sample, driver numpy — the FAISS recipe) and captures the
        dimension; later batches reuse both.  NULL vectors are skipped
        (they cannot be assigned a cell); an all-NULL or empty batch is
        a no-op returning :meth:`stats`.  Returns :meth:`stats`.
        """
        meta = self._meta
        probe = (
            tf.df.select(vec_col).where(F.col(vec_col).isNotNull()).head(1)
        )
        if not probe:
            return self.stats()  # empty / all-NULL batch: no-op
        dim = len(probe[0][0])
        if meta["dim"] is None:
            meta["dim"] = dim
        elif meta["dim"] != dim:
            raise ValueError(
                f"index at {self.path} holds dim={meta['dim']} vectors; "
                f"batch has dim={dim}"
            )
        nvec = (
            self._unit_vecs(
                TidyFrame(tf.df.where(F.col(vec_col).isNotNull())),
                id_col,
                vec_col,
            )
            .localCheckpoint(eager=True)
        )
        first_add = meta["centroids"] is None
        if first_add:
            cvec = nvec.select(F.col("__id").alias("vec_id"), F.col("__u").alias("__cv"))
            meta["centroids"] = _train_centroids_sample(
                cvec, meta["nlist"], meta["refine_iters"], meta["sample_cap"]
            )
            # persist centroids + dim BEFORE the first data append: a
            # crash between the append and a later meta write would
            # otherwise leave on-disk rows bucketed by centroids that
            # were never saved — a retried first add retrains on ITS
            # batch and the orphans are mis-bucketed under the new
            # centroids, silently costing pruned-query recall.  With
            # meta-first, replayed rows re-bucket under the SAME frozen
            # centroids (duplicates, not corruption — compact() rewrites
            # them out).  Counters still update after the append.
            self._write_meta()
        # nvec.sparkSession, NOT self.spark: a foreachBatch frame
        # (stream_add) belongs to the stream's CLONED session, whose
        # temp-function registry is separate — registering on the
        # outer session leaves the projection unresolvable there
        assign = _assign_sim_udf_name(nvec.sparkSession, meta["centroids"])
        from pyspark.sql import Observation

        obs = Observation()
        (
            nvec.selectExpr(
                "__id AS vec_id",
                "__u AS unit",
                f"{assign}(__u) AS __as",
            )
            .select("vec_id", "unit", F.col("__as.cell").alias("cell"),
                    (F.lit(1.0) - F.col("__as.sim")).alias("__d"))
            .repartition(len(meta["centroids"]), "cell")
            .sortWithinPartitions("cell", "vec_id")
            .observe(obs, F.count(F.lit(1)).alias("n"),
                     F.avg("__d").alias("mean_dist"))
            .drop("__d")
            .write.partitionBy("cell")
            .mode("append")
            .parquet(self._vecs_path())
        )
        got = obs.get
        meta["n_vecs"] += int(got["n"])
        meta["n_appends"] += 1
        # drift bookkeeping, O(1) per add: the batch's mean distance-to-
        # assigned-centroid (observed in the SAME job as the write — no
        # extra pass) folds into an EWMA compared against the distance
        # the training epoch itself achieved.  First add IS the training
        # distribution, so it seeds the baseline.
        d = float(got["mean_dist"]) if got["mean_dist"] is not None else None
        if d is not None:
            if first_add or meta.get("baseline_dist") is None:
                meta["baseline_dist"] = d
                meta["drift_ewma"] = d
            else:
                meta["drift_ewma"] = (
                    _DRIFT_ALPHA * d
                    + (1.0 - _DRIFT_ALPHA) * meta["drift_ewma"]
                )
        self._write_meta()
        return self.stats()

    def query(
        self,
        query_tf,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        nprobe: int = 4,
        query_id_col: str | None = None,
        exclude_self: bool = True,
    ) -> TidyFrame:
        """Top-``k`` cosine neighbors from the ``nprobe`` nearest cells.

        Returns (query_id, vec_id, cosine) — ties broken by ``vec_id``
        ascending, so results are deterministic.  The query set is the
        bounded side (the ANN contract): its distinct probe cells (≤
        nlist ints) drive static partition pruning on the index read,
        and the probes broadcast into the pruned scan — the corpus is
        read once (``~nprobe/nlist`` of its bytes), shuffled never.
        ``nprobe >= nlist`` probes everything: exactly the brute-force
        result.
        """
        meta = self._meta
        if not meta["n_appends"]:
            raise ValueError(f"index at {self.path} is empty — add() first")
        qid = query_id_col or id_col
        n_cells = len(meta["centroids"])
        nprobe = min(int(nprobe), n_cells)
        qvec = self._unit_vecs(query_tf, qid, vec_col)
        assign_q = _assign_udf_name(qvec.sparkSession, meta["centroids"], nprobe)
        # explode_outer: assign always returns nprobe cells; the plain
        # explode would add a size>0 filter that re-evaluates the UDF
        probes = qvec.selectExpr(
            "__id AS query_id",
            "__u AS __qu",
            f"explode_outer({assign_q}(__u)) AS cell",
        ).localCheckpoint(eager=True)
        cells = [r[0] for r in probes.select("cell").distinct().collect()]
        index = self.spark.read.parquet(self._vecs_path())
        if len(cells) < n_cells:
            from ..operators.inlist import isin_chunked

            index = index.where(isin_chunked("cell", cells))
        scored = (
            index.join(F.broadcast(probes), "cell")
            .select(
                "query_id",
                "vec_id",
                F.expr(_DOT.format(a="__qu", b="unit")).alias("cosine"),
            )
        )
        if exclude_self:
            scored = scored.filter(F.col("vec_id") != F.col("query_id"))
        ranked = scored.select(
            "*",
            F.expr(
                "row_number() OVER (PARTITION BY query_id "
                "ORDER BY cosine DESC NULLS LAST, vec_id ASC)"
            ).alias("__r"),
        )
        return TidyFrame(ranked.filter(F.col("__r") <= k).drop("__r"))

    def stream_add(
        self,
        stream_tf,
        checkpoint: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        trigger: str | None = None,
    ):
        """Continuous index maintenance: every micro-batch of a streaming
        frame (e.g. embedding shards landing under a path, read with
        ``streaming.stream.read_stream``) runs through :meth:`add` — the
        index accretes as vectors arrive, queries see each batch as soon
        as its append commits.

        Delivery: the file-source checkpoint gives exactly-once BATCH
        pickup; the parquet append itself is the usual non-transactional
        sink, so a crash between the append and the checkpoint commit
        can replay a batch into duplicate index entries — duplicates
        cost recall nothing (the same vector scores identically) and a
        :meth:`compact` pass can rewrite them out.  Centroids train on
        the FIRST micro-batch and freeze, same as batch :meth:`add`.
        Returns the StreamingQuery."""

        def _add_batch(batch_df, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.add(TidyFrame(batch_df), id_col=id_col, vec_col=vec_col)

        w = (
            stream_tf.df.writeStream.outputMode("append")
            .foreachBatch(_add_batch)
            .option("checkpointLocation", checkpoint)
        )
        if trigger == "availableNow":
            w = w.trigger(availableNow=True)
        elif trigger:
            w = w.trigger(processingTime=trigger)
        return w.start()

    def knn_join(
        self,
        left_tf,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        nprobe: int = 4,
        exclude_self: bool = True,
    ) -> TidyFrame:
        """Top-``k`` neighbors from the index for EVERY row of a LARGE
        left table — the persistent-index form of
        :func:`~tidierdb_jl_spark.llm.simsearch.ivf_knn_join`.

        Unlike :meth:`query` (bounded query batch → broadcast + pruned
        scan), nothing here broadcasts or collects: the left side
        explodes to its ``nprobe`` nearest cells (one Arrow pass over
        frozen centroids) and joins the stored cell-partitioned vectors
        on the cell id — both sides shuffle once, candidates =
        ``|left| · nprobe · |index| / nlist``, AQE skew-split handles
        hot cells.  The index is re-used across joins with no retraining
        (same frozen centroids that partitioned it).  ``nprobe >=
        nlist`` degrades to the brute-force kNN join."""
        meta = self._meta
        if not meta["n_appends"]:
            raise ValueError(f"index at {self.path} is empty — add() first")
        n_cells = len(meta["centroids"])
        nprobe = min(int(nprobe), n_cells)
        lvec = self._unit_vecs(left_tf, id_col, vec_col)
        assign_l = _assign_udf_name(lvec.sparkSession, meta["centroids"], nprobe)
        probes = lvec.selectExpr(
            "__id AS query_id",
            "__u AS __qu",
            f"explode_outer({assign_l}(__u)) AS cell",
        )
        index = self.spark.read.parquet(self._vecs_path())
        scored = probes.join(index, "cell").select(
            "query_id",
            "vec_id",
            F.expr(_DOT.format(a="__qu", b="unit")).alias("cosine"),
        )
        if exclude_self:
            scored = scored.filter(F.col("vec_id") != F.col("query_id"))
        ranked = scored.select(
            "*",
            F.expr(
                "row_number() OVER (PARTITION BY query_id "
                "ORDER BY cosine DESC NULLS LAST, vec_id ASC)"
            ).alias("__r"),
        )
        return TidyFrame(ranked.filter(F.col("__r") <= k).drop("__r"))

    def compact(self) -> dict:
        """Rewrite each cell to one file (appends fragment cells).

        Also drops exact duplicate rows (same ``vec_id`` AND same unit
        vector) — the entries a replayed :meth:`stream_add` batch can
        leave behind.  Distinct vectors sharing a ``vec_id`` are kept
        (an id collision is the caller's data, not replay garbage).

        Full-rewrite compaction — at production scale run it per-cell or
        on the fragmented cells only; the layout (one directory per
        cell) makes that a per-partition rewrite.
        """
        src = self._vecs_path()
        dst = self._next_layout_dir()
        (
            self.spark.read.parquet(src)
            .dropDuplicates(["vec_id", "unit"])
            .repartition(len(self._meta["centroids"]), "cell")
            .sortWithinPartitions("cell", "vec_id")
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(join_path(self.path, dst))
        )
        self._commit_layout(dst, src)
        return self.stats()

    def _next_layout_dir(self) -> str:
        return f"vecs_e{self._meta.get('layout_epoch', 0) + 1}"

    def _commit_layout(self, new_dir: str, old_path: str) -> None:
        """Atomically flip the index to a fully-written new layout: ONE
        meta write commits data_dir (+ whatever centroid/nlist changes
        the caller staged in self._meta); the old directory delete after
        it is garbage collection.  Crash before the meta write: the old
        index is untouched and the new directory is an orphan.  Crash
        after: the new index is live and the orphan is the OLD dir,
        removed by the next commit's sweep."""
        self._meta["data_dir"] = new_dir
        self._meta["layout_epoch"] = self._meta.get("layout_epoch", 0) + 1
        self._write_meta()
        fs_delete(self.spark, old_path, recursive=True)

    def retrain(
        self,
        nlist: int | None = None,
        refine_iters: int | None = None,
        sample_cap: int | None = None,
    ) -> dict:
        """Re-cluster the index on a fresh bounded sample of the CURRENT
        corpus and rewrite the cell layout — the growth escape hatch for
        the frozen-first-batch-centroids design.

        Why: frozen centroids keep cell assignment stable (appends are
        O(batch)), but an index grown far past its first batch keeps its
        original cell count — per-probe cost grows linearly with the
        corpus — and an add stream whose distribution DRIFTS from batch 0
        erodes pruned-probe recall against the stale centroids (measured
        in BENCH_VECTORINDEX.md).  ``retrain`` is the FAISS re-train
        recipe as a lake operation: deterministic bounded sample of the
        stored unit vectors, spherical k-means, one Arrow re-assignment
        pass over the corpus, one partitioned write, then the atomic
        meta flip (:meth:`_commit_layout`) — centroids and layout change
        together or not at all.  Cost: one full read+shuffle+write of
        the index (run at compaction cadence, e.g. after the corpus
        doubles); queries before the flip read the old layout
        consistently.

        ``nlist`` defaults to the stored value; pass a larger one as the
        corpus grows (rule of thumb: ~sqrt(n_vecs), so per-probe work
        stays ~sqrt(n) instead of linear).  Returns :meth:`stats`."""
        meta = self._meta
        if not meta["n_appends"]:
            raise ValueError(f"index at {self.path} is empty — add() first")
        nlist = int(nlist or meta["nlist"])
        refine_iters = int(refine_iters or meta["refine_iters"])
        sample_cap = int(sample_cap or meta["sample_cap"])
        vecs = self.spark.read.parquet(self._vecs_path())
        cvec = vecs.select("vec_id", F.col("unit").alias("__cv"))
        centroids = _train_centroids_sample(
            cvec, nlist, refine_iters, sample_cap
        )
        assign = _assign_sim_udf_name(vecs.sparkSession, centroids)
        from pyspark.sql import Observation

        obs = Observation()
        dst = self._next_layout_dir()
        (
            vecs.selectExpr(
                "vec_id", "unit", f"{assign}(unit) AS __as"
            )
            .select("vec_id", "unit", F.col("__as.cell").alias("cell"),
                    (F.lit(1.0) - F.col("__as.sim")).alias("__d"))
            .repartition(len(centroids), "cell")
            .sortWithinPartitions("cell", "vec_id")
            .observe(obs, F.avg("__d").alias("mean_dist"))
            .drop("__d")
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(join_path(self.path, dst))
        )
        old = self._vecs_path()
        meta["centroids"] = centroids
        meta["nlist"] = nlist
        # new training epoch: the full-corpus mean distance under the NEW
        # centroids (observed in the rewrite job) is the new baseline,
        # and the EWMA resets to it — drift reads ~0 until the stream
        # wanders off THIS distribution
        got = obs.get
        if got["mean_dist"] is not None:
            meta["baseline_dist"] = float(got["mean_dist"])
            meta["drift_ewma"] = float(got["mean_dist"])
        self._commit_layout(dst, old)
        return self.stats()
