"""Persistent dedup state for incremental corpus ingestion at 100 TB.

The reference's dedup verbs (TidierDB.jl has only SQL-level ``distinct``)
and this repo's ``exact_dedup_incremental`` both assume the seen-set is a
frame you can afford to re-read per batch.  At corpus scale the seen-set
is billions of fingerprints, and the naive per-batch anti-join pays two
costs that grow with the CORPUS, not the batch:

1. a full scan of the state table every batch, and
2. a shuffle of that state into the anti-join's hash partitioning.

``DedupState`` removes both.  On disk it is a plain parquet table of
fingerprints, directory-partitioned by a stable hash bucket
(``fp_bucket = pmod(xxhash64(fingerprint), n_buckets)``), plus a bloom
sidecar (:mod:`tidierdb_jl_spark.operators.bloom` artifact) in the state's
meta file.  A batch is filtered in three stages, each bounded by the
BATCH (never the corpus):

- **bloom gate** (zero I/O): rows whose fingerprint probes negative are
  *definitively* new — blooms have no false negatives — and skip the
  state entirely.  At a typical few-% duplicate rate this eliminates the
  state read for ~all rows.
- **static partition pruning** (bounded I/O): the surviving rows' bucket
  ids (``<= n_buckets`` distinct values, collected driver-side) become an
  ``IN`` filter on the partition column, so the anti-join scans only the
  state partitions a survivor could possibly live in — proven from the
  status store's files-read metric in ``tests/test_dedupstate.py``.
- **exact anti-join** (correctness): bloom positives are verified against
  the pruned state slice, so false positives never drop a genuinely new
  document.

``append`` is one partitioned parquet append plus an OR-merge of the
bloom sidecar (blooms of identical geometry merge losslessly —
``bloom_merge``).  The bloom geometry is fixed at ``create`` time from
``expected_items``/``fpp``: exceeding the capacity degrades the gate's
false-positive rate (more rows take the verify path) but NEVER
correctness.  Meta updates are atomic (tmp + rename); concurrent writers
are out of scope (same contract as a non-transactional parquet table).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ..core import TidyFrame
from ..operators.bloom import bloom_build, bloom_mark, bloom_merge, bloom_size
from .textstats import with_fingerprint

__all__ = ["DedupState"]

_META = "_dedup_state.json"
_DATA = "data"


class DedupState:
    """A persistent, bloom-gated, partition-pruned fingerprint store.

    Typical batch loop::

        state = DedupState.create(spark, path, expected_items=10_000_000)
        for batch in batches:                      # each a TidyFrame
            fresh = state.ingest(batch, "doc_id")  # unseen rows, pinned
            fresh.df.write.parquet(out, mode="append")
    """

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = str(path)
        self._meta = meta

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        n_buckets: int = 64,
        expected_items: int = 1_000_000,
        fpp: float = 0.01,
    ) -> "DedupState":
        """Initialize an empty state directory.  ``n_buckets`` fixes the
        directory-partition fan-out (pick ~state_size / 1 GB at scale);
        ``expected_items`` sizes the bloom for the LIFETIME of the state."""
        path = str(path)
        if os.path.exists(os.path.join(path, _META)):
            raise ValueError(f"DedupState already exists at {path}")
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        m, k = bloom_size(expected_items, fpp)
        meta = {
            "n_buckets": int(n_buckets),
            "bloom": {"bits": "0" * (m // 4), "m": m, "k": k},
            "expected_items": int(expected_items),
            "n_fingerprints": 0,
            "n_appends": 0,
        }
        os.makedirs(path, exist_ok=True)
        st = cls(spark, path, meta)
        st._write_meta()
        return st

    @classmethod
    def open(cls, spark, path: str) -> "DedupState":
        with open(os.path.join(str(path), _META)) as fh:
            return cls(spark, str(path), json.load(fh))

    def _write_meta(self) -> None:
        tmp = os.path.join(self.path, _META + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(self._meta, fh)
        os.replace(tmp, os.path.join(self.path, _META))

    # -- introspection -----------------------------------------------------

    @property
    def n_buckets(self) -> int:
        return self._meta["n_buckets"]

    def stats(self) -> dict:
        """Lifetime counters plus the bloom's current estimated FPR
        (1 - e^{-kn/m})^k — the fraction of NEW rows that will take the
        verify path rather than the free bloom-negative path."""
        import math

        b = self._meta["bloom"]
        n = self._meta["n_fingerprints"]
        fpr = (1.0 - math.exp(-b["k"] * n / b["m"])) ** b["k"] if n else 0.0
        return {
            "n_fingerprints": n,
            "n_appends": self._meta["n_appends"],
            "n_buckets": self.n_buckets,
            "bloom_bits": b["m"],
            "bloom_est_fpr": fpr,
        }

    # -- the three verbs ---------------------------------------------------

    def _bucket_expr(self) -> str:
        return f"pmod(xxhash64(fingerprint), {self.n_buckets})"

    def _data_path(self) -> str:
        return os.path.join(self.path, _DATA)

    def _state_df(self, buckets=None):
        """The state's fingerprint frame, optionally pruned to ``buckets``
        (a list of partition ids — static partition pruning: only those
        directories' files are listed and read)."""
        if not self._meta["n_appends"]:
            return None
        df = self.spark.read.parquet(self._data_path())
        if buckets is not None:
            df = df.where(F.col("fp_bucket").isin([int(b) for b in buckets]))
        return df.select("fingerprint")

    def filter_new(self, tf, id_col: str, text_col: str = "text") -> TidyFrame:
        """Rows of ``tf`` not yet in the state (plus within-batch
        first-keep by min ``id_col``).  Pure query — does NOT mutate the
        state; the frame recomputes consistently until ``append`` runs.
        Output columns: the batch's columns plus ``fingerprint``."""
        cols = list(tf.columns)
        fp = with_fingerprint(tf, text_col)
        # within-batch keep-first: one shuffle over the BATCH
        batch = (
            fp.mutate(**{"__keep": f"min({id_col})", "_by": "fingerprint"})
            .filter(f"{id_col} = __keep")
            .select(*cols, "fingerprint")
        )
        state = self._state_df()  # unpruned; pruning happens below
        if state is None:
            return batch
        bloom = self._meta["bloom"]
        marked = bloom_mark(batch, "fingerprint", bloom, into="__hit")
        neg = marked.filter("NOT __hit").df.drop("__hit")
        pos = marked.filter("__hit").df.drop("__hit")
        # static partition pruning: the distinct bucket ids of the bloom
        # positives — a driver collect bounded by n_buckets ROWS, never by
        # data — become partition filters on the state scan
        hit_buckets = [
            r[0]
            for r in pos.select(F.expr(self._bucket_expr()).alias("b"))
            .distinct()
            .collect()
        ]
        if not hit_buckets:
            return TidyFrame(neg)
        pruned = self._state_df(buckets=hit_buckets)
        verified = pos.join(pruned, "fingerprint", "left_anti")
        return TidyFrame(neg.unionByName(verified))

    def append(self, tf_or_df) -> int:
        """Record fingerprints as seen.  Accepts any frame with a
        ``fingerprint`` column (``filter_new`` output) and returns the
        number of NEW distinct fingerprints added.  One partitioned
        parquet append + one bloom build over the batch (both O(batch));
        the meta rewrite is atomic."""
        df = tf_or_df.df if hasattr(tf_or_df, "df") else tf_or_df
        if "fingerprint" not in df.columns:
            raise ValueError(
                "append needs a 'fingerprint' column (filter_new output, "
                "or with_fingerprint(...) it yourself)"
            )
        fps = df.select("fingerprint").where(F.col("fingerprint").isNotNull())
        state = self._state_df()
        if state is not None:
            # idempotence across batches: never store a fingerprint twice
            # (within-batch distinct is below, in the aggregate)
            bloom = self._meta["bloom"]
            marked = bloom_mark(TidyFrame(fps), "fingerprint", bloom, "__hit")
            pos = marked.filter("__hit").df.drop("__hit")
            buckets = [
                r[0]
                for r in pos.select(F.expr(self._bucket_expr()).alias("b"))
                .distinct()
                .collect()
            ]
            fresh = marked.filter("NOT __hit").df.drop("__hit")
            if buckets:
                fresh = fresh.unionByName(
                    pos.join(self._state_df(buckets), "fingerprint", "left_anti")
                )
        else:
            fresh = fps
        fresh = fresh.groupBy("fingerprint").agg(
            F.expr(self._bucket_expr()).alias("fp_bucket")
        ).select("fingerprint", "fp_bucket")
        # count + write in ONE pass: the observe accumulator rides the
        # write job, so the batch is not computed twice
        from pyspark.sql import Observation

        obs = Observation()
        (
            fresh.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.partitionBy("fp_bucket")
            .mode("append")
            .parquet(self._data_path())
        )
        n_new = int(obs.get["n"])
        if n_new:
            batch_bloom = bloom_build(
                fresh.select("fingerprint"),
                "fingerprint",
                num_bits=self._meta["bloom"]["m"],
                num_hashes=self._meta["bloom"]["k"],
            )
            self._meta["bloom"] = bloom_merge(self._meta["bloom"], batch_bloom)
        self._meta["n_fingerprints"] += n_new
        self._meta["n_appends"] += 1
        self._write_meta()
        if self._meta["n_fingerprints"] > self._meta["expected_items"]:
            import warnings

            warnings.warn(
                f"DedupState at {self.path} holds "
                f"{self._meta['n_fingerprints']} fingerprints, over its "
                f"bloom capacity {self._meta['expected_items']} — the gate's "
                "FPR degrades (more verify-path traffic), correctness does "
                "not.  Re-create with a larger expected_items to restore it.",
                stacklevel=2,
            )
        return n_new

    def ingest(self, tf, id_col: str, text_col: str = "text") -> TidyFrame:
        """``filter_new`` + ``append`` in one call.  The returned frame is
        PINNED before the append so it does not re-filter against its own
        fingerprints on later actions.  ``persist()`` is NOT enough: the
        append writes into the state path, and Spark invalidates (and
        lazily recomputes) every cached plan that reads a written path
        (CacheManager.recacheByPath) — the recompute would anti-join the
        batch against itself and return nothing.  ``localCheckpoint``
        truncates the lineage so the returned frame no longer references
        the path at all.  The checkpoint is batch-sized (the surviving
        rows), never corpus-sized; for full laziness call ``filter_new``
        and ``append`` yourself around your own write."""
        fresh = self.filter_new(tf, id_col, text_col)
        pinned = fresh.df.localCheckpoint(eager=True)
        self.append(pinned)
        return TidyFrame(pinned)

    def compact(self, target_mb: int = 128) -> None:
        """Rewrite the accreted per-batch files into right-sized ones —
        per-bucket, preserving the partition layout (delegates sizing
        policy to :func:`tidierdb_jl_spark.sources.writers.compact_files`'s
        contract but must keep ``fp_bucket=`` directories, so it rewrites
        through a partitioned write)."""
        if not self._meta["n_appends"]:
            return
        data = self._data_path()
        tmp = data + ".compact.tmp"
        df = self.spark.read.parquet(data)
        total = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(data)
            for f in fs
            if f.endswith(".parquet")
        )
        per_bucket = max(
            1, int(total / max(1, self.n_buckets) / (target_mb * 1024 * 1024)) + 1
        )
        # salt-within-bucket partitioning: each bucket has at most
        # ``per_bucket`` distinct (bucket, salt) shuffle targets, so the
        # partitioned write emits at most ``per_bucket`` files per bucket
        (
            df.withColumn("__s", F.pmod(F.xxhash64("fingerprint"), F.lit(per_bucket)))
            .repartition(self.n_buckets * per_bucket, "fp_bucket", "__s")
            .drop("__s")
            .write.partitionBy("fp_bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        import shutil

        swap = data + ".old"
        os.rename(data, swap)
        os.rename(tmp, data)
        shutil.rmtree(swap)
