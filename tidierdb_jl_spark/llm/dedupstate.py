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
correctness.

Storage: data AND metadata go through the Hadoop FileSystem API
(:mod:`tidierdb_jl_spark.sources.fsio`), so a state path can live on any
filesystem Spark reaches — local, ``file://``, ``hdfs://``, ``s3a://``.
Meta updates are write-tmp-then-swap with a documented per-scheme
atomicity contract and a tmp-fallback reader (see ``fsio``); concurrent
writers are out of scope (same contract as a non-transactional parquet
table).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ..core import TidyFrame
from ..operators.bloom import bloom_build, bloom_mark, bloom_merge, bloom_size
from ..operators.inlist import isin_chunked
from ..sources.fsio import (
    fs_exists,
    fs_mkdirs,
    join_path,
    read_text,
    swap_dir,
    write_text_atomic,
)
from .textstats import with_fingerprint

__all__ = ["DedupState", "EmbeddingDedupState", "NearDupState"]

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
        if fs_exists(spark, join_path(path, _META)):
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
        fs_mkdirs(spark, path)
        st = cls(spark, path, meta)
        st._write_meta()
        return st

    @classmethod
    def open(cls, spark, path: str) -> "DedupState":
        meta = json.loads(
            read_text(spark, join_path(str(path), _META), tmp_fallback=True)
        )
        return cls(spark, str(path), meta)

    def _write_meta(self) -> None:
        write_text_atomic(
            self.spark, join_path(self.path, _META), json.dumps(self._meta)
        )

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
        return join_path(self.path, _DATA)

    def _state_df(self, buckets=None):
        """The state's fingerprint frame, optionally pruned to ``buckets``
        (a list of partition ids — static partition pruning: only those
        directories' files are listed and read)."""
        if not self._meta["n_appends"]:
            return None
        df = self.spark.read.parquet(self._data_path())
        if buckets is not None:
            df = df.where(isin_chunked("fp_bucket", [int(b) for b in buckets]))
        return df.select("fingerprint")

    def _keep_first(self, tf, id_col: str, text_col: str):
        """Fingerprint + within-batch keep-first (one shuffle over the
        BATCH); output: the batch's columns plus ``fingerprint``."""
        cols = list(tf.columns)
        return (
            with_fingerprint(tf, text_col)
            .mutate(**{"__keep": f"min({id_col})", "_by": "fingerprint"})
            .filter(f"{id_col} = __keep")
            .select(*cols, "fingerprint")
        )

    # above this many distinct bloom-positive fingerprints, stop shipping
    # them as a scan-side IN filter (the plan literal would grow unbounded)
    # and fall back to bucket-level pruning alone.  Bounds the driver
    # collect and the plan literal; the scan filter itself ships as
    # ``isin_chunked`` (OR of <=500-value INs) so the full list reaches
    # parquet-mr as shallow pushable chains — see operators/inlist.py for
    # the stack-overflow ceiling that rules out one big IN.
    _IN_PUSHDOWN_CAP = 4096

    # per-column PARQUET bloom filters on the state files: the verify
    # scan's IN probe then skips whole row groups whose bloom rejects all
    # probed fingerprints (min/max stats are useless on uniform hashes —
    # measured 100k rows read -> 0 for absent probes).  Adaptive sizing
    # keeps the bloom proportional to the actual row-group NDV instead of
    # the 1 MB default.
    _BLOOM_FILE_OPTS = {
        "parquet.bloom.filter.enabled#fingerprint": "true",
        "parquet.bloom.filter.adaptive.enabled": "true",
    }

    def _resolve(self, marked):
        """Split a bloom-marked frame (``__hit`` column) into
        definitively-new rows plus verified bloom positives.  The distinct
        (bucket, fingerprint) pairs of the positives — a driver collect
        bounded by the CAP, never by data — drive two levels of state-scan
        pruning: the bucket ids prune partitions (directory level), and,
        when the positives are few (the normal case: true dups + ~FPR of
        the batch), the fingerprints themselves are pushed as a parquet
        ``In`` filter, so row-group min/max + dictionary stats skip nearly
        every row of the surviving partitions too (files are written
        sorted by fingerprint for exactly this)."""
        neg = marked.where(~F.col("__hit")).drop("__hit")
        pos = marked.where(F.col("__hit")).drop("__hit")
        hit_rows = (
            pos.select(F.expr(self._bucket_expr()).alias("b"), "fingerprint")
            .distinct()
            .limit(self._IN_PUSHDOWN_CAP + 1)
            .collect()
        )
        if not hit_rows:
            return neg
        if len(hit_rows) <= self._IN_PUSHDOWN_CAP:
            buckets = sorted({r[0] for r in hit_rows})
            pruned = self._state_df(buckets=buckets).where(
                isin_chunked("fingerprint", [r[1] for r in hit_rows])
            )
        else:
            buckets = [
                r[0]
                for r in pos.select(F.expr(self._bucket_expr()).alias("b"))
                .distinct()
                .collect()
            ]
            pruned = self._state_df(buckets=buckets)
        verified = pos.join(pruned, "fingerprint", "left_anti")
        return neg.unionByName(verified)

    def filter_new(self, tf, id_col: str, text_col: str = "text") -> TidyFrame:
        """Rows of ``tf`` not yet in the state (plus within-batch
        first-keep by min ``id_col``).  Pure query — does NOT mutate the
        state; the frame recomputes consistently until ``append`` runs.
        Output columns: the batch's columns plus ``fingerprint``."""
        batch = self._keep_first(tf, id_col, text_col)
        if self._state_df() is None:
            return batch
        marked = bloom_mark(batch, "fingerprint", self._meta["bloom"], "__hit")
        return TidyFrame(self._resolve(marked.df))

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
            # (within-batch distinct is in _append_new's aggregate)
            marked = bloom_mark(
                TidyFrame(fps), "fingerprint", self._meta["bloom"], "__hit"
            )
            fresh = self._resolve(marked.df)
        else:
            fresh = fps
        return self._append_new(fresh)

    def _append_new(self, fresh, pinned_unique: bool = False) -> int:
        """Write fingerprints ALREADY KNOWN to be absent from the state
        (``filter_new``/``_resolve`` output).  Distinct-per-batch via the
        aggregate; ``repartition(n_buckets, fp_bucket)`` bounds the write
        at ONE file per bucket per append — without it, every shuffle
        partition writes into every bucket directory and the state
        degrades into thousands of KB-files whose listing cost grows with
        the number of appends (measured 6s -> 29s per batch over 10
        appends at sf1).  Run ``compact()`` when the per-bucket file
        count (one per append) gets large.

        ``pinned_unique=True`` (the ``ingest`` fast path) promises the
        input is a CHECKPOINTED frame of already-distinct, already-unseen
        fingerprints: the dedup aggregate and the pre-write checkpoint
        are skipped, and the row count rides the write job as an observe
        accumulator — two Spark jobs total (write + bloom build)."""
        from pyspark.sql import Observation

        fresh = fresh.where(F.col("fingerprint").isNotNull())
        if pinned_unique:
            fresh = (
                fresh.select(
                    "fingerprint", F.expr(self._bucket_expr()).alias("fp_bucket")
                )
                .repartition(self.n_buckets, "fp_bucket")
                # sorted files -> tight fingerprint min/max + dictionary
                # stats per row group, which is what lets _resolve's In
                # pushdown skip nearly all state rows at verify time
                .sortWithinPartitions("fp_bucket", "fingerprint")
            )
        else:
            # localCheckpoint BEFORE the write: fresh's lineage may read
            # the state path (the _resolve anti-join), and both consumers
            # below run after the path is written — an un-truncated
            # recompute would anti-join the new fingerprints against
            # THEMSELVES, building the bloom over an empty set and turning
            # every one of these fingerprints into a future bloom
            # false-negative (= admitted duplicate).  The checkpoint is a
            # narrow (fingerprint, bucket) frame, O(batch).
            fresh = (
                fresh.groupBy("fingerprint")
                .agg(F.expr(self._bucket_expr()).alias("fp_bucket"))
                .select("fingerprint", "fp_bucket")
                .repartition(self.n_buckets, "fp_bucket")
                .sortWithinPartitions("fp_bucket", "fingerprint")
                .localCheckpoint(eager=True)
            )
        obs = Observation()
        (
            fresh.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.partitionBy("fp_bucket")
            .options(**self._BLOOM_FILE_OPTS)
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

    def merge_from(self, other: "DedupState") -> int:
        """Fold another state's fingerprints into this one — distributed
        crawl ingestion's fan-in (per-region/per-day states built
        independently merge into the global seen-set).  Returns the
        number of fingerprints that were new to this state.

        Goes through the re-verifying public :meth:`append`, so overlaps
        between the two states dedup exactly, this state's reads stay
        bloom-gated and partition-pruned, and NOTHING requires the two
        states to share ``n_buckets`` or bloom geometry (buckets and the
        bloom contribution are recomputed for the incoming rows).  Cost
        is O(|other|) regardless of |self|.  Exact-fingerprint states
        merge losslessly because the seen-set is a plain set union; the
        near-dup states have no such merge (two independently-built
        keeper sets can near-duplicate EACH OTHER — fold one state's
        corpus through the other's ``ingest`` instead)."""
        if not other._meta["n_appends"]:
            # a freshly created state has no data directory yet — merging
            # zero fingerprints is a no-op, not a read error
            return 0
        df = self.spark.read.parquet(other._data_path()).select("fingerprint")
        return self.append(df)

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
        and ``append`` yourself around your own write.

        Two checkpoints structure the work so the batch pipeline
        (fingerprint + keep-first window + bloom probe) runs exactly ONCE:
        the bloom-marked batch is pinned first, then the bucket collect,
        the verify anti-join, the state write and the bloom build all read
        from pins instead of re-running it (the lazy composition ran it
        4x — measured at sf1).  The append skips re-verification
        (``_append_new``): filter_new's output is already proven absent."""
        batch = self._keep_first(tf, id_col, text_col)
        if self._state_df() is None:
            pinned = batch.df.localCheckpoint(eager=True)
        else:
            marked = bloom_mark(
                batch, "fingerprint", self._meta["bloom"], "__hit"
            ).df.localCheckpoint(eager=True)
            pinned = self._resolve(marked).localCheckpoint(eager=True)
        self._append_new(pinned.select("fingerprint"), pinned_unique=True)
        return TidyFrame(pinned)

    def ingest_cdf(self, table_path: str, id_col: str,
                   text_col: str = "text") -> TidyFrame:
        """Incremental ingestion from a Delta table's CHANGE DATA FEED
        (r12 — pairs with :func:`~..sources.delta_cdf.read_delta_cdf`):
        process only the rows INSERTED since this state last looked —
        ``insert`` and ``update_postimage`` changes of the unconsumed
        version range — instead of re-reading the table's full snapshot
        per batch, which at 100 TB is the difference between O(changes)
        and O(corpus) per ingestion cycle.  The consumed high-water
        version is tracked PER TABLE in the state meta (crash-safe:
        the watermark advances only after the fingerprints are
        appended; a replay re-ingests a range whose fingerprints are
        already recorded, converging exactly like ``stream_ingest``'s
        replay path).  ``delete`` / ``update_preimage`` changes are
        ignored — a dedup seen-set is monotone by design (a re-crawled
        document that was deleted upstream is still a duplicate).
        Returns the genuinely-new rows, exactly like ``ingest``."""
        from ..sources.delta import _snapshot
        from ..sources.delta_cdf import read_delta_cdf

        root = str(table_path).rstrip("/")
        marks: dict = self._meta.setdefault("cdf_watermarks", {})
        last = int(marks.get(root, -1))
        _live, _tmeta, end_v = _snapshot(self.spark, root, None)
        if end_v <= last:
            # nothing committed since the watermark: empty frame with
            # the table's column shape (no scan at all)
            from ..sources.delta import read_delta

            empty = read_delta(self.spark, root).df.limit(0)
            return TidyFrame(empty.localCheckpoint(eager=True))
        feed = read_delta_cdf(self.spark, root,
                              starting_version=last + 1,
                              ending_version=end_v)
        inserted = (feed.df
                    .where(F.col("_change_type")
                           .isin("insert", "update_postimage"))
                    .drop("_change_type", "_commit_version",
                          "_commit_timestamp"))
        out = self.ingest(TidyFrame(inserted), id_col, text_col)
        marks[root] = int(end_v)
        self._write_meta()
        return out

    def stream_ingest(
        self,
        stream_tf,
        id_col: str,
        out_path: str,
        checkpoint: str,
        text_col: str = "text",
        trigger: str | None = None,
    ):
        """Continuous ingestion: run every micro-batch of a streaming
        frame through the state and append only the UNSEEN rows to
        ``out_path`` (parquet) — the production shape for a crawl that
        never stops (pair with ``sources.warc.read_warc_stream``).

        Delivery semantics: the STATE converges exactly (a replayed
        micro-batch's fingerprints are already recorded, so nothing is
        double-counted — the replay path goes through the re-verifying
        public ``append``, not the ingest fast path); the OUTPUT is
        at-least-once, like any non-transactional foreachBatch file sink —
        a crash between the output write and the state append can emit a
        batch's rows twice.  Every output row carries ``fingerprint``, so
        downstream exact re-dedup is one groupBy away.  Returns the
        StreamingQuery.  ``trigger``: processing-time interval (e.g.
        "10 seconds") or "availableNow" to drain what exists and stop."""
        from ..core import TidyFrame as _TF

        def _ingest_batch(batch_df, batch_id: int) -> None:
            fresh = self.filter_new(_TF(batch_df), id_col, text_col)
            pinned = fresh.df.localCheckpoint(eager=True)
            pinned.write.mode("append").parquet(out_path)
            self.append(pinned)

        w = (
            stream_tf.df.writeStream.outputMode("append")
            .foreachBatch(_ingest_batch)
            .option("checkpointLocation", checkpoint)
        )
        if trigger == "availableNow":
            w = w.trigger(availableNow=True)
        elif trigger:
            w = w.trigger(processingTime=trigger)
        return w.start()

    def compact(self, target_mb: int = 128) -> None:
        """Rewrite the accreted per-batch files into right-sized ones —
        per-bucket, preserving the partition layout (delegates sizing
        policy to :func:`tidierdb_jl_spark.sources.writers.compact_files`'s
        contract but must keep ``fp_bucket=`` directories, so it rewrites
        through a partitioned write)."""
        if not self._meta["n_appends"]:
            return
        from ..sources.writers import dataset_size_bytes

        data = self._data_path()
        tmp = data + ".compact.tmp"
        df = self.spark.read.parquet(data)
        total = dataset_size_bytes(self.spark, data)
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
            .sortWithinPartitions("fp_bucket", "fingerprint")
            .write.partitionBy("fp_bucket")
            .options(**self._BLOOM_FILE_OPTS)
            .mode("overwrite")
            .parquet(tmp)
        )
        swap_dir(self.spark, data, tmp)


class NearDupState:
    """Persistent MinHash-LSH state — the near-dup twin of
    :class:`DedupState`, same pruned-read design.

    On disk: a ``bands`` table of (band, bh, doc_id) LSH bucket rows,
    directory-partitioned by a stable hash of the band key and written
    with a parquet bloom filter on ``bh``; a ``sigs`` table of
    (doc_id, minhash) signatures partitioned by a hash of ``doc_id`` with
    a bloom on ``doc_id``; and a mergeable bloom sidecar over the band
    keys.  History TEXT is never stored (~0.5 KB/doc at num_perm=64).

    Per batch, the only state I/O is proportional to the batch's BAND
    COLLISIONS, not the corpus: bloom-negative band keys (the vast
    majority of a mostly-novel batch) are definitively collision-free and
    never touch disk; positives read only their partitions, and the
    parquet blooms skip row groups whose keys aren't probed.  Candidate
    verification is est-Jaccard (signature-component agreement) against
    signatures fetched with the same two-level pruning.

    Semantics match :func:`tidierdb_jl_spark.llm.dedup.
    minhash_dedup_incremental` exactly (differentially tested): ``ingest``
    returns the batch plus ``minhash`` and ``dup_of`` (NULL → keep; else
    the smallest paired id, history or batch), and only keepers' bands /
    signatures enter the state — with monotonically growing ids the
    running result equals a full-corpus :func:`minhash_dedup`.

    Skew note: a boilerplate band key accumulates doc_ids across appends;
    ``max_bucket`` caps each key's stored partners AT VERIFY TIME (a
    row_number window over the pruned slice), bounding the candidate
    join; the hot key's rows are still read, so genuinely pathological
    keys should be cleaned upstream (the batch-level census cap of
    ``minhash_dedup_pairs``).
    """

    _META = "_neardup_state.json"
    _IN_PUSHDOWN_CAP = 4096
    _BANDS_BLOOM_OPTS = {
        "parquet.bloom.filter.enabled#bh": "true",
        "parquet.bloom.filter.adaptive.enabled": "true",
    }
    _SIGS_BLOOM_OPTS = {
        "parquet.bloom.filter.enabled#doc_id": "true",
        "parquet.bloom.filter.adaptive.enabled": "true",
    }

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = str(path)
        self._meta = meta

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        num_perm: int = 64,
        bands: int = 16,
        shingle: int = 3,
        n_buckets: int = 64,
        expected_items: int = 1_000_000,
        fpp: float = 0.01,
    ) -> "NearDupState":
        """``expected_items`` sizes the band-key bloom for the LIFETIME
        number of stored docs (keys ≈ docs × bands; sized internally)."""
        path = str(path)
        if fs_exists(spark, join_path(path, cls._META)):
            raise ValueError(f"NearDupState already exists at {path}")
        if num_perm % bands:
            raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
        m, k = bloom_size(expected_items * bands, fpp)
        meta = {
            "num_perm": int(num_perm),
            "bands": int(bands),
            "shingle": int(shingle),
            "n_buckets": int(n_buckets),
            "bloom": {"bits": "0" * (m // 4), "m": m, "k": k},
            "expected_items": int(expected_items),
            "n_docs": 0,
            "n_appends": 0,
        }
        fs_mkdirs(spark, path)
        st = cls(spark, path, meta)
        st._write_meta()
        return st

    @classmethod
    def open(cls, spark, path: str) -> "NearDupState":
        meta = json.loads(
            read_text(spark, join_path(str(path), cls._META), tmp_fallback=True)
        )
        return cls(spark, str(path), meta)

    def _write_meta(self) -> None:
        write_text_atomic(
            self.spark, join_path(self.path, self._META), json.dumps(self._meta)
        )

    def stats(self) -> dict:
        return {
            "n_docs": self._meta["n_docs"],
            "n_appends": self._meta["n_appends"],
            "n_buckets": self._meta["n_buckets"],
            "num_perm": self._meta["num_perm"],
            "bands": self._meta["bands"],
            "bloom_bits": self._meta["bloom"]["m"],
        }

    # band-key expressions (band is 0..bands-1, bh a 32-bit hash)
    _KEY = "concat_ws(':', band, bh)"
    _BB = "pmod(xxhash64(band, bh), {n})"
    _SB = "pmod(xxhash64(doc_id), {n})"

    def _read_pruned(self, sub: str, part_col: str, buckets):
        df = self.spark.read.parquet(join_path(self.path, sub))
        if buckets is not None:
            df = df.where(isin_chunked(part_col, [int(b) for b in buckets]))
        return df

    def ingest(
        self,
        tf,
        id_col: str,
        text_col: str = "text",
        threshold: float = 0.7,
        max_bucket: int = 200,
    ) -> TidyFrame:
        """Dedup the batch against the state AND itself; record keepers.
        Returns the batch + ``minhash`` + ``dup_of`` (pinned — see
        :meth:`DedupState.ingest` for why ``localCheckpoint``).
        ``check`` + ``record`` in one call; compose them yourself when a
        downstream gate decides the final keeper set (the
        ``CorpusPrepState`` pattern)."""
        out, token = self.check(
            tf, id_col, text_col=text_col, threshold=threshold,
            max_bucket=max_bucket,
        )
        self.record(token)
        return out

    def check(
        self,
        tf,
        id_col: str,
        text_col: str = "text",
        threshold: float = 0.7,
        max_bucket: int = 200,
    ):
        """Gate WITHOUT recording: returns ``(out, token)`` where ``out``
        is the pinned batch + ``minhash`` + ``dup_of`` and ``token`` is
        an opaque handle for :meth:`record`.  The state is untouched —
        dropping the token discards the check, so callers can run further
        gates (embedding dedup, quality filters) and record only the
        final survivors."""
        from .dedup import _band_explode, minhash_signature

        meta = self._meta
        n_bk = meta["n_buckets"]
        rows = meta["num_perm"] // meta["bands"]
        sig = minhash_signature(
            tf, id_col, text_col, meta["num_perm"], meta["shingle"]
        ).df.localCheckpoint(eager=True)
        sd = sig.select(F.col(id_col).alias("__id"), "minhash")
        nb = _band_explode(sd, meta["bands"], rows).localCheckpoint(eager=True)

        est = (
            "CAST(size(filter(zip_with(__ml, __mr, (x, y) -> x = y), v -> v))"
            " AS DOUBLE) / size(__ml)"
        )

        vs_seen = None
        if meta["n_appends"]:
            marked = bloom_mark(
                TidyFrame(nb), self._KEY, meta["bloom"], "__hit"
            ).df
            pos = marked.where(F.col("__hit")).drop("__hit")
            hit = (
                pos.select(
                    F.expr(self._BB.format(n=n_bk)).alias("b"), "band", "bh"
                )
                .distinct()
                .limit(self._IN_PUSHDOWN_CAP + 1)
                .collect()
            )
            if hit:
                if len(hit) <= self._IN_PUSHDOWN_CAP:
                    bands_df = self._read_pruned(
                        "bands", "bb", sorted({r[0] for r in hit})
                    ).where(isin_chunked("bh", [r[2] for r in hit]))
                else:
                    bks = [
                        r[0]
                        for r in pos.select(
                            F.expr(self._BB.format(n=n_bk)).alias("b")
                        ).distinct().collect()
                    ]
                    bands_df = self._read_pruned("bands", "bb", bks)
                # verify-time skew cap: at most max_bucket stored partners
                # per band key enter the candidate join
                bands_df = bands_df.withColumn(
                    "__rn",
                    F.expr(
                        "row_number() OVER (PARTITION BY band, bh ORDER BY doc_id)"
                    ),
                ).where(F.col("__rn") <= max_bucket).drop("__rn")
                cand = (
                    pos.alias("l")
                    .join(
                        bands_df.alias("r"),
                        (F.col("l.band") == F.col("r.band"))
                        & (F.col("l.bh") == F.col("r.bh")),
                    )
                    .select(
                        F.col("l.__id").alias("__nid"),
                        F.col("r.doc_id").alias("__pid"),
                    )
                    .dropDuplicates(["__nid", "__pid"])
                    .localCheckpoint(eager=True)
                )
                pid_rows = (
                    cand.select(
                        F.expr(
                            self._SB.format(n=n_bk).replace("doc_id", "__pid")
                        ).alias("b"),
                        "__pid",
                    )
                    .distinct()
                    .limit(self._IN_PUSHDOWN_CAP + 1)
                    .collect()
                )
                if pid_rows:
                    if len(pid_rows) <= self._IN_PUSHDOWN_CAP:
                        sigs_df = self._read_pruned(
                            "sigs", "sb", sorted({r[0] for r in pid_rows})
                        ).where(isin_chunked("doc_id", [r[1] for r in pid_rows]))
                    else:
                        sbks = [
                            r[0]
                            for r in cand.select(
                                F.expr(
                                    self._SB.format(n=n_bk).replace(
                                        "doc_id", "__pid"
                                    )
                                ).alias("b")
                            ).distinct().collect()
                        ]
                        sigs_df = self._read_pruned("sigs", "sb", sbks)
                    ml = sd.select(
                        F.col("__id").alias("__nid"),
                        F.col("minhash").alias("__ml"),
                    )
                    mr = sigs_df.select(
                        F.col("doc_id").alias("__pid"),
                        F.col("minhash").alias("__mr"),
                    )
                    vs_seen = (
                        cand.join(ml, "__nid")
                        .join(mr, "__pid")
                        .select("__nid", "__pid", F.expr(est).alias("__est"))
                        .filter(F.col("__est") >= threshold)
                    )

        # within-batch pairs (same cap + est verify as the state side)
        hot = (
            nb.groupBy("band", "bh").count().filter(F.col("count") > max_bucket)
        )
        nbc = nb.join(
            F.broadcast(hot.select("band", "bh")), ["band", "bh"], "left_anti"
        )
        ml = sd.select(F.col("__id").alias("__nid"), F.col("minhash").alias("__ml"))
        mr = sd.select(F.col("__id").alias("__pid"), F.col("minhash").alias("__mr"))
        within = (
            nbc.alias("l")
            .join(
                nbc.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col("r.__id") < F.col("l.__id")),
            )
            .select(F.col("l.__id").alias("__nid"), F.col("r.__id").alias("__pid"))
            .dropDuplicates(["__nid", "__pid"])
            .join(ml, "__nid")
            .join(mr, "__pid")
            .select("__nid", "__pid", F.expr(est).alias("__est"))
            .filter(F.col("__est") >= threshold)
        )
        pairs = within if vs_seen is None else vs_seen.unionAll(within)
        best = pairs.groupBy("__nid").agg(F.min("__pid").alias("dup_of"))
        out = (
            sig.join(best, F.col(id_col) == F.col("__nid"), "left")
            .drop("__nid")
            .localCheckpoint(eager=True)
        )
        return TidyFrame(out), {"out": out, "id_col": id_col}

    def record(self, token, keep_ids=None) -> int:
        """Append a :meth:`check`'s keepers — bands + signatures + sidecar
        bloom (all from pins; nothing re-reads the state paths after the
        writes).  ``keep_ids`` (optional single-column frame) restricts
        the recorded keepers to a downstream gate's survivors: documents
        it excludes are treated as dropped and never enter the state.
        Returns the number of documents recorded."""
        from .dedup import _band_explode

        meta = self._meta
        n_bk = meta["n_buckets"]
        rows = meta["num_perm"] // meta["bands"]
        out, id_col = token["out"], token["id_col"]
        keep = out.where(F.col("dup_of").isNull()).select(
            F.col(id_col).alias("doc_id"), "minhash"
        )
        if keep_ids is not None:
            kdf = keep_ids.df if hasattr(keep_ids, "df") else keep_ids
            kcol = kdf.columns[0]
            # no broadcast hint: keeper sets are batch-sized (can be
            # large); AQE picks broadcast when the stats allow it
            keep = keep.join(
                kdf.select(F.col(kcol).alias("doc_id")).distinct(),
                "doc_id",
                "left_semi",
            )
        kb = (
            _band_explode(
                keep.select(F.col("doc_id").alias("__id"), "minhash"),
                meta["bands"],
                rows,
            )
            .select(
                F.col("__id").alias("doc_id"),
                "band",
                "bh",
                F.expr(self._BB.format(n=n_bk)).alias("bb"),
            )
            .repartition(n_bk, "bb")
            .sortWithinPartitions("bb", "bh")
            .localCheckpoint(eager=True)
        )
        (
            kb.write.partitionBy("bb")
            .options(**self._BANDS_BLOOM_OPTS)
            .mode("append")
            .parquet(join_path(self.path, "bands"))
        )
        ks = (
            keep.withColumn("sb", F.expr(self._SB.format(n=n_bk)))
            .repartition(n_bk, "sb")
            .sortWithinPartitions("sb", "doc_id")
        )
        from pyspark.sql import Observation

        obs = Observation()
        (
            ks.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.partitionBy("sb")
            .options(**self._SIGS_BLOOM_OPTS)
            .mode("append")
            .parquet(join_path(self.path, "sigs"))
        )
        n_kept = int(obs.get["n"])
        if n_kept:
            batch_bloom = bloom_build(
                kb.selectExpr(f"{self._KEY} AS k"),
                "k",
                num_bits=meta["bloom"]["m"],
                num_hashes=meta["bloom"]["k"],
            )
            self._meta["bloom"] = bloom_merge(meta["bloom"], batch_bloom)
        self._meta["n_docs"] += n_kept
        self._meta["n_appends"] += 1
        self._write_meta()
        return n_kept


class EmbeddingDedupState:
    """Persistent random-hyperplane-LSH state for EMBEDDING near-dups —
    the third member of the state family (exact :class:`DedupState`,
    text :class:`NearDupState`, vectors here).

    On disk: a ``bands`` table of (band, sig, vec_id) LSH postings
    partitioned by a hash of the band key with a parquet bloom on
    ``sig``; a ``vecs`` table of UNIT vectors (vec_id, unit) partitioned
    by a hash of ``vec_id`` with a bloom on ``vec_id``; and a mergeable
    band-key bloom sidecar.  The hyperplanes are deterministic seeded
    literals (:func:`~tidierdb_jl_spark.llm.simsearch._hyperplanes`), so
    signatures computed in different sessions collide correctly; the
    vector dimension is captured at the first ingest and enforced after.

    Per batch, state I/O is bounded by the batch's band collisions
    (bloom-negative keys never touch disk; positives read pruned
    partitions/row-groups), and every candidate is EXACT-cosine verified
    against fetched unit vectors — no false positives.  Semantics match
    :func:`~tidierdb_jl_spark.llm.dedup.embedding_dedup_incremental`
    (differentially tested): ``ingest`` returns the batch + ``dup_of``,
    and only keepers enter the state."""

    _META = "_embdedup_state.json"
    _IN_PUSHDOWN_CAP = 4096
    _BANDS_BLOOM_OPTS = {
        "parquet.bloom.filter.enabled#sig": "true",
        "parquet.bloom.filter.adaptive.enabled": "true",
    }
    _VECS_BLOOM_OPTS = {
        "parquet.bloom.filter.enabled#vec_id": "true",
        "parquet.bloom.filter.adaptive.enabled": "true",
    }
    _KEY = "concat_ws(':', __band, __sig)"
    _BB = "pmod(xxhash64(__band, __sig), {n})"
    _VB = "pmod(xxhash64(vec_id), {n})"

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = str(path)
        self._meta = meta

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        nbits: int = 4,
        bands: int = 16,
        n_buckets: int = 64,
        expected_items: int = 1_000_000,
        fpp: float = 0.01,
    ) -> "EmbeddingDedupState":
        path = str(path)
        if fs_exists(spark, join_path(path, cls._META)):
            raise ValueError(f"EmbeddingDedupState already exists at {path}")
        m, k = bloom_size(expected_items * bands, fpp)
        meta = {
            "nbits": int(nbits),
            "bands": int(bands),
            "dim": None,  # captured at first ingest
            "n_buckets": int(n_buckets),
            "bloom": {"bits": "0" * (m // 4), "m": m, "k": k},
            "expected_items": int(expected_items),
            "n_vecs": 0,
            "n_appends": 0,
        }
        fs_mkdirs(spark, path)
        st = cls(spark, path, meta)
        st._write_meta()
        return st

    @classmethod
    def open(cls, spark, path: str) -> "EmbeddingDedupState":
        meta = json.loads(
            read_text(spark, join_path(str(path), cls._META), tmp_fallback=True)
        )
        return cls(spark, str(path), meta)

    def _write_meta(self) -> None:
        write_text_atomic(
            self.spark, join_path(self.path, self._META), json.dumps(self._meta)
        )

    def stats(self) -> dict:
        return {
            "n_vecs": self._meta["n_vecs"],
            "n_appends": self._meta["n_appends"],
            "n_buckets": self._meta["n_buckets"],
            "dim": self._meta["dim"],
            "nbits": self._meta["nbits"],
            "bands": self._meta["bands"],
            "bloom_bits": self._meta["bloom"]["m"],
        }

    def _read_pruned(self, sub: str, part_col: str, buckets):
        df = self.spark.read.parquet(join_path(self.path, sub))
        if buckets is not None:
            df = df.where(isin_chunked(part_col, [int(b) for b in buckets]))
        return df

    def ingest(
        self,
        tf,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.95,
    ) -> TidyFrame:
        """Dedup the batch against the state AND itself; record keepers.
        Returns the batch + ``dup_of`` (pinned; see
        :meth:`DedupState.ingest`).  ``check`` + ``record`` in one call;
        compose them yourself when a downstream gate decides the final
        keeper set."""
        out, token = self.check(tf, id_col, vec_col, threshold)
        self.record(token)
        return out

    def check(
        self,
        tf,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.95,
    ):
        """Gate WITHOUT recording: ``(out, token)``, state untouched —
        same contract as :meth:`NearDupState.check`."""
        from .simsearch import _dot, _hyperplanes, _make_sig_udf, _to_double

        meta = self._meta
        n_bk = meta["n_buckets"]
        dim = len(tf.df.select(vec_col).first()[0])
        if meta["dim"] is None:
            meta["dim"] = dim
        elif meta["dim"] != dim:
            raise ValueError(
                f"state at {self.path} holds dim={meta['dim']} vectors; "
                f"batch has dim={dim}"
            )
        sig_udf = _make_sig_udf(
            _hyperplanes(dim, meta["nbits"] * meta["bands"]),
            meta["nbits"],
            meta["bands"],
        )
        unit = (
            "transform(__v, x -> x / sqrt(aggregate(__v, 0.0D, (a, y) -> a + y * y)))"
        )
        nvec = (
            tf.df.select(
                F.col(id_col).alias("__id"), F.expr(_to_double(vec_col)).alias("__v")
            )
            .select("__id", F.expr(unit).alias("__u"))
            .localCheckpoint(eager=True)
        )
        nb = (
            nvec.select("__id", sig_udf(F.col("__u")).alias("__sigs"))
            .select("__id", F.posexplode_outer("__sigs").alias("__band", "__sig"))
            .localCheckpoint(eager=True)
        )

        vs_seen = None
        if meta["n_appends"]:
            marked = bloom_mark(
                TidyFrame(nb), self._KEY, meta["bloom"], "__hit"
            ).df
            pos = marked.where(F.col("__hit")).drop("__hit")
            hit = (
                pos.select(
                    F.expr(self._BB.format(n=n_bk)).alias("b"), "__band", "__sig"
                )
                .distinct()
                .limit(self._IN_PUSHDOWN_CAP + 1)
                .collect()
            )
            if hit:
                if len(hit) <= self._IN_PUSHDOWN_CAP:
                    bands_df = self._read_pruned(
                        "bands", "bb", sorted({r[0] for r in hit})
                    ).where(isin_chunked("sig", [r[2] for r in hit]))
                else:
                    bks = [
                        r[0]
                        for r in pos.select(
                            F.expr(self._BB.format(n=n_bk)).alias("b")
                        ).distinct().collect()
                    ]
                    bands_df = self._read_pruned("bands", "bb", bks)
                cand = (
                    pos.alias("l")
                    .join(
                        bands_df.alias("r"),
                        (F.col("l.__band") == F.col("r.band"))
                        & (F.col("l.__sig") == F.col("r.sig")),
                    )
                    .select(
                        F.col("l.__id").alias("__nid"),
                        F.col("r.vec_id").alias("__pid"),
                    )
                    .dropDuplicates(["__nid", "__pid"])
                    .localCheckpoint(eager=True)
                )
                pid_rows = (
                    cand.select(
                        F.expr(
                            self._VB.format(n=n_bk).replace("vec_id", "__pid")
                        ).alias("b"),
                        "__pid",
                    )
                    .distinct()
                    .limit(self._IN_PUSHDOWN_CAP + 1)
                    .collect()
                )
                if pid_rows:
                    if len(pid_rows) <= self._IN_PUSHDOWN_CAP:
                        vecs_df = self._read_pruned(
                            "vecs", "vb", sorted({r[0] for r in pid_rows})
                        ).where(isin_chunked("vec_id", [r[1] for r in pid_rows]))
                    else:
                        vbks = [
                            r[0]
                            for r in cand.select(
                                F.expr(
                                    self._VB.format(n=n_bk).replace(
                                        "vec_id", "__pid"
                                    )
                                ).alias("b")
                            ).distinct().collect()
                        ]
                        vecs_df = self._read_pruned("vecs", "vb", vbks)
                    la = nvec.select(
                        F.col("__id").alias("__nid"), F.col("__u").alias("__ua")
                    )
                    rb = vecs_df.select(
                        F.col("vec_id").alias("__pid"), F.col("unit").alias("__ub")
                    )
                    vs_seen = (
                        cand.join(la, "__nid")
                        .join(rb, "__pid")
                        .select(
                            "__nid", "__pid", F.expr(_dot("__ua", "__ub")).alias("__cos")
                        )
                        .filter(F.col("__cos") >= threshold)
                    )

        la = nvec.select(F.col("__id").alias("__nid"), F.col("__u").alias("__ua"))
        rb = nvec.select(F.col("__id").alias("__pid"), F.col("__u").alias("__ub"))
        within = (
            nb.alias("l")
            .join(
                nb.alias("r"),
                (F.col("l.__band") == F.col("r.__band"))
                & (F.col("l.__sig") == F.col("r.__sig"))
                & (F.col("r.__id") < F.col("l.__id")),
            )
            .select(F.col("l.__id").alias("__nid"), F.col("r.__id").alias("__pid"))
            .dropDuplicates(["__nid", "__pid"])
            .join(la, "__nid")
            .join(rb, "__pid")
            .select("__nid", "__pid", F.expr(_dot("__ua", "__ub")).alias("__cos"))
            .filter(F.col("__cos") >= threshold)
        )
        pairs = within if vs_seen is None else vs_seen.unionAll(within)
        best = pairs.groupBy("__nid").agg(F.min("__pid").alias("dup_of"))
        out = (
            tf.df.join(best, F.col(id_col) == F.col("__nid"), "left")
            .drop("__nid")
            .localCheckpoint(eager=True)
        )
        return TidyFrame(out), {
            "out": out, "id_col": id_col, "nvec": nvec, "nb": nb
        }

    def record(self, token, keep_ids=None) -> int:
        """Append a :meth:`check`'s keepers — postings + unit vectors +
        sidecar bloom.  ``keep_ids`` (optional single-column frame)
        restricts the recorded keepers to a downstream gate's survivors.
        Returns the number of vectors recorded."""
        meta = self._meta
        n_bk = meta["n_buckets"]
        out, id_col = token["out"], token["id_col"]
        nvec, nb = token["nvec"], token["nb"]
        keep = out.where(F.col("dup_of").isNull()).select(
            F.col(id_col).alias("vec_id")
        )
        if keep_ids is not None:
            kdf = keep_ids.df if hasattr(keep_ids, "df") else keep_ids
            kcol = kdf.columns[0]
            keep = keep.join(
                kdf.select(F.col(kcol).alias("vec_id")).distinct(),
                "vec_id",
                "left_semi",
            )
        keep_ids = keep
        keep_vec = (
            nvec.join(
                keep_ids, nvec["__id"] == keep_ids["vec_id"], "left_semi"
            ).select(F.col("__id").alias("vec_id"), F.col("__u").alias("unit"))
        )
        kb = (
            nb.join(keep_ids, nb["__id"] == keep_ids["vec_id"], "left_semi")
            .select(
                F.col("__id").alias("vec_id"),
                F.col("__band").alias("band"),
                F.col("__sig").alias("sig"),
                F.expr(
                    self._BB.format(n=n_bk)
                    .replace("__band", "band")
                    .replace("__sig", "sig")
                ).alias("bb"),
            )
            .repartition(n_bk, "bb")
            .sortWithinPartitions("bb", "sig")
            .localCheckpoint(eager=True)
        )
        (
            kb.write.partitionBy("bb")
            .options(**self._BANDS_BLOOM_OPTS)
            .mode("append")
            .parquet(join_path(self.path, "bands"))
        )
        kv = (
            keep_vec.withColumn("vb", F.expr(self._VB.format(n=n_bk)))
            .repartition(n_bk, "vb")
            .sortWithinPartitions("vb", "vec_id")
        )
        from pyspark.sql import Observation

        obs = Observation()
        (
            kv.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.partitionBy("vb")
            .options(**self._VECS_BLOOM_OPTS)
            .mode("append")
            .parquet(join_path(self.path, "vecs"))
        )
        n_kept = int(obs.get["n"])
        if n_kept:
            batch_bloom = bloom_build(
                kb.selectExpr("concat_ws(':', band, sig) AS k"),
                "k",
                num_bits=meta["bloom"]["m"],
                num_hashes=meta["bloom"]["k"],
            )
            self._meta["bloom"] = bloom_merge(meta["bloom"], batch_bloom)
        self._meta["n_vecs"] += n_kept
        self._meta["n_appends"] += 1
        self._write_meta()
        return n_kept
