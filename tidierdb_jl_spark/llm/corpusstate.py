"""Incremental training-corpus preparation over persistent state.

:func:`~tidierdb_jl_spark.llm.pipeline.prepare_training_corpus` is the
one-shot capstone: clean → dedup → split over a corpus that is all
there.  Real 100 TB corpora are not all there — crawl shards land daily,
and re-running the one-shot pipeline over history+increment re-pays the
whole corpus every day.  ``CorpusPrepState`` is the incremental form:
each ``ingest`` cleans ONE batch, gates it against the persistent
seen-state (exact fingerprints, optionally MinHash text near-dups and
embedding near-dups — the three state stores of
:mod:`~tidierdb_jl_spark.llm.dedupstate`), records the keepers, and
assigns the deterministic hash split.  Per-batch cost is O(batch):

- cleaning is one fused scan of the batch (per-row gates, language ID);
- every dedup gate reads state bounded by the batch's bloom positives /
  band collisions (see the ``DedupState`` family docstrings);
- the split is a pure hash of the id — a document keeps its split
  forever, so appends never reshuffle earlier train/test assignments.

Pipeline config (gates, language, thresholds, split fraction) is frozen
into the state's meta at ``create`` and reapplied verbatim on ``open`` —
two operators ingesting into the same state cannot silently run
different gates, which is what makes the accreted corpus reproducible.

Semantics: first-wins across batches (the earliest ingested copy of a
document survives; later exact/near duplicates are dropped), matching
``DedupState``/``NearDupState``/``EmbeddingDedupState`` replay — with
monotonically increasing ids this equals the one-shot pipeline's
min-id-wins convention.  Chain transitivity differs from the one-shot
``prepare_training_corpus`` by design: dropped documents are NOT
recorded, so a later document that near-dups only a DROPPED one is kept
(the one-shot pair list would drop it) — the incremental store never
grows with rejected data.

Reference parity: beyond the reference (TidierDB.jl has no pipeline or
state surface); the composition mirrors its verb chaining
(src/TidierDB.jl macro pipeline) applied to corpus preparation.
"""

from __future__ import annotations

import json
import os

from ..core import TidyFrame

_META = "_corpus_prep_state.json"


class CorpusPrepState:
    """``create`` → per-shard ``ingest`` → an accreting, deduped,
    split-stable training corpus."""

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = str(path)
        self._meta = meta
        self._exact = None
        self._near = None
        self._emb = None

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        lang: str | None = "en",
        train_frac: float = 0.9,
        neardup: bool = False,
        embdedup: bool = False,
        neardup_threshold: float = 0.7,
        cosine_threshold: float = 0.95,
        expected_items: int = 1_000_000,
        n_buckets: int = 64,
        **gates,
    ) -> "CorpusPrepState":
        path = str(path)
        if os.path.exists(os.path.join(path, _META)):
            raise ValueError(f"CorpusPrepState already exists at {path}")
        meta = {
            "lang": lang,
            "train_frac": float(train_frac),
            "neardup": bool(neardup),
            "embdedup": bool(embdedup),
            "neardup_threshold": float(neardup_threshold),
            "cosine_threshold": float(cosine_threshold),
            "gates": gates,
            "n_batches": 0,
            "n_ingested": 0,
            "n_kept": 0,
        }
        os.makedirs(path, exist_ok=True)
        st = cls(spark, path, meta)
        from .dedupstate import DedupState

        DedupState.create(
            spark, os.path.join(path, "exact"),
            n_buckets=n_buckets, expected_items=expected_items,
        )
        if neardup:
            from .dedupstate import NearDupState

            NearDupState.create(
                spark, os.path.join(path, "near"),
                n_buckets=n_buckets, expected_items=expected_items,
            )
        if embdedup:
            from .dedupstate import EmbeddingDedupState

            EmbeddingDedupState.create(
                spark, os.path.join(path, "emb"),
                n_buckets=n_buckets, expected_items=expected_items,
            )
        st._write_meta()
        return st

    @classmethod
    def open(cls, spark, path: str) -> "CorpusPrepState":
        with open(os.path.join(str(path), _META)) as fh:
            return cls(spark, str(path), json.load(fh))

    def _write_meta(self) -> None:
        tmp = os.path.join(self.path, _META + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(self._meta, fh)
        os.replace(tmp, os.path.join(self.path, _META))

    def _states(self):
        from .dedupstate import DedupState, EmbeddingDedupState, NearDupState

        if self._exact is None:
            self._exact = DedupState.open(self.spark, os.path.join(self.path, "exact"))
        if self._meta["neardup"] and self._near is None:
            self._near = NearDupState.open(self.spark, os.path.join(self.path, "near"))
        if self._meta["embdedup"] and self._emb is None:
            self._emb = EmbeddingDedupState.open(
                self.spark, os.path.join(self.path, "emb")
            )
        return self._exact, self._near, self._emb

    def stats(self) -> dict:
        ex, nd, em = self._states()
        out = {
            "n_batches": self._meta["n_batches"],
            "n_ingested": self._meta["n_ingested"],
            "n_kept": self._meta["n_kept"],
            "exact": ex.stats(),
        }
        if nd is not None:
            out["near"] = nd.stats()
        if em is not None:
            out["emb"] = em.stats()
        return out

    def ingest(
        self,
        docs,
        embeddings=None,
        id_col: str = "doc_id",
        text_col: str = "text",
        vec_id: str = "vec_id",
        vec_col: str = "embedding",
    ) -> TidyFrame:
        """Clean one shard, gate it against the state, record keepers.

        Returns the kept documents as (``id_col``, n_words, lang_pred,
        split) — the same shape as ``prepare_training_corpus``.  With
        ``embdedup`` configured, ``embeddings`` must carry vectors for
        (at least) the batch's documents; documents without a vector
        pass the embedding gate (they cannot be vector-dupped).
        """
        from pyspark.sql import functions as F

        from ..operators.skew import semi_reduce
        from .pipeline import clean_corpus, split_by_hash

        meta = self._meta
        if meta["embdedup"] and embeddings is None:
            raise ValueError("state was created with embdedup=True; "
                             "ingest needs the batch's embeddings")
        ex, nd, em = self._states()

        cleaned = clean_corpus(
            docs, id_col=id_col, col=text_col, lang=meta["lang"],
            dedup=False, **meta["gates"]
        )
        n_in = docs.df.count()

        # exact gate: keep-first within the batch + unseen vs state
        kept = ex.ingest(cleaned, id_col, text_col)
        if nd is not None:
            kept = nd.ingest(
                kept, id_col, text_col, threshold=meta["neardup_threshold"]
            ).filter("dup_of IS NULL").select("!dup_of", "!minhash")
        if em is not None:
            emb_batch = semi_reduce(
                embeddings, kept, f"{vec_id} == {id_col}"
            )
            if emb_batch.df.isEmpty():
                emb_batch = None
        if em is not None and emb_batch is not None:
            emb_res = em.ingest(
                emb_batch, vec_id, vec_col, threshold=meta["cosine_threshold"]
            )
            dup_ids = emb_res.filter("dup_of IS NOT NULL").select(vec_id)
            kept = TidyFrame(
                kept.df.join(
                    F.broadcast(dup_ids.df),
                    kept.df[id_col] == dup_ids.df[vec_id],
                    "left_anti",
                )
            )

        out = split_by_hash(
            TidyFrame(kept.df), id_col, meta["train_frac"]
        ).select(id_col, "n_words", "lang_pred", "split")
        # pin: later state appends must not re-filter this result
        pinned = out.df.localCheckpoint(eager=True)
        meta["n_batches"] += 1
        meta["n_ingested"] += int(n_in)
        meta["n_kept"] += pinned.count()
        self._write_meta()
        return TidyFrame(pinned)

    def stream_ingest(
        self,
        stream_tf,
        out_path: str,
        checkpoint: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        trigger: str | None = None,
    ):
        """Continuous corpus preparation: every micro-batch of a
        streaming frame (pair with ``sources.warc.read_warc_stream``)
        runs through :meth:`ingest` and the kept, split-assigned rows
        append to ``out_path`` (parquet) — crawl shards land, the
        training corpus accretes.

        Delivery semantics match :meth:`DedupState.stream_ingest`: the
        output is written BEFORE the state append (a crash in between
        replays the batch as still-unseen, re-emitting rows —
        at-least-once — never silently dropping them, which the reverse
        order would), the STATE converges exactly under replay, and the
        lifetime counters may overcount replayed batches — diagnostics,
        not state.

        Streaming supports the EXACT gate only: the near-dup/embedding
        states expose no filter/append split, so their appends could not
        be ordered after the output write — a crash would eat the batch.
        Run near-dup passes as periodic batch jobs over the accreted
        output (the production shape: global near-dedup is a compaction
        step, not a per-micro-batch one)."""
        if self._meta["embdedup"] or self._meta["neardup"]:
            raise ValueError(
                "stream_ingest supports the exact gate only (the near-dup/"
                "embedding states cannot defer their appends past the "
                "output write); create the streaming state with "
                "neardup=False, embdedup=False and near-dedup in batch"
            )

        from .pipeline import clean_corpus, split_by_hash

        meta = self._meta
        ex, _, _ = self._states()

        def _ingest_batch(batch_df, batch_id: int) -> None:
            cleaned = clean_corpus(
                TidyFrame(batch_df), id_col=id_col, col=text_col,
                lang=meta["lang"], dedup=False, **meta["gates"]
            )
            fresh = ex.filter_new(cleaned, id_col, text_col)
            out = split_by_hash(fresh, id_col, meta["train_frac"]).select(
                id_col, "n_words", "lang_pred", "split", "fingerprint"
            )
            pinned = out.df.localCheckpoint(eager=True)
            pinned.write.mode("append").parquet(out_path)
            ex.append(pinned)
            meta["n_batches"] += 1
            meta["n_kept"] += pinned.count()
            self._write_meta()

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
