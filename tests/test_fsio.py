"""Hadoop-FileSystem metadata I/O (sources/fsio.py) and the state
family's non-POSIX-path round trips.

The round-9 port: state metadata/compaction used to be Python ``open()``
/ ``os.rename`` — driver-local POSIX only.  These tests drive every
state through ``file://`` URIs, which exercise the full Hadoop
FileSystem code path (URI parsing, FS resolution by scheme, stream
read/write, rename/delete) that ``hdfs://`` / ``s3a://`` use — the only
untestable part in this sandbox is the remote connector jar itself.
(A mocked custom scheme was tried: Hadoop's RawLocalFileSystem hard-
rejects foreign schemes with "Wrong FS", so ``file://`` is the
strongest in-sandbox evidence.)
"""

import os

import pytest

from tidierdb_jl_spark import TidyFrame
from tidierdb_jl_spark.sources import fsio


def _docs(tables, lo, hi):
    return tables["documents"].filter(
        f"doc_id >= {lo} AND doc_id < {hi}"
    ).select("doc_id", "text")


def test_join_path_preserves_scheme():
    assert fsio.join_path("s3a://bucket/state", "data") == "s3a://bucket/state/data"
    assert fsio.join_path("/local/x/", "a", "b") == "/local/x/a/b"
    assert fsio.join_path("hdfs://nn:8020/x", "_m.json") == "hdfs://nn:8020/x/_m.json"


def test_atomic_text_roundtrip_and_tmp_fallback(spark, tmp_path):
    p = "file://" + str(tmp_path / "meta.json")
    fsio.write_text_atomic(spark, p, '{"v": 1}')
    assert fsio.read_text(spark, p) == '{"v": 1}'
    fsio.write_text_atomic(spark, p, '{"v": 2, "s": "héllo"}')
    assert fsio.read_text(spark, p) == '{"v": 2, "s": "héllo"}'
    # crash window: meta deleted, fully-written tmp left behind
    os.rename(str(tmp_path / "meta.json"), str(tmp_path / "meta.json.tmp"))
    assert fsio.read_text(spark, p, tmp_fallback=True) == '{"v": 2, "s": "héllo"}'
    with pytest.raises(Exception):
        fsio.read_text(spark, p)  # without fallback: missing is an error


def test_swap_dir_commits_replacement(spark, tmp_path):
    src, tmp = str(tmp_path / "data"), str(tmp_path / "data.new")
    os.makedirs(src), os.makedirs(tmp)
    open(src + "/f.txt", "w").write("old")
    open(tmp + "/f.txt", "w").write("new")
    fsio.swap_dir(spark, "file://" + src, "file://" + tmp)
    assert open(src + "/f.txt").read() == "new"
    assert not os.path.exists(src + ".old") and not os.path.exists(tmp)


def test_dedupstate_roundtrip_file_uri(spark, tables, tmp_path):
    """Create / ingest / reopen / compact a DedupState entirely through
    file:// URIs — no os.* path may be assumed anywhere in the flow."""
    from tidierdb_jl_spark.llm.dedupstate import DedupState

    path = "file://" + str(tmp_path / "st")
    st = DedupState.create(spark, path, n_buckets=4, expected_items=20_000)
    k1 = st.ingest(_docs(tables, 0, 150), "doc_id")
    n1 = k1.df.count()
    assert n1 > 0
    # reopen from the URI and dedup an overlapping batch
    st2 = DedupState.open(spark, path)
    k2 = st2.ingest(_docs(tables, 100, 250), "doc_id")
    ids2 = {r[0] for r in k2.df.select("doc_id").collect()}
    ids1 = {r[0] for r in k1.df.select("doc_id").collect()}
    assert ids2.isdisjoint(ids1)
    before = st2.stats()["n_fingerprints"]
    st2.compact()
    st3 = DedupState.open(spark, path)
    assert st3.stats()["n_fingerprints"] == before
    # post-compact the state still gates exactly
    k3 = st3.ingest(_docs(tables, 0, 250), "doc_id")
    assert k3.df.count() == 0
    # empty-source merge is a no-op, not a read error (ADVICE r8)
    empty = DedupState.create(
        spark, "file://" + str(tmp_path / "empty"), n_buckets=4,
        expected_items=1000,
    )
    assert st3.merge_from(empty) == 0


def test_vectorindexstate_roundtrip_file_uri(spark, tables, tmp_path):
    """VectorIndexState create / add / reopen / query / compact through
    file:// URIs; plus the r8-ADVICE empty/NULL batch guards."""
    from pyspark.sql import functions as F

    from tidierdb_jl_spark.llm.vectorindex import VectorIndexState

    emb = tables["embeddings"].select("vec_id", "embedding")
    path = "file://" + str(tmp_path / "ivf")
    ix = VectorIndexState.create(spark, path, nlist=8, sample_cap=512)
    ix.add(emb.filter("vec_id < 300"))
    ix2 = VectorIndexState.open(spark, path)
    assert ix2.stats()["n_vecs"] == 300
    ix2.add(emb.filter("vec_id >= 300 AND vec_id < 500"))
    got = ix2.query(emb.filter("vec_id < 5"), k=3, nprobe=8).collect()
    assert set(got["query_id"]) == set(range(5))
    assert (got.groupby("query_id").size() == 3).all()
    ix2.compact()
    ix3 = VectorIndexState.open(spark, path)
    got2 = ix3.query(emb.filter("vec_id < 5"), k=3, nprobe=8).collect()
    assert got.sort_values(["query_id", "vec_id"]).values.tolist() == \
        got2.sort_values(["query_id", "vec_id"]).values.tolist()
    # empty and all-NULL batches are no-ops (not TypeError)
    n_before = ix3.stats()["n_vecs"]
    ix3.add(emb.filter("vec_id < 0"))
    ix3.add(TidyFrame(
        emb.df.limit(3).select("vec_id", F.lit(None).cast(
            emb.df.schema["embedding"].dataType).alias("embedding"))
    ))
    assert ix3.stats()["n_vecs"] == n_before


def test_vectorindexstate_first_add_meta_before_data(spark, tables, tmp_path):
    """The first add persists centroids+dim BEFORE the data append: a
    reader that opens the state right after the append (simulating a
    crash before the counter update) sees the exact centroids the
    on-disk rows were bucketed by."""
    from tidierdb_jl_spark.llm.vectorindex import VectorIndexState

    emb = tables["embeddings"].select("vec_id", "embedding")

    calls = []
    orig = VectorIndexState._write_meta

    def spy(self):
        calls.append(json.loads(json.dumps(self._meta)))
        orig(self)

    import json

    path = str(tmp_path / "ivf")
    ix = VectorIndexState.create(spark, path, nlist=4, sample_cap=256)
    VectorIndexState._write_meta = spy
    try:
        calls.clear()
        ix.add(emb.filter("vec_id < 100"))
    finally:
        VectorIndexState._write_meta = orig
    # two meta writes: centroids+dim first (counters still 0), then counters
    assert len(calls) == 2
    assert calls[0]["centroids"] is not None and calls[0]["dim"] is not None
    assert calls[0]["n_appends"] == 0
    assert calls[1]["n_appends"] == 1
    assert calls[1]["centroids"] == calls[0]["centroids"]


def test_neardup_embdedup_state_file_uri(spark, tables, tmp_path):
    """NearDupState and EmbeddingDedupState lifecycle through file://
    URIs (check/record split included)."""
    from tidierdb_jl_spark.llm.dedupstate import EmbeddingDedupState, NearDupState

    nd_path = "file://" + str(tmp_path / "nd")
    nd = NearDupState.create(spark, nd_path, n_buckets=4, expected_items=20_000)
    out1 = nd.ingest(_docs(tables, 0, 80), "doc_id", threshold=0.9)
    kept1 = set(out1.filter("dup_of IS NULL").collect()["doc_id"])
    assert kept1
    nd2 = NearDupState.open(spark, nd_path)
    twins = _docs(tables, 0, 80).mutate(
        doc_id="doc_id + 100000", text="concat(text, ' ')"
    )
    out2, token = nd2.check(twins, "doc_id", threshold=0.9)
    dropped = set(out2.filter("dup_of IS NOT NULL").collect()["doc_id"])
    assert {d + 100000 for d in kept1} <= dropped
    # check alone must not touch the state
    assert NearDupState.open(spark, nd_path).stats()["n_docs"] == len(kept1)
    # record with an empty keep filter: still nothing enters
    nd2.record(token, keep_ids=out2.df.select("doc_id").limit(0))
    assert NearDupState.open(spark, nd_path).stats()["n_docs"] == len(kept1)

    emb = tables["embeddings"].select("vec_id", "embedding")
    em_path = "file://" + str(tmp_path / "em")
    em = EmbeddingDedupState.create(spark, em_path, n_buckets=4,
                                    expected_items=20_000)
    r1 = em.ingest(emb.filter("vec_id < 60"), threshold=0.99)
    kept_v = set(r1.filter("dup_of IS NULL").collect()["vec_id"])
    em2 = EmbeddingDedupState.open(spark, em_path)
    vtwins = emb.filter("vec_id < 60").mutate(vec_id="vec_id + 100000")
    r2 = em2.ingest(vtwins, threshold=0.99)
    dup_v = set(r2.filter("dup_of IS NOT NULL").collect()["vec_id"])
    assert {v + 100000 for v in kept_v} <= dup_v


def test_writer_lock_mutual_exclusion_and_release(spark, tmp_path):
    import pytest

    from tidierdb_jl_spark.sources.fsio import fs_exists, writer_lock

    path = str(tmp_path / "st")
    with writer_lock(spark, path, holder="a") as lock:
        assert fs_exists(spark, lock)
        with pytest.raises(RuntimeError, match="already held by a"):
            with writer_lock(spark, path, holder="b"):
                pass
    assert not fs_exists(spark, lock)  # released on clean exit
    # released on error too
    with pytest.raises(ValueError, match="boom"):
        with writer_lock(spark, path, holder="c"):
            raise ValueError("boom")
    assert not fs_exists(spark, lock)


def test_writer_lock_breaks_stale_and_file_scheme(spark, tmp_path):
    import json
    import time

    from tidierdb_jl_spark.sources.fsio import read_text, writer_lock

    path = "file://" + str(tmp_path / "st")
    # plant an abandoned lock from a "crashed" writer
    with writer_lock(spark, path, holder="dead"):
        import shutil

        shutil.copy(str(tmp_path / "st" / "_writer.lock"),
                    str(tmp_path / "planted"))
    import shutil

    shutil.copy(str(tmp_path / "planted"), str(tmp_path / "st" / "_writer.lock"))
    # fresh lock is NOT stale -> refused
    import pytest

    with pytest.raises(RuntimeError, match="already held by dead"):
        with writer_lock(spark, path, holder="new", stale_s=3600):
            pass
    # but with stale_s=0 it is reclaimed, loudly
    time.sleep(0.01)
    with writer_lock(spark, path, holder="new", stale_s=0.001) as lock:
        body = json.loads(read_text(spark, lock))
        assert body["holder"] == "new"
        assert "reclaimed stale lock" in body["note"]
        assert "dead" in body["note"]


def test_writer_lock_heartbeat_renews_lease(spark, tmp_path):
    """r10 lease renewal: a LIVE holder's heartbeat keeps the lock fresh
    past stale_s (no self-eviction, takeover refused), while a CRASHED
    holder — heartbeats stopped — goes stale one stale_s after the last
    beat and is reclaimed.  This is what lets stale_s default to 5 min
    instead of covering the longest possible job."""
    import shutil
    import time

    import pytest

    from tidierdb_jl_spark.sources.fsio import read_json_retry, writer_lock

    path = "file://" + str(tmp_path / "st")
    lock_file = str(tmp_path / "st" / "_writer.lock")

    # live holder: held LONGER than stale_s, heartbeats refresh the ts —
    # a second writer is still refused (age is measured from the beat).
    # stale_s is 10x the heartbeat so a briefly-starved heartbeat thread
    # on a loaded host cannot flake the refusal.
    with writer_lock(spark, path, holder="live",
                     stale_s=5.0, heartbeat_s=0.5) as lock:
        t0 = read_json_retry(spark, lock)["ts"]
        deadline = time.time() + 20
        while time.time() < deadline:
            time.sleep(0.5)
            body = read_json_retry(spark, lock)
            if body["ts"] > t0:
                break
        assert body["ts"] > t0, "heartbeat must rewrite the lock ts"
        assert body["note"] == "heartbeat"
        time.sleep(5.2)  # hold past stale_s with heartbeats running
        with pytest.raises(RuntimeError, match="already held by live"):
            with writer_lock(spark, path, holder="second",
                             stale_s=5.0, heartbeat_s=0.5):
                pass
        shutil.copy(lock_file, str(tmp_path / "crashed"))
    # release cleans up
    assert not (tmp_path / "st" / "_writer.lock").exists()

    # crashed holder: plant its last-heartbeat lock, wait > stale_s with
    # NO renewal -> takeover succeeds with the reclaim note
    shutil.copy(str(tmp_path / "crashed"), lock_file)
    time.sleep(1.0)
    with writer_lock(spark, path, holder="taker",
                     stale_s=0.9, heartbeat_s=0.2) as lock:
        body = read_json_retry(spark, lock)
        assert body["holder"] == "taker"
        assert "reclaimed stale lock" in body["note"]
        assert "since last heartbeat" in body["note"]
    # heartbeat_s=0 disables renewal (legacy behavior)
    with writer_lock(spark, path, holder="legacy",
                     stale_s=3600, heartbeat_s=0) as lock:
        b0 = read_json_retry(spark, lock)
        time.sleep(0.3)
        assert read_json_retry(spark, lock)["ts"] == b0["ts"]


def test_read_json_retry_tolerates_torn_and_missing(spark, tmp_path):
    """The heartbeat overwrites the lock in place (truncate+write), so a
    concurrent reader can see an empty/partial file; write_text_atomic's
    delete->rename leaves a missing-with-.tmp window.  read_json_retry
    must ride out both and still fail loudly on a persistently bad file."""
    import json
    import threading
    import time

    from tidierdb_jl_spark.sources import fsio

    p = "file://" + str(tmp_path / "m" / "meta.json")
    fsio.fs_mkdirs(spark, "file://" + str(tmp_path / "m"))

    # torn window: file exists but is empty (mid-truncate) -> a writer
    # fills it shortly after; the retry loop must recover.
    local = tmp_path / "m" / "meta.json"
    local.write_text("")

    def _fill():
        time.sleep(0.15)
        local.write_text(json.dumps({"v": 7}))

    t = threading.Thread(target=_fill)
    t.start()
    assert fsio.read_json_retry(spark, p)["v"] == 7
    t.join()

    # missing-with-tmp window: only the fully-written .tmp exists.
    local.unlink()
    (tmp_path / "m" / "meta.json.tmp").write_text(json.dumps({"v": 8}))
    assert fsio.read_json_retry(spark, p)["v"] == 8

    # persistently invalid: raises after the retries are exhausted.
    (tmp_path / "m" / "meta.json.tmp").unlink()
    local.write_text("{never valid json")
    import pytest

    with pytest.raises(Exception):
        fsio.read_json_retry(spark, p, retries=2, delay_s=0.01)
