"""Jar-free Delta WRITER (sources/delta_writer.py) — verified against
the repo's own independent log-replay reader (sources/delta.py), which
is itself spec-tested against hand-built protocol fixtures.  Write and
read sides were developed against the published protocol, not each
other: the reader predates the writer by two rounds."""

import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources import delta_writer
from tidierdb_jl_spark.sources.delta_writer import write_delta


def _tf(spark, rows, schema="id long, val string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def test_write_append_overwrite_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v0 = write_delta(_tf(spark, [(1, "a"), (2, "b")]), root)
    assert v0 == 0
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "val"]].values.tolist() == [[1, "a"], [2, "b"]]

    v1 = write_delta(_tf(spark, [(3, "c")]), root, mode="append")
    assert v1 == 1
    assert read_delta(spark, root).df.count() == 3
    # history intact: version 0 still reconstructs
    assert read_delta(spark, root, version=0).df.count() == 2

    v2 = write_delta(_tf(spark, [(9, "z")]), root, mode="overwrite")
    assert v2 == 2
    now = read_delta(spark, root).collect()
    assert now[["id", "val"]].values.tolist() == [[9, "z"]]
    assert read_delta(spark, root, version=1).df.count() == 3

    with pytest.raises(ValueError, match="mode=error"):
        write_delta(_tf(spark, [(0, "x")]), root, mode="error")


def test_partitioned_write_prunes_and_null_partition(spark, tmp_path):
    root = str(tmp_path / "tbl")
    rows = [(1, "a", "en"), (2, "b", "fr"), (3, "c", "en"), (4, "d", None)]
    write_delta(_tf(spark, rows, "id long, val string, lang string"),
                root, partition_by="lang")
    tf = read_delta(spark, root)
    got = tf.collect().sort_values("id")
    assert got["lang"].tolist() == ["en", "fr", "en", None]
    # static partition pruning through the log works on written tables
    only_en = read_delta(spark, root, partition_filter="lang = 'en'")
    assert sorted(only_en.collect()["id"].tolist()) == [1, 3]
    # appending with DIFFERENT partitioning refuses
    with pytest.raises(ValueError, match="partitioned by"):
        write_delta(_tf(spark, [(5, "e", "de")],
                        "id long, val string, lang string"), root)


def test_schema_enforcement_and_explicit_widen(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root)
    # drifted schema on append -> refuse
    with pytest.raises(ValueError, match="schema"):
        write_delta(_tf(spark, [(2, "b", 1.5)],
                        "id long, val string, score double"), root,
                    mode="append")
    # explicit: overwrite + overwrite_schema
    write_delta(_tf(spark, [(2, "b", 1.5)],
                    "id long, val string, score double"), root,
                mode="overwrite", overwrite_schema=True)
    got = read_delta(spark, root).collect()
    assert list(got.columns) == ["id", "val", "score"]
    assert got.values.tolist() == [[2, "b", 1.5]]


def test_commit_race_retries_with_next_version(spark, tmp_path,
                                               monkeypatch):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root)

    real = delta_writer._try_create
    calls = {"n": 0}

    def lose_once(sp, path, text):
        calls["n"] += 1
        if calls["n"] == 1:
            # a concurrent writer wins this version: commit a real
            # competing append, then report the loss
            competing = _tf(sp, [(50, "x")]).df
            actions = '{"add": {"path": "nope.parquet", ' \
                      '"partitionValues": {}, "size": 1, ' \
                      '"modificationTime": 1, "dataChange": true}}'
            del competing, actions
            import json as _json

            with open(path.replace("file:", ""), "w") as fh:
                fh.write(_json.dumps({"commitInfo": {
                    "timestamp": 1, "operation": "WRITE"}}) + "\n")
            return False
        return real(sp, path, text)

    monkeypatch.setattr(delta_writer, "_try_create", lose_once)
    v = write_delta(_tf(spark, [(2, "b")]), root, mode="append")
    assert v == 2  # version 1 was taken by the "concurrent" commit
    assert calls["n"] == 2
    assert read_delta(spark, root).df.count() == 2  # 1 + the append


def test_written_table_readable_and_stable_via_db_table(spark, tmp_path):
    from tidierdb_jl_spark.sources.readers import db_table

    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(i, f"v{i}") for i in range(100)]), root)
    tf = db_table(spark, root, delta=True)
    assert tf.df.count() == 100
    # log shape: exactly one commit, protocol + metaData + adds
    log = os.path.join(root, "_delta_log")
    names = sorted(n for n in os.listdir(log) if not n.startswith("."))
    assert names == ["00000000000000000000.json"]
    import json as _json

    with open(os.path.join(log, names[0])) as fh:
        kinds = [next(iter(_json.loads(ln))) for ln in fh if ln.strip()]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert kinds.count("add") >= 1 and kinds[-1] == "commitInfo"


def test_empty_batch_creates_valid_empty_table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [], "id long, val string"), root)
    tf = read_delta(spark, root)
    assert tf.df.count() == 0
    assert [f.name for f in tf.df.schema.fields] == ["id", "val"]


def test_txn_idempotence_and_watermark(spark, tmp_path):
    """PROTOCOL.md Transaction Identifiers: a commit stamped
    txn=(app, v) is a no-op when the table already records a watermark
    >= v for app — the exactly-once building block."""
    from tidierdb_jl_spark.sources.delta_writer import last_txn_version

    root = str(tmp_path / "tbl")
    assert last_txn_version(spark, root, "job") == -1
    v = write_delta(_tf(spark, [(1, "a")]), root, txn=("job", 0))
    assert v == 0 and last_txn_version(spark, root, "job") == 0
    # replay of batch 0: no-op, count unchanged, current version returned
    v2 = write_delta(_tf(spark, [(1, "a")]), root, txn=("job", 0))
    assert v2 == 0
    assert read_delta(spark, root).df.count() == 1
    # batch 1 commits; another app's batch 0 also commits
    write_delta(_tf(spark, [(2, "b")]), root, txn=("job", 1))
    write_delta(_tf(spark, [(3, "c")]), root, txn=("other", 0))
    assert read_delta(spark, root).df.count() == 3
    assert last_txn_version(spark, root, "job") == 1
    assert last_txn_version(spark, root, "other") == 0
    # stale replay after newer commits: still a no-op
    write_delta(_tf(spark, [(9, "z")]), root, txn=("job", 1))
    assert read_delta(spark, root).df.count() == 3


def test_write_stream_delta_exactly_once(spark, tmp_path):
    """Streaming -> Delta sink: availableNow drains the source into
    committed table versions; a RESTART over the same checkpoint adds
    only the new data; a crash-style replay of an already-committed
    batch is a no-op."""
    from tidierdb_jl_spark.sources.delta_writer import (
        last_txn_version, write_delta as wd,
    )
    from tidierdb_jl_spark.streaming.stream import (
        read_stream, write_stream_delta,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    _tf(spark, [(i, f"v{i}") for i in range(10)]).df \
        .write.mode("overwrite").parquet(src)

    st = read_stream(spark, src)
    q = write_stream_delta(st, tbl, ckpt, trigger="availableNow")
    q.awaitTermination(120)
    got = read_delta(spark, tbl).collect()
    assert sorted(got["id"].tolist()) == list(range(10))

    # restart over the same checkpoint with MORE source data: only the
    # delta arrives (the checkpoint skips consumed files)
    _tf(spark, [(i, f"v{i}") for i in range(10, 15)]).df \
        .write.mode("append").parquet(src)
    q2 = write_stream_delta(read_stream(spark, src), tbl, ckpt,
                            trigger="availableNow")
    q2.awaitTermination(120)
    got = read_delta(spark, tbl).collect()
    assert sorted(got["id"].tolist()) == list(range(15))

    # crash-style duplicate: re-commit an already-recorded batch id for
    # the checkpoint-derived app id -> no-op
    import hashlib

    app = "stream-" + hashlib.sha256(ckpt.encode()).hexdigest()[:16]
    hi = last_txn_version(spark, tbl, app)
    assert hi >= 0
    wd(_tf(spark, [(99, "dup")]), tbl, mode="append", txn=(app, hi))
    assert read_delta(spark, tbl).df.count() == 15


def test_checkpoint_written_and_replayed(spark, tmp_path):
    """checkpoint_delta writes a classic parquet checkpoint +
    _last_checkpoint; the reader replays from it even after the JSON
    prefix is deleted, and txn watermarks survive the truncation."""
    import glob
    import json as _json

    from tidierdb_jl_spark.sources.delta_writer import (
        checkpoint_delta, last_txn_version,
    )

    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root, txn=("job", 0))
    write_delta(_tf(spark, [(2, "b")]), root, txn=("job", 1))
    write_delta(_tf(spark, [(3, "c")]), root)
    v = checkpoint_delta(spark, root)
    assert v == 2
    log = os.path.join(root, "_delta_log")
    assert os.path.exists(
        os.path.join(log, "00000000000000000002.checkpoint.parquet"))
    lc = _json.loads(open(os.path.join(log, "_last_checkpoint")).read())
    assert lc["version"] == 2

    # truncate the JSON prefix: replay must come from the checkpoint
    for p in glob.glob(os.path.join(log, "*.json")):
        os.remove(p)
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [1, 2, 3]
    # exactly-once state survives the truncation
    assert last_txn_version(spark, root, "job") == 1
    # and the table keeps accepting commits after the checkpoint
    write_delta(_tf(spark, [(4, "d")]), root)
    assert read_delta(spark, root).df.count() == 4


def test_optimize_compacts_without_data_change(spark, tmp_path):
    """optimize_delta rewrites many small files into one per partition,
    commits the swap with dataChange=false, preserves rows exactly and
    keeps history time-travelable."""
    import json as _json

    from tidierdb_jl_spark.sources.delta import _snapshot
    from tidierdb_jl_spark.sources.delta_writer import optimize_delta

    root = str(tmp_path / "tbl")
    for i in range(5):  # 5 tiny commits per partition value
        write_delta(_tf(spark, [(i, f"v{i}", "en"), (100 + i, f"w{i}", "fr")],
                        "id long, val string, lang string"),
                    root, partition_by="lang")
    live0, _, v0 = _snapshot(spark, root, None)
    assert len(live0) == 10 and v0 == 4
    v = optimize_delta(spark, root)
    assert v == 5
    live1, _, _ = _snapshot(spark, root, None)
    assert len(live1) == 2  # one file per partition now
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [0, 1, 2, 3, 4, 100, 101, 102, 103, 104]
    assert got["lang"].tolist() == ["en"] * 5 + ["fr"] * 5
    # pre-compaction version still reconstructs from history
    assert read_delta(spark, root, version=4).df.count() == 10
    # the OPTIMIZE commit carries dataChange=false on every action
    with open(os.path.join(root, "_delta_log",
                           "00000000000000000005.json")) as fh:
        for ln in fh:
            d = _json.loads(ln)
            for k in ("add", "remove"):
                if k in d:
                    assert d[k]["dataChange"] is False
    # idempotent second pass: nothing left to compact
    assert optimize_delta(spark, root) is None


def test_stream_sink_auto_maintenance(spark, tmp_path):
    """checkpoint_every / optimize_every ride the streaming sink: after
    enough micro-batches the table has a parquet checkpoint and (with
    optimize) compacted files, while rows stay exactly-once."""
    import glob

    from tidierdb_jl_spark.streaming.stream import (
        read_stream, write_stream_delta,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    # several source files so availableNow may split into batches; then
    # run the stream repeatedly to accumulate table versions
    for i in range(4):
        _tf(spark, [(i, f"v{i}")]).df.write.mode("append").parquet(src)
        q = write_stream_delta(read_stream(spark, src), tbl, ckpt,
                               trigger="availableNow",
                               checkpoint_every=2, optimize_every=2)
        q.awaitTermination(120)
    got = read_delta(spark, tbl).collect()
    assert sorted(got["id"].tolist()) == [0, 1, 2, 3]
    assert glob.glob(os.path.join(tbl, "_delta_log",
                                  "*.checkpoint.parquet"))


def test_delete_delta_copy_on_write(spark, tmp_path):
    from tidierdb_jl_spark.sources.delta import _snapshot
    from tidierdb_jl_spark.sources.delta_writer import delete_delta

    root = str(tmp_path / "tbl")
    # two files: ids 0-4 and 5-9 (coalesced so each commit is ONE file)
    write_delta(TidyFrame(_tf(spark, [(i, f"v{i}") for i in range(5)])
                          .df.coalesce(1)), root)
    write_delta(TidyFrame(_tf(spark, [(i, f"v{i}") for i in range(5, 10)])
                          .df.coalesce(1)), root)
    live0, _, _ = _snapshot(spark, root, None)
    assert len(live0) == 2

    v = delete_delta(spark, root, "id IN (2, 3)")
    assert v == 2
    got = read_delta(spark, root).collect().sort_values("id")
    assert got["id"].tolist() == [0, 1, 4, 5, 6, 7, 8, 9]
    # only the touched file was rewritten: the 5-9 file survives as-is
    live1, _, _ = _snapshot(spark, root, None)
    untouched = set(live0) & set(live1)
    assert len(untouched) == 1
    # history: the pre-delete version still has all 10 rows
    assert read_delta(spark, root, version=1).df.count() == 10
    # no match -> no commit
    assert delete_delta(spark, root, "id = 999") is None


def test_merge_delta_upsert(spark, tmp_path):
    from tidierdb_jl_spark.sources.delta import _snapshot
    from tidierdb_jl_spark.sources.delta_writer import merge_delta

    root = str(tmp_path / "tbl")
    write_delta(TidyFrame(_tf(spark, [(1, "a"), (2, "b")]).df.coalesce(1)),
                root)
    write_delta(TidyFrame(_tf(spark, [(3, "c"), (4, "d")]).df.coalesce(1)),
                root)
    live0, _, _ = _snapshot(spark, root, None)
    assert len(live0) == 2

    # update id=2, insert id=9 — only the first file is touched
    v = merge_delta(spark, root,
                    _tf(spark, [(2, "B!"), (9, "new")]), key="id")
    assert v == 2
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "val"]].values.tolist() == [
        [1, "a"], [2, "B!"], [3, "c"], [4, "d"], [9, "new"]]
    live1, _, _ = _snapshot(spark, root, None)
    assert len(set(live0) & set(live1)) == 1  # the (3,4) file untouched
    # pure insert (no matches): nothing removed
    v2 = merge_delta(spark, root, _tf(spark, [(7, "g")]), key="id")
    assert v2 == 3
    assert read_delta(spark, root).df.count() == 6

    # ambiguous batch refuses
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_delta(spark, root, _tf(spark, [(5, "x"), (5, "y")]),
                    key="id")
    # schema drift refuses
    with pytest.raises(ValueError, match="schema"):
        merge_delta(spark, root,
                    _tf(spark, [(5, "x", 1.0)],
                        "id long, val string, z double"), key="id")


def test_merge_delta_partitioned_moves_rows_across_partitions(
        spark, tmp_path):
    from tidierdb_jl_spark.sources.delta_writer import merge_delta

    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a", "en"), (2, "b", "fr")],
                    "id long, val string, lang string"),
                root, partition_by="lang")
    # the update MOVES id=2 from fr to de, and inserts id=3 in en
    merge_delta(spark, root,
                _tf(spark, [(2, "B", "de"), (3, "c", "en")],
                    "id long, val string, lang string"), key="id")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "val", "lang"]].values.tolist() == [
        [1, "a", "en"], [2, "B", "de"], [3, "c", "en"]]
    only_de = read_delta(spark, root, partition_filter="lang = 'de'")
    assert only_de.collect()["id"].tolist() == [2]


def test_vacuum_removes_unreferenced_files_only(spark, tmp_path):
    import glob

    from tidierdb_jl_spark.sources.delta_writer import vacuum_delta

    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a"), (2, "b")]), root)
    write_delta(_tf(spark, [(9, "z")]), root, mode="overwrite")
    n_files = len(glob.glob(os.path.join(root, "*.parquet")))
    assert n_files >= 2  # v0's files are tombstoned but still on disk

    # within retention: nothing deleted (dry run agrees)
    assert vacuum_delta(spark, root, retain_hours=1.0) == []
    # zero retention: the unreferenced v0 files go; dry_run lists first
    would = vacuum_delta(spark, root, retain_hours=0.0, dry_run=True)
    assert len(would) == n_files - len(
        glob.glob(os.path.join(root, "*.parquet"))) + len(would)
    gone = vacuum_delta(spark, root, retain_hours=0.0)
    assert gone == would and len(gone) >= 1
    # the current snapshot is intact...
    got = read_delta(spark, root).collect()
    assert got[["id", "val"]].values.tolist() == [[9, "z"]]
    # ...and time travel past the vacuum horizon now fails to read data
    with pytest.raises(Exception):
        read_delta(spark, root, version=0).collect()
    # idempotent
    assert vacuum_delta(spark, root, retain_hours=0.0) == []


def test_describe_history(spark, tmp_path):
    from tidierdb_jl_spark.sources.delta_writer import (
        delete_delta, describe_history,
    )

    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a"), (2, "b")]), root)
    write_delta(_tf(spark, [(3, "c")]), root)
    delete_delta(spark, root, "id = 1")
    hist = describe_history(spark, root)
    assert [h["version"] for h in hist] == [2, 1, 0]
    assert hist[0]["operation"] == "DELETE"
    assert hist[0]["operationParameters"] == {"predicate": "id = 1"}
    assert hist[0]["num_removed_files"] >= 1
    assert hist[2]["operation"] == "WRITE"
    assert all(isinstance(h["timestamp"], int) for h in hist)
    with pytest.raises(ValueError, match="not a Delta table"):
        describe_history(spark, str(tmp_path / "nope"))
