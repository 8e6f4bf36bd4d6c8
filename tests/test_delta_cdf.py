"""Delta Change Data Feed (sources/delta_cdf.py) + cdc emission from
the copy-on-write ops (r12).

Covers PROTOCOL.md "Change Data Files": commits WITH cdc actions use
exactly those files; commits without derive add->insert /
remove->delete; dataChange=false commits are invisible; DV-bearing
derived commits refuse; checkpoint-truncated ranges refuse."""

import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources.delta_cdf import read_delta_cdf
from tidierdb_jl_spark.sources.delta_writer import (
    checkpoint_delta, delete_delta, merge_delta, optimize_delta,
    write_delta,
)


def _tf(spark, rows, schema="id long, v string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def _changes(spark, root, **kw):
    pdf = read_delta_cdf(spark, root, **kw).collect()
    return sorted(
        (int(v), ct, int(i), s) for i, s, ct, v in
        pdf[["id", "v", "_change_type", "_commit_version"]]
        .values.tolist()
    )


def test_derived_inserts_and_deletes(spark, tmp_path):
    """No cdc actions anywhere: appends derive as inserts, the
    overwrite's removes as deletes of every prior row plus inserts of
    the new state; OPTIMIZE (dataChange=false) contributes nothing."""
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a"), (2, "b")]), root)           # v0
    write_delta(_tf(spark, [(3, "c")]), root, mode="append")      # v1
    optimize_delta(spark, root, min_files=2)                      # v2
    write_delta(_tf(spark, [(9, "z")]), root, mode="overwrite")   # v3

    got = _changes(spark, root)
    assert got == [
        (0, "insert", 1, "a"), (0, "insert", 2, "b"),
        (1, "insert", 3, "c"),
        (3, "delete", 1, "a"), (3, "delete", 2, "b"),
        (3, "delete", 3, "c"), (3, "insert", 9, "z"),
    ]
    # sub-ranges slice exactly
    assert _changes(spark, root, starting_version=1,
                    ending_version=1) == [(1, "insert", 3, "c")]
    assert [c for c in _changes(spark, root, starting_version=3)
            if c[1] == "delete"] == [
        (3, "delete", 1, "a"), (3, "delete", 2, "b"),
        (3, "delete", 3, "c")]
    # timestamps ride along
    pdf = read_delta_cdf(spark, root).collect()
    assert pdf["_commit_timestamp"].notna().all()


def test_cow_delete_merge_emit_exact_cdc(spark, tmp_path):
    """On a CDF-enabled table the row ops write cdc files, so the feed
    shows the EXACT row-level changes — not the rewrite's delete-all +
    reinsert-survivors derivation."""
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(i, f"t{i}") for i in range(10)]), root,
                configuration={"delta.enableChangeDataFeed": "true"})
    delete_delta(spark, root, "id % 4 = 1")                       # v1
    merge_delta(spark, root,
                _tf(spark, [(2, "U2"), (77, "U77")]), key="id")   # v2

    v1 = [c for c in _changes(spark, root) if c[0] == 1]
    assert v1 == [(1, "delete", 1, "t1"), (1, "delete", 5, "t5"),
                  (1, "delete", 9, "t9")]
    v2 = [c for c in _changes(spark, root) if c[0] == 2]
    assert v2 == [(2, "insert", 77, "U77"),
                  (2, "update_postimage", 2, "U2"),
                  (2, "update_preimage", 2, "t2")]
    # cdc files live under _change_data/ and are dataChange=false —
    # invisible to the snapshot reader
    assert os.path.isdir(os.path.join(root, "_change_data"))
    snap = sorted(read_delta(spark, root).collect()["id"])
    assert snap == [0, 2, 3, 4, 6, 7, 8, 77]


def test_partitioned_cdf_reattaches_partition_values(spark, tmp_path):
    root = str(tmp_path / "tbl")
    rows = [(i, f"t{i}", ["en", "fr"][i % 2]) for i in range(6)]
    write_delta(_tf(spark, rows, "id long, v string, lang string"),
                root, partition_by="lang",
                configuration={"delta.enableChangeDataFeed": "true"})
    delete_delta(spark, root, "id = 4")  # an en row
    pdf = read_delta_cdf(spark, root, starting_version=1).collect()
    assert pdf[["id", "lang", "_change_type"]].values.tolist() == [
        [4, "en", "delete"]]


def test_dv_derived_commit_refuses(spark, tmp_path):
    """A commit adding a DV-bearing file without cdc actions cannot be
    derived — the DV'd rows would be wrongly reported."""
    import sys
    import uuid as _uuid

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roaring_ref import encode_roaring_array, write_dv_file, z85_encode
    from test_delta import _commit, _meta, _write_parquet
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    f0 = _uuid.uuid4().hex + ".parquet"
    _write_parquet(spark, [(i,) for i in range(5)], "id long",
                   os.path.join(root, f0))
    bm = encode_roaring_array([0])
    blob, offs = write_dv_file([bm])
    u = _uuid.uuid4()
    os.makedirs(os.path.join(root, "ab"))
    with open(os.path.join(root, "ab", f"deletion_vector_{u}.bin"),
              "wb") as fh:
        fh.write(blob)
    dv = {"storageType": "u", "pathOrInlineDv": "ab" + z85_encode(u.bytes),
          "offset": offs[0], "sizeInBytes": len(bm), "cardinality": 1}
    schema = T.StructType([T.StructField("id", T.LongType())])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(schema.json()),
        {"add": {"path": f0, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True,
                 "deletionVector": dv}}])
    with pytest.raises(NotImplementedError, match="deletion vector"):
        read_delta_cdf(spark, root)


def test_checkpointed_away_range_refuses(spark, tmp_path):
    """A checkpoint holds state, not change provenance: asking for a
    range whose JSON commits were truncated must refuse."""
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a")]), root)
    write_delta(_tf(spark, [(2, "b")]), root, mode="append")
    v = checkpoint_delta(spark, root)
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match=r"\[0\]"):
        read_delta_cdf(spark, root)
    # the surviving suffix still reads
    got = _changes(spark, root, starting_version=1)
    assert got == [(1, "insert", 2, "b")]


def test_dedupstate_ingest_cdf(spark, tmp_path):
    """The incremental dedup state consumes a Delta table's change feed:
    first call ingests the whole history, repeat calls are version-
    watermarked no-ops, and after new commits only the NEW inserts flow
    — O(changes), not O(corpus), per cycle.  update_postimage rows
    count as inserts; deletes are ignored (the seen-set is monotone).
    The watermark survives close/open."""
    from tidierdb_jl_spark.llm.dedupstate import DedupState

    root = str(tmp_path / "tbl")
    docs = [(i, f"document number {i} body", "en") for i in range(20)]
    write_delta(_tf(spark, docs, "doc_id long, text string, lang string"),
                root, configuration={"delta.enableChangeDataFeed": "true"})

    st = DedupState.create(spark, str(tmp_path / "state"), n_buckets=4,
                           expected_items=1000)
    got0 = st.ingest_cdf(root, "doc_id").collect()
    assert sorted(got0["doc_id"]) == list(range(20))
    # watermarked: an immediate re-run sees nothing
    assert len(st.ingest_cdf(root, "doc_id").collect()) == 0

    # new commits: an append (inserts), a delete (ignored), and a merge
    # whose postimages carry DUPLICATE text for even keys
    write_delta(_tf(spark, [(100, "document number 100 body", "en")],
                    "doc_id long, text string, lang string"),
                root, mode="append")
    delete_delta(spark, root, "doc_id = 3")
    merge_delta(spark, root,
                _tf(spark, [(4, "document number 4 body", "en"),     # dup
                            (200, "brand new body", "en")],          # new
                    "doc_id long, text string, lang string"),
                key="doc_id")
    st2 = DedupState.open(spark, str(tmp_path / "state"))  # persisted mark
    got1 = st2.ingest_cdf(root, "doc_id").collect()
    # 100 and 200 are new text; key 4's postimage text was already seen
    assert sorted(got1["doc_id"]) == [100, 200]
    assert len(st2.ingest_cdf(root, "doc_id").collect()) == 0
