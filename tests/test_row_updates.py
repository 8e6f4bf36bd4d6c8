"""Row-level UPDATE (update_delta / update_iceberg): copy-on-write
SET-expression rewrites with exact CDF emission on Delta."""

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources.delta_writer import (update_delta,
                                                    write_delta)
from tidierdb_jl_spark.sources.iceberg import read_iceberg
from tidierdb_jl_spark.sources.iceberg_ops import update_iceberg
from tidierdb_jl_spark.sources.iceberg_writer import write_iceberg


def _tf(spark, rows, schema="id long, v string, n long"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def test_update_delta_with_cdf(spark, tmp_path):
    from tidierdb_jl_spark.sources.delta_cdf import read_delta_cdf

    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]),
                root,
                configuration={"delta.enableChangeDataFeed": "true"})
    v = update_delta(spark, root, "id >= 2",
                     {"v": "upper(v)", "n": "n + 1"})
    assert v == 1
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "v", "n"]].values.tolist() == [
        [1, "a", 10], [2, "B", 21], [3, "C", 31]]
    # history intact; exact pre/post cdc emitted
    assert read_delta(spark, root, version=0).df.count() == 3
    cdf = read_delta_cdf(spark, root, starting_version=1).collect()
    rows = sorted((r["id"], r["v"], r["n"], r["_change_type"])
                  for _, r in cdf.iterrows())
    assert rows == sorted([
        (2, "b", 20, "update_preimage"),
        (2, "B", 21, "update_postimage"),
        (3, "c", 30, "update_preimage"),
        (3, "C", 31, "update_postimage"),
    ])

    assert update_delta(spark, root, "id = 99", {"v": "'x'"}) is None
    with pytest.raises(ValueError, match="not in the"):
        update_delta(spark, root, "id = 1", {"nope": "'x'"})


def test_update_iceberg_partitioned(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_iceberg(
        TidyFrame(spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "en"), (3, "c", "fr")],
            "id long, v string, lang string")),
        root, partition_by="lang")
    s = update_iceberg(spark, root, "id = 2", {"v": "concat(v, '!')"})
    assert s is not None
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["v"].tolist() == ["a", "b!", "c"]
    # the fr partition was never touched
    from tidierdb_jl_spark.sources.iceberg_ops import files_iceberg

    assert any(f["partition"].get("lang") == "fr"
               for f in files_iceberg(spark, root))
    assert update_iceberg(spark, root, "id = 99", {"v": "'x'"}) is None
    with pytest.raises(ValueError, match="not in the"):
        update_iceberg(spark, root, "id = 1", {"zz": "'x'"})


def test_update_delta_merge_on_read(spark, tmp_path):
    """MOR update: matched rows DV in place, transformed images append
    — no touched file rewrites; exact pre/post cdc."""
    import os

    from tidierdb_jl_spark.sources.delta_cdf import read_delta_cdf

    root = str(tmp_path / "tbl")
    write_delta(
        TidyFrame(spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, v string, n long").coalesce(1)), root,
        configuration={"delta.enableChangeDataFeed": "true"})
    orig = {f for f in os.listdir(root) if f.endswith(".parquet")}
    v = update_delta(spark, root, "id >= 2",
                     {"v": "upper(v)", "n": "n + 1"},
                     mode="merge-on-read")
    assert v == 1
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "v", "n"]].values.tolist() == [
        [1, "a", 10], [2, "B", 21], [3, "C", 31]]
    assert orig <= {f for f in os.listdir(root)
                    if f.endswith(".parquet")}  # nothing rewritten
    cdf = read_delta_cdf(spark, root, starting_version=1).collect()
    rows = sorted((r["id"], r["v"], r["_change_type"])
                  for _, r in cdf.iterrows())
    assert rows == sorted([
        (2, "b", "update_preimage"), (2, "B", "update_postimage"),
        (3, "c", "update_preimage"), (3, "C", "update_postimage")])
    assert update_delta(spark, root, "id = 99", {"v": "'x'"},
                        mode="merge-on-read") is None


def test_update_iceberg_merge_on_read(spark, tmp_path):
    """Iceberg MOR update: position-delete + transformed appends in
    one snapshot; original files intact; compaction materializes."""
    import glob
    import os

    from tidierdb_jl_spark.sources.iceberg_ops import (
        rewrite_data_files_iceberg,
    )

    root = str(tmp_path / "tbl")
    write_iceberg(
        TidyFrame(spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "en"), (3, "c", "fr")],
            "id long, v string, lang string")),
        root, partition_by="lang")
    orig = set(glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                         recursive=True))
    s = update_iceberg(spark, root, "id = 2",
                       {"v": "concat(v, '!')"}, mode="merge-on-read")
    assert s is not None
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["v"].tolist() == ["a", "b!", "c"]
    assert orig <= set(glob.glob(
        os.path.join(root, "data", "**", "*.parquet"), recursive=True))
    # a second MOR update composes (the reader subtracts the first)
    update_iceberg(spark, root, "id = 3", {"v": "'C'"},
                   mode="merge-on-read")
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["v"].tolist() == ["a", "b!", "C"]
    # materialize: rows unchanged, delete manifests pruned
    from tidierdb_jl_spark.sources.iceberg_ops import manifests_iceberg

    rewrite_data_files_iceberg(spark, root, min_files=1)
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got["v"].tolist() == ["a", "b!", "C"]
    assert all(m["content"] == "data"
               for m in manifests_iceberg(spark, root))
