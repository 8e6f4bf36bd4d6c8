"""Dynamic partition overwrite, both formats: replace exactly the
partitions the batch writes, leave the rest."""

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources.delta_writer import write_delta
from tidierdb_jl_spark.sources.iceberg import read_iceberg
from tidierdb_jl_spark.sources.iceberg_ops import (
    overwrite_partitions_iceberg,
)
from tidierdb_jl_spark.sources.iceberg_writer import write_iceberg


def _tf(spark, rows, schema="id long, v string, lang string"):
    return TidyFrame(spark.createDataFrame(rows, schema))


def test_delta_dynamic_overwrite(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(_tf(spark, [(1, "a", "en"), (2, "b", "fr"),
                            (3, "c", "de")]), root, partition_by="lang")
    # refresh ONLY the en partition
    write_delta(_tf(spark, [(9, "z", "en")]), root, mode="overwrite",
                partition_by="lang", partition_overwrite="dynamic")
    got = read_delta(spark, root).collect().sort_values("id")
    assert got[["id", "lang"]].values.tolist() == [
        [2, "fr"], [3, "de"], [9, "en"]]
    # time travel still sees the replaced rows
    assert read_delta(spark, root, version=0).df.count() == 3
    # static overwrite still replaces everything
    write_delta(_tf(spark, [(7, "q", "fr")]), root, mode="overwrite",
                partition_by="lang")
    assert read_delta(spark, root).collect()["id"].tolist() == [7]
    with pytest.raises(ValueError, match="static.dynamic"):
        write_delta(_tf(spark, [(1, "a", "en")]), root,
                    mode="overwrite", partition_by="lang",
                    partition_overwrite="bogus")


def test_delta_dynamic_overwrite_unpartitioned_refuses(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_delta(
        TidyFrame(spark.createDataFrame([(1, "a")],
                                        "id long, v string")), root)
    with pytest.raises(ValueError, match="unpartitioned"):
        write_delta(
            TidyFrame(spark.createDataFrame([(2, "b")],
                                            "id long, v string")),
            root, mode="overwrite", partition_overwrite="dynamic")


def test_iceberg_dynamic_overwrite(spark, tmp_path):
    root = str(tmp_path / "tbl")
    s0 = write_iceberg(_tf(spark, [(1, "a", "en"), (2, "b", "fr"),
                                   (3, "c", "de")]), root,
                       partition_by="lang")
    s1 = overwrite_partitions_iceberg(
        _tf(spark, [(9, "z", "en"), (8, "y", "it")]), root)
    assert s1 is not None
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got[["id", "lang"]].values.tolist() == [
        [2, "fr"], [3, "de"], [8, "it"], [9, "en"]]
    # time travel intact
    assert read_iceberg(spark, root, snapshot_id=s0).df.count() == 3
    # schema mismatch refuses
    with pytest.raises(ValueError, match="does not match"):
        overwrite_partitions_iceberg(
            TidyFrame(spark.createDataFrame([(1, "a")],
                                            "id long, v string")),
            root)
