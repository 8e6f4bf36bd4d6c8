"""CONVERT TO DELTA (delta_writer.convert_to_delta): in-place
migration of a plain parquet directory — existing files become v0
adds, no data moves."""

import os

import pytest

from tidierdb_jl_spark.sources.delta import read_delta
from tidierdb_jl_spark.sources.delta_writer import (convert_to_delta,
                                                    delete_delta,
                                                    write_delta)
from tidierdb_jl_spark.core import TidyFrame


def test_convert_partitioned_and_keep_writing(spark, tmp_path):
    root = str(tmp_path / "plain")
    spark.createDataFrame(
        [(i, f"v{i}", "en" if i % 2 else "fr") for i in range(10)],
        "id long, v string, lang string"
    ).write.partitionBy("lang").parquet(root)
    def inventory():
        # (partition dir, size) — convert renames to uuid-fresh
        # basenames (cross-partition collisions) but never moves bytes
        return sorted(
            (os.path.relpath(d, root), os.path.getsize(os.path.join(d, f)))
            for d, _dns, fns in os.walk(root) for f in fns
            if f.endswith(".parquet") and "_delta_log" not in d
        )

    files_before = inventory()
    assert convert_to_delta(spark, root, partition_by="lang") == 0
    got = read_delta(spark, root).collect()
    assert sorted(got["id"].tolist()) == list(range(10))
    assert set(got["lang"]) == {"en", "fr"}
    assert inventory() == files_before  # same dirs, same bytes

    # the converted table is a first-class Delta table: writes and
    # row ops compose (schema includes the typed partition column)
    sch = read_delta(spark, root).df.schema
    write_delta(TidyFrame(
        spark.createDataFrame([(90, "x", "de")], sch)),
        root, partition_by="lang")
    delete_delta(spark, root, "id = 0")
    got = sorted(read_delta(spark, root).collect()["id"].tolist())
    assert got == [1, 2, 3, 4, 5, 6, 7, 8, 9, 90]

    with pytest.raises(ValueError, match="already has a _delta_log"):
        convert_to_delta(spark, root, partition_by="lang")


def test_convert_layout_gates(spark, tmp_path):
    root = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a", "en")],
                          "id long, v string, lang string") \
        .write.partitionBy("lang").parquet(root)
    with pytest.raises(ValueError, match="declare the actual layout"):
        convert_to_delta(spark, root)  # undeclared partition layout
    with pytest.raises(ValueError, match="no parquet files"):
        convert_to_delta(spark, str(tmp_path / "empty_nonexistent"))
