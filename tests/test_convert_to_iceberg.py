"""convert_to_iceberg (iceberg_ops): in-place parquet-to-Iceberg
migration — existing files become the first snapshot, distributed
footer probe for counts, hive-layout refusal."""

import glob
import os

import pytest

from tidierdb_jl_spark.core import TidyFrame
from tidierdb_jl_spark.sources.iceberg import read_iceberg
from tidierdb_jl_spark.sources.iceberg_ops import (convert_to_iceberg,
                                                   delete_iceberg,
                                                   files_iceberg)
from tidierdb_jl_spark.sources.iceberg_writer import write_iceberg


def test_convert_and_row_ops(spark, tmp_path):
    root = str(tmp_path / "plain")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    ).repartition(3).write.parquet(root)
    data_before = sorted(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "*.parquet")))

    convert_to_iceberg(spark, root)
    got = read_iceberg(spark, root).collect()
    assert sorted(got["id"].tolist()) == list(range(10))
    # nothing moved, counts probed correctly
    assert sorted(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "*.parquet"))) \
        == data_before
    inv = files_iceberg(spark, root)
    assert sum(f["record_count"] for f in inv) == 10
    assert all(f["file_size_in_bytes"] > 0 for f in inv)

    # a first-class table afterwards: append + delete compose
    write_iceberg(
        TidyFrame(spark.createDataFrame([(90, "x")],
                                        "id long, v string")),
        root, mode="append")
    delete_iceberg(spark, root, "id = 0")
    got = sorted(read_iceberg(spark, root).collect()["id"].tolist())
    assert got == [1, 2, 3, 4, 5, 6, 7, 8, 9, 90]

    with pytest.raises(ValueError, match="already has a metadata"):
        convert_to_iceberg(spark, root)


def test_convert_hive_layout_identity_fill(spark, tmp_path):
    """A hive-partitioned dir converts to an identity partition spec;
    the partition column (present ONLY in directory names) re-attaches
    through the reader's Column Projection rule-1 fill, typed by
    Spark's directory inference — including an int partition key."""
    root = str(tmp_path / "plain")
    spark.createDataFrame(
        [(1, "a", "en", 10), (2, "b", "fr", 10), (3, "c", "en", 20)],
        "id long, v string, lang string, bucket int"
    ).write.partitionBy("lang", "bucket").parquet(root)

    convert_to_iceberg(spark, root)
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got[["id", "lang", "bucket"]].values.tolist() == [
        [1, "en", 10], [2, "fr", 10], [3, "en", 20]]
    # partition tuples landed typed in the inventory
    inv = files_iceberg(spark, root)
    assert {(f["partition"]["lang"], f["partition"]["bucket"])
            for f in inv} == {("en", 10), ("fr", 10), ("en", 20)}

    # row ops compose: the survivors rewrite materializes the filled
    # partition columns into self-contained new files
    delete_iceberg(spark, root, "lang = 'en' AND bucket = 10")
    got = read_iceberg(spark, root).collect().sort_values("id")
    assert got[["id", "lang"]].values.tolist() == [[2, "fr"],
                                                   [3, "en"]]
