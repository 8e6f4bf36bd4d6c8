"""with_row_index: ordered index vs DuckDB row_number oracle, contiguity
of the unordered (zipWithIndex-style) index, cache discipline, and the
no-single-task plan shape."""

from tidierdb_jl_spark import release_caches
from tidierdb_jl_spark.operators.rowindex import with_row_index

from helpers import assert_matches_duckdb


def test_ordered_index_matches_duckdb_row_number(tables, ddb):
    idx = with_row_index(
        tables["lineitem"], order_by=["l_orderkey", "l_linenumber"], num_partitions=8
    ).select("l_orderkey", "l_linenumber", "row_index")
    assert_matches_duckdb(
        idx,
        ddb,
        """
        SELECT l_orderkey, l_linenumber,
               CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1
                    AS BIGINT) AS row_index
        FROM lineitem
        """,
        "row_index_ordered",
    )
    release_caches()


def test_unordered_index_is_contiguous_permutation(tables):
    li = tables["lineitem"]
    n = li.df.count()
    idx = with_row_index(li)
    got = sorted(r.row_index for r in idx.df.select("row_index").collect())
    assert got == list(range(n))
    release_caches()


def test_no_single_partition_window(tables):
    """The whole point: the plan must NOT contain a global (empty
    partition spec) Window — enumeration reads the pinned cache in
    parallel."""
    idx = with_row_index(tables["lineitem"], order_by="l_orderkey", num_partitions=8)
    plan = idx.df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    # and the enumerate pass runs one task per range partition
    assert idx.df.rdd.getNumPartitions() == 8
    release_caches()


def test_persisted_frames_are_released(spark, tables):
    base = len(spark.sparkContext._jsc.getPersistentRDDs())
    with_row_index(tables["region"]).df.count()
    release_caches(blocking=True)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= base
