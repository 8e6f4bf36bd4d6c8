"""Sinks — write_file / create_table / create_view.

Reference: ``/root/reference/src/view_compute.jl:13-109`` (``COPY (query)
TO path`` with format by extension; CREATE [OR REPLACE] TABLE/VIEW AS).
"""

from __future__ import annotations

__all__ = ["write_file", "create_table", "drop_view"]

_EXT = {".parquet": "parquet", ".csv": "csv", ".json": "json", ".orc": "orc"}


def write_file(
    tf, path: str, mode: str = "overwrite", partition_by=None, cluster_by=None
) -> None:
    fmt = next((f for ext, f in _EXT.items() if path.lower().endswith(ext)), "parquet")
    df = tf.df
    if cluster_by:
        cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        df = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*([partition_by] if isinstance(partition_by, str) else partition_by))
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def create_table(
    tf,
    name: str,
    replace: bool = True,
    temp: bool = False,
    bucket_by=None,
    buckets: int = 0,
    sort_by=None,
    partition_by=None,
    cluster_by=None,
) -> None:
    """(``/root/reference/src/view_compute.jl:45-94``).

    ``bucket_by``/``buckets`` (+ optional ``sort_by``) write a bucketed
    table: subsequent equi-joins or aggregations on the bucket keys read
    co-located partitions and skip the shuffle entirely — the 100 TB
    pattern for dimension/fact tables joined repeatedly.  ``partition_by``
    adds directory partitioning for partition pruning on filters.
    ``cluster_by`` range-partitions and sorts rows by the given columns
    before writing, so each parquet file covers a narrow key range —
    min/max row-group statistics then skip most files on selective scans
    (the cheap cousin of Z-ordering; pick the columns your filters use).
    """
    if temp:
        if replace:
            tf.df.createOrReplaceTempView(name)
        else:
            tf.df.createTempView(name)
        return
    df = tf.df
    if cluster_by:
        cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        df = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    writer = df.write
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    if bucket_by:
        if not buckets:
            raise ValueError("bucket_by requires buckets=N")
        cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
        writer = writer.bucketBy(buckets, *cols)
        if sort_by:
            s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
            writer = writer.sortBy(*s)
    writer.saveAsTable(name, mode="overwrite" if replace else "errorifexists")


def drop_view(spark, name: str) -> bool:
    """Drop a temp view (``/root/reference/src/view_compute.jl:40-42``).
    Falls back to global temp views; returns whether anything was dropped."""
    return spark.catalog.dropTempView(name) or spark.catalog.dropGlobalTempView(name)
