"""Sinks — write_file / create_table / create_view.

Reference: ``/root/reference/src/view_compute.jl:13-109`` (``COPY (query)
TO path`` with format by extension; CREATE [OR REPLACE] TABLE/VIEW AS).
"""

from __future__ import annotations

__all__ = [
    "write_file", "create_table", "drop_view", "merge_upsert",
    "compact_files", "dataset_size_bytes", "write_delta",
]

from .delta_writer import write_delta  # noqa: E402,F401 — re-export

_EXT = {".parquet": "parquet", ".csv": "csv", ".json": "json", ".orc": "orc", ".xml": "xml"}


def write_file(
    tf,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
    cluster_by=None,
    cluster_files: int | None = None,
) -> None:
    """``cluster_files`` pins the number of range partitions (= output
    files per directory) when clustering — size files for the target
    object store instead of inheriting shuffle-partition/AQE defaults."""
    fmt = next((f for ext, f in _EXT.items() if path.lower().endswith(ext)), "parquet")
    df = tf.df
    if cluster_by:
        cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        parts = [cluster_files] if cluster_files else []
        df = df.repartitionByRange(*parts, *cols).sortWithinPartitions(*cols)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*([partition_by] if isinstance(partition_by, str) else partition_by))
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt == "xml":
        writer.option("rowTag", "row").format("xml").save(path)
        return
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
    cluster_files: int | None = None,
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
        parts = [cluster_files] if cluster_files else []
        df = df.repartitionByRange(*parts, *cols).sortWithinPartitions(*cols)
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


def _dataset_exists(spark, path: str) -> bool:
    """True when ``path`` holds at least one non-hidden file.  Goes through
    the Hadoop FileSystem API so hdfs:// / s3a:// datasets are seen — a
    local ``os.path`` check would report them missing and a caller like
    ``merge_upsert`` would silently overwrite the dataset with only the
    updates batch."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    return any(
        not st.getPath().getName().startswith(("_", "."))
        for st in fs.listStatus(hpath)
    )


def merge_upsert(spark, path: str, updates_tf, key, partition_col=None):
    """MERGE-like upsert into a parquet dataset (no lakehouse format
    needed): rows whose ``key`` matches an update are replaced, new keys
    are inserted.  The CDC-ingestion primitive for plain-parquet tables.

    With ``partition_col`` (dataset written partitioned by it; updates
    must carry it) only partitions containing updated keys are rewritten
    — dynamic partition overwrite — so at 100 TB an upsert costs a scan +
    rewrite of the AFFECTED partitions, never the history.  Without it
    the whole dataset rewrites.

    REQUIREMENT for the partition-scoped mode: a key's partition must be
    stable — an update row must land in the same partition as the row it
    replaces (true for the usual CDC layouts, where the partition value
    is derived from the key or immutable per entity).  A key that "moved"
    partitions would leave its old row behind, since untouched partitions
    are — by design — never read.

    Not ACID: a crash mid-write can leave the overwritten partitions
    partial (that's what Delta/Iceberg add — use ``db_table(delta=...)``
    when the connector is available).  The merged result is
    localCheckpoint-ed before writing because the write target is also
    the read source.

    Returns a TidyFrame reading the merged dataset.
    """
    from pyspark.sql import functions as F

    from ..core import TidyFrame

    keys = [key] if isinstance(key, str) else list(key)
    updates = updates_tf.df
    writer_cols = [partition_col] if partition_col else []
    exists = _dataset_exists(spark, path)
    if not exists:
        w = updates.write.mode("overwrite")
        if writer_cols:
            w = w.partitionBy(*writer_cols)
        w.parquet(path)
        return TidyFrame(spark.read.parquet(path))

    target = spark.read.parquet(path)
    if partition_col:
        parts = updates.select(partition_col).distinct()
        # only affected partitions are read (broadcast semi prunes) ...
        target = target.join(F.broadcast(parts), partition_col, "left_semi")
    keep = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = keep.unionByName(updates).localCheckpoint(eager=True)
    w = merged.write.mode("overwrite")
    if partition_col:
        # ... and only they are rewritten
        w = w.partitionBy(partition_col).option("partitionOverwriteMode", "dynamic")
    w.parquet(path)
    return TidyFrame(spark.read.parquet(path))


def drop_view(spark, name: str) -> bool:
    """Drop a temp view (``/root/reference/src/view_compute.jl:40-42``).
    Falls back to global temp views; returns whether anything was dropped."""
    return spark.catalog.dropTempView(name) or spark.catalog.dropGlobalTempView(name)


def dataset_size_bytes(spark, path: str) -> int:
    """Total bytes of the non-hidden files under ``path`` (recursive),
    via the Hadoop FileSystem API — works for local, hdfs://, s3a://."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            total += st.getLen()
    return total


def compact_files(
    spark,
    src_path: str,
    dest_path: str | None = None,
    target_mb: int = 128,
    fmt: str = "parquet",
):
    """Rewrite a dataset into right-sized files — the small-files fix: a
    100 TB table accreted from per-batch appends ends up as millions of
    KB-scale files whose per-file open/footer overhead dominates scans;
    compaction rewrites it as ``ceil(total_bytes / target_mb)`` files.

    The output file count comes from the dataset's ACTUAL on-disk bytes
    (Hadoop FS metadata — no data read), so the result lands near
    ``target_mb`` per file regardless of row width.  ``coalesce`` (not
    ``repartition``) does the narrowing — no shuffle, each output task
    reads a contiguous set of input files.  In-place compaction
    (``dest_path=None``) writes to a sibling temp directory and swaps it
    in with Hadoop FS delete+rename — rows stream disk-to-disk, NEVER
    through executor memory (a ``localCheckpoint`` pin would cache the
    whole dataset, which does not survive 100 TB), and a mid-write crash
    leaves the original intact.  Returns (TidyFrame of the compacted
    dataset, n_output_files).
    """
    from ..core import TidyFrame

    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    total = dataset_size_bytes(spark, src_path)
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = getattr(spark.read, fmt)(src_path)
    in_place = dest_path is None or dest_path == src_path
    write_to = (src_path.rstrip("/") + "._compact_tmp") if in_place else dest_path
    getattr(df.coalesce(n_out).write.mode("overwrite"), fmt)(write_to)
    if in_place:
        jvm = spark._jvm
        src = jvm.org.apache.hadoop.fs.Path(src_path)
        tmp = jvm.org.apache.hadoop.fs.Path(write_to)
        fs = src.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.delete(src, True):
            raise IOError(f"could not remove {src_path} for in-place swap")
        if not fs.rename(tmp, src):
            raise IOError(
                f"rename {write_to} -> {src_path} failed; compacted data "
                f"remains at {write_to}"
            )
    final = getattr(spark.read, fmt)(dest_path or src_path)
    return TidyFrame(final), n_out
