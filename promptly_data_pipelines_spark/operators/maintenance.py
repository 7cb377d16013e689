"""Table maintenance — the lakehouse housekeeping the reference
delegates to Iceberg/Nessie (compaction, snapshot hygiene). Streaming
and frequent batch appends produce many small files; scans then pay
per-file open/footer costs and lose row-group locality.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .fs import FileSystemOps


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Rewrite a parquet table dir into ~target-sized files (per
    partition directory when partitioned — the Iceberg rewrite_data_files
    role). Returns the resulting file count.

    Sizing: file count = ceil(current_bytes / target). Unpartitioned
    tables repartition round-robin; partitioned tables repartition on
    the partition column so each directory is rewritten by the tasks
    that own it.

    All file operations route through the Hadoop FileSystem API
    (FileSystemOps), so sizing and the staging swap work on any
    supported scheme (file://, s3a://, gs://, hdfs://), not just the
    local FS. The rewrite stages into ``<path>__compact`` then swaps:
    crash BEFORE the swap leaves the original untouched; the swap
    itself is two renames (original → __old, staging → original) — on
    HDFS these are atomic metadata ops, on object stores rename is
    copy+delete and the brief window where the table path is absent is
    why real lakehouses do this through Iceberg/Delta metadata commits
    instead (see lakehouse.py). A crash between the renames is
    recoverable: ``<path>__old`` still holds the full pre-compaction
    table."""
    fs = FileSystemOps(spark)
    data_files = [p for p in fs.list_files_recursive(path) if p.endswith(".parquet")]
    total = sum(fs.file_size(p) for p in data_files) or 1
    n_files = max(1, -(-total // target_file_bytes))

    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact"
    if partition_col is not None:
        writer = df.repartition(max(n_files, 1), partition_col).write.partitionBy(partition_col)
    else:
        writer = df.repartition(n_files).write
    writer.mode("overwrite").parquet(staging)

    backup = path.rstrip("/") + "__old"
    fs.rename(path, backup)
    fs.rename(staging, path)
    fs.delete(backup, recursive=True)
    return sum(1 for p in fs.list_files_recursive(path) if p.endswith(".parquet"))
