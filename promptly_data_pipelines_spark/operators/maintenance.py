"""Table maintenance — the lakehouse housekeeping the reference
delegates to Iceberg/Nessie (compaction, snapshot hygiene). Streaming
and frequent batch appends produce many small files; scans then pay
per-file open/footer costs and lose row-group locality.

Two compactors, one sizing model:

- **Partitioned tables**: delegated to
  ``compaction.compact_partitioned`` — per-partition file counts,
  salted parallel writers, ``maxRecordsPerFile`` hard bound. (A
  ``repartition(n, partition_col)`` would hash on the partition value
  alone: ONE task and one file per partition regardless of ``n``, so
  a 10 GB hot partition becomes a single 10 GB file — the exact
  degenerate case the salted rewrite exists to avoid.)
- **Unpartitioned tables**: round-robin repartition to
  ``ceil(bytes / target)`` files, staged + swapped here.

The in-place swap is two Hadoop renames whose RESULTS ARE CHECKED —
rename returns False instead of raising on HDFS when the destination
exists (e.g. a ``__old`` leftover from a crashed run), and ignoring
that would move the staging dir INSIDE the live table (duplicating
every row) and then delete the only clean backup. On object stores
rename is copy+delete and the table path is briefly absent — the
reason real lakehouses commit through Iceberg/Delta metadata instead
(see lakehouse.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .fs import FileSystemOps


def _checked_swap(fs: FileSystemOps, staging: str, path: str) -> None:
    """Replace ``path`` with ``staging`` via backup + two verified
    renames. Raises (leaving the original or the backup intact) rather
    than proceeding past a failed rename."""
    backup = path.rstrip("/") + "__old"
    if fs.exists(backup):
        raise IOError(
            f"stale backup {backup} exists (crashed prior run?) — "
            "inspect/remove it before compacting; refusing to overwrite "
            "the only recovery copy"
        )
    if not fs.rename(path, backup):
        raise IOError(f"rename {path} -> {backup} failed; table untouched")
    if not fs.rename(staging, path):
        # roll back so the table is not left missing
        fs.rename(backup, path)
        raise IOError(f"rename {staging} -> {path} failed; original restored")
    fs.delete(backup, recursive=True)


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Rewrite a parquet table dir into ~target-sized files (the
    Iceberg ``rewrite_data_files`` role). Returns the resulting file
    count. Sizing: bytes-per-row estimated from the current files, so
    the byte target translates to the row-count bound the partitioned
    compactor enforces."""
    fs = FileSystemOps(spark)
    data_files = [p for p in fs.list_files_recursive(path) if p.endswith(".parquet")]
    total = sum(fs.file_size(p) for p in data_files) or 1
    staging = path.rstrip("/") + "__compact"

    if partition_col is not None:
        from .compaction import compact_partitioned

        n_rows = spark.read.parquet(path).count() or 1
        rows_per_file = max(1, int(n_rows * target_file_bytes / total))
        compact_partitioned(spark, path, staging, partition_col, rows_per_file)
    else:
        n_files = max(1, -(-total // target_file_bytes))
        spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(staging)

    _checked_swap(fs, staging, path)
    return sum(1 for p in fs.list_files_recursive(path) if p.endswith(".parquet"))
