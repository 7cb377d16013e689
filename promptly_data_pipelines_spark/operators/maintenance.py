"""Table maintenance — the lakehouse housekeeping the reference
delegates to Iceberg/Nessie (compaction, snapshot hygiene). Streaming
and frequent batch appends produce many small files; scans then pay
per-file open/footer costs and lose row-group locality.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession


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
    that own it. The rewrite stages into ``<path>__compact`` and
    atomically swaps via rename — crash before the swap leaves the
    original untouched."""
    data_files = [
        f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ]
    total = sum(os.path.getsize(f) for f in data_files) or 1
    n_files = max(1, -(-total // target_file_bytes))

    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact"
    if partition_col is not None:
        writer = df.repartition(max(n_files, 1), partition_col).write.partitionBy(partition_col)
    else:
        writer = df.repartition(n_files).write
    writer.mode("overwrite").parquet(staging)

    backup = path.rstrip("/") + "__old"
    os.rename(path, backup)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(backup)
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
