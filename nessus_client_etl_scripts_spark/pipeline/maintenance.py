"""Lake maintenance — small-file compaction (SURVEY.md §2.1 S4's sink,
kept healthy over time).

An incremental pipeline that lands a snapshot per day (the reference's
layout, /root/reference/export.py:89-108) accretes files forever; at
100 TB the symptom is a scan spending longer opening files than reading
them (driver-side listing, per-file footer reads, tiny row groups that
defeat vectorized IO). Compaction is the standard fix: rewrite a
partition's many small files into few target-sized ones. Engines with a
table format get this from OPTIMIZE; on a plain parquet lake it is this
operator.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
    partition_cols: tuple[str, ...] = (),
) -> dict[str, int]:
    """Rewrite the parquet dataset at ``src_path`` into ``dst_path``
    with files sized ~``target_mb`` (the 128 MB default aligns file
    size with a typical ``maxPartitionBytes`` so one task reads one
    file). Returns {files_before, files_after, rows, bytes}.

    Sizing: bytes/row is measured from the SOURCE files (sum of file
    sizes / count — real encoded width, not schema guesses), the row
    target per file derives from it, and ``maxRecordsPerFile`` enforces
    the ceiling while a round-robin ``repartition`` to
    ceil(total_bytes / target) sets the file count floor. With
    ``partition_cols`` the repartition keys on them instead so each
    writer task owns whole partitions (one file per partition per
    task, dynamic-overwrite-compatible layout).

    src != dst deliberately: compact-in-place over an object store is
    a read-your-own-overwrite race; the swap (rename or view flip) is
    the caller's transactional step.
    """
    if src_path == dst_path:
        raise ValueError("compact_parquet requires dst_path != src_path")
    df = spark.read.parquet(src_path)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    total_bytes = 0
    files_before = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        total_bytes += fs.getFileStatus(p).getLen()
        files_before += 1
    rows = df.count()
    target_bytes = target_mb * 1024 * 1024
    bytes_per_row = max(total_bytes / max(rows, 1), 1e-9)
    records_per_file = max(int(target_bytes / bytes_per_row), 1)
    n_files = max(math.ceil(total_bytes / target_bytes), 1)

    if partition_cols:
        out = df.repartition(*partition_cols)
    else:
        out = df.repartition(n_files)
    writer = (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
    )
    if partition_cols:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_cols
        )
    writer.parquet(dst_path)

    files_after = len(spark.read.parquet(dst_path).inputFiles())
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
        "bytes": total_bytes,
    }
