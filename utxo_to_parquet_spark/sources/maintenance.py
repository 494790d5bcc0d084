"""Table-maintenance utilities: small-file compaction.

The reference writes one parquet file per run (src/main.rs:216) and never
revisits it; a long-lived Spark lake accumulates small files instead —
every micro-batch, every incremental conversion, every partition append
leaves a few. At 100 TB the failure mode is scan-task explosion: file
listing dominates planning, and each tiny file becomes its own input
split. Compaction is the standing maintenance job that rewrites a
directory into size-targeted files.

Kept deliberately engine-native: size discovery goes through Hadoop's
FileSystem API (works for file://, hdfs://, s3a:// alike), the rewrite
is a plain read → repartition → write so AQE and the committer do the
heavy lifting.
"""

from __future__ import annotations

import math


def parquet_dir_stats(spark, path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) for a parquet directory, via the
    Hadoop FileSystem so the same call works on any supported scheme."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    total = 0
    n = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # commit markers / CRCs, not data
        total += st.getLen()
        n += 1
    return total, n


def compact_parquet(
    spark,
    input_path: str,
    output_path: str,
    *,
    target_file_bytes: int = 512 * 1024 * 1024,
    sort_within: list[str] | None = None,
) -> dict:
    """Rewrite ``input_path`` into ``output_path`` with files sized
    toward ``target_file_bytes``.

    The output file count is ceil(input_bytes / target); compaction to
    FEWER files uses coalesce (narrow — no shuffle, each output task
    concatenates input splits), while growing the file count (splitting
    oversized files) needs a real repartition. When ``sort_within`` is
    given, each output file is re-sorted on those columns so clustering
    (and with it page-stat pruning) survives the rewrite — compaction
    that silently destroys sort order is a classic regression.

    Returns an audit dict: bytes/files before and after.
    """
    in_bytes, in_files = parquet_dir_stats(spark, input_path)
    n_out = max(1, math.ceil(in_bytes / target_file_bytes))
    df = spark.read.parquet(input_path)
    if sort_within:
        # sortWithinPartitions requires a shuffle-free narrow parent to
        # keep task count = n_out; repartition gives deterministic sizing
        df = df.repartition(n_out).sortWithinPartitions(*sort_within)
    elif n_out < in_files:
        df = df.coalesce(n_out)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").option("compression", "zstd").option(
        "parquet.compression.codec.zstd.level", "1"
    ).parquet(output_path)
    out_bytes, out_files = parquet_dir_stats(spark, output_path)
    return {
        "in_bytes": in_bytes,
        "in_files": in_files,
        "out_bytes": out_bytes,
        "out_files": out_files,
    }
