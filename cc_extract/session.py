"""SparkSession factory with the pipeline's tuned physical configs
(SURVEY.md §4.2/§4.3).

Every config here exists for the 100 TB design point and is annotated;
the same settings are correct (just bigger numbers) on a 1000-executor
cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(
    cpus: int | None = None,
    app_name: str = "cc_extract",
    shuffle_partitions: int | None = None,
    arrow_batch: int = 256,
) -> SparkSession:
    """Local session for tests/bench; on a cluster only master() changes.

    - ``arrow.maxRecordsPerBatch`` small (256): rows carry multi-MB binary
      payloads; a default 10k-row batch could approach the 2 GiB Arrow
      buffer limit (SURVEY.md §4.2 "Arrow batch sizing").
    - ``useLargeVarTypes``: 64-bit offsets for binary/string arrays so a
      single batch of fat payloads can't overflow 32-bit offsets.
    - AQE on: runtime coalescing + skew-join backstop; our explicit
      size-aware salting handles the UDF-stage skew AQE can't see.
    - ``parquet.compression=zstd``: text output compresses ~3-4x, and at
      100 TB the write/read volume matters more than the cpu.
    """
    master = f"local[{cpus}]" if cpus else "local[*]"
    n_shuffle = shuffle_partitions or (cpus * 4 if cpus else 32)
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
