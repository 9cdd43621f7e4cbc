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
    arrow_batch: int = 1024,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Local session for tests/bench; on a cluster only master() changes.

    - ``arrow.maxRecordsPerBatch`` 1024: measured sweet spot.  256-row
      batches cost ~8x in JVM->Python transport (per-batch flush overhead
      dominates); 10k-row default risks multi-GiB batches when a salted
      partition holds giants (SURVEY.md §4.2 "Arrow batch sizing") —
      1024 x ~1 MiB worst-case giants ~= 1 GiB/batch, safe under
      useLargeVarTypes with headroom.
    - ``useLargeVarTypes``: 64-bit offsets for binary/string arrays so a
      single batch of fat payloads can't overflow 32-bit offsets.
    - AQE on: runtime coalescing + skew-join backstop; our explicit
      size-aware salting handles the UDF-stage skew AQE can't see.
    - ``parquet.compression=zstd``: text output compresses ~3-4x, and at
      100 TB the write/read volume matters more than the cpu.
    """
    import os

    master = f"local[{cpus}]" if cpus else "local[*]"
    n_shuffle = shuffle_partitions or (cpus * 4 if cpus else 32)
    # Shuffle/spill dirs on tmpfs when available: in this single-disk
    # sandbox the lone block device is a shared resource that does NOT
    # scale with core count, which would understate scaling efficiency —
    # on a real cluster every executor brings its own shuffle disks.
    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp/spark-local"
    builder = SparkSession.builder
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return (
        builder.master(master)
        .config("spark.local.dir", local_dir)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Round 6: InferFiltersFromGenerate turns every explode(arr) into
        # an inferred `isnotnull(arr) AND size(arr) > 0` filter, and
        # predicate pushdown then drags that filter — containing the FULL
        # array-building expression (tokenize + per-window md5 for the
        # shingle/segment relations) — below the fan-out exchange, where
        # it re-runs single-threaded in the scan task and duplicates the
        # projection's work (measured: the (doc, segment) explode went
        # 5.6 s -> 1.3 s at sf1.0 with the rule off).  The inferred
        # filter is semantically redundant (Generate already skips
        # null/empty arrays), so excluding the rule cannot change any
        # result; our corpora have no empty-array-heavy tail for it to
        # prune — at any scale the duplicated generator evaluation costs
        # more than the rows it would skip.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # 32 MB scan splits: the giants-only pipeline extracts small docs
        # IN scan partitions, so scan granularity = extraction task
        # granularity; at sf-small the corpus files are ~17 MB and the
        # default 128 MB would pack them into too few tasks for 32 cores.
        # Production at 100 TB raises this back to 128-256 MB.
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        # never pack multiple files into one scan split: extraction
        # parallelism rides the scan in the giants-only plan, and packed
        # 3 MB fixture files would starve 32 cores
        .config("spark.sql.files.openCostInBytes", "33554432")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
