"""SparkSession construction with the engine's scale-tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "fin-ocr-sdk-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Session defaults chosen for the 100 TB design point, scaled to
    local mode for tests:

    - AQE on (runtime coalescing + skew-join splitting)
    - Arrow on, with a bounded records-per-batch so a batch of decoded
      rasters (~0.5 MB each) stays well inside executor memory
    - shuffle partitions default to local core count (driver-set
      SPARK_GRAFT_CPUS), sized up by the byte-weighted repartition for
      the scan stage (plans/pipeline.py)
    """
    # one BLAS thread per python worker: the scan stage runs one worker
    # per core, so nested BLAS threading only thrashes caches
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        # media payloads decompress ~10:1 out of parquet: split scans by
        # the UNCOMPRESSED working set, not on-disk bytes (one media
        # part file per task)
        .config("spark.sql.files.maxPartitionBytes", str(4 << 20))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.python.worker.reuse", "true")
    )
    return builder.getOrCreate()
