"""SparkSession factory tuned for the extraction workload.

Local-mode testing stands in for a multi-executor cluster (driver note):
partitioning/shuffle settings are chosen so the same plan scales — AQE on,
Arrow on, shuffle partitions sized to cores, multi-MB html blobs capped per
Arrow batch (SURVEY.md §4: ``maxPartitionBytes`` / ``maxRecordsPerBatch``
tuning for binary-heavy rows).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pubscience-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("", "*") else int(n)
    b = (SparkSession.builder.appName(app_name).master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         # SIZE-based post-shuffle coalescing (guide §2.2/§9): the
         # parallelismFirst default keeps ~shuffle.partitions tiny
         # reduce tasks alive, paying pure scheduling latency on every
         # exchange; targeting the advisory size instead coalesces a
         # small stage to a handful of tasks while a 100 TB stage
         # still gets bytes/64 MB tasks — the scale-adaptive shape
         # (round-8 A/B: battery hot-set −7%, headline unchanged-to-
         # better; production may raise the advisory toward 256 MB,
         # guide §9, via extra_conf)
         .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                 "false")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         # html blobs are multi-MB: keep Arrow batches bounded so a batch of
         # pages fits executor memory at 100 TB scale
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
         .config("spark.sql.files.maxPartitionBytes", "134217728")
         # many-query workloads (the 50-entry battery, multi-stage
         # curation plans) generate hundreds of codegen'd stages; the
         # default 100-entry class cache thrashes and every re-planned
         # query repays ~1-2 s of janino compile (measured round 7)
         .config("spark.sql.codegen.cache.maxEntries", "2000")
         .config("spark.sql.parquet.compression.codec", "zstd")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
         .config("spark.ui.enabled", "false"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
