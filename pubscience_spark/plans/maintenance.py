"""Table maintenance: small-file compaction.

The extraction write is partitioned by ``bucket`` but executes from
url-join-partitioned data, so every task sprays a file into several bucket
directories (measured ~5 files/bucket per run; appends and resumes add
more). At 10^12 docs that is millions of small files — scan planning and
shuffle-read costs degrade long before storage does. Compaction rewrites
each bucket from exactly one task (hash repartition on the bucket column),
yielding one file per bucket per pass — the plain-parquet analog of
Iceberg's ``rewrite_data_files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def count_files(path: str) -> int:
    return sum(1 for _root, _dirs, files in os.walk(path)
               for f in files if f.endswith(".parquet"))


def compact_extracted(spark: SparkSession, extracted_path: str,
                      *, max_rows_per_file: int | None = None) -> dict:
    """Rewrite the bucket-partitioned extracted table with one writer task
    per bucket. Safe to re-run; lineage/dedup-index are untouched (row
    content is preserved byte-for-byte, only file layout changes)."""
    before = count_files(extracted_path)
    df = spark.read.parquet(extracted_path)
    n_buckets = df.select("bucket").distinct().count()
    writer = (df.repartition(n_buckets, "bucket")
              .write.mode("overwrite").partitionBy("bucket"))
    if max_rows_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_rows_per_file))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    writer.parquet(extracted_path + "._compact")
    # atomic-ish swap: write to a sibling, then replace
    import shutil
    shutil.rmtree(extracted_path)
    os.rename(extracted_path + "._compact", extracted_path)
    after = count_files(extracted_path)
    return {"files_before": before, "files_after": after,
            "buckets": n_buckets}
