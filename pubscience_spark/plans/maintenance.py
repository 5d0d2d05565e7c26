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
    import shutil
    compact_tmp = extracted_path + "._compact"
    old_tmp = extracted_path + "._old"
    # crash recovery: a COMPLETE ._compact (our _COMPACTED marker, written
    # after the Spark job finishes — dynamic overwrite emits no _SUCCESS)
    # with no live table means a prior run died between the two swap
    # renames — finish its swap; any other leftover sibling is garbage
    if (not os.path.isdir(extracted_path) and
            os.path.exists(os.path.join(compact_tmp, "_COMPACTED"))):
        os.rename(compact_tmp, extracted_path)
    for leftover in (old_tmp, compact_tmp):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)

    before = count_files(extracted_path)
    df = spark.read.parquet(extracted_path)
    n_buckets = df.select("bucket").distinct().count()
    writer = (df.repartition(n_buckets, "bucket")
              .write.mode("overwrite").partitionBy("bucket"))
    if max_rows_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_rows_per_file))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    writer.parquet(compact_tmp)
    open(os.path.join(compact_tmp, "_COMPACTED"), "w").close()
    # swap order is crash-safe: move the live table ASIDE first, promote
    # the compacted copy, delete the old copy last — at every instant a
    # complete table exists on disk (either live or as ._compact+_SUCCESS,
    # which the recovery above promotes). Renames are same-directory, so
    # no cross-filesystem hazard. Readers planned against old file paths
    # during the swap window fail their scan and must re-plan — run
    # compaction when the table is quiescent.
    os.rename(extracted_path, old_tmp)
    os.rename(compact_tmp, extracted_path)
    shutil.rmtree(old_tmp)
    after = count_files(extracted_path)
    return {"files_before": before, "files_after": after,
            "buckets": n_buckets}
