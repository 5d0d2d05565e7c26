"""The end-to-end extraction pipeline (SURVEY.md §7.1 DAG).

    pages(url, warc_ts, html, text, lang)
      └─ resume gate: anti-join vs committed lineage buckets      [R1-R3]
      └─ salted size-balanced repartition over url-hash           [north rule]
      └─ mapInPandas extract (html | pubmed-xml | pdf routes)     [H*,B*,C*,P*]
      └─ language gate (input col ∥ seeded detector)              [F8]
      └─ dedup keys + keep-first duplicate marking                [X1,X2]
      └─ write extracted, partitioned by bucket(url)
      └─ lineage rows (bucket, row_count, checksum, wall_time)    [R4]

Commit protocol (Iceberg-analog on plain parquet): extracted data for a
bucket is visible only once its lineage row exists — lineage is written
last (write-at-end-marks-success, ``extractor/parse.py:75-79`` analog).
Resume anti-joins the lineage table, so re-running after a crash reprocesses
only uncommitted buckets; dynamic partition overwrite makes that idempotent.

Scale notes:
- the shuffle key is ``pmod(xxhash64(url, SALT), n_buckets)`` — url hashing
  defeats domain skew (Zipf hosts), the salt constant decorrelates this
  shuffle from any earlier url-hash partitioning;
- ``n_buckets`` targets ~BYTES_PER_BUCKET of html per bucket, computed from
  a cheap (count, sum(length)) pre-agg — size-balanced partitions instead
  of file-boundary skew (the reference's per-file fan-out problem,
  BASELINE.md "parallelism model");
- AQE re-coalesces post-filter partitions at runtime.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dedup_ops
from ..operators.extract import extract_pages

SALT = 0x5CA1AB1E
BYTES_PER_BUCKET = 64 * 1024 * 1024  # ~64 MB of raw html per bucket


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("url"), F.lit(SALT)), F.lit(n_buckets))


def plan_buckets(pages: DataFrame, target_bytes: int = BYTES_PER_BUCKET,
                 min_buckets: int | None = None) -> int:
    """Size-balanced bucket count from a cheap pre-agg."""
    row = pages.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("html")).alias("b")).collect()[0]
    total = row["b"] or 0
    if min_buckets is None:
        min_buckets = pages.sparkSession.sparkContext.defaultParallelism
    return max(min_buckets, math.ceil(total / target_bytes))


def committed_buckets(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    """Buckets whose lineage row exists (= committed). Missing/empty
    lineage → None (nothing committed yet); a genuine read failure
    propagates — treating it as "nothing committed" would silently
    reprocess every bucket (idempotent but masks the failure; the
    ADVICE-r8 loader rule, applied consistently)."""
    raw = dedup_ops._read_index_or_none(spark, lineage_path)
    if raw is None:
        return None
    return raw.select("bucket").distinct()


def run_extraction(spark: SparkSession, pages: DataFrame, out_dir: str,
                   *, n_buckets: int | None = None, resume: bool = True,
                   lang_keep: str | None = None,
                   use_detector_gate: bool = False,
                   dedup_strategy: str = "slim-join",
                   boilerplate_by_domain: dict[str, str] | None = None
                   ) -> dict:
    """Run the pipeline; returns run metrics. Idempotent under re-run.

    ``boilerplate_by_domain`` maps url hosts onto the per-source B2
    rule-sets (``kernels/source_rules`` names, e.g. ``{"www.who.int":
    "who"}``); matched hosts get their reference processor, others the
    generic default — the pipeline emits ``clean_text`` + ``kept`` columns
    alongside the raw ``extracted_text`` (dedup keys stay derived from the
    raw text, so resume/fixture identities are unchanged).
    """
    extracted_path = os.path.join(out_dir, "extracted")
    lineage_path = os.path.join(out_dir, "lineage")

    if n_buckets is None:
        n_buckets = plan_buckets(pages)

    pages = pages.withColumn("bucket", bucket_col(n_buckets))

    skipped = 0
    committed = None
    if resume:
        committed = committed_buckets(spark, lineage_path)
        if committed is not None:
            n_committed = committed.count()
            if n_committed:
                # partition-level resume: committed bucket list is tiny →
                # broadcast left-anti join prunes whole buckets (R1/R2)
                pages = pages.join(F.broadcast(committed), "bucket",
                                   "left_anti")
                skipped = n_committed

    # salted size-balanced repartition over url-hash (north rule): one
    # shuffle that co-locates each bucket, balanced by byte-targeted count
    pages = pages.repartition(n_buckets, "bucket")

    extracted = extract_pages(pages.select("url", "html", "bucket")) \
        .withColumn("bucket", bucket_col(n_buckets))

    if lang_keep is not None:
        if use_detector_gate:
            # native Catalyst detector (kernel-equal, test-enforced) —
            # no Python workers in the gate
            from ..operators.clean import with_detected_lang
            extracted = (with_detected_lang(extracted, "extracted_text",
                                            "__det")
                         .where(F.col("__det") == F.lit(lang_keep))
                         .drop("__det"))
        else:
            extracted = extracted.where(F.col("language") == F.lit(lang_keep))

    if boilerplate_by_domain is not None:
        from ..operators.boilerplate import strip_boilerplate
        extracted = extracted.withColumn(
            "__host", F.lower(F.expr("try_parse_url(url, 'HOST')")))
        extracted = strip_boilerplate(
            extracted, text_col="extracted_text", source_col="__host",
            source_map=boilerplate_by_domain,
            title_col="title").drop("__host")

    # X1/X2 duplicate marking (keep-first by url — deterministic total
    # order). Two strategies, identical output on a fresh run ("windows"
    # does NOT consult the cross-run keeper index — use the default
    # "slim-join" whenever resume matters):
    # - "slim-join": windows over a slim (url, keys) projection + one
    #   shuffle-hash join back — wide rows shuffle once; requires a
    #   disk-backed persist because the extracted DF feeds both join sides
    #   (otherwise the expensive mapInPandas extraction runs twice);
    # - "windows": row_number windows directly over the wide rows — one
    #   extraction pass, but each dedup key is a full-data shuffle+sort.
    cached = None
    new_index = None
    index_path = os.path.join(out_dir, "dedup_index")
    if dedup_strategy == "slim-join":
        from pyspark.storagelevel import StorageLevel
        cached = extracted.persist(StorageLevel.MEMORY_AND_DISK)
        # cross-run correctness: keepers committed by earlier runs win, so
        # a resumed bucket still marks duplicates of rows it cannot see
        prior_index = dedup_ops.load_keeper_index(spark, index_path) \
            if resume else None
        extracted, new_index = dedup_ops.mark_duplicates_incremental(
            cached, ["sha256", "dedup_key"], "url", prior_index)
    else:
        extracted = dedup_ops.mark_duplicates(extracted, "dedup_key", "url") \
            .withColumnRenamed("is_duplicate", "is_prefix_duplicate")
        extracted = dedup_ops.mark_duplicates(extracted, "sha256", "url") \
            .withColumn("is_duplicate",
                        F.col("is_duplicate") | F.col("is_prefix_duplicate")) \
            .drop("is_prefix_duplicate")

    # run-report counters (A4/R4) ride the write pass via observe() —
    # zero extra jobs (scripts/clean.py:863-869 analog)
    from pyspark.sql import Observation
    obs = Observation("run_report")
    extracted = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
        .alias("errors"),
        F.sum(F.when(F.length("extracted_text") == 0, 1).otherwise(0))
        .alias("empty"),
        F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0)).alias("dups"))

    # write data first, lineage last (commit marker). Dynamic partition
    # overwrite keeps crashed half-written buckets idempotent.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import time
    t0 = time.time()
    extracted.write.mode("overwrite").partitionBy("bucket") \
        .parquet(extracted_path)
    wall = time.time() - t0
    observed = dict(obs.get)
    if new_index is not None:
        new_index.write.mode("append").parquet(index_path)
    if cached is not None:
        cached.unpersist()

    # empty run (everything committed already, or empty input): dynamic
    # overwrite writes no files, so there may be nothing to read. Probe
    # through the Hadoop FS API so s3a://hdfs:// out_dirs work (round-2
    # review: os.walk silently returns nothing for non-local paths)
    from . import fsutil
    has_files = fsutil.has_files(spark, extracted_path)
    if not has_files:
        return {"rows_written": 0, "buckets": n_buckets,
                "buckets_skipped": skipped, "write_wall_s": wall,
                "extracted_path": extracted_path,
                "lineage_path": lineage_path}

    # lineage from the *written* data: counts/checksum reflect committed rows;
    # only buckets processed this run get a lineage row (append-only log)
    written = spark.read.parquet(extracted_path)
    new_buckets = written
    if committed is not None and skipped:
        new_buckets = written.join(F.broadcast(committed), "bucket",
                                   "left_anti")
    lineage = (new_buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0)).alias("dup_count"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("error_count"),
        F.sum(F.crc32(F.concat_ws("|", "url", "sha256"))).alias("checksum"),
        F.sum("cpu_seconds").alias("wall_time_s"))
        .withColumn("input_split", F.concat(F.lit("bucket="), F.col("bucket")))
        .withColumn("committed_at", F.current_timestamp()))
    # lineage is tiny (one row per bucket): cache it so the commit write and
    # the row-count report share one scan of the written table
    lineage = lineage.cache()
    lineage.write.mode("append").parquet(lineage_path)

    new_rows = lineage.agg(F.sum("row_count")).collect()[0][0] or 0
    lineage.unpersist()
    n_rows = new_rows if committed is None or not skipped else written.count()
    return {"rows_written": n_rows, "buckets": n_buckets,
            "buckets_skipped": skipped, "write_wall_s": wall,
            "observed": observed,
            "extracted_path": extracted_path, "lineage_path": lineage_path}
