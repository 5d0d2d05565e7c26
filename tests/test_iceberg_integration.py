"""Real-catalog Iceberg integration (VERDICT r3 #4 / SURVEY §7.1).

This container ships no Iceberg runtime jar (installs are forbidden), so
the whole module SKIPS unless `org.apache.iceberg.spark.SparkCatalog` is
loadable — the day the jar is present (e.g. spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>), these light up
and exercise the exact seam `sources/sinks.write_extracted` dispatches
into: snapshot-committed appends, the resume anti-join against a
snapshot read, and partition-transform metadata pruning.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

JAR_COORD = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"


def _require_iceberg(spark, tmp_path):
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip(f"no Iceberg runtime on the classpath ({JAR_COORD})")
    spark.conf.set("spark.sql.catalog.ice",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse",
                   os.path.join(str(tmp_path), "warehouse"))


def _extracted(spark, n, seed):
    from pubscience_spark.datagen.pages import write_pages_parquet
    from pubscience_spark.operators.extract import extract_pages
    from pubscience_spark.plans.pipeline import bucket_col
    import tempfile
    pp = os.path.join(tempfile.mkdtemp(), "pages.parquet")
    write_pages_parquet(pp, n, seed=seed)
    pages = (spark.read.parquet(pp)
             .withColumn("bucket", bucket_col(16)))
    return extract_pages(pages.select("url", "html", "bucket"))


def test_iceberg_append_resume_and_pruning(spark, tmp_path):
    """write_extracted append onto a bucket(16, url)-partitioned Iceberg
    table; resume = anti-join new arrivals against the snapshot read;
    a url point-filter must prune to one partition in the BatchScan."""
    _require_iceberg(spark, tmp_path)
    from pubscience_spark.sources.sinks import write_extracted

    spark.sql("CREATE DATABASE IF NOT EXISTS ice.db")
    spark.sql("DROP TABLE IF EXISTS ice.db.extracted")
    first = _extracted(spark, 60, seed=21)
    spark.sql(
        "CREATE TABLE ice.db.extracted ("
        + ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in first.schema.fields)
        + ") USING iceberg PARTITIONED BY (bucket(16, url))")

    write_extracted(first, "ice.db.extracted", mode="append",
                    partition_col=None)
    n1 = spark.table("ice.db.extracted").count()
    assert n1 == first.count()

    # second arrival overlaps the first; resume anti-join on the
    # snapshot read keeps the append idempotent per url
    second = _extracted(spark, 90, seed=21)   # superset: first 60 same
    committed = spark.table("ice.db.extracted").select("url")
    delta = second.join(committed, "url", "left_anti")
    write_extracted(delta, "ice.db.extracted", mode="append",
                    partition_col=None)
    total = spark.table("ice.db.extracted")
    assert total.count() == second.count()
    assert total.select("url").distinct().count() == second.count()

    # metadata pruning: a url equality predicate reaches the BatchScan
    # (Iceberg prunes to the single bucket(16, url) partition)
    one_url = total.select("url").first()["url"]
    plan = total.where(F.col("url") == one_url) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan" in plan
    assert "url" in plan


def test_iceberg_snapshot_incremental_read(spark, tmp_path):
    """Incremental consumption between snapshots — the real-catalog
    version of streaming/extract_stream.run_incremental's contract."""
    _require_iceberg(spark, tmp_path)
    from pubscience_spark.sources.sinks import write_extracted

    spark.sql("CREATE DATABASE IF NOT EXISTS ice.db")
    spark.sql("DROP TABLE IF EXISTS ice.db.inc")
    a = _extracted(spark, 30, seed=31)
    write_extracted(a, "ice.db.inc", mode="append", partition_col=None)
    snap1 = spark.sql(
        "SELECT snapshot_id FROM ice.db.inc.snapshots "
        "ORDER BY committed_at DESC LIMIT 1").first()[0]
    b = _extracted(spark, 50, seed=32)
    write_extracted(b, "ice.db.inc", mode="append", partition_col=None)
    inc = (spark.read.format("iceberg")
           .option("start-snapshot-id", snap1)
           .load("ice.db.inc"))
    assert inc.count() == b.count()     # only the post-snapshot delta
