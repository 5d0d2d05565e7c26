"""Sinks (SURVEY.md §2.1, K1-K3).

The reference buffers a whole output file and writes once at the end as its
commit marker (``retrieve/pubmed/extractor/parse.py:75-79``,
``identify/identify.py:467-477``). Spark's per-partition atomic file commit
plus the pipeline's lineage-last protocol (plans/pipeline.py) give the same
guarantee distributed; these helpers fix the layout conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def is_table_identifier(target: str) -> bool:
    """True when ``target`` names a catalog table rather than a
    filesystem path. Paths carry ``/`` or a URI scheme; a catalog table
    must be CATALOG-QUALIFIED (``catalog.db.table`` — at least two
    dots), so a dotted relative filename like ``out.parquet`` is still
    treated as a path (round-3 review: a single-dot rule silently
    created a managed table named `out`.`parquet` instead of writing
    the file)."""
    if "/" in target or "\\" in target or "://" in target:
        return False
    return target.count(".") >= 2


def write_extracted(df: DataFrame, target: str, *, mode: str = "overwrite",
                    partition_col: str = "bucket") -> None:
    """K1: the extracted table, partitioned by url-hash bucket.

    Dispatch (the Iceberg seam, SURVEY §7.1): when ``target`` is a
    catalog table identifier (``catalog.db.extracted``) the DataFrameV2
    API is used — ``writeTo(...).append()`` for appends,
    ``createOrReplace()`` for overwrite — which on an Iceberg catalog
    gives real snapshot-commit semantics (and makes the parquet commit
    protocol in plans/pipeline redundant: Iceberg's snapshot IS the
    commit marker). When ``target`` is a path, plain parquet partitioned
    by ``bucket`` (the ``bucket(url)`` partition-transform analog). This
    container ships no Iceberg runtime jar (installs forbidden), so the
    catalog branch is exercised against Spark's built-in session catalog
    in tests; on a cluster, configuring
    ``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog``
    routes the same call to Iceberg unchanged."""
    if is_table_identifier(target):
        writer = df.writeTo(target)
        if partition_col and partition_col in df.columns:
            writer = writer.partitionedBy(F.col(partition_col))
        try:
            if mode == "append":
                try:
                    writer.append()
                except Exception as exc:  # first write: table absent
                    if "TABLE_OR_VIEW_NOT_FOUND" in str(exc) or \
                            "NoSuchTable" in str(exc):
                        writer.create()
                    else:
                        raise
            else:
                writer.createOrReplace()
        except Exception as exc:
            # V1 session-catalog tables reject V2 REPLACE/append
            # ("UNSUPPORTED_FEATURE", "Cannot write into v1 table") —
            # fall back to the classic writer; an Iceberg/V2 catalog
            # never takes this branch
            if "UNSUPPORTED_FEATURE" not in str(exc) \
                    and "v1 table" not in str(exc):
                raise
            writer_v1 = df.write.mode(
                "overwrite" if mode != "append" else "append")
            if partition_col and partition_col in df.columns:
                writer_v1 = writer_v1.partitionBy(partition_col)
            writer_v1.saveAsTable(target)
        return
    df.write.mode(mode).partitionBy(partition_col).parquet(target)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """K2: jsonl shards (``{"text":…, "meta":{…}}`` records,
    ``build_final_dataset.py:36-53`` shape is the caller's select)."""
    df.write.mode(mode).json(path)


def write_text(df: DataFrame, path: str, col: str = "text",
               *, mode: str = "overwrite") -> None:
    """K3: one document per line; newlines inside a doc are escaped so the
    line-oriented contract holds (the reference writes latin-1 lines,
    ``clean/cleaner.py:283-291`` — encoding pinned at fixture boundary)."""
    (df.select(F.regexp_replace(F.col(col), r"\n", r"\\n").alias("value"))
     .write.mode(mode).text(path))
