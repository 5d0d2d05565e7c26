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


def write_extracted(df: DataFrame, path: str, *, mode: str = "overwrite",
                    partition_col: str = "bucket") -> None:
    """K1: the extracted table, partitioned by url-hash bucket (the
    Iceberg ``bucket(url)`` analog on plain parquet)."""
    (df.write.mode(mode).partitionBy(partition_col).parquet(path))


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
