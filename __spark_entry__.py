"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship document pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the operator battery from
``pubscience_spark.queries`` (SURVEY.md §2 coverage) for the DuckDB
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pubscience_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the document-corpus curation pass — quality features,
    exact+prefix dedup marking, deterministic split, per-source stats."""
    from pyspark.sql import functions as F

    from pubscience_spark.operators import dedup as dedup_ops
    from pubscience_spark.operators.sampling import train_val_test_split
    from pubscience_spark.operators.stats import word_count_col

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    enriched = (docs
                .withColumn("n_words", word_count_col("text").cast("long"))
                .withColumn("sha256_key", F.sha2(F.col("text"), 256)))
    marked = dedup_ops.mark_duplicates(enriched, "sha256_key", "doc_id")
    split = train_val_test_split(marked, "doc_id")
    return (split.groupBy("source", "lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("total_words"),
                 F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0))
                 .alias("n_duplicates"))
            .orderBy("source", "lang", "split"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (keys ⊆ queries())."""
    return dict(Q.ORACLES)
