"""SQL surface: table views + kernel functions in one call.

``bind_sql(spark, sf_dir)`` registers the test tables as temp views and
every kernel as a ``ps_*`` function, so the whole engine is drivable from
``spark.sql`` — the query-language face of the toolkit (the reference has
CLIs per module; here it is one SQL session).

    bind_sql(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT ps_langid(text) lang, count(*) FROM documents GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .registry import register_all

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> list[str]:
    done = []
    for t in tables:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet") \
                .createOrReplaceTempView(t)
            done.append(t)
        except Exception:
            continue  # missing table in this sf_dir — skip
    return done


def bind_sql(spark: SparkSession, sf_dir: str) -> dict:
    return {"views": register_views(spark, sf_dir),
            "functions": register_all(spark)}
