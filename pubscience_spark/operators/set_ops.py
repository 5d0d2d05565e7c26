"""Set operators (SURVEY.md §2.7): shard combine + per-source overwrite,
X4 name-based dedup with sub-article removal, G4 regex doc splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def combine_shards(*dfs: DataFrame) -> DataFrame:
    """``combine_guidelines`` (scripts/clean.py:910-924): shard union by
    column name — order-free, schema-checked."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def overwrite_source(base: DataFrame, new: DataFrame,
                     source_col: str = "source") -> DataFrame:
    """``add_guidelines`` (scripts/clean.py:927-939): replace every row of
    the sources present in ``new`` with the new rows — a left-anti join on
    the (tiny, broadcast) source list plus a union."""
    sources = new.select(source_col).distinct()
    kept = base.join(F.broadcast(sources), source_col, "left_anti")
    return kept.unionByName(new)


def dedup_by_name_keep_longest(df: DataFrame, name_col: str,
                               text_col: str = "text",
                               drop_subarticles: bool = True) -> DataFrame:
    """X4 (scripts/clean.py:695-738): merge same-name docs keeping the
    longest text; optionally drop sub-articles — rows named ``"X <sub>"``
    when a row named ``"X overview"`` exists.

    The sub-article check is an equi-join on the *overview base name*
    (first token sequence before the suffix), never a cross join: each row
    joins against the broadcast set of overview base names.
    """
    w = Window.partitionBy(name_col).orderBy(
        F.length(text_col).desc(), F.col(text_col))
    merged = (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))
    if not drop_subarticles:
        return merged
    lower = F.lower(F.col(name_col))
    overviews = (merged
                 .where(lower.endswith(" overview"))
                 .select(F.expr(f"substring(lower({name_col}), 1, "
                                f"length({name_col}) - length(' overview'))")
                         .alias("__base"))
                 .distinct())
    candidates = merged.withColumn(
        "__base",
        F.when(lower.endswith(" overview"), F.lit(None))
        .otherwise(F.regexp_replace(lower, r"\s+\S+$", "")))
    return (candidates
            .join(F.broadcast(overviews), "__base", "left_anti")
            .drop("__base"))


def split_docs_regex(df: DataFrame, pattern: str, id_col: str = "url",
                     text_col: str = "text") -> DataFrame:
    """G4 (identify/identify.py:262-306): split documents on a boundary
    regex into numbered parts — native split + posexplode, no Python."""
    parts = F.split(F.col(text_col), pattern)
    return (df.select(id_col, F.posexplode(parts).alias("part_no", "part"))
            .where(F.length(F.trim(F.col("part"))) > 0))
