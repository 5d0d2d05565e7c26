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


def dedup_by_name(df: DataFrame, name_col: str, text_col: str = "text",
                  drop_subarticles: bool = True,
                  keep: str = "first", order_col: str | None = None,
                  rename_overviews: bool = True) -> DataFrame:
    """X4 (scripts/clean.py:695-738): wikidoc-style name dedup + sub-article
    removal, reference-exact semantics:

    - same-name merge keeps the FIRST-seen text (the reference's dict only
      inserts on miss). Spark has no input order, so ``keep="first"``
      requires an explicit ``order_col`` total order; ``keep="longest"``
      is the order-free variant.
    - a row is a sub-article iff an overview exists whose *subject* (the
      overview name with every ``overview`` substring removed, stripped —
      reference uses ``re.sub``, not suffix-strip) is a PREFIX of the row's
      name, any suffix length, and the row itself does not end with
      ``overview``. Surviving overview rows are renamed to their subject
      (reference mutates ``name`` in place).

    Scale shape: the reference's ``name.startswith(subject)`` admits
    mid-token prefixes (subject ``Alpha`` drops ``Alphabet history``), so
    no token-level equi-join key exists; the overview-subject side is tiny
    by construction (distinct page names ending in ``overview``), so the
    prefix match is a broadcast nested-loop join — O(n·m) JVM string
    compares with m = |overviews|, no shuffle, no cross join of big sides.
    Empty subjects (a doc literally named "overview") would prefix-match
    every article in the reference; they are guarded out here (divergence
    noted: the as-written behavior deletes the whole corpus).
    """
    if keep == "first":
        if order_col is None:
            raise ValueError("keep='first' needs order_col (Spark rows "
                             "have no implicit order)")
        w = Window.partitionBy(name_col).orderBy(order_col)
    elif keep == "longest":
        w = Window.partitionBy(name_col).orderBy(
            F.length(text_col).desc(), F.col(text_col))
    else:
        raise ValueError(f"keep must be 'first' or 'longest', got {keep!r}")
    merged = (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))
    if not drop_subarticles:
        return merged
    name = F.col(name_col)
    subject = F.trim(F.replace(name, F.lit("overview"), F.lit("")))
    overviews = (merged
                 .where(name.endswith("overview"))
                 .select(subject.alias("__subj"))
                 .where(F.length("__subj") > 0)
                 .distinct())
    non_overview = merged.where(~name.endswith("overview"))
    drop_keys = (non_overview.select(name_col)
                 .join(F.broadcast(overviews),
                       name.startswith(F.col("__subj")))
                 .select(name).distinct())
    survivors = merged.join(F.broadcast(drop_keys), name_col, "left_anti")
    if rename_overviews:
        survivors = survivors.withColumn(
            name_col,
            F.when(name.endswith("overview") & (F.length(subject) > 0),
                   subject).otherwise(name))
    return survivors


def dedup_by_name_keep_longest(df: DataFrame, name_col: str,
                               text_col: str = "text",
                               drop_subarticles: bool = True) -> DataFrame:
    """Back-compat alias: the order-free ``keep='longest'`` variant without
    the reference's overview rename."""
    return dedup_by_name(df, name_col, text_col, drop_subarticles,
                         keep="longest", rename_overviews=False)


def mint_ids(df: DataFrame, source_col: str = "source",
             order_col: str = "url", id_col: str = "id") -> DataFrame:
    """X6 (scripts/clean.py:965-983): per-source sequential id minting,
    ``id = sha1(source ∥ str(i))`` with ``i`` the 0-based position within
    the source. The reference's ``i`` is file order; Spark rows have no
    order, so ``order_col`` supplies the total order (url / doc_id) —
    deterministic under any partitioning. One shuffle on ``source_col``;
    the sha1 is native (JVM codegen)."""
    w = Window.partitionBy(source_col).orderBy(order_col)
    i = (F.row_number().over(w) - 1).cast("string")
    return df.withColumn(
        id_col, F.sha1(F.concat(F.col(source_col).cast("string"), i)))


def split_docs_regex(df: DataFrame, pattern: str, id_col: str = "url",
                     text_col: str = "text") -> DataFrame:
    """G4 (identify/identify.py:262-306): split documents on a boundary
    regex into numbered parts — native split + posexplode, no Python."""
    parts = F.split(F.col(text_col), pattern)
    return (df.select(id_col, F.posexplode(parts).alias("part_no", "part"))
            .where(F.length(F.trim(F.col("part"))) > 0))
