"""Skew-aware join operators.

AQE's runtime skew-join split handles sort-merge skew automatically, but
two shapes still need explicit salting at 10^12-row scale:

- a HOT-KEY equi-join where one side has a handful of keys carrying a
  large fraction of all rows (Zipf domains): :func:`salted_join` explodes
  the small side ``n_salt``× and spreads the big side's hot rows across
  salt buckets, so no single task ever owns a whole hot key;
- a skewed AGGREGATION: :func:`salted_count` two-phase counts (salted
  partial → final) — the groupBy analog.

Both are pure DataFrame composition (no RDDs, codegen-friendly keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salt: int = 16, how: str = "inner",
                salt_keys: list | None = None) -> DataFrame:
    """Equi-join with hot-key salting.

    ``big`` rows get ``salt = pmod(xxhash64(<all big columns>,
    spark_partition_id()), n_salt)`` restricted to hot keys; mixing the
    input partition id keeps the spread deterministic (file-scan splits
    are stable across retries) while splitting byte-identical duplicate
    rows of a hot key — the viral-duplicate shape — across buckets as
    long as they span input partitions. Identical rows *within one input
    partition* still share a bucket (bounded by
    ``maxPartitionBytes``-worth of rows, so no task owns a whole viral
    key). ``small`` rows for hot keys replicate ``n_salt``× (explode),
    others keep salt 0 — replication cost is bounded by ``n_salt × |hot
    small rows|``, which is tiny by definition of "hot key list". When
    ``salt_keys`` is None every key is treated hot (full ``n_salt``×
    replication of the small side — only sane when the small side is
    genuinely small).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # right/full joins would emit unmatched SMALL-side rows once per
        # salt replica — a silent row-count bug; reverse the sides instead
        raise ValueError(f"salted_join does not support how={how!r}: "
                         "unmatched replicated small-side rows would "
                         "duplicate — swap the join sides")
    if salt_keys is not None:
        hot = F.col(key).isin(*salt_keys)
    else:
        hot = F.lit(True)
    big_salted = big.withColumn(
        "__salt",
        F.when(hot, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns],
                                      F.spark_partition_id()),
                           F.lit(n_salt)).cast("int"))
        .otherwise(F.lit(0)))
    small_salted = small.withColumn(
        "__salt",
        F.explode(F.when(hot, F.sequence(F.lit(0), F.lit(n_salt - 1)))
                  .otherwise(F.array(F.lit(0)))))
    return (big_salted.join(small_salted, [key, "__salt"], how)
            .drop("__salt"))


def salted_count(df: DataFrame, key: str, n_salt: int = 16,
                 out_col: str = "n") -> DataFrame:
    """Two-phase count for skewed group keys: salted partial counts spread
    a hot key over ``n_salt`` reducers, the final agg sums ``n_salt`` tiny
    partials per key. (Plain ``count`` already map-side combines; this
    shape matters for aggregates WITHOUT a combiner — collect_list-like —
    and documents the pattern.)"""
    partial = (df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns],
                                    F.spark_partition_id()),
                         F.lit(n_salt)).cast("int"))
        .groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__pc")))
    return partial.groupBy(key).agg(F.sum("__pc").cast("long").alias(out_col))
