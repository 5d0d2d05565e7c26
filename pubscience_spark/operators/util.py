"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Ensure a UDF-heavy stage gets cluster-wide parallelism.

    Small inputs (a single parquet file under ``maxPartitionBytes``) arrive
    as ONE scan split, which would run every Arrow batch on one core —
    measured 10× battery slowdowns on the fixture tables. When the plan has
    fewer partitions than ``min_ratio × defaultParallelism``, round-robin
    repartition to the default parallelism; on production inputs (thousands
    of splits) this is a no-op, so no gratuitous shuffle at scale. Only
    spread SLIM projections — the shuffle moves whatever columns the frame
    carries.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_ratio)):
        return df.repartition(target)
    return df
