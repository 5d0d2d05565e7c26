"""Shared operator utilities."""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Ensure a UDF-heavy stage gets cluster-wide parallelism.

    Small inputs (a single parquet file under ``maxPartitionBytes``) arrive
    as ONE scan split, which would run every Arrow batch on one core —
    measured 10× battery slowdowns on the fixture tables. When the plan has
    fewer partitions than ``min_ratio × defaultParallelism``, round-robin
    repartition to the default parallelism; on production inputs (thousands
    of splits) this is a no-op, so no gratuitous shuffle at scale.

    The probe is the exact RDD partition count. A file-count shortcut
    (``inputFiles()``) was tried in round 3 and reverted as unsound:
    Spark bin-packs small files into scan splits, so many files does
    NOT imply many partitions, and an under-parallel UDF stage costs
    10× while the rdd probe costs only planning time on a slim
    projection. Only spread SLIM projections; the shuffle moves
    whatever columns the frame carries.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    thresh = max(1, int(target * min_ratio))
    if df.rdd.getNumPartitions() < thresh:
        return df.repartition(target)
    return df


# Expected rows per LSH band bucket above which the candidate self-join
# starts degenerating toward all-pairs (m rows in a bucket → ~m²/2 pairs).
BAND_BUCKET_WARN_ROWS = 10_000


def warn_band_capacity(n_rows: int | None, n_buckets: int, op: str,
                       knob: str) -> float | None:
    """Candidate-volume guard for banded self-joins.

    With ``n_rows`` hashed uniformly into ``n_buckets`` buckets per band,
    the expected bucket holds ``n/k`` rows and each band contributes
    ``≈ n²/(2k)`` candidate pairs. When the expected bucket size crosses
    :data:`BAND_BUCKET_WARN_ROWS`, the banding no longer bounds the join
    (the round-2 footgun: ``band_bits=4`` → 16 buckets at n ≫ 10⁶ is
    effectively all-pairs) — warn with the knob to raise. Returns the
    expected bucket size (None when ``n_rows`` is unknown)."""
    if n_rows is None:
        return None
    expected = n_rows / max(1, n_buckets)
    if expected > BAND_BUCKET_WARN_ROWS:
        warnings.warn(
            f"{op}: expected ~{expected:,.0f} rows per band bucket "
            f"(n={n_rows:,}, {n_buckets:,} buckets/band) — the candidate "
            f"self-join degenerates toward all-pairs "
            f"(~n²/2k ≈ {n_rows * n_rows / (2 * max(1, n_buckets)):.2g} "
            f"pairs per band). Raise {knob}.",
            RuntimeWarning, stacklevel=3)
    return expected
