"""Sampling / splitting operators (O4-O6).

The reference samples with unseeded/py-random state (``utils/
txt_randomizer.py:71-93``, ``scripts/clean.py:988-1012``). For oracle
comparability and cluster determinism we use *hash-based* sampling: the
md5 of the row key decides membership — identical in Spark and DuckDB,
independent of partitioning, stable under resume. ``df.sample``/
``randomSplit`` remain available but are not oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, buckets: int = 10000) -> Column:
    """Deterministic [0, buckets) bucket from md5(key) — engine-portable."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long") % buckets)


def hash_sample(df: DataFrame, key: str, fraction: float,
                buckets: int = 10000) -> DataFrame:
    """O4: deterministic uniform sample — keep rows whose hash bucket falls
    below fraction*buckets."""
    return df.where(_bucket(F.col(key), buckets) < int(fraction * buckets))


def stratified_hash_sample(df: DataFrame, key: str, strata: str,
                           fractions: dict[str, float],
                           buckets: int = 10000) -> DataFrame:
    """O5: per-stratum deterministic sample (sampleBy analog)."""
    pred = F.lit(False)
    b = _bucket(F.col(key), buckets)
    for value, frac in fractions.items():
        pred = pred | ((F.col(strata) == value) & (b < int(frac * buckets)))
    return df.where(pred)


def train_val_test_split(df: DataFrame, key: str,
                         weights: tuple[float, float, float] = (.9, .05, .05),
                         buckets: int = 10000) -> DataFrame:
    """O6: adds a ``split`` column (train/val/test) from the hash bucket —
    90/5/5 per scripts/clean.py:988-1012, but reproducible."""
    b = _bucket(F.col(key), buckets)
    t1 = int(weights[0] * buckets)
    t2 = int((weights[0] + weights[1]) * buckets)
    return df.withColumn(
        "split",
        F.when(b < t1, "train").when(b < t2, "val").otherwise("test"))


def reservoir_sample(df: DataFrame, k: int, key: str,
                     seed: int = 42) -> DataFrame:
    """O4 exact-k variant: deterministic top-k by md5(seed ∥ key) —
    ``rand(seed)`` is partition-dependent (repartitioning reshuffles the
    draw), which would contradict this module's determinism doctrine, so
    the rank comes from the row KEY instead. Still a single
    TakeOrderedAndProject (per-partition top-k, never a full sort)."""
    rank = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string")))
    return df.orderBy(rank, F.col(key)).limit(k)
