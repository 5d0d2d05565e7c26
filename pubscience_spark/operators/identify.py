"""Document identification (F4/F5): term gates + scored relevance.

Re-derived from ``identify/identify.py``:

- conservative gate (:135-145): any(include) AND NOT any(exclude) — pure
  boolean column expr (``operators/filters.include_exclude``);
- greedy gate (:187-198): any(include) OR model-says-relevant, minus
  exclusions;
- scored gate (:530-554): truncate each doc to the first
  ``max_chunk_length`` words, score in batches, keep score ≥ threshold.

The reference's scorer is an HF text-classification pipeline (◇ —
model-dependent, excluded from the byte contract). ``term_density_score``
is the deterministic default: the fraction of include-terms present in the
truncated text. It is SQL-expressible (oracle-checked) and swaps for a
``predict_batch_udf`` model scorer without touching the plan shape — the
truncation, batching (Arrow), and threshold semantics are the operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .filters import include_exclude, terms_any


def truncate_words(col: str = "text", max_words: int = 256) -> Column:
    """First ``max_words`` whitespace words (identify.py:530-536 truncation
    before scoring)."""
    words = F.split(F.trim(F.col(col)), r"\s+")
    return F.concat_ws(" ", F.slice(words, 1, max_words))


def term_density_score(text_col: Column, terms: list[str]) -> Column:
    """Deterministic relevance score: fraction of terms present."""
    hits = [F.when(text_col.contains(t), 1).otherwise(0) for t in terms]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    return (total / F.lit(len(terms))).cast("double")


def scored_identify(df: DataFrame, terms: list[str], *,
                    text_col: str = "text", threshold: float = 0.5,
                    max_words: int = 256,
                    score_fn=None) -> DataFrame:
    """F5 shape: truncate → score → threshold. ``score_fn(Column) -> Column``
    defaults to term density; pass a predict_batch_udf for a real model."""
    truncated = truncate_words(text_col, max_words)
    score = (score_fn or (lambda c: term_density_score(c, terms)))(truncated)
    return (df.withColumn("score", F.round(score, 6))
            .where(F.col("score") >= threshold)
            .withColumn("text_len", F.length(text_col).cast("long")))


def greedy_identify(df: DataFrame, include: list[str], exclude: list[str],
                    *, text_col: str = "text", threshold: float = 0.5,
                    max_words: int = 256) -> DataFrame:
    """Greedy gate: any(include) OR score ≥ threshold, then exclusions."""
    truncated = truncate_words(text_col, max_words)
    score = term_density_score(truncated, include)
    keep = terms_any(text_col, include) | (score >= threshold)
    drop = terms_any(text_col, exclude)
    return df.where(keep & ~drop)


def conservative_identify(df: DataFrame, include: list[str],
                          exclude: list[str],
                          text_col: str = "text") -> DataFrame:
    return df.where(include_exclude(text_col, include, exclude))
