"""Language-model quality scoring (CCNet-style perplexity filter).

Web-scale pipelines rank documents by how "language-like" they are under
a small LM trained on a trusted slice (CCNet buckets Common Crawl by
wikipedia-LM perplexity; the reference has no analog — its quality gate
is term/length rules). Re-expressed Spark-first as a self-contained
character-trigram model:

- :func:`train_char_lm` — DISTRIBUTED training: native trigram explode
  (substr over a sequence, JVM) → count aggregation → top-V collect.
  Driver state is the V-entry table (V ≈ 50k → under a megabyte), the
  same "tiny centroid state" pattern as the IVF k-means.
- :func:`with_lm_score` — scoring as one Arrow-batched pandas UDF whose
  inner loop is pure numpy: texts are latin-1 byte arrays, rolling
  3-byte codes are vectorized arithmetic, and log-probabilities come
  from a ``searchsorted`` lookup into the broadcast sorted-code table.
  No per-character Python, no shuffle.

Score = mean trigram log-probability (higher = more language-like;
``exp(-score)`` is the per-trigram perplexity). Deterministic given the
training corpus and parameters.

Normalization note: training lowercases and collapses whitespace with
Spark regex, scoring with Python ``str.split`` — these differ only on
exotic Unicode space classes; the trigram distribution is insensitive
to that tail (documented divergence, not worth a Python training path).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


class CharTrigramLM:
    """Broadcastable model artifact: sorted trigram byte-codes with
    log-probs, plus the unseen-trigram floor."""
    __slots__ = ("codes", "logprobs", "floor", "n_train")

    def __init__(self, codes: np.ndarray, logprobs: np.ndarray,
                 floor: float, n_train: int):
        self.codes = codes            # int64, sorted ascending
        self.logprobs = logprobs      # float32, aligned with codes
        self.floor = floor
        self.n_train = n_train


def _norm_text_expr(text_col: str):
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   r"\s+", " "))


def train_char_lm(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 50_000, k_smooth: float = 0.5,
                  max_chars_per_doc: int = 10_000) -> CharTrigramLM:
    """Count character trigrams across the corpus (native explode — the
    heavy pass is all JVM), keep the ``vocab_size`` most frequent, and
    build an add-k-smoothed log-probability table driver-side."""
    t = F.substring(_norm_text_expr(text_col), 1, max_chars_per_doc)
    n_grams = F.greatest(F.length(t) - 2, F.lit(0))
    grams = F.when(n_grams > 0, F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: t.substr(i, F.lit(3)))) \
        .otherwise(F.array().cast("array<string>"))
    counts = (df.select(F.explode(grams).alias("g"))
              .groupBy("g").agg(F.count(F.lit(1)).alias("n"))
              .orderBy(F.col("n").desc(), F.col("g"))
              .limit(vocab_size)
              .collect())
    total = sum(r["n"] for r in counts)
    vocab = max(len(counts), 1)
    denom = total + k_smooth * (vocab + 1)        # +1: the UNK bucket
    code_lp: dict[int, float] = {}
    for r in counts:
        b = r["g"].encode("latin-1", "replace")
        if len(b) != 3:
            b = (b + b"???")[:3]
        code = (b[0] << 16) | (b[1] << 8) | b[2]
        lp = math.log((r["n"] + k_smooth) / denom)
        # unicode trigrams can collide after latin-1 replacement: keep
        # the higher-probability entry (first in the sorted collect)
        if code not in code_lp:
            code_lp[code] = lp
    floor = math.log(k_smooth / denom)
    codes = np.array(sorted(code_lp), dtype=np.int64)
    lps = np.array([code_lp[c] for c in codes], dtype=np.float32)
    return CharTrigramLM(codes, lps, floor, total)


def _score_batch(texts: pd.Series, codes: np.ndarray, lps: np.ndarray,
                 floor: float, max_chars: int) -> pd.Series:
    out = np.empty(len(texts), dtype=np.float64)
    if len(codes) == 0:                 # degenerate model (no trigrams
        out.fill(floor)                 # in training corpus): floor all
        return pd.Series(out)
    for i, t in enumerate(texts):
        t = " ".join((t or "").lower().split())[:max_chars]
        b = np.frombuffer(t.encode("latin-1", "replace"), dtype=np.uint8)
        if len(b) < 3:
            out[i] = floor
            continue
        roll = (b[:-2].astype(np.int64) << 16) \
            | (b[1:-1].astype(np.int64) << 8) | b[2:].astype(np.int64)
        idx = np.searchsorted(codes, roll)
        idx = np.clip(idx, 0, len(codes) - 1)
        hit = codes[idx] == roll
        out[i] = np.where(hit, lps[idx], floor).mean()
    return pd.Series(out)


def lm_score_udf(model: CharTrigramLM, max_chars: int = 10_000):
    codes, lps, floor = model.codes, model.logprobs, float(model.floor)

    @pandas_udf(DoubleType())
    def _score(texts: pd.Series) -> pd.Series:
        return _score_batch(texts, codes, lps, floor, max_chars)
    return _score


def with_lm_score(df: DataFrame, model: CharTrigramLM,
                  text_col: str = "text",
                  out_col: str = "lm_logprob",
                  max_chars: int = 10_000) -> DataFrame:
    """Mean trigram log-prob per doc (higher = more language-like).
    Filter like CCNet: keep the top quantile, or threshold on
    ``exp(-lm_logprob)`` perplexity."""
    return df.withColumn(out_col,
                         lm_score_udf(model, max_chars)(F.col(text_col)))
