"""SQL-registered scalar function surface (SURVEY.md §2.10).

The reference's extension points are plain Python callables (sklearn-style
classes, the PROCESSORS registry ``scripts/clean.py:784-805``). Here the
same surface is exposed to Spark SQL: ``register_all(spark)`` makes every
kernel available as ``ps_*`` functions inside ``spark.sql(...)`` — all
Arrow-batched pandas UDFs, never row-at-a-time.

    register_all(spark)
    spark.sql("SELECT ps_clean_line(text) FROM docs")
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StringType)

from ..kernels import hashing, langid, pii, quality, segment, textclean


def _series_udf(fn, ret):
    @pandas_udf(ret)
    def _u(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fn(t if t is not None else ""))
    return _u


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


REGISTRY = {
    "ps_clean_line": (textclean.clean_line, StringType()),
    "ps_clean_markdown": (textclean.clean_markdown, StringType()),
    "ps_prefix_key": (textclean.prefix_dedup_key, StringType()),
    "ps_mask_numbers": (pii.mask_numbers, StringType()),
    "ps_anonymise": (pii.anonymise, StringType()),
    "ps_langid": (langid.detect_lang, StringType()),
    "ps_quality_score": (quality.quality_score, DoubleType()),
    "ps_token_count": (quality.token_count, IntegerType()),
    "ps_fingerprint": (lambda t: _signed64(quality.rolling_fingerprint(t)),
                       LongType()),
    "ps_simhash": (lambda t: _signed64(hashing.simhash(t)), LongType()),
    "ps_sentences": (segment.split_sentences, ArrayType(StringType())),
    "ps_chunks": (segment.chunk_text, ArrayType(StringType())),
    "ps_minhash": (lambda t: [_signed64(v) for v in
                              hashing.minhash_signature(t, num_perm=32)],
                   ArrayType(LongType())),
    "ps_rtf_to_text": (None, StringType()),     # bound lazily below
    "ps_truncate": (None, StringType()),        # (text) → default ruleset
    "ps_process_source": (None, StringType()),  # 2-arg, bound below
}


def _late_bindings():
    """Imports deferred so registry import stays light."""
    from ..kernels import rtf
    from ..operators.boilerplate import process_source
    return {
        "ps_rtf_to_text": (rtf.rtf_to_text, StringType()),
        "ps_truncate": (lambda t: textclean.truncate(t), StringType()),
    }, process_source


def register_all(spark: SparkSession) -> list[str]:
    """Register every kernel as a SQL function; returns the names."""
    late, process_source = _late_bindings()
    for name, (fn, ret) in {**REGISTRY, **late}.items():
        if fn is None:
            continue
        spark.udf.register(name, _series_udf(fn, ret))

    @pandas_udf(StringType())
    def _proc(text: pd.Series, source: pd.Series) -> pd.Series:
        return pd.Series([process_source(t or "", s or "default")[0]
                          for t, s in zip(text, source)])
    spark.udf.register("ps_process_source", _proc)
    return sorted({**REGISTRY, **late})
