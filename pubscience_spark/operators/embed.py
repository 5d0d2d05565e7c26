"""Deterministic document embedder (◇-tier stand-in).

The reference embeds documents with spacy/SBERT/BERT sklearn transformers
(``embedder/embedder.py:73-89,405``) — model-dependent, so excluded from the
byte-identical contract. This operator keeps the *Spark plumbing* real: an
Arrow-batched hashed bag-of-words embedding (feature-hashing into ``dim``
buckets, L2-normalized) with the exact signature a model embedder would
have — swap ``_embed_batch`` for an SBERT call and nothing else changes.

Output plugs directly into the similarity operators
(``operators/similarity.py``): cosine top-k / LSH ANN over the vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, FloatType, StringType, StructField,
                               StructType)

from ..kernels.hashing import normalize_words, word_hash64


def embed_text(text: str, dim: int = 64) -> list[float]:
    """Sequential reference implementation: hashed BoW, L2-normalized.

    The word hash is the kernel's md5-LE uint64 (``kernels.hashing``)
    — round 6 switched from blake2b so the whole chain is replayable in
    DuckDB (no blake2b there), making ``hash_embed_topk`` oracle-
    checkable. Every arithmetic step stays cross-engine exact: bucket
    counts are small integers (exact in float64 in any summation
    order), the norm is sqrt of an exact integer, and the final
    float32 cast is one IEEE rounding in both engines."""
    vec = np.zeros(dim, dtype=np.float64)
    # word hashes come from the kernel's cross-document cache (same md5
    # values; the cache only skips recomputation — round 8)
    for w in normalize_words(text):
        h = word_hash64(w)
        sign = 1.0 if (h >> 63) else -1.0
        vec[h % dim] += sign
    n = float(np.linalg.norm(vec))
    return (vec / n if n else vec).astype(np.float32).tolist()


def embed_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", dim: int = 64) -> DataFrame:
    """(id, embedding array<float>) — mapInPandas, model-swappable."""
    schema = StructType([
        StructField("id", StringType(), False),
        StructField("embedding", ArrayType(FloatType())),
    ])
    cols = df.select(df[id_col].cast("string").alias("id"),
                     df[text_col].alias("t"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            yield pd.DataFrame({
                "id": b["id"],
                "embedding": [embed_text(t if t is not None else "", dim)
                              for t in b["t"]],
            })

    return cols.mapInPandas(_batches, schema=schema)
