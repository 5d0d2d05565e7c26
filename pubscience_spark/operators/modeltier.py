"""◇ model tier: translate / transform / label (deterministic stand-ins).

The reference's NMT/LLM modules (``translate/ntm.py``, ``transform/text.py``,
``label/text.py``) are model-bound — no fixed output bytes, so they sit
outside the byte-identical contract. What IS the engine's job, and is real
here, is their data movement:

- ``translate_documents``: sentence-split → greedy token-budget chunking
  (``translate/ntm.py:345-410``) → *batched* model calls over Arrow batches
  → order-preserving reassembly per document. The default ``translate_fn``
  is a deterministic tagger; swap in an NMT/LLM batch callable (the
  signature is ``list[str] -> list[str]``) and the plan is unchanged.
- ``label_documents``: multi-label scoring → arg-max label + score columns
  (``label/text.py`` record shape). Default scorer = term density per label.
- ``transform_documents``: generic Arrow-batched text→text stage
  (``transform/text.py`` shape).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..kernels.segment import chunk_text


def _tag_translate(chunks: list[str], src: str, tgt: str) -> list[str]:
    """Deterministic stand-in 'model': tags each chunk. Replace with a
    batched NMT/LLM call of the same signature."""
    return [f"[{src}->{tgt}] {c}" for c in chunks]


def translate_documents(df: DataFrame, *, src: str = "nl", tgt: str = "en",
                        id_col: str = "doc_id", text_col: str = "text",
                        max_tokens: int = 64,
                        translate_fn: Callable[[list[str]], list[str]]
                        | None = None) -> DataFrame:
    """(id, translated) — chunked, batch-translated, reassembled in order."""
    fn = translate_fn or (lambda cs: _tag_translate(cs, src, tgt))
    schema = StructType([
        StructField("id", StringType(), False),
        StructField("translated", StringType()),
    ])
    slim = df.select(df[id_col].cast("string").alias("id"),
                     df[text_col].alias("t"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            # flatten chunks across the whole Arrow batch so the model sees
            # big batches (identify.py batch-64 analog), then reassemble
            per_doc: list[tuple[str, int]] = []
            flat: list[str] = []
            for i, t in zip(b["id"], b["t"]):
                chunks = chunk_text(t if t is not None else "", max_tokens)
                per_doc.append((i, len(chunks)))
                flat.extend(chunks)
            out = fn(flat) if flat else []
            res, pos = [], 0
            for i, n in per_doc:
                res.append({"id": i, "translated": " ".join(out[pos:pos + n])})
                pos += n
            yield pd.DataFrame(res, columns=["id", "translated"])

    return slim.mapInPandas(_batches, schema=schema)


def label_documents(df: DataFrame, labels: dict[str, list[str]], *,
                    text_col: str = "text",
                    threshold: float = 0.0) -> DataFrame:
    """Adds (label, label_score): arg-max over per-label term-density scores
    (deterministic; swap the score columns for predict_batch_udf outputs)."""
    lower = F.lower(F.col(text_col))
    scores = []
    for name, terms in labels.items():
        hits = [F.when(lower.contains(t.lower()), 1).otherwise(0)
                for t in terms]
        total = hits[0]
        for h in hits[1:]:
            total = total + h
        scores.append(F.struct(
            (total / F.lit(len(terms))).cast("double").alias("s"),
            F.lit(name).alias("l")))
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return (df.withColumn("label", best["l"])
            .withColumn("label_score", F.round(best["s"], 6))
            .where(F.col("label_score") >= threshold))


def transform_documents(df: DataFrame,
                        fn: Callable[[str], str], *,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Generic Arrow-batched text→text stage (transform/text.py shape)."""
    schema = StructType([
        StructField("id", StringType(), False),
        StructField("transformed", StringType()),
    ])
    slim = df.select(df[id_col].cast("string").alias("id"),
                     df[text_col].alias("t"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            yield pd.DataFrame({
                "id": b["id"],
                "transformed": [fn(t if t is not None else "")
                                for t in b["t"]],
            })

    return slim.mapInPandas(_batches, schema=schema)
