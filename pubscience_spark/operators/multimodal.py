"""Multimodal column plumbing (training-data tier, task spec).

Image/audio/video are opaque ``binary`` columns with typed metadata. The
decode/resample step is STUBBED (no codec libs in this container) behind a
deterministic fake gated by ``PUBSCIENCE_FAKE_DECODE=1`` — the Spark-side
plumbing (schema, mapInPandas batch shape, partitioning) is real and tested.
On a production cluster, swap ``_decode_image``/``_decode_audio`` for
Pillow/soundfile bodies; the DataFrame plan does not change.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, StringType,
                               StructField, StructType)

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("media_type", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("error", StringType()),
])


def _fake_decode_enabled() -> bool:
    return os.environ.get("PUBSCIENCE_FAKE_DECODE", "1") == "1"


def _decode_image(raw: bytes) -> tuple[int, int, list[float]]:
    """Decode + 8-dim feature extract.

    Deterministic fake: dimensions and features derive from a blake2b of the
    bytes — stable across executors, exercises the full Arrow round trip."""
    if not _fake_decode_enabled():
        raise NotImplementedError(
            "real image decode requires Pillow; not available in this container")
    d = hashlib.blake2b(raw, digest_size=40).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feats = [(int.from_bytes(d[2 + 4 * i:6 + 4 * i], "little") % 10_000)
             / 10_000.0 for i in range(8)]
    return width, height, feats


def _image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]
    for b in batches:
        recs = []
        for url, raw in zip(b["url"], b["media"]):
            raw = bytes(raw) if raw is not None else b""
            rec = {"url": url, "media_type": "image", "n_bytes": len(raw),
                   "width": None, "height": None, "feature": None,
                   "error": None}
            try:
                w, h, f = _decode_image(raw)
                rec.update(width=w, height=h, feature=f)
            except Exception as exc:
                rec["error"] = f"{type(exc).__name__}: {exc}"[:200]
            recs.append(rec)
        yield pd.DataFrame(recs, columns=cols)


def image_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """(url, media binary) → IMAGE_FEATURES_SCHEMA, Arrow-batched."""
    return (df.selectExpr("url", f"{media_col} as media")
            .mapInPandas(_image_batches, schema=IMAGE_FEATURES_SCHEMA))
