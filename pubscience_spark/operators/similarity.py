"""Similarity search over embedding columns (training-data tier).

- brute-force cosine top-k: native ``zip_with``/``aggregate`` dot products
  (JVM-side, no Python) against a *broadcast* query set — the correctness
  baseline;
- LSH-bucketed variant: random-hyperplane signatures (pUDF) bucket the
  corpus so each query probes one bucket family — the 100 TB scale path
  (bucket join instead of full cross product).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set, cross-join,
    JVM-side dot products, per-query window top-k.

    Returns (query_id, neighbor_id, cosine) with ties broken by neighbor_id.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot(F.col("qv"), F.col("cv"))
                          / (_norm(F.col("qv")) * _norm(F.col("cv")))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from blake2b bytes."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        for c in range(0, dim, 8):
            d = hashlib.blake2b(f"{seed}:{p}:{c}".encode(),
                                digest_size=64).digest()
            vals.extend(struct.unpack("<8q", d)[:min(8, dim - c)])
        out[p] = np.array(vals[:dim], dtype=np.float64)
    return out / np.abs(out).max()


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    planes = _hyperplanes(dim, n_planes, seed)

    @pandas_udf(StringType())
    def _sig(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.map(lambda v: np.asarray(v, dtype=np.float64)))
        bits = (mat @ planes.T) > 0  # (n, planes)
        return pd.Series(["".join("1" if b else "0" for b in row)
                          for row in bits])
    return _sig


def _cent_literal(centroids: list[list[float]]):
    """The n_lists × dim centroid literal as ONE ``F.expr`` parse.

    Built per-element (``F.array(F.lit(...))``), an 8×64 quantizer costs
    ~1000 py4j round-trips of driver time PER QUERY BUILD (round-8
    measurement: ivf_topk spent 0.8-1.1 s building the DataFrame vs
    0.65 s executing it); one SQL string parses JVM-side in ~ms to the
    identical literal tree. ``repr(float)`` round-trips exactly in
    Java's Double.parseDouble, so values are bit-equal."""
    return F.expr("array({})".format(", ".join(
        "array({})".format(", ".join(f"{float(x)!r}D" for x in c))
        for c in centroids)))


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Adds ``list_id`` = argmax-dot-product centroid (broadcast as a
    literal array — no shuffle, pure codegen arithmetic). Right for tens
    of lists; beyond ~100 the literal expression tree itself becomes the
    bottleneck — use :func:`ivf_assign_join`."""
    cent = _cent_literal(centroids)
    dots = F.transform(cent, lambda c: _dot(c, F.col(vec_col)))
    return df.withColumn("list_id", F.array_position(
        dots, F.array_max(dots)).cast("int") - 1)


def ivf_assign_join(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Join-based coarse assignment for LARGE ``n_lists`` (IVF at 10^12
    docs wants thousands of lists): centroids become a broadcast DataFrame,
    each row scores against every centroid via a broadcast nested-loop
    crossJoin, and argmax is a ``max(struct(dot, -list_id))`` aggregation —
    map-side combinable, one slim shuffle on ``id_col``, no giant literal
    expression tree. Tie-break (equal dot) picks the LOWEST list id,
    matching :func:`ivf_assign`'s array_position-of-first-max."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list_id int, cv array<double>")
    scored = (df.crossJoin(F.broadcast(cent_df))
              .withColumn("__dot", _dot(F.col(vec_col), F.col("cv")))
              .drop("cv"))
    best = (scored.groupBy(id_col)
            .agg(F.max(F.struct(F.col("__dot").alias("d"),
                                (-F.col("list_id")).alias("nid")))
                 .alias("__b"))
            .select(id_col, (-F.col("__b.nid")).cast("int")
                    .alias("list_id")))
    return df.join(best, id_col)


def kmeans_centroids(corpus: DataFrame, n_lists: int, *, n_iter: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> list[list[float]]:
    """Spherical k-means coarse quantizer for IVF — distributed Lloyd
    iterations, tiny driver state (n_lists × dim doubles per round).

    Init = ``n_lists`` vectors in md5(id) order — a deterministic
    pseudo-random spread (first-by-id init degenerates when ids are
    clustered, e.g. near-duplicate runs share a prefix); each round:
    assign by max dot against unit centroids (= max cosine on the unit-
    normalized corpus, one codegen pass, no shuffle of vectors), then
    per-list per-dim ``avg`` (map-side partial agg, one slim shuffle of
    n_lists×dim partials), renormalize, empty lists keep their centroid.
    Float-sum order across partitions can differ in the last ulp, which
    may move boundary points between lists — ``ivf_topk``'s probe-all
    oracle is invariant to centroid choice, so this cannot break
    correctness, only nudge recall at n_probe < n_lists."""
    first = (corpus
             .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
             .limit(n_lists)
             .select(F.col(vec_col).cast("array<double>").alias("v"))
             .collect())
    dim = len(first[0]["v"])

    def _unit(vec):
        import math
        n = math.sqrt(sum(x * x for x in vec)) or 1.0
        return [x / n for x in vec]

    cents = [_unit(r["v"]) for r in first]
    # staged norm column (computed once per row, not per element)
    unit_corpus = (corpus
                   .withColumn("__n", F.greatest(_norm(F.col(vec_col)),
                                                 F.lit(1e-12)))
                   .select(F.transform(
                       F.col(vec_col).cast("array<double>"),
                       lambda x: x / F.col("__n")).alias("v")))
    for _ in range(n_iter):
        assigned = ivf_assign(unit_corpus, cents, "v")
        # constant-width plan at ANY dim (a per-dim avg column list hits
        # codegen limits at real embedding dims 768-4096): posexplode to
        # (list_id, dim_idx, value) and aggregate — map-side partial agg
        # still combines each partition down to n_lists × dim partials
        # before the shuffle, so shuffle volume matches the wide form
        rows = (assigned
                .select("list_id",
                        F.posexplode(F.col("v")).alias("di", "x"))
                .groupBy("list_id", "di")
                .agg(F.avg("x").alias("c"))
                .collect())
        by_list: dict[int, dict[int, float]] = {}
        for r in rows:                    # empty lists emit no rows at
            by_list.setdefault(r["list_id"], {})[r["di"]] = r["c"]
        new_cents = list(cents)           # all → keep their centroid
        for li, dims in by_list.items():
            new_cents[li] = _unit([dims[i] for i in range(dim)])
        cents = new_cents
    return cents


def ivf_topk(corpus: DataFrame, queries: DataFrame, *, n_lists: int = 16,
             n_probe: int = 4, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: "str | list[list[float]]" = "first",
             kmeans_iter: int = 5) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_lists`` inverted lists,
    probe the ``n_probe`` nearest lists per query, exact cosine inside.

    ``centroids``: ``"first"`` = first ``n_lists`` vectors by id
    (deterministic, zero training cost); ``"kmeans"`` = spherical k-means
    (:func:`kmeans_centroids` — better-balanced lists, higher recall at
    small n_probe); or a precomputed list. The probe join hits only
    ``n_probe/n_lists`` of the corpus — the 100 TB path where LSH bucket
    skew is a concern and list sizes must stay balanced.
    """
    if centroids == "kmeans":
        cents = kmeans_centroids(corpus, n_lists, n_iter=kmeans_iter,
                                 id_col=id_col, vec_col=vec_col)
    elif centroids == "first":
        cents = [r["v"] for r in
                 corpus.orderBy(id_col).limit(n_lists)
                 .select(F.col(vec_col).cast("array<double>").alias("v"))
                 .collect()]
    else:
        cents = centroids
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv")), cents, "cv")

    # per query: the n_probe nearest centroid ids, exploded to probe rows
    cent = _cent_literal(cents)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    dots = F.transform(cent, lambda cc: _dot(cc, F.col("qv")))
    ranked = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(dots,
                           F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                           lambda d, i: F.struct((-d).alias("nd"),
                                                 i.alias("i")))),
            lambda s: s["i"]),
        1, n_probe)
    q = q.withColumn("list_id", F.explode(ranked))

    scored = (c.join(F.broadcast(q), "list_id")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot(F.col("qv"), F.col("cv"))
                          / (_norm(F.col("qv")) * _norm(F.col("cv")))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))


def lsh_band_udf(dim: int, n_bands: int = 24, band_bits: int = 4,
                 seed: int = 42):
    """Banded sign-LSH signatures: ``n_bands`` independent families of
    ``band_bits`` hyperplanes each; a pair is a candidate if ANY band key
    matches. Recall at cosine c: 1-(1-p^band_bits)^n_bands with
    p = 1 - arccos(c)/π — tune n_bands up for low thresholds."""
    planes = _hyperplanes(dim, n_bands * band_bits, seed)

    @pandas_udf(ArrayType(StringType()))
    def _bands(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.map(lambda v: np.asarray(v, dtype=np.float64)))
        bits = (mat @ planes.T) > 0                      # (n, bands*bits)
        out = []
        for row in bits:
            sig = "".join("1" if b else "0" for b in row)
            out.append([f"{i}:{sig[i * band_bits:(i + 1) * band_bits]}"
                        for i in range(n_bands)])
        return pd.Series(out)
    return _bands


def embedding_neardup_lsh(corpus: DataFrame, threshold: float, dim: int,
                          n_bands: int = 24, band_bits: int | None = None,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          n_rows: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs, the 100 TB shape: banded sign-LSH
    keys → band-bucket self-join (id_a < id_b) → exact cosine verify — the
    composed named API replacing any bounded all-pairs crossJoin.

    One shuffle on the band key (uniform, no salting), candidates only in
    the verify; precision is exact (cosine recomputed), recall follows the
    banding formula on :func:`lsh_band_udf`. Everything after the
    signature pUDF is JVM codegen.

    **Candidate-volume math (round-2 footgun):** each band hashes the
    corpus into ``2^band_bits`` buckets, so a band contributes
    ``≈ n² · 2^(-band_bits) / 2`` candidate pairs — at n ≫ 10⁶ a small
    fixed ``band_bits`` degenerates toward all-pairs. Defaults therefore
    scale with the corpus: ``band_bits=None`` counts the corpus (one slim
    scan) and picks ``ceil(log2(n / 64))`` clamped to [4, 24] (~64 rows
    per expected bucket). Production callers pin ``band_bits`` explicitly
    to skip the count; passing ``n_rows`` alongside an explicit
    ``band_bits`` re-enables the capacity warning without a count job.
    Raising ``band_bits`` lowers per-band recall (``p^band_bits``) —
    compensate with more ``n_bands`` per the formula on
    :func:`lsh_band_udf`."""
    from .util import warn_band_capacity
    vecs = corpus.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("v"))
    if band_bits is None:
        import math
        if n_rows is None:
            n_rows = vecs.count()
        band_bits = max(4, min(24, math.ceil(
            math.log2(max(n_rows, 2) / 64))))
    warn_band_capacity(n_rows, 2 ** band_bits,
                       "embedding_neardup_lsh", "band_bits")
    sig = lsh_band_udf(dim, n_bands, band_bits)
    # slim (id, band) rows through the self-join + distinct; vectors join
    # back only for candidate pairs (wide arrays never shuffle n_bands×)
    banded = vecs.withColumn("band", F.explode(sig(F.col("v")))) \
        .select("id", "band")
    # banded feeds BOTH sides of the self-join; without a persist the
    # signature pUDF runs twice over the corpus (round-8 plan audit).
    # Slim (id, band) rows only.
    from pyspark.storagelevel import StorageLevel
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .distinct())
    pairs = (cands
             .join(vecs.select(F.col("id").alias("id_a"),
                               F.col("v").alias("va")), "id_a")
             .join(vecs.select(F.col("id").alias("id_b"),
                               F.col("v").alias("vb")), "id_b"))
    cos = _dot(F.col("va"), F.col("vb")) \
        / (_norm(F.col("va")) * _norm(F.col("vb")))
    out = (pairs.withColumn("cosine", cos)
           .where(F.col("cosine") >= threshold)
           .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))
    out._ps_persisted_input = banded  # noqa: SLF001
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_planes: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Scale-path ANN: sign-LSH bucket join, then exact cosine within
    buckets. Recall < 1 by design — candidates share all hyperplane signs."""
    sig = lsh_bucket_udf(dim, n_planes)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv")) \
        .withColumn("bucket", sig(F.col("cv")))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv")) \
        .withColumn("bucket", sig(F.col("qv")))
    scored = (c.join(F.broadcast(q), "bucket")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot(F.col("qv"), F.col("cv"))
                          / (_norm(F.col("qv")) * _norm(F.col("cv")))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))
