"""Distributed connected components + cluster-aware near-dup dedup.

The curation funnel's near-dup stage drops the higher id of every
verified pair — correct keep-first semantics pairwise, but similarity
is transitive in the data ("A~B, B~C" usually means one template):
proper dedup groups the CLUSTER and keeps one representative. At
10^12 docs the cluster structure must be computed distributed; this
module implements the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — the standard O(log²n)-round formulation), entirely with
DataFrame ops:

- each round is two groupBy-min aggregations + equi-joins over the
  (src, dst) edge list — slim integer rows, map-side combinable;
- convergence to star graphs (every node points at its component's
  minimum id) is detected by edge-set fixpoint;
- ``localCheckpoint`` every round truncates the iterative lineage so
  the plan does not grow unboundedly (the classic iterative-Spark
  footgun).

``neardup_components`` composes it with the LSH candidate generator:
banded MinHash candidates → exact verify → connected components →
keep the minimum id per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge list: (a < b), distinct, self-loops
    dropped."""
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    return (edges.select(a, b)
            .where(F.col("a") != F.col("b"))
            .distinct())


def _sym(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every neighbor v > u to
    m = min(N(u) ∪ {u}). In/out columns: (a, b)."""
    nbrs = _sym(e)
    mins = nbrs.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m"))
    return (nbrs.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b")))


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every smaller neighbor (and u itself) to
    m = min(N⁻(u) ∪ {u}). In/out columns: (a, b)."""
    # orient edges high -> low so the group key collects smaller nbrs
    lo = _canon(e, "a", "b")
    pointed = lo.select(F.col("b").alias("u"), F.col("a").alias("v"))
    mins = pointed.groupBy("u").agg(F.min("v").alias("m"))
    return (pointed.join(mins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(mins.select(F.col("u").alias("a"),
                                     F.col("m").alias("b"))))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", *,
                         max_iter: int = 50) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of its connected component.

    Alternates large-star and small-star until the canonical edge set
    reaches a fixpoint (all stars), O(log²n) rounds on adversarial
    graphs, 2-4 rounds on the short-chain clusters near-dup graphs
    produce. Each round shuffles only slim (long, long) rows."""
    e = _canon(edges, src, dst).localCheckpoint(eager=True)
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        e2 = _canon(_small_star(_large_star(e)), "a", "b") \
            .localCheckpoint(eager=True)
        # order-independent edge-set signature; bit_xor cannot overflow
        # (summing xxhash64 values trips ANSI arithmetic overflow)
        sig = (e2.agg(F.count(F.lit(1)).alias("n"),
                      F.coalesce(F.expr("bit_xor(xxhash64(a, b))"),
                                 F.lit(0)).alias("h")).collect()[0])
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            e = e2
            converged = True
            break
        prev_sig, e = sig, e2
    if not converged:
        # a partially-merged result would make downstream dedup silently
        # under-merge clusters — fail loudly instead (round-4 review)
        raise RuntimeError(
            f"connected_components: edge-set fixpoint not reached within "
            f"max_iter={max_iter} rounds (last signature {prev_sig}); "
            f"raise max_iter — O(log² n) rounds suffice for any graph")
    # stars: every edge is (member, component-min); members that ARE the
    # min appear only as dst — union both sides
    return (e.select(F.col("b").alias("node"), F.col("a").alias("component"))
            .unionByName(
                e.select(F.col("a").alias("node"),
                         F.col("a").alias("component")))
            .groupBy("node").agg(F.min("component").alias("component")))


def neardup_components(df: DataFrame, id_col: str, text_col: str = "text",
                       *, threshold: float = 0.85, num_perm: int = 128,
                       bands: int = 32) -> DataFrame:
    """Cluster-aware near-dup marking: LSH candidates → exact Jaccard
    verify → connected components over the surviving pairs → every doc
    gains ``component`` (cluster id = min doc id in cluster) and
    ``is_neardup`` (True unless it is the cluster representative).
    Documents with no near-dup edge are their own singleton cluster."""
    from .dedup import minhash_neardup
    pairs = minhash_neardup(df, id_col, text_col, threshold=threshold,
                            num_perm=num_perm, bands=bands)
    comps = connected_components(pairs, "id_a", "id_b")
    return (df.join(comps.withColumnRenamed("node", id_col),
                    id_col, "left")
            .withColumn("component",
                        F.coalesce("component", F.col(id_col).cast("long")))
            .withColumn("is_neardup",
                        F.col(id_col).cast("long") != F.col("component")))
