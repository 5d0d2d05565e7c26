"""Distributed connected components (large-star/small-star) vs a
union-find reference, and the cluster-aware near-dup composition."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pubscience_spark.operators import components as C


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    rng = random.Random(5)
    for trial in range(3):
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["component"]
               for r in C.connected_components(df).collect()}
        assert got == _uf_components(edges), f"trial {trial}"


def test_connected_components_long_chain(spark):
    """A 64-node path graph needs multiple star rounds — exercises the
    iteration + fixpoint detection, and the answer is one component."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = C.connected_components(df).collect()
    assert len(got) == 64
    assert {r["component"] for r in got} == {0}


def test_connected_components_empty_and_selfloops(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert C.connected_components(df).count() == 0
    df2 = spark.createDataFrame([(7, 7), (3, 9)], "src long, dst long")
    got = {r["node"]: r["component"]
           for r in C.connected_components(df2).collect()}
    assert got == {3: 3, 9: 3}          # self-loop contributes nothing


def test_neardup_components_transitive_cluster(spark):
    """A~B and B~C but A and C less alike: pairwise drop logic sees two
    pairs; component clustering puts all three in ONE cluster with the
    min id as representative."""
    base = ("spark engine corpus dedup paragraph pipeline quality "
            "tokens filter sample shuffle partition broadcast join "
            "window aggregate ").split()
    a = " ".join(base * 4)
    b = " ".join(base * 4) + " tail one extra words here"
    c = " ".join(base * 4) + " tail one extra words here plus more drift"
    d = "an entirely different document about pdf parsing and xref streams"
    df = spark.createDataFrame(
        [(10, a), (11, b), (12, c), (13, d)], "doc_id long, text string")
    out = C.neardup_components(df, "doc_id", threshold=0.7, bands=64)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[10]["component"] == rows[11]["component"] \
        == rows[12]["component"] == 10
    assert not rows[10]["is_neardup"]
    assert rows[11]["is_neardup"] and rows[12]["is_neardup"]
    # the unrelated doc is its own singleton representative
    assert rows[13]["component"] == 13 and not rows[13]["is_neardup"]


def test_connected_components_deterministic(spark):
    edges = [(1, 2), (2, 3), (10, 11), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, C.connected_components(df).collect()))
    b = sorted(map(tuple, C.connected_components(df).collect()))
    assert a == b == [(1, 1), (2, 1), (3, 1), (5, 1), (10, 10), (11, 10)]
