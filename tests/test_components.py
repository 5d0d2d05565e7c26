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


def test_curation_cluster_mode_vs_pairs(spark, tmp_path):
    """neardup_mode='cluster' keeps one representative per transitive
    cluster where 'pairs' can keep several (a~c, b~c chain)."""
    import os
    from pubscience_spark.plans.curation import curate_corpus
    base = ("the corpus and curation pipeline in spark with a shuffle "
            "of partition and broadcast to window for aggregate join "
            "on quality token filter sample ").split()
    c_txt = " ".join(base * 5)
    a_txt = c_txt + " alpha drift ending"
    b_txt = c_txt + " gamma other closing"         # a~c, b~c; a vs b farther
    d_txt = ("a completely unrelated document concerning pdf xref "
             "streams and object models with plenty of words to pass "
             "the gates and quality filters in this funnel test")
    rows = [(1, a_txt, "en"), (2, b_txt, "en"), (3, c_txt, "en"),
            (4, d_txt, "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kwargs = dict(min_chars=50, min_words=10, neardup_threshold=0.8,
                  neardup_bands=64)
    mp = curate_corpus(spark, docs, os.path.join(str(tmp_path), "p"),
                       neardup_mode="pairs", **kwargs)
    mc = curate_corpus(spark, docs, os.path.join(str(tmp_path), "c"),
                       neardup_mode="cluster", **kwargs)
    ids_p = {r["doc_id"] for r in
             spark.read.parquet(mp["corpus_path"]).collect()}
    ids_c = {r["doc_id"] for r in
             spark.read.parquet(mc["corpus_path"]).collect()}
    assert ids_c == {1, 4}                  # one rep per cluster + singleton
    assert ids_c <= ids_p and 4 in ids_p    # pairs keeps at least as many
    assert mc["params"]["neardup_mode"] == "cluster"
    import pytest
    with pytest.raises(ValueError, match="neardup_mode"):
        curate_corpus(spark, docs, os.path.join(str(tmp_path), "x"),
                      neardup_mode="bogus", **kwargs)
