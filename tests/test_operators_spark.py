"""Operator-level Spark tests: dedup equivalences, sampling, similarity,
plan-quality (pushdown / broadcast / no extra shuffles)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pubscience_spark.operators import dedup as dedup_ops
from pubscience_spark.operators import sampling, similarity
from pubscience_spark.operators.stats import (concat_by_key,
                                              corpus_stats_by_source,
                                              vocab_stats)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc text number {i % 7} body words here", f"s{i % 3}")
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_native_sha2_matches_python(spark, docs):
    row = docs.withColumn("h", F.sha2("text", 256)).first()
    assert row["h"] == hashlib.sha256(row["text"].encode()).hexdigest()


def test_exact_dedup_keeps_first(spark, docs):
    out = dedup_ops.exact_dedup(docs, "text", "doc_id")
    assert out.count() == 7  # 7 distinct texts
    assert {r["doc_id"] for r in out.collect()} == set(range(7))


def test_minhash_finds_planted_neardups(spark):
    base = " ".join(f"tok{i}" for i in range(120))
    near = base.replace("tok5 ", "tok5x ")
    far = " ".join(f"other{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = dedup_ops.minhash_neardup(df, "doc_id", "text", threshold=0.5) \
        .collect()
    assert any(p["id_a"] == 1 and p["id_b"] == 2 for p in pairs)
    assert not any(p["id_b"] == 3 or p["id_a"] == 3 for p in pairs)


def test_hash_sample_fraction_and_determinism(spark, docs):
    s1 = sampling.hash_sample(docs, "doc_id", 0.3)
    s2 = sampling.hash_sample(docs, "doc_id", 0.3)
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2
    assert 0.05 < len(ids1) / 60 < 0.6  # loose at n=60


def test_split_partitions_are_exhaustive(spark, docs):
    out = sampling.train_val_test_split(docs, "doc_id")
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count()
              .collect()}
    assert sum(counts.values()) == 60
    assert counts.get("train", 0) > counts.get("val", 0)


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.cosine_topk(df, df.where("vec_id < 3"), k=4).collect()
    v = vecs.astype("float64")
    norms = np.linalg.norm(v, axis=1)
    sims = (v @ v.T) / np.outer(norms, norms)
    for q in range(3):
        order = [i for i in np.argsort(-sims[q]) if i != q][:4]
        spark_n = [r["neighbor_id"] for r in sorted(
            (g for g in got if g["query_id"] == q), key=lambda r: r["rank"])]
        assert spark_n == order


def test_lsh_topk_subset_of_bruteforce(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 16).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lsh = similarity.lsh_topk(df, df.where("vec_id < 5"), dim=16, k=3,
                              n_planes=4).collect()
    assert lsh  # some candidates found
    # every LSH result must be a genuine corpus vector pairing
    assert all(0 <= r["neighbor_id"] < 50 for r in lsh)


def test_concat_by_key_order_pinned(spark):
    df = spark.createDataFrame(
        [(1, 2, "b"), (1, 1, "a"), (2, 1, "x")],
        "k long, o long, t string")
    out = {r["k"]: r["concat_text"]
           for r in concat_by_key(df, "k", "o", "t", "|").collect()}
    assert out == {1: "a|b", 2: "x"}


def test_corpus_stats_and_vocab(spark, docs):
    stats = corpus_stats_by_source(docs).collect()
    assert len(stats) == 3
    assert all(r["n_docs"] == 20 for r in stats)
    v = vocab_stats(docs).collect()[0]
    # "doc text number {i%7} body words here" = 7 words per doc
    assert v["total_words"] == 60 * 7
    # vocab: doc, text, number, body, words, here (6 fixed) + digits 0..6
    assert v["vocab_size"] == 13


# --- plan quality ----------------------------------------------------------

def test_filter_pushdown_reaches_scan(spark, tmp_path, docs):
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    df = spark.read.parquet(p).where(F.col("doc_id") > 10).select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)" in plan
    # column pruning: only doc_id read
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_extract_projection_prunes_scan(spark, tmp_path, pages_path):
    from pubscience_spark.operators.extract import extract_pages
    pages = spark.read.parquet(pages_path)
    plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
    # the scan must read only url+html, not warc_ts/text/lang
    assert "warc_ts" not in plan.split("ReadSchema")[1][:200]


def test_broadcast_join_in_star_query(spark):
    from pubscience_spark.queries import q_nation_revenue
    df = q_nation_revenue(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exact_dedup_single_shuffle(spark, docs):
    out = dedup_ops.exact_dedup(docs, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window partitioning, nothing else
    assert plan.count("Exchange hashpartitioning") == 1
