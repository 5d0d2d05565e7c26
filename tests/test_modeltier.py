"""Tests for the ◇ model tier stand-ins and salted-bucket balance."""

from pyspark.sql import functions as F

from pubscience_spark.operators import modeltier


def test_translate_chunks_and_reassembles(spark):
    long_text = ". ".join(f"Sentence number {i} with several words here"
                          for i in range(40)) + "."
    df = spark.createDataFrame([(1, "Short one."), (2, long_text)],
                               ["doc_id", "text"])
    rows = {r["id"]: r["translated"]
            for r in modeltier.translate_documents(df, max_tokens=32).collect()}
    assert rows["1"].startswith("[nl->en] Short one.")
    # every chunk tagged, all content preserved in order
    assert rows["2"].count("[nl->en]") > 1
    stripped = rows["2"].replace("[nl->en] ", "")
    assert stripped == long_text


def test_translate_custom_fn_batches(spark):
    # the fake model stamps the batch size it saw into every output —
    # proves chunks were flattened across the whole Arrow batch (one call)
    def fake_model(chunks):
        n = len(chunks)
        return [f"{n}|{c.upper()}" for c in chunks]

    df = spark.createDataFrame([(i, f"doc {i} text") for i in range(6)],
                               ["doc_id", "text"])
    out = modeltier.translate_documents(
        df.coalesce(1), translate_fn=fake_model).collect()
    assert len(out) == 6
    assert all(r["translated"].startswith("6|DOC") for r in out)


def test_label_documents_argmax(spark):
    df = spark.createDataFrame([
        (1, "cardiac heart valve surgery"),
        (2, "lung airway breathing"),
        (3, "unrelated text"),
    ], ["doc_id", "text"])
    labels = {"cardio": ["cardiac", "heart", "valve"],
              "pulmo": ["lung", "airway", "breathing"]}
    rows = {r["doc_id"]: (r["label"], r["label_score"])
            for r in modeltier.label_documents(df, labels).collect()}
    assert rows[1] == ("cardio", 1.0)
    assert rows[2] == ("pulmo", 1.0)
    assert rows[3][1] == 0.0


def test_transform_documents(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "text"])
    rows = {r["id"]: r["transformed"]
            for r in modeltier.transform_documents(
                df, lambda t: t.upper()).collect()}
    assert rows == {"1": "A B", "2": "C"}


def test_salted_buckets_balance_zipf_domains(spark, pages_path):
    """North rule: url-hash bucketing defeats Zipf domain skew — the hottest
    bucket stays within 2x of the mean even though the hottest domain holds
    a large share of rows."""
    from pubscience_spark.plans.pipeline import bucket_col
    pages = spark.read.parquet(pages_path)
    n = pages.count()
    top_domain = (pages.groupBy(F.regexp_extract("url", r"https://([^/]+)/", 1)
                                .alias("d")).count()
                  .orderBy(F.desc("count")).first())
    assert top_domain["count"] > n / 10  # skew actually present
    sizes = [r["count"] for r in
             pages.withColumn("b", bucket_col(8)).groupBy("b").count()
             .collect()]
    assert len(sizes) == 8
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))
