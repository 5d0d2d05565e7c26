"""Tests for identify gates (F4/F5 shape) and sessionization operators."""

import datetime as dt

from pyspark.sql import functions as F

from pubscience_spark.operators import identify, sessions


def _docs(spark):
    return spark.createDataFrame([
        (1, "cardiac study with clinical trial evidence"),
        (2, "cardiac mention only"),
        (3, "nothing relevant here"),
        (4, "trial " + "filler " * 300 + " cardiac"),  # term past word 256
    ], ["doc_id", "text"])


def test_conservative_and_greedy_gates(spark):
    d = _docs(spark)
    cons = identify.conservative_identify(
        d, include=["cardiac", "trial"], exclude=["nothing"])
    assert {r["doc_id"] for r in cons.collect()} == {1, 2, 4}
    greedy = identify.greedy_identify(
        d, include=["clinical"], exclude=["nothing"], threshold=0.5)
    assert {r["doc_id"] for r in greedy.collect()} == {1}


def test_scored_identify_truncation_semantics(spark):
    d = _docs(spark)
    out = identify.scored_identify(
        d, ["cardiac", "trial"], threshold=0.9)
    ids = {r["doc_id"]: r["score"] for r in out.collect()}
    # doc 4's 'cardiac' sits past the 256-word truncation → score 0.5 < 0.9
    assert set(ids) == {1}
    assert ids[1] == 1.0
    cols = set(out.columns)
    assert {"score", "text_len"} <= cols  # identify.py:546-553 shape


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for m in (0, 5, 10, 70, 75, 200):       # user 1: 3 sessions (30-min gap)
        rows.append((1, base + dt.timedelta(minutes=m)))
    for m in (0, 45):                        # user 2: 2 sessions
        rows.append((2, base + dt.timedelta(minutes=m)))
    return spark.createDataFrame(rows, ["user_id", "ts"])


def test_session_window_counts_match_lag_formulation(spark):
    e = _events(spark)
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in sessions.session_counts(e).collect()}
    assert got == {1: (3, 6), 2: (2, 2)}
    agg = sessions.session_aggregate(e).where(F.col("user_id") == 1) \
        .orderBy("session_start").collect()
    assert [r["n_events"] for r in agg] == [3, 2, 1]


def test_running_user_counts_stateful_stream(spark, tmp_path):
    import os
    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    e = _events(spark)
    e.coalesce(1).write.parquet(str(in_dir / "f1.parquet"))

    out: dict[int, int] = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            out[r["user_id"]] = r["n_events_total"]

    schema = e.schema
    stream = spark.readStream.schema(schema).parquet(str(in_dir) + "/*")
    q = (sessions.running_user_counts(stream)
         .writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert out == {1: 6, 2: 2}

    # second batch arrives: state carries the running totals forward
    e2 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2)), (3, dt.datetime(2024, 1, 2))],
        ["user_id", "ts"])
    e2.coalesce(1).write.parquet(str(in_dir / "f2.parquet"))
    q = (sessions.running_user_counts(stream)
         .writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert out == {1: 7, 2: 2, 3: 1}
    assert os.path.isdir(str(tmp_path / "ckpt"))
