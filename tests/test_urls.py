"""URL curation operators: normalization, keep-first URL dedup,
suffix-join domain filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubscience_spark.operators import urls as U


def test_normalized_url_expr(spark):
    cases = [
        # tracking params stripped, kept params survive
        ("https://Ex.COM/a/?utm_source=x&q=1&fbclid=zz",
         "https://ex.com/a?q=1"),
        # fragment dropped (parse_url PATH/QUERY never include it)
        ("http://ex.com/p#section", "http://ex.com/p"),
        # trailing slash trimmed, root slash kept
        ("http://ex.com/dir/", "http://ex.com/dir"),
        ("http://ex.com/", "http://ex.com/"),
        # scheme+host lowercased, path case preserved
        ("HTTP://WWW.Ex.com/CaSe", "http://www.ex.com/CaSe"),
        # all params tracking → no '?'
        ("http://ex.com/x?utm_medium=a&gclid=b", "http://ex.com/x"),
        # non-default port preserved (distinct origin), default stripped
        ("http://ex.com:8080/a", "http://ex.com:8080/a"),
        ("http://ex.com:80/a", "http://ex.com/a"),
        ("https://ex.com:443/a", "https://ex.com/a"),
        # unparseable (space in path): passes through unchanged, no
        # collapse onto a shared constant
        ("http://ex.com/a b", "http://ex.com/a b"),
        ("not a url at all", "not a url at all"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["url_norm"] for r in
           U.with_normalized_url(df).orderBy(F.lit(1)).collect()]
    by_in = dict(zip((u for u, _ in cases),
                     (r["url_norm"] for r in
                      U.with_normalized_url(df).collect())))
    for raw, want in cases:
        assert by_in[raw] == want, (raw, by_in[raw], want)


def test_dedup_by_url_keep_first(spark):
    rows = [("http://ex.com/a?utm_source=x", "d1"),
            ("http://EX.com/a", "d2"),          # same normalized → dup
            ("http://ex.com/b", "d3"),
            ("http://ex.com/b", "d4")]          # byte-identical repeat
    df = spark.createDataFrame(rows, ["url", "doc_id"])
    out = {r["doc_id"]: r["is_url_duplicate"] for r in
           U.dedup_by_url(df, order_col="doc_id").collect()}
    assert out == {"d1": False, "d2": True, "d3": False, "d4": True}
    # a unique order is REQUIRED — the url itself can never flag exact
    # repeats (review finding)
    import pytest as _pt
    with _pt.raises(ValueError):
        U.dedup_by_url(df)


def test_filter_domains_suffix_semantics(spark):
    rows = [("http://spam.com/x",), ("http://sub.spam.com/y",),
            ("http://notspam.com/z",), ("http://ok.org/w",),
            ("http://deep.a.b.tracker.net/q",)]
    df = spark.createDataFrame(rows, ["url"])
    blocked = U.filter_domains(df, ["spam.com", "tracker.net"])
    kept = {r["url"] for r in blocked.collect()}
    # exact domain and subdomains blocked; 'notspam.com' is NOT a
    # suffix-match (label-boundary aware), so it survives
    assert kept == {"http://notspam.com/z", "http://ok.org/w"}
    allowed = U.filter_domains(df, ["spam.com"], mode="allow")
    assert {r["url"] for r in allowed.collect()} == \
        {"http://spam.com/x", "http://sub.spam.com/y"}
    # DataFrame-typed list (big-list path)
    dom_df = spark.createDataFrame([("spam.com",)], ["domain"])
    assert U.filter_domains(df, dom_df).count() == 3


def test_url_ops_native_plan(spark):
    df = spark.createDataFrame([("http://ex.com/a",)], ["url"])
    plan = U.with_normalized_url(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_dedup_by_url_keeps_null_url_rows(spark):
    """Round-3 review: NULL-url rows must survive with flag False, not
    vanish in the key equi-join."""
    rows = [("http://ex.com/a", "d1"), (None, "d2"), (None, "d3")]
    df = spark.createDataFrame(rows, "url string, doc_id string")
    out = {r["doc_id"]: r["is_url_duplicate"] for r in
           U.dedup_by_url(df, order_col="doc_id").collect()}
    assert out == {"d1": False, "d2": False, "d3": False}
