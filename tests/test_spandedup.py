"""ExactSubstr duplicate-span dedup (operators/spandedup) vs an
independent brute-force reference: planted overlaps, the viral-span
skew case at salt 1 and 8, within-doc repeats, whitespace edge cases,
and a randomized small-vocab sweep."""

from __future__ import annotations

import random
import re

import pytest

from pubscience_spark.operators.spandedup import (drop_duplicate_spans,
                                                  duplicate_span_marks)

_TOK = re.compile(r"[^ \t\n\r\f\x0b]+")


def _brute(docs, n):
    """Independent reference: dict id -> (text_out, n_spans, n_toks)."""
    toks = {d: list(_TOK.finditer(t)) for d, t in docs}
    occ = {}
    for d, t in docs:
        ts = [m.group(0) for m in toks[d]]
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p:p + n]), []).append((d, p))
    marks = {}
    for lst in occ.values():
        if len(lst) > 1:
            keeper = min(lst)
            for o in lst:
                if o != keeper:
                    marks.setdefault(o[0], set()).add(o[1])
    out = {}
    for d, t in docs:
        ms = toks[d]
        T = len(ms)
        mask = [False] * T
        for p in marks.get(d, ()):
            for j in range(p, min(p + n, T)):
                mask[j] = True
        n_rm = sum(mask)
        spans = sum(1 for i in range(T)
                    if mask[i] and (i == 0 or not mask[i - 1]))
        parts = [t[:ms[0].start()] if T else t]
        for i, m in enumerate(ms):
            if mask[i]:
                continue
            end = ms[i + 1].start() if i + 1 < T else len(t)
            parts.append(t[m.start():end])
        out[d] = ("".join(parts), spans, n_rm)
    return out


def _run(spark, docs, n, salt=8):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    res = drop_duplicate_spans(df, "doc_id", "text",
                               min_tokens=n, salt=salt)
    got = {r["doc_id"]: (r["text"], r["n_spans_removed"],
                         r["n_tokens_removed"])
           for r in res.collect()}
    assert got == _brute(docs, n)
    return got


def test_planted_overlapping_spans(spark):
    shared = "the quick brown fox jumps over the lazy dog today"
    docs = [
        ("a", f"alpha one two {shared} tail a"),
        ("b", f"beta {shared} middle {shared} tail b"),
        ("c", "no duplication in this document at all whatsoever"),
        ("d", f"{shared}"),                 # exactly the span
    ]
    got = _run(spark, docs, n=5)
    # keeper doc "a" is untouched; b loses both copies; d is emptied
    assert got["a"][1:] == (0, 0)
    assert got["b"][1] >= 1 and shared not in got["b"][0]
    assert got["c"] == (docs[2][1], 0, 0)
    assert got["d"][0] == "" and got["d"][2] == 10


def test_exact_copy_doc_fully_removed(spark):
    t = "w1 w2 w3 w4 w5 w6 w7 w8"
    got = _run(spark, [("a", t), ("b", t)], n=4)
    assert got["a"] == (t, 0, 0)
    assert got["b"] == ("", 1, 8)


def test_within_doc_repeat(spark):
    span = "x1 x2 x3 x4"
    docs = [("solo", f"{span} filler middle words {span} end")]
    got = _run(spark, docs, n=4)
    # first occurrence keeps, second drops
    assert got["solo"][0].startswith(span)
    assert got["solo"][1:] == (1, 4)


@pytest.mark.parametrize("salt", [1, 8])
def test_viral_span_salted(spark, salt):
    """One boilerplate span shared by 40 docs — the skew case the
    salted winner join exists for; results must not depend on salt."""
    viral = "this site uses cookies to improve your experience ok"
    docs = [("d%02d" % i, f"doc {i} body text {viral} more {i}")
            for i in range(40)]
    got = _run(spark, docs, n=6, salt=salt)
    kept = [d for d, (t, _, _) in got.items() if viral in t]
    assert kept == ["d00"]                  # keeper = min (doc, pos)


def test_whitespace_preservation(spark):
    docs = [
        ("a", "  lead a1 a2 a3 a4 a5\t\ttabbed   spaced trail  "),
        ("b", "prefix a1 a2 a3 a4 a5\nsuffix line"),
    ]
    got = _run(spark, docs, n=5)
    # keeper a unchanged, incl. its leading/trailing runs
    assert got["a"][0] == docs[0][1]
    # b lost the 5-gram but kept its own original whitespace bytes
    assert got["b"][0] == "prefix suffix line"


def test_short_and_empty_docs_pass_through(spark):
    docs = [("a", "one two three"), ("b", ""), ("c", "   "),
            ("d", "one two three"),           # dup but < n tokens
            ]
    got = _run(spark, docs, n=5)
    assert {d: v[0] for d, v in got.items()} == dict(docs)


def test_marks_frame_shape(spark):
    t = "w1 w2 w3 w4 w5"
    df = spark.createDataFrame([("a", t), ("b", t)],
                               "doc_id string, text string")
    marks = duplicate_span_marks(df, "doc_id", "text", min_tokens=5)
    assert marks.columns == ["doc_id", "pos"]
    assert [(r["doc_id"], r["pos"]) for r in marks.collect()] \
        == [("b", 0)]


def test_random_sweep_matches_brute_force(spark):
    rng = random.Random(42)
    vocab = ["w%d" % i for i in range(12)]
    docs = [("doc%02d" % i,
             " ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 40))))
            for i in range(30)]
    _run(spark, docs, n=4)


def test_min_tokens_validation(spark):
    df = spark.createDataFrame([("a", "x y")],
                               "doc_id string, text string")
    with pytest.raises(ValueError, match="min_tokens"):
        duplicate_span_marks(df, "doc_id", "text", min_tokens=1)


def test_curation_funnel_exact_substr_stage(spark, tmp_path):
    """Opt-in ExactSubstr stage inside curate_corpus: the shared span
    keeps its first occurrence, a non-keeper pure copy drops out
    (emptied), manifest counters account for both."""
    import os

    from pubscience_spark.plans.curation import curate_corpus
    shared = ("please subscribe to our weekly newsletter for all the "
              "latest updates and exclusive member only offers today")
    body = ("Document %d carries its own distinctive body sentence with "
            "sufficient words and characters to clear every quality and "
            "length gate applied by the funnel stages in this test run.")
    rows = [(i, (body % i) + " " + shared, "en") for i in range(1, 7)]
    rows.append((9, shared + " " + shared, "en"))  # only duplicated text
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
    m = curate_corpus(spark, docs, os.path.join(str(tmp_path), "es"),
                      min_chars=50, min_words=10, exact_substr=True,
                      exact_substr_min_tokens=8, neardup_threshold=0.99)
    es = m["exact_substr"]
    assert es["docs_emptied"] == 1             # doc 9 emptied out
    assert es["spans_removed"] >= 6            # 5 followers + doc 9's
    assert es["tokens_removed"] >= 5 * 17
    out = spark.read.parquet(m["corpus_path"])
    texts = [r["text"] for r in out.collect()]
    assert sum(t.count("please subscribe") for t in texts) == 1
    assert out.count() == 6                    # doc 9 gone
    assert m["params"]["exact_substr"] == {"min_tokens": 8, "salt": 8}
    # stage off -> manifest key None
    m2 = curate_corpus(spark, docs, os.path.join(str(tmp_path), "es2"),
                       min_chars=50, min_words=10,
                       neardup_threshold=0.99)
    assert m2["exact_substr"] is None


def test_null_text_passes_through(spark):
    """documents.text is nullable — a NULL text row must survive
    untouched (the battery query runs over the raw table)."""
    docs = [("a", "w1 w2 w3 w4 w5"), ("b", None),
            ("c", "w1 w2 w3 w4 w5")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    res = drop_duplicate_spans(df, "doc_id", "text", min_tokens=5)
    got = {r["doc_id"]: (r["text"], r["n_spans_removed"],
                         r["n_tokens_removed"]) for r in res.collect()}
    assert got["b"] == (None, 0, 0)
    assert got["a"] == ("w1 w2 w3 w4 w5", 0, 0)
    assert got["c"] == ("", 1, 5)


def test_marks_persist_handle_is_the_persisted_frame(spark):
    """Round-7 review #1: the unpersist handle must be the exact frame
    .persist() was called on — the salted projection is a different
    plan and unpersisting it is a silent no-op that leaks the gram
    cache for the session."""
    t = "w1 w2 w3 w4 w5"
    df = spark.createDataFrame([("a", t), ("b", t)],
                               "doc_id string, text string")
    marks = duplicate_span_marks(df, "doc_id", "text", min_tokens=5)
    handle = marks._ps_persisted_input
    marks.collect()                                # materialize cache
    assert handle.storageLevel.useMemory or handle.storageLevel.useDisk
    assert handle.is_cached
    from pubscience_spark.operators.dedup import unpersist_input
    unpersist_input(marks)
    assert not handle.is_cached
