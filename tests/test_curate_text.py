"""Gopher repetition signals + n-gram decontamination, checked against
sequential brute-force implementations of the same definitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubscience_spark.operators import curate_text as C


# ------------------------------------------------ brute-force references ---

def _ref_dup_fraction(items):
    if not items:
        return 0.0
    return (len(items) - len(set(items))) / len(items)


def _ref_dup_char_fraction(items):
    total = sum(len(s) for s in items)
    if not total:
        return 0.0
    distinct = sum(len(s) for s in set(items))
    return (total - distinct) / total


def _ref_top_ngram_frac(text, n):
    words = text.lower().split()
    grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    total = sum(len(w) for w in words)
    if not grams or not total:
        return 0.0
    from collections import Counter
    cnt = Counter(grams)
    top = max(cnt.values())
    # ties resolved to the lexicographically largest gram (operator rule)
    gram = max(g for g, c in cnt.items() if c == top)
    return top * (len(gram) - (n - 1)) / total


DOCS = [
    ("d0", "unique prose line one\nanother line\n\nfresh paragraph here"),
    ("d1", "spam spam spam spam spam spam spam spam"),
    ("d2", "menu\nmenu\nmenu\ncontact us\nmenu\n\nbody text paragraph\n\n"
           "body text paragraph"),
    ("d3", ""),
    ("d4", "a b c d e f g h i j"),
    ("d5", "repeat pair repeat pair repeat pair tail words here now"),
]


def test_gopher_repetition_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in C.gopher_repetition(df).collect()}
    for doc_id, text in DOCS:
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        import re
        paras = [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]
        r = got[doc_id]
        assert r["dup_line_frac"] == pytest.approx(
            _ref_dup_fraction(lines), abs=1e-6), doc_id
        assert r["dup_line_char_frac"] == pytest.approx(
            _ref_dup_char_fraction(lines), abs=1e-6), doc_id
        assert r["dup_para_frac"] == pytest.approx(
            _ref_dup_fraction(paras), abs=1e-6), doc_id
        assert r["dup_para_char_frac"] == pytest.approx(
            _ref_dup_char_fraction(paras), abs=1e-6), doc_id
        assert r["top_2gram_char_frac"] == pytest.approx(
            _ref_top_ngram_frac(text, 2), abs=1e-6), doc_id
        assert r["top_3gram_char_frac"] == pytest.approx(
            _ref_top_ngram_frac(text, 3), abs=1e-6), doc_id
    # the spammy docs are the ones Gopher's thresholds would drop
    assert got["d1"]["top_2gram_char_frac"] > 0.20
    assert got["d2"]["dup_line_frac"] > 0.30
    assert got["d0"]["dup_line_frac"] == 0.0


def test_gopher_repetition_on_real_docs(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100)
    out = C.gopher_repetition(docs).select(
        "doc_id", "dup_line_frac", "top_2gram_char_frac").collect()
    assert len(out) == 100
    for r in out:
        assert 0.0 <= r["dup_line_frac"] <= 1.0
        assert 0.0 <= r["top_2gram_char_frac"] <= 1.0


def test_mark_contaminated_matches_bruteforce(spark):
    n = 5
    eval_rows = [("e0", "the quick brown fox jumps over the lazy dog"),
                 ("e1", "four score and seven years ago our fathers")]
    train_rows = [
        # contains eval e0's 5-gram verbatim
        ("t0", "intro words the quick brown fox jumps over and then more"),
        # clean
        ("t1", "completely unrelated training document about spark joins"),
        # shares only a 4-gram (below n) → clean
        ("t2", "the quick brown fox sleeps all day long here"),
        # contains e1 content, case-insensitive
        ("t3", "FOUR SCORE AND SEVEN YEARS ago our fathers brought forth"),
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["is_contaminated"] for r in
           C.mark_contaminated(train, ev, "doc_id", n=n).collect()}
    # brute force
    def grams(t):
        w = t.lower().split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    ev_grams = set().union(*(grams(t) for _, t in eval_rows))
    for doc_id, text in train_rows:
        assert got[doc_id] == bool(grams(text) & ev_grams), doc_id
    assert got["t0"] and got["t3"] and not got["t1"] and not got["t2"]
    # shuffle-join mode agrees with broadcast mode
    got2 = {r["doc_id"]: r["is_contaminated"] for r in
            C.mark_contaminated(train, ev, "doc_id", n=n,
                                broadcast_eval=False).collect()}
    assert got2 == got


def test_mark_contaminated_short_docs_never_flagged(spark):
    train = spark.createDataFrame([("t0", "too few words")],
                                  ["doc_id", "text"])
    ev = spark.createDataFrame([("e0", "too few words")], ["doc_id", "text"])
    out = C.mark_contaminated(train, ev, "doc_id", n=13).collect()
    assert out[0]["is_contaminated"] is False  # no 13-gram exists


def test_curate_text_plan_is_native(spark):
    """The repetition signals must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython in the plan, and decontamination's shuffle carries
    only (id, 8-byte hash)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    plan = C.gopher_repetition(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    hashes = C.ngram_hashes(docs, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in hashes


def test_curation_funnel_with_gopher_and_decontam(spark, tmp_path):
    """Opt-in repetition gate + decontamination stages in curate_corpus:
    funnel counts stay consistent, stages drop the right docs."""
    import os

    from pubscience_spark.plans.curation import (GOPHER_DEFAULT_MAX,
                                                 curate_corpus)
    base = ("solid prose content with the usual stopwords and a view of "
            "analysis that is long enough to pass all of the gates in "
            "this small curation test corpus for sure ") * 3
    rows = [(f"d{i}", base + f"variation token {i} " * 5) for i in range(20)]
    # a repetition-spam doc: passes length/quality, fails the Gopher gate
    rows.append(("d_spam", ("the same line again and again\n" * 40)))
    # a doc contaminated with the eval corpus
    eval_text = ("held out evaluation question about the spark optimizer "
                 "and its adaptive execution behavior in detail")
    rows.append(("d_leak", base + " " + eval_text))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ev = spark.createDataFrame([("e0", eval_text)], ["doc_id", "text"])
    m = curate_corpus(spark, docs, os.path.join(str(tmp_path), "out"),
                      min_chars=50, min_words=10,
                      gopher_max=GOPHER_DEFAULT_MAX,
                      decontam_eval=ev, decontam_n=13,
                      neardup_threshold=0.995)
    assert m["input"] == 22
    assert m["after_repetition_gate"] == m["after_quality_gate"] - 1
    assert m["decontaminated_dropped"] == 1
    written = spark.read.parquet(m["corpus_path"])
    ids = {r["doc_id"] for r in written.select("doc_id").collect()}
    assert "d_spam" not in ids and "d_leak" not in ids
    assert m["written"] == len(ids)
    # default call (no opt-ins) keeps the old manifest shape working
    m2 = curate_corpus(spark, docs, os.path.join(str(tmp_path), "out2"),
                       min_chars=50, min_words=10,
                       neardup_threshold=0.995)
    assert m2["after_repetition_gate"] == m2["after_quality_gate"]
    assert m2["decontaminated_dropped"] == 0


def test_curation_funnel_paragraph_dedup_stage(spark, tmp_path):
    """Opt-in C4-style paragraph dedup inside curate_corpus: shared
    boilerplate paragraphs keep one occurrence, fully-boilerplate docs
    drop out, manifest counters account for both."""
    import os
    from pubscience_spark.plans.curation import curate_corpus
    footer = ("Subscribe to our newsletter for the latest updates and "
              "exclusive offers delivered weekly to your inbox today.")
    body = ("Document %d carries its own distinctive body paragraph with "
            "sufficient words and characters to clear every quality and "
            "length gate applied by the funnel stages in this test run.")
    rows = [(i, (body % i) + "\n\n" + footer, "en") for i in range(1, 9)]
    rows.append((9, footer, "en"))            # pure boilerplate doc
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = curate_corpus(spark, docs, os.path.join(str(tmp_path), "pd"),
                      min_chars=50, min_words=10, para_dedup=True,
                      neardup_threshold=0.99)
    assert m["paragraph_dedup"]["paras_dropped"] == 8   # 7 footers + doc 9's
    assert m["paragraph_dedup"]["docs_emptied"] == 1
    out = spark.read.parquet(m["corpus_path"])
    texts = [r["text"] for r in out.collect()]
    assert sum(t.count("Subscribe to our newsletter") for t in texts) == 1
    assert out.count() == 8                    # doc 9 gone
    # stage off -> manifest key None, footer survives everywhere
    m2 = curate_corpus(spark, docs, os.path.join(str(tmp_path), "pd2"),
                       min_chars=50, min_words=10, neardup_threshold=0.99)
    assert m2["paragraph_dedup"] is None


def test_gopher_quality_signals_bruteforce(spark):
    """Native gopher_quality signals vs a per-doc python reimplementation
    of the published MassiveText C1 rules."""
    import re

    from pubscience_spark.operators.curate_text import gopher_quality

    good = ("The quick brown fox jumps over the lazy dog and then "
            "continues to run with great speed across the field. " * 4)
    docs = {
        1: good,
        2: "short text",                               # < 50 words
        3: "- item one\n- item two\n- item three\nnot a bullet line",
        4: "Trailing thought...\nAnother one…\nplain line\nplain too",
        5: "#tag #tag #tag " + good,
        6: "12 34 56 78 " * 30,                        # numeric words
        7: "",
        # punctuation-heavy: stopwords appear only as 'the,' / 'of.' /
        # '(and)' — they must still count (ADVICE r5)
        8: "Start of. sentence, the, end. (and) more! words here now.",
    }
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_quality(df).collect()}

    def brute(t):
        words = t.strip().lower().split()
        lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
        n_w, n_l = len(words), len(lines)
        mean_wl = sum(map(len, words)) / n_w if n_w else 0.0
        n_sym = t.count("#") + t.count("...") + t.count("…")
        bullets = sum(bool(re.match(r"^([•‣▪●⁃\-\*])\s", ln))
                      for ln in lines)
        ells = sum(ln.endswith("...") or ln.endswith("…")
                   for ln in lines)
        alpha = sum(bool(re.search(r"[a-z]", w)) for w in words)
        # round 6: tokens are punctuation-stripped before stopword
        # matching, so 'the,' and 'of.' count (ADVICE r5)
        stripped = {re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", w)
                    for w in words}
        stops = len(stripped & {"the", "be", "to", "of", "and",
                                "that", "have", "with"})
        return {
            "n_words": n_w,
            "mean_word_len": round(mean_wl, 6),
            "symbol_word_ratio": round(n_sym / n_w, 6) if n_w else 0.0,
            "bullet_line_frac": round(bullets / n_l, 6) if n_l else 0.0,
            "ellipsis_line_frac": round(ells / n_l, 6) if n_l else 0.0,
            "alpha_word_frac": round(alpha / n_w, 6) if n_w else 0.0,
            "n_required_stopwords": stops,
        }

    for did, t in docs.items():
        want = brute(t)
        got = {k: rows[did][k] for k in want}
        assert got == want, (did, got, want)
    assert rows[1]["gopher_quality_pass"] is True
    for did in (2, 3, 6, 7):
        assert rows[did]["gopher_quality_pass"] is False, did


def test_gopher_quality_plan_is_native(spark):
    from pubscience_spark.operators.curate_text import gopher_quality
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = gopher_quality(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_curation_funnel_gopher_quality_gate(spark, tmp_path):
    """Opt-in Gopher C1 quality gate in curate_corpus: a doc passing the
    base quality predicate but failing a published C1 rule (numeric
    words → alpha_word_frac < 0.8) is dropped only when the gate is on."""
    import os

    from pubscience_spark.plans.curation import curate_corpus
    base = ("solid prose content with the usual stopwords and a view of "
            "analysis that is long enough to pass all of the gates in "
            "this small curation test corpus for sure ") * 3
    rows = [(f"d{i}", base + f"variation token {i} " * 5) for i in range(6)]
    # teaser-listicle doc: normal words/stopwords (base gate passes) but
    # most lines trail off with an ellipsis → ellipsis_line_frac > 0.3,
    # a rule only the Gopher C1 set checks
    teaser = "\n".join(
        f"the number {i} reason people love spark engines is that..."
        if i % 2 else
        f"a plain line of prose about the engine number {i} here"
        for i in range(12))
    rows.append(("d_numeric", teaser))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    m_off = curate_corpus(spark, docs,
                          os.path.join(str(tmp_path), "off"),
                          min_chars=50, min_words=10,
                          neardup_threshold=0.995, neardup_bands=4)
    m_on = curate_corpus(spark, docs, os.path.join(str(tmp_path), "on"),
                         min_chars=50, min_words=10,
                         gopher_quality_gate=True,
                         neardup_threshold=0.995, neardup_bands=4)
    ids_off = {r["doc_id"] for r in spark.read.parquet(
        m_off["corpus_path"]).select("doc_id").collect()}
    ids_on = {r["doc_id"] for r in spark.read.parquet(
        m_on["corpus_path"]).select("doc_id").collect()}
    assert "d_numeric" in ids_off and "d_numeric" not in ids_on
    assert ids_off - ids_on == {"d_numeric"}


def test_c4_clean_matches_bruteforce(spark):
    """C4 §2.2 line rules vs a python reimplementation."""
    import re

    from pubscience_spark.operators.curate_text import c4_clean

    docs = {
        1: 'Good sentence one stays right here.\nshort line.\n'
           'No terminal punctuation so dropped\n'
           'This javascript line is dropped for the word.\n'
           'Another proper sentence with enough words!\n'
           'Quoted sentences also count as terminal here."',
        2: "Lorem Ipsum dolor sit amet consectetur adipiscing elit.\n"
           "A second proper sentence right here now.\n"
           "And a third proper sentence right here too.",
        3: "function f() { return 1; }\nA fine sentence with words here."
           "\nAnother fine sentence with many words here.\n"
           "And one more fine sentence with words here.",
        4: "Only one proper sentence with enough words here.",
        5: "",
        # CRLF + tab-indented lines (what the WARC path feeds): Spark's
        # space-only trim and Java's $-before-\r both bit here (r5 review)
        6: "A proper crlf sentence with enough words here.\r\n"
           "\tAnother tab indented proper sentence right here.\r\n"
           "one two three four.\r\n"
           "And a third full sentence with plenty of words.\r\n",
    }
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in c4_clean(df).collect()}

    def brute(t):
        lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
        kept = [ln for ln in lines
                if re.search(r'[.!?"]$', ln)
                and len(ln.split()) >= 5
                and not re.search(r"\bjavascript\b", ln.lower())]
        cleaned = "\n".join(kept)
        n_sent = len(re.split(r"[.!?]", cleaned)) - 1
        keep = (n_sent >= 3 and "lorem ipsum" not in t.lower()
                and "{" not in t)
        return cleaned, keep, len(kept), len(lines) - len(kept)

    for did, t in docs.items():
        c, k, nk, nd = brute(t)
        r = rows[did]
        got = (r["text_c4"], r["c4_keep"], r["n_lines_kept"],
               r["n_lines_dropped"])
        assert got == (c, k, nk, nd), (did, got, (c, k, nk, nd))
    assert rows[1]["c4_keep"] is True
    assert rows[2]["c4_keep"] is False          # lorem ipsum page
    assert rows[3]["c4_keep"] is False          # curly brace page
    assert rows[4]["c4_keep"] is False          # < 3 sentences
    # the plan stays JVM-side
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_curation_funnel_c4_stage(spark, tmp_path):
    """Opt-in C4 stage: text is line-cleaned BEFORE the other gates and
    pages failing the C4 page rule drop at their own funnel stage."""
    import os

    from pubscience_spark.plans.curation import curate_corpus
    base = ("This is solid prose content with the usual stopwords here. "
            "It has a view of analysis that is long enough to pass the "
            "gates of this small curation corpus for sure. ") * 3
    rows = [(f"d{i}", base + f"This is variation sentence {i} here. " * 3)
            for i in range(6)]
    # page with a curly brace → fails C4's page rule only
    rows.append(("d_brace", base + " if (x) { return; }"))
    # page whose lines lack terminal punctuation → C4 empties it
    rows.append(("d_noterm", ("just words with no ending punctuation "
                              "on any line here at all " * 8)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    m = curate_corpus(spark, docs, os.path.join(str(tmp_path), "out"),
                      min_chars=50, min_words=10, c4=True,
                      neardup_threshold=0.995, neardup_bands=4)
    assert m["input"] == 8
    # exactly both pages fail the C4 page rule: d_brace (curly brace)
    # and d_noterm (cleaned text has 0 sentences < 3)
    assert m["after_c4_gate"] == 6
    ids = {r["doc_id"] for r in spark.read.parquet(m["corpus_path"])
           .select("doc_id").collect()}
    assert "d_brace" not in ids and "d_noterm" not in ids
    assert ids == {f"d{i}" for i in range(6)}
    # without c4, the brace page passes straight through
    m2 = curate_corpus(spark, docs, os.path.join(str(tmp_path), "out2"),
                       min_chars=50, min_words=10,
                       neardup_threshold=0.995, neardup_bands=4)
    ids2 = {r["doc_id"] for r in spark.read.parquet(m2["corpus_path"])
            .select("doc_id").collect()}
    assert "d_brace" in ids2


def test_c4_badwords_gate(spark):
    """Opt-in dirty-word page removal: word-boundary matching on alnum
    tokens (never substrings), case/punct-insensitive, multi-token
    phrases across whitespace; schema untouched without the list."""
    from pubscience_spark.operators.curate_text import c4_clean

    good = ("A perfectly fine sentence with enough words here. "
            "Another fine sentence with enough words too.\n"
            "And a third full sentence with plenty of words.")
    docs = [
        (1, good),
        (2, good + "\nThis line mentions BADWORD, with punctuation."),
        (3, good + "\nclassy classification unbadworded stays fine."),
        (4, good + "\nA naughty phrase two appears right here."),
        (5, good + "\nphrase  two split across   extra whitespace."),
        (6, good + "\nphrase alone and two alone do not match."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           c4_clean(df, badwords=["BadWord", "phrase two"]).collect()}
    assert [out[i]["c4_badword"] for i in (1, 2, 3, 4, 5, 6)] == \
        [False, True, False, True, True, False]
    for i in (2, 4, 5):
        assert out[i]["c4_keep"] is False
    assert out[1]["c4_keep"] is True and out[6]["c4_keep"] is True
    # no list → no column, page rule unchanged
    assert "c4_badword" not in c4_clean(df).columns
    # the gate stays JVM-side (arrays_overlap + contains, no regex UDF)
    plan = (c4_clean(df, badwords=["badword", "phrase two"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan


def test_curation_funnel_badwords(spark, tmp_path):
    """Funnel wiring: badword pages drop at the C4 stage and the
    manifest counts them separately."""
    import os

    from pubscience_spark.plans.curation import curate_corpus
    base = ("This is solid prose content with the usual stopwords here. "
            "It has a view of analysis that is long enough to pass the "
            "gates of this small curation corpus for sure. ") * 3
    rows = [(f"d{i}", base + f"This is variation sentence {i} here. " * 3)
            for i in range(5)]
    rows.append(("d_bad", base + "This sentence contains scunthorpe."))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    m = curate_corpus(spark, docs, os.path.join(str(tmp_path), "bw"),
                      min_chars=50, min_words=10, c4=True,
                      c4_badwords=["scunthorpe"],
                      neardup_threshold=0.995, neardup_bands=4)
    assert m["input"] == 6
    assert m["badword_pages"] == 1
    assert m["after_c4_gate"] == 5
    assert m["params"]["c4_badwords_n"] == 1
    ids = {r["doc_id"] for r in spark.read.parquet(m["corpus_path"])
           .select("doc_id").collect()}
    assert "d_bad" not in ids
    # badwords with the C4 stage disabled would silently skip the
    # gate — must fail fast instead (review finding)
    with pytest.raises(ValueError, match="c4_badwords requires"):
        curate_corpus(spark, docs, os.path.join(str(tmp_path), "bw2"),
                      c4=False, c4_badwords=["scunthorpe"])
    # no-c4 run still reports the counter (zero) for manifest stability
    m2 = curate_corpus(spark, docs, os.path.join(str(tmp_path), "bw2"),
                       min_chars=50, min_words=10,
                       neardup_threshold=0.995, neardup_bands=4)
    assert m2["badword_pages"] == 0
