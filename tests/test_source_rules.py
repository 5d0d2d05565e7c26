"""B2 per-source rule-set content (kernels/source_rules) + the wikidoc
name-dedup composition (set_ops.dedup_by_name).

Golden fixture `fixtures_source_rules.json` holds one branch-exercising
input per source with the expected output BYTES; the expected side was
captured after byte-identical validation against the reference's
`scripts/clean.py` PROCESSORS (all 18 sources, plus the skip paths below).
Regenerate only on deliberate semantic change.
"""

from __future__ import annotations

import json
import os

import pytest

from pubscience_spark.kernels import source_rules
from pubscience_spark.operators import set_ops
from pubscience_spark.operators.boilerplate import (process_source,
                                                    strip_boilerplate)

_FX = json.load(open(os.path.join(os.path.dirname(__file__),
                                  "fixtures_source_rules.json")))


@pytest.mark.parametrize("src", sorted(_FX["cases"]))
def test_processor_bytes(src):
    case = _FX["cases"][src]
    g = case["input"]
    out = source_rules.PROCESSORS[src](
        g["text"], title=g.get("title", ""), url=g.get("url"))
    assert out == case["expected"]


def test_section_mode_processors():
    for src, case in _FX["section_cases"].items():
        g = case["input"]
        if src == "mayo":
            out = source_rules.process_mayo(
                "", title=g["title"], sections=g["sections"])
        elif src == "nice":
            out = source_rules.process_nice(
                "", title=g["title"], url=g.get("url"),
                sections=g["sections"], overview=g["overview"])
        else:
            out = source_rules.process_rch(
                g["text"], title=g["title"], url=g.get("url"))
        assert out == case["expected"], src


def test_skip_conditions_return_none():
    assert source_rules.process_aafp(
        "The AAFP supports the ACC guideline on this topic.\nmore",
        title="T") is None
    assert source_rules.process_cdc_diseases(
        "### Disease Directory\nlist") is None
    assert source_rules.process_idsa(
        "Title\nThis new guideline is currently in development now.") is None
    assert source_rules.process_cps("### Abstract\nshort\n") is None
    assert source_rules.process_gc("short text only", title="Title") is None
    assert source_rules.process_wikidoc("# Overview\nshort line\n") is None
    assert source_rules.process_nice(
        "", sections={"Committee members": "x",
                      "Update information": "y"}) is None


def test_nice_text_mode_roundtrips_section_concat():
    """Column mode re-derives sections from the '# name' concat format."""
    sections = {"Recommendations": "Measure blood pressure.",
                "Committee discussion": "Evidence was reviewed.",
                "Update information": "changed 2020"}
    text = source_rules.concatenate_sections(sections)
    via_dict = source_rules.process_nice("", title="H", sections=sections)
    via_text = source_rules.process_nice(text, title="H")
    assert via_dict == via_text


def test_process_source_dispatch_and_kept_flag():
    g = _FX["cases"]["who"]["input"]
    text, kept = process_source(g["text"], "who")
    assert kept and text == _FX["cases"]["who"]["expected"]["text"]
    # alias resolution via source_map
    text2, kept2 = process_source(g["text"], "src_who",
                                  source_map={"src_who": "who"})
    assert (text2, kept2) == (text, kept)
    # skip path surfaces as kept=False
    _, kept3 = process_source("### Disease Directory\nx", "cdc_diseases")
    assert kept3 is False
    # unknown source falls back to the generic default RuleSet
    text4, kept4 = process_source("body line here\nreferences\ntail",
                                  "unknown_source")
    assert kept4 and "tail" not in text4


def test_strip_boilerplate_real_rulesets_spark(spark):
    rows = [(f"d{i}", src, _FX["cases"][src]["input"]["text"])
            for i, src in enumerate(["who", "cco", "icrc", "spor"])]
    rows.append(("d_skip", "cdc_diseases", "### Disease Directory\nx"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in
           strip_boilerplate(df).select("doc_id", "clean_text",
                                        "kept").collect()}
    for i, src in enumerate(["who", "cco", "icrc", "spor"]):
        assert out[f"d{i}"]["clean_text"] == \
            _FX["cases"][src]["expected"]["text"]
        assert out[f"d{i}"]["kept"]
    assert not out["d_skip"]["kept"]
    assert strip_boilerplate(df, drop_skipped=True).count() == 4


def test_strip_boilerplate_plumbs_title_col(spark):
    """title_col reaches title-dependent processors (ADVICE round 2):
    the Spark path must equal process_source(..., title=...)."""
    text = ("Noise header\nPrint\nShare\n"
            "Asthma is a chronic condition of the airways.\n"
            "More body text follows here.\n")
    title = "Asthma Care | AAFP"
    seq_text, seq_kept = process_source(text, "aafp", title=title)
    df = spark.createDataFrame([("d0", "aafp", text, title)],
                               ["doc_id", "source", "text", "title"])
    row = (strip_boilerplate(df, title_col="title")
           .select("clean_text", "kept").collect()[0])
    assert (row["clean_text"], row["kept"]) == (seq_text, seq_kept)
    # the aafp processor seeds output with the cleaned title head
    assert seq_kept and seq_text.startswith("Asthma Care")
    # without title_col the pUDF sees title="" — same as the sequential
    # default, NOT the titled output
    row2 = strip_boilerplate(df).select("clean_text").collect()[0]
    assert row2["clean_text"] == process_source(text, "aafp")[0]


# ---------------------------------------------------------------- X4 -----

def _ref_wikidoc_dedup(articles):
    """Reference semantics inline (scripts/clean.py:682-738): first-seen
    text per name; longest-first overview pass; subject = every 'overview'
    substring removed + strip; delete non-overview names with subject
    prefix; rename overview keys' articles to subject."""
    byname = {}
    for a in articles:
        byname.setdefault(a["name"], dict(a))
    byname = dict(sorted(byname.items(), key=lambda kv: len(kv[0]),
                         reverse=True))
    import re
    for name in list(byname):
        if name.endswith("overview"):
            subject = re.sub("overview", "", name).strip()
            byname[name]["name"] = subject
            for sub in list(byname):
                if sub.startswith(subject) and not sub.endswith("overview"):
                    del byname[sub]
    return sorted((v["name"], v["text"]) for v in byname.values())


def test_dedup_by_name_matches_reference_semantics(spark):
    articles = [
        {"i": 1, "name": "aortic stenosis overview", "text": "ov"},
        {"i": 2, "name": "aortic stenosis medical therapy", "text": "s1"},
        {"i": 3, "name": "aortic stenosis", "text": "s2"},
        {"i": 4, "name": "aortic stenosis medical therapy", "text": "dup"},
        {"i": 5, "name": "mitral overview", "text": "mo"},
        {"i": 6, "name": "mitral valve repair detail page", "text": "mv"},
        {"i": 7, "name": "unrelated article", "text": "ua"},
        # mid-token prefix (ADVICE round 2): subject 'alpha' must drop
        # 'alphabet history' — reference uses raw startswith, token
        # boundaries don't matter
        {"i": 8, "name": "alpha overview", "text": "ao"},
        {"i": 9, "name": "alphabet history", "text": "ah"},
        {"i": 10, "name": "alpine skiing", "text": "as"},
    ]
    expected = _ref_wikidoc_dedup(articles)
    df = spark.createDataFrame(articles)
    out = set_ops.dedup_by_name(df, "name", keep="first", order_col="i")
    got = sorted((r["name"], r["text"]) for r in out.collect())
    assert got == expected
    # multi-token suffix IS removed (ADVICE round 1): 'medical therapy'
    assert not any(n == "aortic stenosis medical therapy" for n, _ in got)
    # mid-token prefix removed (ADVICE round 2), non-prefix survives
    assert not any(n == "alphabet history" for n, _ in got)
    assert ("alpine skiing", "as") in got
    # first-seen text kept, not longest
    assert ("unrelated article", "ua") in got


def test_dedup_by_name_first_requires_order(spark):
    df = spark.createDataFrame([("a", "t")], ["name", "text"])
    with pytest.raises(ValueError):
        set_ops.dedup_by_name(df, "name", keep="first")


# ---------------------------------------------------- totality (hypothesis)

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(st.text(max_size=600), st.text(max_size=40))
def test_processors_total_on_arbitrary_text(text, title):
    """Every processor either returns a dict with a str text or None —
    never raises — on arbitrary unicode input."""
    for name, proc in source_rules.PROCESSORS.items():
        if name in ("mayo", "nice"):
            continue  # section-dict processors, text mode covered below
        out = proc(text, title=title, url="u")
        assert out is None or isinstance(out["text"], str), name
    for out in (source_rules.process_mayo(text, title=title),
                source_rules.process_nice(text, title=title)):
        assert out is None or isinstance(out["text"], str)
