"""Unit fixtures for the cleaning kernels (FIXTURES.md §4).

Golden outputs follow the reference semantics as re-derived in SURVEY.md
§2.8/§2.11, including the as-written quirks that pin byte behavior.
"""

from pubscience_spark.kernels import textclean as tc


def test_mojibake_fixes():
    # clean/cleaner.py:35-39 fixed table
    assert tc.clean_line("CafÃ©") == "Café"
    assert tc.clean_line("patiÃ«nt Ã¶ver") == "patiënt över"


def test_digit_masking_as_written():
    # first rule consumes every digit → '##'/'###' rules unreachable
    # (clean/config/settings.yaml:5-9, SURVEY.md §2.11)
    assert tc.clean_line("a1b22c333") == "a#b##c###"
    assert tc.clean_line("2024-01-02") == "####-##-##"


def test_whitespace_collapse():
    assert tc.clean_line("a  b\t\tc") == "a b c"


def test_fix_encoding_roundtrip():
    broken = "CafÃ©"  # utf-8 bytes of 'Café' read as latin-1
    assert tc.fix_encoding(broken) == "Café"
    assert tc.fix_encoding("plain text") == "plain text"


def test_sentence_fold():
    # delimiters [:;.] — emit once ≥2 splits; trailing partial dropped
    # (clean/cleaner.py:257-291)
    out = tc.sentence_fold(["abc", "def.", "ghi: jkl", "tail-no-delim"])
    assert out == ["abcdef.", "ghi: jkl"]


def test_sentence_fold_max_len():
    out = tc.sentence_fold(["x" * 10, "y" * 10], max_len=15)
    assert out == ["x" * 10 + "y" * 10]


def test_remove_urls():
    assert tc.remove_urls("see http://x.com/a?b=1 now") == "see  now"
    assert tc.remove_urls("https://a-b.c/d") == ""


def test_remove_references():
    assert tc.remove_references("a [12] b") == "a  b"
    assert tc.remove_references("[text](http://x)") == ""
    assert tc.remove_references("<b>bold</b>") == "bold"


def test_normalize_lists_quirks():
    # '\n* ' → '\n- ' plus the as-written '\no' quirk (scripts/clean.py:99-108)
    assert tc.normalize_lists("\n* item") == "\n- item"
    assert tc.normalize_lists("\noops") == "\n-ops"
    assert tc.normalize_lists("• x") == "- x"


def test_normalize_sections():
    txt = "\n## A\ntext\n#### B"
    out = tc.normalize_sections(txt)
    # min run (2) → 1 hash; 4 hashes → capped at 3
    assert "\n# A" in out and "\n### B" in out


def test_normalize_newlines_drops_nonalpha_lines():
    out = tc.normalize_newlines("keep me\n1234\n---\nalso keep\n")
    assert "keep me" in out and "also keep" in out
    assert "1234" not in out and "---" not in out


def test_clean_markdown_composite():
    raw = "# Title\n\nSee http://x.com/a now\n* item\n[3] gone\n\n\n## Sub\nbody"
    out = tc.clean_markdown(raw)
    assert out.startswith("# Title")
    assert "http" not in out and "[3]" not in out
    assert "- item" in out and "\n\n# Sub" in out


def test_truncate_state_machine():
    # scripts/clean.py:159-192
    text = "intro\nRecommendations\nbody A\n=== sep\nReferences\ntail"
    out = tc.truncate(text, starters=["recommendation"],
                      removers=["==="], stoppers=["references"])
    assert out == "Recommendations\nbody A"


def test_truncate_no_starter_keeps_head():
    out = tc.truncate("head\nbody", starters=["nomatch"], stoppers=None)
    assert out == "head\nbody"


def test_prefix_dedup_key():
    # scripts/clean.py:808-817: first 500 chars → lower → strip non-alnum
    assert tc.prefix_dedup_key("Ab, c!1") == "abc1"
    long = "x" * 600
    assert len(tc.prefix_dedup_key(long)) == 500


def test_clean_lines_simple():
    out = tc.clean_lines_simple(
        "a line that is long enough 123 to keep\nshort\n")
    assert out == "a line that is long enough # to keep"
