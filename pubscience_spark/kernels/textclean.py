"""Text cleaning / normalization kernels (operator families B and C).

Re-derived semantics (NOT copied code) from the reference:

- mojibake fixed replacements + config regex replacements + encoding fix:
  ``clean/cleaner.py:35-39,193-203`` (C1)
- digit masking with the as-written (buggy-order) rules where the first
  rule consumes every digit so ``##``/``###`` are unreachable:
  ``clean/config/settings.yaml:5-9`` (C2)
- whitespace collapse ``\\s{2,} -> ' '``: ``clean/config/settings.yaml:9`` (C3)
- stateful sentence assembly: ``clean/cleaner.py:257-264,266-291`` (C4)
- markdown/guideline ``clean()`` composite and its pieces:
  ``scripts/clean.py:69-156`` (B3/B4/B5 family), including the as-written
  quirks (``\\no -> \\n-`` in normalize_lists) that pin byte semantics
- truncate state machine: ``scripts/clean.py:159-192`` (B1)
- prefix dedup key: ``scripts/clean.py:808-817`` (X2)
- medrxiv line clean: ``retrieve/medrxiv/clean_txt.py:7-16`` (C6)

Known divergence (documented per SURVEY.md §2.11): the reference calls
``ftfy.fix_encoding``; ftfy is not available here, so :func:`fix_encoding`
implements a deterministic latin-1→utf-8 double-encoding repair that covers
the mojibake classes present in the fixture corpus.
"""

from __future__ import annotations

import re

# --- C1: mojibake fixes (clean/cleaner.py:35-39) -------------------------

MOJIBAKE_FIXES = [
    ("Ã«", "ë"),  # Ã« -> ë
    ("Ã¯", "ï"),  # Ã¯ -> ï
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¶", "ö"),  # Ã¶ -> ö
]

# config regex replacements, order as written (clean/config/settings.yaml:5-9)
_REPLACE_RULES = [
    (re.compile(r"[0-9]"), "#"),
    (re.compile(r"[0-9]{2}"), "##"),     # unreachable after rule 1 — kept as-written
    (re.compile(r"[0-9]{3,}"), "###"),   # unreachable after rule 1 — kept as-written
    (re.compile(r"\s{2,}"), " "),
]

_MOJIBAKE_MARKERS = ("Ã", "Â", "â", "â")


def fix_encoding(text: str) -> str:
    """Deterministic stand-in for ``ftfy.fix_encoding`` (divergence noted).

    If the string looks like UTF-8 bytes mis-decoded as latin-1 (contains the
    classic lead sequences) and a latin-1 re-encode → utf-8 re-decode
    round-trips, return the repaired string; otherwise return unchanged.
    """
    if not any(m in text for m in _MOJIBAKE_MARKERS):
        return text
    try:
        repaired = text.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text
    return repaired


def clean_line(text: str, encoding_fix: bool = True) -> str:
    """C1+C2+C3 line cleaner (clean/cleaner.py:193-203)."""
    for bad, good in MOJIBAKE_FIXES:
        text = text.replace(bad, good)
    for rx, repl in _REPLACE_RULES:
        text = rx.sub(repl, text)
    if encoding_fix:
        text = fix_encoding(text)
    return text


# --- C4: stateful sentence assembly (clean/cleaner.py:257-291) -----------

_SENTENCE_DELIM = re.compile(r"[:;.]")
MAX_SENTENCE_LENGTH = 256_000
MIN_SENTENCE_CHAR_LENGTH = 1


def sentence_fold(lines: list[str], *, min_chars: int = MIN_SENTENCE_CHAR_LENGTH,
                  max_len: int = MAX_SENTENCE_LENGTH,
                  encoding_fix: bool = True) -> list[str]:
    """Per-document sentence assembly.

    The reference folds this state across a whole file stream
    (clean/cleaner.py:266-291); we scope the fold to a single document so
    the operator is order-independent across rows (SURVEY.md §3.1). A
    trailing partial sentence is dropped, matching the reference (the
    residual ``self.sentence`` is never flushed).
    """
    out: list[str] = []
    acc = ""
    for raw in lines:
        lp = clean_line(raw, encoding_fix=encoding_fix)
        if len(lp) < min_chars:
            continue
        acc += lp
        if len(_SENTENCE_DELIM.split(acc)) >= 2 or len(acc) > max_len:
            out.append(acc)
            acc = ""
    return out


# --- B3 composite: guideline/markdown clean (scripts/clean.py:69-156) -----

_RE_URL = re.compile(r"(https|http)?:\/\/(\w|\.|\/|\?|\=|\&|\%|\-)*\b", re.MULTILINE)


def remove_urls(text: str) -> str:
    # the pattern requires a literal "://" — a C substring probe skips the
    # regex scan on the (overwhelmingly common) url-free document
    if "://" not in text:
        return text
    return _RE_URL.sub("", text)


_RE_TAG = re.compile(r"<.*?>")
_RE_MDLINK = re.compile(r"\[.*?\]\(.*?\)")
_RE_BRACKET = re.compile(r"\[.*?\]")
_RE_NUMREF = re.compile(r"\[\d+\]")
_RE_MDLINK_KEEP = re.compile(r"\[(.*?)\]\((.*?)\)")


def remove_references(text: str) -> str:
    # every pattern needs a literal '<' or '[' — guard the regex scans
    # (byte-identical output: sub of an absent pattern is the identity)
    if "<" in text:
        text = _RE_TAG.sub("", text)
    if "[" in text:
        text = _RE_MDLINK.sub("", text)
        text = _RE_BRACKET.sub("", text)
        text = _RE_NUMREF.sub("", text)
        text = _RE_MDLINK_KEEP.sub(r"\1", text)
    return text


_RE_HASH_RUN = re.compile(r"\n#+")


_RE_HASH_CAP3 = re.compile(r"\n#{3,}")


def normalize_sections(text: str, max_hashes: int = 3) -> str:
    if "\n#" not in text:
        return text
    min_hashes = min(len(run) - 1 for run in _RE_HASH_RUN.findall(text))
    # both rules are literal-prefix rewrites; str.replace / a precompiled
    # pattern replace the per-call re.sub compile-cache lookups
    text = text.replace("\n" + "#" * min_hashes, "\n#")
    cap = _RE_HASH_CAP3 if max_hashes == 3 \
        else re.compile(r"\n#{%d,}" % max_hashes)
    text = cap.sub("\n" + "#" * max_hashes, text)
    return text


def normalize_lists(text: str) -> str:
    # as-written rule sequence, including the '\no' quirk
    # (scripts/clean.py:99-108). Every pattern is a regex LITERAL (the
    # only metachars are escaped), so str.replace is byte-identical and
    # skips six regex scans per document.
    text = text.replace("\n* ", "\n- ")
    text = text.replace("\n•", "\n-")
    text = text.replace("\no", "\n-")
    text = text.replace("\n", "\n-")
    text = text.replace("\n+ ", "\n- ")
    text = text.replace("\n•", "\n-")
    text = text.replace("• ", "- ")
    text = text.replace("* ", "- ")
    return text


_WEIRD_CHARS = ["◆", "•", "", "▪", "■", "□"]


def remove_weird_chars(text: str) -> str:
    for ch in _WEIRD_CHARS:
        text = text.replace(ch, "")
    text = text.replace("*-", "")       # literal patterns: replace ≡ re.sub
    text = text.replace("\n>", "\n")
    text = text.replace("**", "")
    text = text.replace("�", "")
    return text


_RE_NON_ALPHA_SP = re.compile(r"[^a-zA-Z ]")


_RE_HAS_ALPHA = re.compile(r"[a-zA-Z]")
_RE_BLANKISH = re.compile(r"\n\s*\n")
_RE_NL_RUN = re.compile(r"\n{2,}")


def normalize_newlines(text: str) -> str:
    kept = []
    for line in text.split("\n"):
        # original: strip [^a-zA-Z ], strip spaces, test empty — i.e.
        # "line has no ASCII letter"; a search() probe decides the same
        # predicate without building two throwaway strings per line
        if _RE_HAS_ALPHA.search(line) is None:
            continue
        kept.append(line)
    text = "\n".join(kept) + ("\n" if kept else "")
    text = _RE_BLANKISH.sub("\n", text)
    text = _RE_NL_RUN.sub("\n", text)
    text = text.replace("\n#", "\n\n#")
    return text


def clean_markdown(text: str) -> str:
    """B3 composite (scripts/clean.py:140-156)."""
    text = remove_urls(text)
    text = remove_references(text)
    text = normalize_lists(text)
    text = remove_weird_chars(text)
    text = normalize_sections(text)
    text = normalize_newlines(text)
    return text.strip()


# --- B1: truncate state machine (scripts/clean.py:159-192) ----------------


def truncate(text: str, starters: list[str] | None = None,
             removers: list[str] | None = None,
             stoppers: list[str] | None = None) -> str:
    starters = [s.lower() for s in starters] if starters else None
    removers = [s.lower() for s in removers] if removers else None
    stoppers = [s.lower() for s in stoppers] if stoppers else None
    out = ""
    started = False
    for line in text.split("\n"):
        low = line.lower()
        line_lower = low.strip()
        line_clean = low.replace("#", "").strip()
        line_an = _RE_NON_ALPHA_SP.sub("", low).strip()
        forms = [line, line_lower, line_clean, line_an]
        if starters and not started and any(
                f.startswith(s) for f in forms for s in starters):
            out = line + "\n"
            started = True
        elif removers and any(f.startswith(r) for f in forms for r in removers):
            continue
        elif stoppers and any(f.startswith(s) for f in forms for s in stoppers):
            break
        elif line_an == "":
            continue
        else:
            out += line + "\n"
    return out.strip()


# --- X2: prefix dedup key (scripts/clean.py:808-817) ----------------------

_RE_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")


def prefix_dedup_key(text: str, dedup_chars: int = 500) -> str:
    sample = text if len(text) < dedup_chars else text[:dedup_chars]
    return _RE_NON_ALNUM.sub("", sample.lower())


# --- C6: medrxiv-style line clean (retrieve/medrxiv/clean_txt.py:7-16) ----


def clean_lines_simple(text: str, min_chars: int = 20) -> str:
    """Whitespace collapse, digit-run masking, keep lines > ``min_chars``."""
    out = []
    for line in text.split("\n"):
        line = re.sub(r"\s{2,}", " ", line)
        line = re.sub(r"[0-9]+", "#", line)
        if len(line.strip()) > min_chars:
            out.append(line.strip())
    return "\n".join(out)
