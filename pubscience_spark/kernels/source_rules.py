"""B2: the reference's per-source guideline processors, full rule content.

The reference ships one processor function per scraped source
(``scripts/clean.py:200-779``, registry ``:784-805``). Round 1 shipped the
operator *shape* with 3 generic profiles; this module ports the actual rule
content of all 16 registry processors. The rule literals (starters /
removers / stoppers / regex substitutions) ARE the byte-identity spec, so
they match the reference exactly; the surrounding structure is original —
every processor is decomposed into ``truncate`` (kernels.textclean) + a
per-source line fold + a substitution list + the shared ``clean_markdown``
composite, instead of the reference's 16 standalone imperative functions.

As-written reference quirks preserved deliberately (each noted inline):
- aafp: an empty line is dropped by the ``all(len(w)==1 ...)`` rule
  (``all([]) is True``);
- cdc: the all-caps-heading branch tests ``isupper`` on an already
  lowercased string, so it only fires for letterless ``#`` lines;
- cma / icrc: a substitution is applied to the pre-fold text and then
  discarded (dead code in the reference — we simply omit it);
- idsa: the dot index found in the ``#``-stripped lowercased line is used
  to slice the ORIGINAL line;
- wikidoc: ``Redirect to.*`` without DOTALL cuts to end-of-LINE only,
  despite the reference comment claiming end-of-text.

Every processor returns ``None`` to mean "drop this document" (the
reference's skip conditions) — the Spark operator turns that into an
empty-string ``clean_text`` plus ``kept = false``.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from . import textclean

_clean = textclean.clean_markdown
_truncate = textclean.truncate


def _fold(text: str, keep: Callable[[str], Optional[str]],
          head: str = "") -> str:
    """Shared line fold: ``keep`` returns the (possibly rewritten) line or
    None to drop it. ``head`` seeds the output (title prefix pattern)."""
    out = head
    for line in text.split("\n"):
        repl = keep(line)
        if repl is not None:
            out += repl + "\n"
    return out


def _min_words(line: str, n: int = 3) -> bool:
    return len(line.strip().split()) < n


_RE_NON_ALPHA = re.compile(r"[^a-zA-Z]")
_RE_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")


# ----------------------------------------------------------------- aafp --

def process_aafp(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:200-233 — AAFP guideline processor."""
    text = text.strip()
    if "The AAFP supports" in text:
        support = [ln for ln in text.split("\n")
                   if ln.startswith("The AAFP supports")]
        if support and support[0].strip().endswith("on this topic."):
            return None
    title = title.strip().replace(" | AAFP", "").replace(
        " - Choosing Wisely", "")
    text = _truncate(
        text,
        starters=["key recommendations",
                  "clinical preventive service recommendation",
                  "recommendation"],
        removers=["===", "---", "**[", "[", "http"],
        stoppers=["references", "related content",
                  "more about choosing wisely",
                  "more about practice guidelines", "*keyboard\\_tab*",
                  "sources", "*these recommendations are provided only",
                  "*these guidelines are provided only"])
    title_low = title.lower()

    def keep(line: str):
        lc = line.lower().replace("#", "").strip()
        if all(len(w) == 1 for w in lc.split()):   # empty line → dropped
            return None
        if title_low.startswith(lc):
            return None
        if "|" in lc or "http" in lc:
            return None
        return line

    return {"title": title, "url": url,
            "text": _clean(_fold(text, keep, head=title + "\n\n"))}


# ------------------------------------------------------------------ cco --

def process_cco(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:239-263 — CCO guideline processor."""
    text = _truncate(
        text.strip(),
        starters=["QUESTIONS", "INTRODUCTION", "INTENDED PURPOSE",
                  "GUIDELINE OBJECTIVES"],
        removers=["These guidelines recommendations have been endorsed",
                  "This report is copyrighted by",
                  "An assessment conducted in ",
                  "Care has been taken in the preparation ",
                  "This is a quick reference guide"])

    def keep(line: str):
        if line.strip().startswith("•"):
            return "- " + line[1:].strip()
        if _min_words(line):
            return None
        if _RE_NON_ALPHA.sub("", line).strip() == "":
            return None
        return re.sub(r"^o ", "- ", line)

    return {"title": title, "url": url, "text": _clean(_fold(text, keep))}


# --------------------------------------------------------- cdc_diseases --

def process_cdc_diseases(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:269-288 — CDC travel-disease pages. NB the reference
    does NOT run the generic clean() here; neither do we."""
    if text.strip().split("\n")[0].strip() == "### Disease Directory":
        return None
    removers = ["insurance", " | CDC"]
    body = _truncate(text.strip(), starters=["###"], removers=removers,
                     stoppers=["More Information", "After Travel"])
    parsed_title = body.split("\n")[0][3:].strip()

    def keep(line: str):
        if _min_words(line):
            return None
        if any(s in line for s in removers):
            return None
        line = re.sub(r"\+ ", "- ", line)
        line = re.sub(r"\*\*", "", line)
        return re.sub(r"\*", "- ", line)

    return {"title": parsed_title, "url": url,
            "text": _fold(body, keep, head=title + "\n\n")}


# ------------------------------------------------------------------ cdc --

def process_cdc(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:291-311 — CDC MMWR-style documents."""
    out = ""
    for line in text.strip().split("\n"):
        lc = re.sub(r"[•#]", "", line.lower()).strip()
        la = _RE_NON_ALPHA.sub("", line.lower()).strip()
        if lc == "":
            continue
        if line.startswith("q "):
            out += "- " + line[2:].strip() + "\n"
        elif la.startswith("acknowledg"):
            break
        elif line.startswith("#") and all(c.isupper() for c in la):
            # dead-unless-letterless branch: `la` is lowercased (as-written)
            out += " ".join(w.capitalize() for w in line.split(" ")) + "\n"
        else:
            out += line.strip() + "\n"
    return {"title": title, "url": url,
            "text": re.sub(r"\n# -", "\n#", _clean(out))}


# ------------------------------------------------------------------ cma --

def process_cma(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:317-353 — CMA guidelines with inline table removal."""
    text = text.strip()
    title = text.split("\n")[0]
    text = _truncate(
        text,
        starters=["key information", "### key information", "### 1. what",
                  "### abstract", "### what", "overview", "introduction",
                  "preamble"],
        removers=["refer to", "===", "---", "* [", "[", "![", "|", "table",
                  "figure", "+ [", "footnote"],
        stoppers=["### selected references", "selected references",
                  "### references", "### authors’ statement",
                  "references", "appendix", "acknowledgments",
                  "acknowledgements", "report a problem",
                  "list of abbreviations", "additional tables",
                  "additional resources"])
    out = title + "\n\n"
    in_table = False
    for line in text.split("\n"):
        lc = line.strip().lower()
        if lc.startswith("table") or lc.startswith("figure"):
            in_table = True
        elif "|" in line:
            continue
        elif title in line:
            continue
        elif in_table:
            if line == "":
                in_table = False
        else:
            out += line + "\n"
    return {"title": title, "url": url, "text": _clean(out)}


# ------------------------------------------------------------- cma_pdfs --

def process_cma_pdfs(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:356-373 — CMA PDF bodies."""
    text = _truncate(text.strip(),
                     stoppers=["acknowledg", "disclaimer",
                               "conflict of interest", "funding"])

    def keep(line: str):
        lc = re.sub(r"[#.]", "", line).strip().lower()
        if lc == "•" or lc == "":
            return None
        if lc.isdigit():
            return None
        m = re.match(r"^\d+\.\s", line)
        if m:
            return "- " + line[m.end():]
        return line

    return {"title": title, "url": url, "text": _clean(_fold(text, keep))}


# ------------------------------------------------------------------ cps --

def process_cps(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:379-398 — CPS position statements."""
    removers = ["|", "Figure",
                "The Canadian Paediatric Society gives permission",
                "Keywords:", "Key words:"]
    text = _truncate(text.strip(), starters=["### Abstract"],
                     removers=removers,
                     stoppers=["Acknowledgements", "Selected resources",
                               "Current:  About CPS position"])

    def keep(line: str):
        if _min_words(line):
            return None
        if any(s in line for s in removers):
            return None
        return line.strip()

    cleaned = _clean(_fold(text, keep))
    if len(cleaned.split("\n")) < 3:
        return None
    return {"title": title, "url": url, "text": cleaned}


# ---------------------------------------------------------------- drugs --

def process_drugs(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:400-415 — drugs.com pages."""
    title = title.split(" - ")[0].strip()
    text = "\n".join(ln for ln in text.strip().split("\n") if "|" not in ln)
    text = _truncate(
        text,
        removers=["[Medical", "===", "---", "###", "* [", "[",
                  "Always consult your healthcare provider",
                  "Frequently asked", "More about", "Further information"])
    text = re.sub(r"\*", "-", text)
    text = re.sub(r"\[|\]", "", text)
    text = re.sub(r"\([^\)]+\)", "", text).strip()
    text = re.sub(r"--", "", text)
    return {"title": title, "url": url, "text": _clean(text)}


# ------------------------------------------------------------------- gc --

def process_gc(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:421-453 — Guideline Central summaries."""
    title, text = title.strip(), text.strip()
    if title == "Title":
        title, text = "", text[6:]
    for rx in (r'\["', r'"\]'):
        title = re.sub(rx, "", title)
        text = re.sub(rx, "", text)
    text = _truncate(text, starters=["Document Objectives"],
                     removers=["Publication Date", "(c)", "www", "http"],
                     stoppers=["Disclaimer", "Recommendation Grading",
                               "Source Citation"])

    def keep(line: str):
        line = line.strip()
        la = _RE_NON_ALNUM.sub("", line).strip()
        if line == "(c)":
            return None
        if la.isupper() and len(la) > 2:
            return "\n# " + line
        return line

    cleaned = _clean(_fold(text, keep))
    if len([ln for ln in cleaned.split("\n")
            if len(ln.split(" ")) > 10]) < 3:
        return None
    return {"title": title, "url": url, "text": cleaned}


# ----------------------------------------------------------------- icrc --

def process_icrc(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:459-476 — ICRC manuals."""
    text = _truncate(text, stoppers=["acknowledgements", "acknowledgments",
                                     "contacts"])

    def keep(line: str):
        if _RE_NON_ALPHA.sub("", line).strip() == "":
            return None
        if re.match(r"^\d+[a-zA-Z]+", line):
            return "- " + line[1:].strip()
        return line

    return {"title": title, "url": url,
            "text": _clean(_fold(text, keep)).strip()}


# ----------------------------------------------------------------- idsa --

def process_idsa(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:482-512 — IDSA practice guidelines."""
    text = text.strip()
    title = text.split("\n")[0]
    if "This new guideline is currently in development" in text:
        return None
    text = _truncate(
        text, starters=["introduction", "abstract"],
        removers=["---", "===", "published", "[!",
                  "appropriate use criteria"],
        stoppers=["references", "for more information",
                  "to view the full version", "disclaimer", "supplementary",
                  "acknowledgments", "notes", "to access a more user"])
    title_low = title.lower()

    def keep(line: str):
        lc = line.lower().replace("#", "").strip()
        if lc.split(".")[0].isdigit():
            # the index from the stripped line slices the ORIGINAL line
            return "- " + line[lc.find(".") + 1:].strip()
        if title_low.startswith(lc):
            return None
        return line

    out = _fold(text, keep, head=title + "\n\n")
    out = re.sub(r" ,", "", out)
    out = re.sub(r" \.", ".", out)
    out = re.sub(r"\*", "", out)
    out = re.sub(r" \)", "", out)
    out = re.sub(r"-\. ", "- ", out)
    cleaned = _clean(out)
    if len(cleaned.split("\n")) < 5:
        return None
    return {"title": title, "url": url, "text": cleaned}


# ---------------------------------------------------------------- magic --

_MAGIC_SECTION_REMOVERS = [
    "members", "disclaimer", "disclosure", "funding", "acknowledgements",
    "acknowledgments", "publisher", "date of publication", "authorship",
    "publication approval", "isbn", "declarations of interest",
    "external reviewers", "contributors", "previous versions in magicapp",
    "references"]


def process_magic(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:518-577 — MAGICapp chunk-loaded guidelines."""
    body = ""
    for chunk in text.strip().split("Loading Data...\n"):
        if not any(x in chunk for x in ("Write remark here",
                                        "Write header here")):
            body += chunk + "\n\n"

    # numbered-header reshaping (reference starts at sentences[i+1], so the
    # very first line is skipped — as-written)
    lines = body.split("\n")
    out = ""
    if len(lines) < 3:                 # reference would IndexError; guard
        out = body
    else:
        i = 0
        while i < len(lines):
            if i == len(lines) - 3:
                out += "\n".join(lines[i:])
                break
            prev, cur, nxt = (lines[i].strip(), lines[i + 1].strip(),
                              lines[i + 2].strip())
            if prev.isdigit() and not cur.isdigit() and nxt.isdigit():
                out += f"# {cur}\n"
                i += 2
            else:
                out += cur + "\n"
                i += 1

    text = _truncate(out, starters=["abstract", "introduction"],
                     removers=["updates", "===", "---", "![",
                               "please visit the", "< less", "more >",
                               "write general section text",
                               "loading data...", "view section text",
                               "about this guideline"])

    def keep(line: str):
        lc = line.lower().replace("#", "").strip()
        if lc == "" or "|" in lc:
            return None
        return line.strip()

    out = _fold(text, keep)
    out = re.sub(r"\n+", "\n", out)
    out = re.sub(r"\n\*\*", "\n## ", out)
    out = re.sub(r"\*", "", out)
    out = re.sub(r"\n\(", "(", out)
    out = re.sub(r"\n\)", ")", out)
    out = re.sub(r"\n;", ";", out)
    out = out.strip()

    kept_sections = ""
    for section in out.split("\n\n"):
        header = re.sub(r"[^a-zA-Z ]", "",
                        section.split("\n")[0].lower()).strip()
        if any(header.startswith(x) for x in _MAGIC_SECTION_REMOVERS):
            continue
        kept_sections += section + "\n\n"

    def keep2(line: str):
        lc = re.sub(r"[^a-zA-Z0-9 ]", "", line.lower()).strip()
        if line.startswith("!") or lc.strip().isdigit():
            return None
        if line.startswith("#") and len(line.split(" ")) > 7:
            return line.replace("#", "").strip()
        return line

    return {"title": title, "url": url,
            "text": _clean(_fold(kept_sections, keep2))}


# ----------------------------------------------------------------- mayo --

def concatenate_sections(sections: dict[str, str]) -> str:
    """scripts/clean.py:58-66 — '# name\\n\\nbody' concat (no separator
    between sections, as-written)."""
    return "".join(f"# {name}\n\n{body}" for name, body in sections.items())


def process_mayo(text: str, title: str = "", url: str | None = None,
                 sections: dict[str, str] | None = None):
    """scripts/clean.py:583-587 — Mayo Clinic pages. Column mode takes the
    pre-concatenated text; dict mode reproduces the section concat."""
    if sections is not None:
        text = concatenate_sections(sections)
    cleaned = "\n".join(ln for ln in _clean(text).split("\n")
                        if "MayoClinic" not in ln)
    return {"title": title, "url": url, "text": cleaned}


# ----------------------------------------------------------------- nice --

_NICE_EXCLUDERS = ["advice", "committee", "implementation", "team", "update"]


def process_nice(text: str, title: str = "", url: str | None = None,
                 sections: dict[str, str] | None = None,
                 overview: str = ""):
    """scripts/clean.py:593-616 — NICE guidance. Column mode re-derives the
    section map from '# ' headings (the concat format is its own inverse
    when bodies contain no '# ' lines — documented adaptation)."""
    if sections is None:
        # the concat format has NO separator between a body and the next
        # '# name' (as-written), so headers can start mid-line — split on
        # the '# name\n\n' marker anywhere, not per-line
        parts = re.split(r"# (.+?)\n\n", text)
        sections = {parts[i]: parts[i + 1]
                    for i in range(1, len(parts) - 1, 2)}
    kept = {}
    for sec_name, sec in sections.items():
        low = sec_name.lower()
        if "discussion" in low:
            kept[sec_name] = sec
        if not any(x in low for x in _NICE_EXCLUDERS):
            kept[sec_name] = sec
    if not kept:
        return None
    out = ""
    if title:
        out += title + "\n\n"
    if overview:
        out += overview + "\n\n"
    out += _clean(concatenate_sections(kept))
    return {"title": title, "url": url, "text": out}


# ------------------------------------------------------------------ rch --

def process_rch(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:622-628 — RCH passthrough (field rename only)."""
    return {"title": title, "url": url, "text": text}


# ----------------------------------------------------------------- spor --

def process_spor(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:634-647 — SPOR reports."""
    text = _truncate(text.strip(), stoppers=["CONFLICT OF INTEREST"])
    text = re.sub(r"\|", "", text)
    text = re.sub(r"---", "\n", text)

    def keep(line: str):
        return None if _min_words(line) else line.strip()

    return {"title": title, "url": url, "text": _clean(_fold(text, keep))}


# ------------------------------------------------------------------ who --

def process_who(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:653-669 — WHO guidelines."""
    text = _truncate(text.strip(), starters=["Introduction "],
                     removers=["|", "Under the terms of this licence"],
                     stoppers=["Acknowl"])

    def keep(line: str):
        if _min_words(line):
            return None
        return re.sub(r"• ", "- ", line).strip()

    out = _fold(text, keep)
    out = re.sub("", "", out)   # private-use bullet (as in reference)
    return {"title": title, "url": url, "text": _clean(out)}


# -------------------------------------------------------------- wikidoc --

def process_wikidoc(text: str, title: str = "", url: str | None = None):
    """scripts/clean.py:739-779 — WikiDoc articles (post name-dedup)."""
    text = _truncate(
        text,
        removers=["Editor", "Associate Editor", "Media:", "Click here",
                  "For patient information click here",
                  "How to edit trial information", "Template:",
                  "To go back to the main page"],
        stoppers=["external links"])
    out = ""
    in_disclaimer = False
    for line in text.split("\n"):
        if line.startswith("Any recommendations found on these pages"):
            in_disclaimer = True
        elif line.startswith("#"):
            in_disclaimer = False
            out += line + "\n"
        elif line.startswith("CLASS"):
            continue
        elif not in_disclaimer:
            out += line + "\n"
    out = re.sub(r"Redirect to.*", "", out)   # end-of-line cut (as-written)
    cleaned = _clean(out)
    if len([ln for ln in cleaned.split("\n")
            if len(ln.split(" ")) > 10]) < 3:
        return None
    return {"title": title, "url": url, "text": cleaned}


# ------------------------------------------------------------- registry --

PROCESSORS: dict[str, Callable[..., Optional[dict]]] = {
    "aafp": process_aafp,
    "cco": process_cco,
    "cdc": process_cdc,
    "cdc_diseases": process_cdc_diseases,
    "cma": process_cma,
    "cma_pdfs": process_cma_pdfs,
    "cps": process_cps,
    "drugs": process_drugs,
    "gc": process_gc,
    "icrc": process_icrc,
    "idsa": process_idsa,
    "magic": process_magic,
    "mayo": process_mayo,
    "nice": process_nice,
    "rch": process_rch,
    "spor": process_spor,
    "who": process_who,
    "wikidoc": process_wikidoc,
}
