"""Deterministic synthetic `pages` corpus (FIXTURES.md §1, seed 42).

Schema matches BASELINE.json input_hint exactly:
  (url string, warc_ts timestamp, html binary, text string, lang string)

Mixture per FIXTURES.md: (a) article HTML with nav/footer/references/toc
boilerplate, (b) PubMed-style XML, (c) minimal deterministic PDFs,
(d) noise rows (empty body, broken XML, 'aaa aaa' repetitions, mojibake).
Zipf-skewed domains exercise the salted url-hash repartition; ~5% exact
html duplicates under different urls (X1) and ~5% sharing the first 500
normalized chars (X2) are built in.

Pure function of (n_rows, seed) — safe to regenerate anywhere; no
Date/now dependence (warc_ts is a deterministic ramp from 2024-01-01).
"""

from __future__ import annotations

import datetime as _dt
import random
import zlib

DOMAINS = [f"host{i:02d}.example.org" for i in range(20)]

_WORDS = ("patient treatment clinical study results cardiac disease therapy "
          "diagnosis symptoms evidence trial cohort analysis outcome risk "
          "guideline recommendation screening prevention dose medication "
          "surgery recovery chronic acute infection immune response tissue "
          "blood pressure heart rate lung kidney liver brain nerve muscle "
          "protein gene cell receptor antibody vaccine placebo control").split()

_NL_WORDS = ("de patiënt behandeling klinische studie resultaten hart ziekte "
             "therapie diagnose symptomen bewijs onderzoek cohort analyse "
             "uitkomst risico richtlijn aanbeveling screening preventie dosis "
             "medicatie chirurgie herstel chronisch acuut infectie het een en "
             "van in is dat op niet wordt worden tussen onder deze").split()

_DE_WORDS = ("der patient behandlung klinische studie ergebnisse herz "
             "krankheit therapie diagnose symptome nachweis untersuchung "
             "kohorte analyse ergebnis risiko leitlinie empfehlung die das "
             "und ist nicht ein eine zu den von mit sich des auf für").split()


def _sentence(rng: random.Random, words, n=None) -> str:
    n = n or rng.randint(8, 18)
    toks = [rng.choice(words) for _ in range(n)]
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words, n_sent=None) -> str:
    n_sent = n_sent or rng.randint(2, 5)
    return " ".join(_sentence(rng, words) for _ in range(n_sent))


def _words_for(lang: str):
    return {"nl": _NL_WORDS, "de": _DE_WORDS}.get(lang, _WORDS)


def make_article_html(rng: random.Random, lang: str, seq: int) -> str:
    w = _words_for(lang)
    title = _sentence(rng, w, rng.randint(4, 8))[:-1]
    author = f"Author {rng.randint(1, 99)} Name{rng.randint(1, 30)}"
    nav_items = "".join(
        f'<li><a href="/s/{i}">{rng.choice(w)}</a></li>' for i in range(6))
    paras = "\n".join(
        f"<p>{_paragraph(rng, w)}</p>" for _ in range(rng.randint(3, 8)))
    list_items = "".join(
        f"<li>{_sentence(rng, w, rng.randint(5, 9))}</li>"
        for _ in range(rng.randint(2, 4)))
    refs = "".join(
        f"<li>Ref {i}: {_sentence(rng, w, 6)}</li>" for i in range(4))
    footer_links = "".join(
        f'<a href="/f/{i}">{rng.choice(w)}</a> ' for i in range(5))
    maybe_h3 = (f"<h3>{_sentence(rng, w, 3)[:-1]}</h3>\n"
                f"<p>{_paragraph(rng, w)}</p>" if rng.random() < 0.5 else "")
    return f"""<!DOCTYPE html>
<html><head><title>{title} | HostSite</title>
<meta name="author" content="{author}">
<meta name="description" content="{_sentence(rng, w, 12)}">
</head><body>
<nav class="main-menu"><ul>{nav_items}</ul></nav>
<div class="breadcrumb"><a href="/">Home</a> &gt; <a href="/c">Topics</a></div>
<article>
<h1>{title}</h1>
<p>{_paragraph(rng, w, 3)}</p>
<h2>{_sentence(rng, w, 3)[:-1]}</h2>
{paras}
<ul>{list_items}</ul>
{maybe_h3}
<h2>References</h2>
<ol>{refs}</ol>
</article>
<div class="sidebar related"><ul>{nav_items}</ul></div>
<footer>{footer_links}<p>© 2024 HostSite doc {seq}</p></footer>
</body></html>"""


def make_pubmed_xml(rng: random.Random, lang: str, seq: int) -> str:
    w = _words_for(lang)
    pmid = 10_000_000 + seq
    title = _sentence(rng, w, rng.randint(6, 12))[:-1]
    abstract = " ".join(_sentence(rng, w) for _ in range(rng.randint(3, 6)))
    year = 1990 + (seq % 35)
    month = 1 + (seq % 12)
    mesh = "".join(
        f'<MeshHeading><DescriptorName UI="D{seq % 999:06d}{i}">'
        f"{rng.choice(w).capitalize()} {rng.choice(w)}</DescriptorName></MeshHeading>"
        for i in range(rng.randint(1, 4)))
    pmc = (f'<ArticleId IdType="pmc">PMC{seq}</ArticleId>'
           if rng.random() < 0.4 else "")
    body = ""
    if rng.random() < 0.5:
        paras = "".join(
            f"<p>{_paragraph(rng, w)} <xref rid=\"b{i}\">[{i}]</xref>"
            f"<ext-link xlink:href=\"http://x/{i}\">link</ext-link></p>"
            for i in range(rng.randint(2, 6)))
        body = f"<body>{paras}</body>"
    copyright_block = ("<CopyrightInformation>© publisher"
                       "</CopyrightInformation>" if rng.random() < 0.3 else "")
    return f"""<?xml version="1.0"?>
<PubmedArticle><MedlineCitation>
<PMID>{pmid}</PMID>
<Article><ArticleTitle>{title}</ArticleTitle>
<Abstract><AbstractText>{abstract}</AbstractText>{copyright_block}</Abstract>
<Language>{'eng' if lang == 'en' else lang}</Language>
<Journal><JournalIssue><PubDate><Year>{year}</Year><Month>{month}</Month></PubDate></JournalIssue></Journal>
</Article>
<MeshHeadingList>{mesh}</MeshHeadingList>
</MedlineCitation>
<PubmedData><ArticleIdList>{pmc}</ArticleIdList></PubmedData>
{body}
</PubmedArticle>"""


def make_pdf(rng: random.Random, lang: str, seq: int) -> bytes:
    """Minimal valid-enough PDF: one content stream per page, Tj text ops."""
    w = _words_for(lang)
    n_pages = rng.randint(3, 6)
    pages_text: list[str] = []
    pages_text.append(f"{seq}\nIntroduction chapter\n" +
                      " ".join(_sentence(rng, w) for _ in range(8)))
    for _ in range(n_pages - 2):
        pages_text.append(" ".join(_sentence(rng, w) for _ in range(9)))
    if rng.random() < 0.5:
        pages_text.append("Summary\n" +
                          " ".join(_sentence(rng, w) for _ in range(8)))
    else:
        pages_text.append("References\n" +
                          "\n".join(f"{i}. {_sentence(rng, w, 6)}"
                                    for i in range(8)))
    scanned = rng.random() < 0.08
    producer = "SynthScanner Image 1.0" if scanned else "SynthWriter 1.0"
    objs: list[bytes] = []
    for pt in pages_text:
        safe = (pt.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)").replace("\n", r"\n"))
        use_flate = rng.random() < 0.5
        content = f"BT /F1 12 Tf ({safe}) Tj ET".encode("latin-1", "replace")
        if use_flate:
            comp = zlib.compress(content)
            objs.append(b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
                        % (len(comp), comp))
        else:
            objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                        % (len(content), content))
    page_objs = b"\n".join(b"obj\n/Type /Page\n%s\nendobj" % o for o in objs)
    return (b"%PDF-1.4\n/Producer (" + producer.encode() + b")\n"
            + page_objs + b"\n%%EOF\n")


_MOJIBAKE = "CafÃ© rÃ©sumÃ© patiÃ«nt studiÃ«n Ã¶ver"


def make_noise(rng: random.Random, kind: int, seq: int) -> tuple[bytes, str]:
    if kind == 0:   # empty body
        return b"<html><head><title>empty</title></head><body></body></html>", ""
    if kind == 4:   # RTF document (H8 route)
        paras = r"\par ".join(_sentence(rng, _WORDS) for _ in range(3))
        doc = (r"{\rtf1\ansi{\fonttbl{\f0 Arial;}}\f0\fs20 " + paras
               + r"\par}")
        return doc.encode("latin-1", "replace"), ""
    if kind == 1:   # broken XML (regex-repair path)
        return (f"<?xml version=\"1.0\"?><PubmedArticle><PMID>{seq}</PMID>"
                f"<ArticleTitle>Broken & unclosed".encode(), "")
    if kind == 2:   # spurious repetitions
        base = "aaa " * 40 + _sentence(rng, _WORDS, 12)
        return f"<html><body><p>{base}</p></body></html>".encode(), base
    # mojibake page (latin-1 bytes of utf-8 text)
    para = f"{_MOJIBAKE} {_paragraph(rng, _WORDS, 2)}"
    html = f"<html><body><p>{para}</p></body></html>"
    return html.encode("utf-8").decode("utf-8").encode("latin-1", "replace"), para


_EPOCH = _dt.datetime(2024, 1, 1)


def generate_pages(n_rows: int, seed: int = 42) -> list[dict]:
    """Deterministic list of page rows (schema = input_hint)."""
    rng = random.Random(seed)
    # zipf-ish domain weights: w_i ∝ 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(len(DOMAINS))]
    rows: list[dict] = []
    for i in range(n_rows):
        domain = rng.choices(DOMAINS, weights=weights, k=1)[0]
        lang = rng.choices(["en", "nl", "de", "unknown"],
                           weights=[0.6, 0.2, 0.15, 0.05], k=1)[0]
        # ~8% of lang labels are deliberately wrong (detector-gate fodder)
        label = lang
        if rng.random() < 0.08:
            label = rng.choice(["en", "nl", "de", "unknown"])
        roll = rng.random()
        text = ""
        if roll < 0.55:
            html = make_article_html(rng, lang, i).encode("utf-8")
            kind = "article"
        elif roll < 0.75:
            html = make_pubmed_xml(rng, lang, i).encode("utf-8")
            kind = "pubmed"
        elif roll < 0.87:
            html = make_pdf(rng, lang, i)
            kind = "pdf"
        else:
            html, text = make_noise(rng, rng.randint(0, 4), i)
            kind = "noise"
        url = f"https://{domain}/{kind}/{i:08d}"
        rows.append({
            "url": url,
            "warc_ts": _EPOCH + _dt.timedelta(seconds=17 * i),
            "html": html,
            "text": text,
            "lang": label,
        })
    # ~5% exact html duplicates under different urls (X1)
    n_dup = n_rows // 20
    for j in range(n_dup):
        src = rows[rng.randrange(len(rows))]
        domain = rng.choices(DOMAINS, weights=weights, k=1)[0]
        rows.append({
            "url": f"https://{domain}/dup/{j:08d}",
            "warc_ts": _EPOCH + _dt.timedelta(seconds=17 * (n_rows + j)),
            "html": src["html"],
            "text": src["text"],
            "lang": src["lang"],
        })
    # ~5% near-duplicates sharing the extraction prefix (X2): same article,
    # different trailing paragraph
    for j in range(n_dup):
        idx = rng.randrange(n_rows)
        src = rows[idx]
        try:
            base = src["html"].decode("utf-8")
        except UnicodeDecodeError:
            continue
        if "</article>" not in base:
            continue
        extra = f"<p>{_paragraph(rng, _WORDS, 2)}</p></article>"
        variant = base.replace("</article>", extra)
        domain = rng.choices(DOMAINS, weights=weights, k=1)[0]
        rows.append({
            "url": f"https://{domain}/near/{j:08d}",
            "warc_ts": _EPOCH + _dt.timedelta(seconds=17 * (2 * n_rows + j)),
            "html": variant.encode("utf-8"),
            "text": src["text"],
            "lang": src["lang"],
        })
    return rows


def _to_table(rows: list[dict]):
    import pyarrow as pa
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def write_pages_parquet(path: str, n_rows: int, seed: int = 42,
                        *, row_group_size: int = 4096,
                        n_shards: int = 1) -> int:
    """Write the corpus as parquet; returns row count.

    ``n_shards > 1`` writes a directory of part files — WARC-segment-shaped
    input. Small row groups + many shards keep the scan *splittable*: a
    single giant row group serializes the whole scan+shuffle into one task
    regardless of cluster size (measured: it halves 8→32-core scaling)."""
    import os

    import pyarrow.parquet as pq
    rows = generate_pages(n_rows, seed)
    if n_shards <= 1:
        pq.write_table(_to_table(rows), path, row_group_size=row_group_size)
        return len(rows)
    os.makedirs(path, exist_ok=True)
    per = (len(rows) + n_shards - 1) // n_shards
    for s in range(n_shards):
        chunk = rows[s * per:(s + 1) * per]
        if not chunk:
            break
        pq.write_table(_to_table(chunk),
                       os.path.join(path, f"part-{s:05d}.parquet"),
                       row_group_size=row_group_size)
    return len(rows)
