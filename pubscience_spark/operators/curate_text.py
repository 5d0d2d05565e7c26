"""Web-scale training-corpus text curation operators.

Two operators every LLM-pretraining pipeline needs that the reference
lacks (its quality gate is length + language + term filters,
``identify/identify.py``; SURVEY §2 LLM-ops tier):

- :func:`gopher_repetition` — the Gopher/MassiveText repetition rules
  (Rae et al. 2021, table A1): duplicate line/paragraph fractions,
  duplicate line/paragraph CHARACTER fractions, top-n-gram character
  fraction. All computed with native higher-order array functions on a
  per-row basis — no shuffle, no Python, whole-stage codegen.
- :func:`mark_contaminated` — n-gram test-set decontamination (the
  GPT-3/LLaMA approach): a training doc is contaminated when it shares
  any word n-gram (default 13, the GPT-3 choice) with an evaluation
  document. Slim ``(id, ngram-hash)`` explode on both sides, equi-join
  on the 64-bit hash, distinct ids back — the join key is uniform by
  construction, candidates only, no text moves through the shuffle.

Scale notes: ``gopher_repetition`` is embarrassingly parallel (pure
projection). ``mark_contaminated`` shuffles ``total_words - n + 1``
slim hash rows per side; the eval side is typically tiny (benchmarks) —
pass ``broadcast_eval=True`` to skip the shuffle entirely and map-side
join the eval hash set.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# badword-gate tokenization: collapse any non-alphanumeric run to one
# space, both Python-side (list normalization) and expression-side
_RE_NONALNUM = re.compile(r"[^a-z0-9]+")


def _RE_NONALNUM_EXPR(col):
    return F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")


def _ws_trim(col):
    """Full-whitespace trim (``F.trim`` strips SPACES only — a leading
    tab or trailing \\r would survive it and corrupt word/line counts;
    round-5 review)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def _words(col):
    t = _ws_trim(F.lower(col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))


def _lines(col):
    # non-empty whitespace-trimmed lines; \r?\n so CRLF text (which the
    # WARC path feeds directly) splits identically to LF text
    return F.filter(
        F.transform(F.split(col, r"\r?\n"), lambda s: _ws_trim(s)),
        lambda s: F.length(s) > 0)


def _paragraphs(col):
    return F.filter(
        F.transform(F.split(col, r"\n\s*\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0)


def _dup_fraction(arr):
    """(count - distinct count) / count — fraction of elements that are
    repeats of an earlier element (Gopher's duplicate-fraction shape)."""
    n = F.size(arr)
    return F.when(n > 0,
                  (n - F.size(F.array_distinct(arr)))
                  / n.cast("double")).otherwise(F.lit(0.0))


def _dup_char_fraction(arr):
    """Characters inside duplicated elements / total characters: for each
    element value appearing k times, k-1 copies' characters count as
    duplicated (the element's first occurrence is 'original')."""
    total = F.aggregate(arr, F.lit(0),
                        lambda acc, s: acc + F.length(s)).cast("double")
    # chars in all occurrences minus chars in distinct values
    distinct_chars = F.aggregate(F.array_distinct(arr), F.lit(0),
                                 lambda acc, s: acc + F.length(s))
    dup_chars = (total - distinct_chars)
    return F.when(total > 0, dup_chars / total).otherwise(F.lit(0.0))


def _ngrams(words, n: int):
    """Word n-grams as strings via sequence+transform (JVM, no Python)."""
    count = F.size(words) - (n - 1)
    return F.when(count > 0, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)))) \
        .otherwise(F.array().cast("array<string>"))


def _top_ngram_char_fraction(words, n: int, max_words: int):
    """Fraction of characters covered by the most frequent word n-gram
    (Gopher: 2-grams > 0.20, 3-grams > 0.18, 4-grams > 0.16 are dropped).

    Mode-of-array is computed natively as array_sort + one aggregate()
    fold tracking the longest equal-run — O(g log g) per row, no
    Python, no shuffle (a naive count-per-distinct-gram filter is
    O(g²) and measurably hangs on 2k-word docs). Ties resolve to the
    lexicographically largest gram (the fold updates on run >= best
    over the ascending sort). ``words`` is truncated to ``max_words``
    to bound the per-row cost; the signal saturates long before 2k
    words.
    """
    w = F.slice(words, 1, max_words)
    grams = F.array_sort(_ngrams(w, n))
    total_chars = F.aggregate(w, F.lit(0),
                              lambda a, s: a + F.length(s)).cast("double")
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"), F.lit("").alias("bestg"))

    def step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        upd = run >= acc["best"]
        return F.struct(
            g.alias("prev"), run.alias("run"),
            F.when(upd, run).otherwise(acc["best"]).alias("best"),
            F.when(upd, g).otherwise(acc["bestg"]).alias("bestg"))

    st = F.aggregate(grams, zero, step)
    # chars of the gram's WORDS = string length minus its n-1 spaces
    frac = (st["best"] * (F.length(st["bestg"]) - F.lit(n - 1))) \
        / total_chars
    return F.when((F.size(grams) > 0) & (total_chars > 0),
                  F.round(frac, 6)).otherwise(F.lit(0.0))


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      max_words: int = 2000) -> DataFrame:
    """Adds the Gopher/MassiveText repetition signals as columns:

    ``dup_line_frac``, ``dup_line_char_frac``, ``dup_para_frac``,
    ``dup_para_char_frac``, ``top_2gram_char_frac``,
    ``top_3gram_char_frac``. Gopher's drop thresholds (A1): line-dup
    > 0.30, line-char-dup > 0.20, para-dup > 0.30, para-char-dup
    > 0.20, top-2-gram > 0.20, top-3-gram > 0.18 — left to the caller
    (signals, not verdicts, so thresholds stay tunable).
    """
    col = F.col(text_col)
    lines = _lines(col)
    paras = _paragraphs(col)
    words = _words(col)
    return (df
            .withColumn("dup_line_frac", F.round(_dup_fraction(lines), 6))
            .withColumn("dup_line_char_frac",
                        F.round(_dup_char_fraction(lines), 6))
            .withColumn("dup_para_frac", F.round(_dup_fraction(paras), 6))
            .withColumn("dup_para_char_frac",
                        F.round(_dup_char_fraction(paras), 6))
            .withColumn("top_2gram_char_frac",
                        _top_ngram_char_fraction(words, 2, max_words))
            .withColumn("top_3gram_char_frac",
                        _top_ngram_char_fraction(words, 3, max_words)))


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher/MassiveText QUALITY signal set (the companion of
    :func:`gopher_repetition`'s repetition rules), all native HOF
    expressions — embarrassingly parallel, no shuffle, survives any
    scale-up:

    - ``n_words`` (Gopher keeps 50..100,000)
    - ``mean_word_len`` (keeps 3..10)
    - ``symbol_word_ratio`` — '#' or '…'/'...' occurrences per word
      (keeps ≤ 0.1)
    - ``bullet_line_frac`` — lines starting with a bullet (keeps ≤ 0.9)
    - ``ellipsis_line_frac`` — lines ending with an ellipsis
      (keeps ≤ 0.3)
    - ``alpha_word_frac`` — words containing at least one alphabetic
      character (keeps ≥ 0.8)
    - ``n_required_stopwords`` — how many of Gopher's eight stop words
      appear (keeps ≥ 2)
    - ``gopher_quality_pass`` — the published thresholds applied, as a
      convenience; the signal columns stay so callers can re-threshold.
    """
    sig = gopher_quality_signals(text_col)
    out = df
    for name, expr in sig.items():
        out = out.withColumn(name, expr)
    return out.withColumn("gopher_quality_pass",
                          gopher_quality_pass(sig))


def gopher_quality_signals(text_col: str = "text") -> dict:
    """The signal expressions as a name → Column dict — composable into
    a gate predicate without materializing columns (the curation funnel
    path, where input tables may already carry same-named columns)."""
    col = F.col(text_col)
    words = _words(col)
    lines = _lines(col)
    n_words = F.size(words)
    n_lines = F.size(lines)
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda a, w: a + F.length(w))
    mean_wl = F.when(n_words > 0,
                     total_word_chars / n_words).otherwise(F.lit(0.0))
    n_symbols = (F.size(F.split(col, r"#", -1)) - 1
                 + F.size(F.split(col, r"\.\.\.", -1)) - 1
                 + F.size(F.split(col, "…", -1)) - 1)
    sym_ratio = F.when(n_words > 0,
                       n_symbols / n_words).otherwise(F.lit(0.0))
    bullet = F.size(F.filter(
        lines, lambda ln: F.trim(ln)
        .rlike(r"^([•‣▪●⁃\-\*])\s")))
    bullet_frac = F.when(n_lines > 0,
                         bullet / n_lines).otherwise(F.lit(0.0))
    ellipsis = F.size(F.filter(
        lines, lambda ln: F.rtrim(ln)
        .rlike(r"(\.\.\.|…)$")))
    ellipsis_frac = F.when(n_lines > 0,
                           ellipsis / n_lines).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
    alpha_frac = F.when(n_words > 0,
                        alpha / n_words).otherwise(F.lit(0.0))
    # stopword matching strips leading/trailing punctuation from each
    # (already-lowercased) token first — 'the,' and 'of.' count, per the
    # Gopher rule's intent (ADVICE r5: exact whitespace tokens failed
    # punctuation-heavy prose). [^a-z0-9] is engine-portable: identical
    # semantics in Java regex and DuckDB's RE2, unlike \p{P}.
    n_stop = F.size(F.array_intersect(
        F.transform(words, lambda w: F.regexp_replace(
            w, "^[^a-z0-9]+|[^a-z0-9]+$", "")),
        F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])))
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_wl, 6),
        "symbol_word_ratio": F.round(sym_ratio, 6),
        "bullet_line_frac": F.round(bullet_frac, 6),
        "ellipsis_line_frac": F.round(ellipsis_frac, 6),
        "alpha_word_frac": F.round(alpha_frac, 6),
        "n_required_stopwords": n_stop.cast("long"),
    }


def gopher_quality_pass(sig: dict):
    """Published Gopher C1 thresholds over a signal dict (either the
    expressions from :func:`gopher_quality_signals` or the materialized
    columns)."""
    return (sig["n_words"].between(50, 100_000)
            & sig["mean_word_len"].between(3.0, 10.0)
            & (sig["symbol_word_ratio"] <= 0.1)
            & (sig["bullet_line_frac"] <= 0.9)
            & (sig["ellipsis_line_frac"] <= 0.3)
            & (sig["alpha_word_frac"] >= 0.8)
            & (sig["n_required_stopwords"] >= 2))


def c4_clean(df: DataFrame, text_col: str = "text", *,
             min_words_per_line: int = 5,
             min_sentences: int = 3,
             badwords: list[str] | None = None,
             out_col: str | None = None) -> DataFrame:
    """The C4 line-level cleaning rules (Raffel et al. 2020 §2.2),
    all native HOF expressions — with Gopher quality/repetition, CCNet
    LM quality, and RefinedWeb paragraph dedup this completes the
    published curation-recipe stack:

    - keep only lines ending in terminal punctuation (. ! ? "),
    - drop lines with fewer than ``min_words_per_line`` words,
    - drop lines containing the word "javascript" (case-insensitive),
    - page-level ``c4_keep``: False when the cleaned page has fewer
      than ``min_sentences`` sentences (terminal-punctuation count) or
      the ORIGINAL page contains "lorem ipsum" or a curly brace.

    Emits the cleaned text (``out_col``, default ``<text_col>_c4``),
    ``c4_keep``, and ``n_lines_kept`` / ``n_lines_dropped`` counters —
    signals + rewritten text, dropping is the caller's choice (the
    funnel's convention).

    ``badwords`` (opt-in — the paper's dirty-word list is an external
    resource and is NOT bundled; bring your own) applies C4's
    page-level removal: a page containing ANY listed word is flagged.
    Matching is case-insensitive on ``[a-z0-9]+`` word boundaries over
    the ORIGINAL text — single-token entries via one ``arrays_overlap``
    against a literal array (native, no regex blowup at hundreds of
    terms); multi-token phrases via a space-joined token-sequence
    ``contains`` (word-boundary exact, ``"ass"`` never matches
    ``"class"``, ``"blow job"`` matches across any whitespace). Adds a
    ``c4_badword`` column and folds ``~c4_badword`` into ``c4_keep``;
    without the list neither the column nor the gate is added (schema
    unchanged)."""
    out_col = out_col or f"{text_col}_c4"
    col = F.col(text_col)
    lines = _lines(col)
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r'[.!?"]$')
        & (F.size(F.split(ln, r"\s+")) >= min_words_per_line)
        & ~F.lower(ln).rlike(r"\bjavascript\b"))
    cleaned = F.array_join(kept, "\n")
    # sentence count over the CLEANED text: terminal-punct occurrences
    n_sent = F.size(F.split(cleaned, r"[.!?]", -1)) - 1
    page_ok = ((n_sent >= min_sentences)
               & ~F.lower(col).contains("lorem ipsum")
               & ~col.contains("{"))
    bad = None
    if badwords:
        norm = sorted({" ".join(_RE_NONALNUM.sub(" ", w.lower()).split())
                       for w in badwords} - {""})
        singles = [w for w in norm if " " not in w]
        phrases = [w for w in norm if " " in w]
        toks = F.array_remove(
            F.split(_RE_NONALNUM_EXPR(col), " "), "")
        bad = F.lit(False)
        if singles:
            bad = F.arrays_overlap(toks, F.array(*map(F.lit, singles)))
        if phrases:
            padded = F.concat(F.lit(" "), F.array_join(toks, " "),
                              F.lit(" "))
            for p in phrases:
                bad = bad | padded.contains(f" {p} ")
        page_ok = page_ok & ~bad
    out = (df
           .withColumn(out_col, cleaned)
           .withColumn("c4_keep", page_ok)
           .withColumn("n_lines_kept", F.size(kept).cast("long"))
           .withColumn("n_lines_dropped",
                       (F.size(lines) - F.size(kept)).cast("long")))
    if bad is not None:
        out = out.withColumn("c4_badword", bad)
    return out


def ngram_hashes(df: DataFrame, id_col: str, text_col: str = "text",
                 n: int = 13) -> DataFrame:
    """Slim ``(id, ngram_hash)`` rows: xxhash64 over each word n-gram.
    Hashing before the explode keeps 8-byte longs (not n-word strings)
    in the shuffle."""
    grams = _ngrams(_words(F.col(text_col)), n)
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(F.transform(
                          grams, lambda g: F.xxhash64(g))).alias("ngram_hash"))
            .distinct())


def mark_contaminated(train: DataFrame, eval_df: DataFrame, id_col: str,
                      text_col: str = "text", n: int = 13,
                      eval_text_col: str | None = None,
                      broadcast_eval: bool = True,
                      flag_col: str = "is_contaminated") -> DataFrame:
    """Flags training docs sharing any word ``n``-gram with the eval set.

    ``broadcast_eval=True`` (default) broadcasts the distinct eval-side
    hash set — correct whenever the eval corpus is benchmark-sized; at
    a huge eval side set it False for a shuffle hash join on the
    uniform 64-bit key.
    """
    ev = ngram_hashes(eval_df, id_col, eval_text_col or text_col, n) \
        .select("ngram_hash").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = ngram_hashes(train, id_col, text_col, n)
    hit_ids = tr.join(ev, "ngram_hash").select("id").distinct() \
        .withColumnRenamed("id", id_col)
    # no broadcast hint on the hit set: usually tiny (AQE will broadcast
    # it), but a heavily contaminated corpus could produce millions of
    # ids — same policy as the curation plan's near-dup drop set
    return train.join(hit_ids.withColumn(flag_col, F.lit(True)),
                      id_col, "left") \
        .withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))
