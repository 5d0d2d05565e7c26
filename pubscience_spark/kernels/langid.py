"""F8: deterministic n-gram / stopword language identification.

The reference gates on ``langdetect.detect(text[:10000]) == 'en'``
(``scripts/clean.py:46-55``) without pinning the detector seed — a
documented nondeterminism (SURVEY.md §2.11). langdetect is not available
here; this is a from-scratch deterministic detector over stopword hits and
characteristic character n-grams, returning 'unknown' when no signal
clears the margin — same API shape:
``detect_lang(text, sample_size=10000)``.

Round 7 (VERDICT r6 #7): profiles extended from the corpus languages
(en/nl/de) to the top-10 Common-Crawl languages — adding es/fr/it/pt
(Latin-script, stopwords + trigrams), ru (Cyrillic, same machinery
once the word class covers а-яё), and ja/zh (no space-delimited words,
so the stopword term stays 0 and the character-gram term carries the
signal — hiragana grams for ja, high-frequency hanzi for zh). The
``_PROFILES`` table is the single source of truth: the kernel, the
native Catalyst expression (``operators/clean.with_detected_lang``)
and the generated DuckDB oracle all derive from it, so extending it
moves all three in lockstep.
"""

from __future__ import annotations

import re

_PROFILES: dict[str, tuple[frozenset[str], tuple[str, ...]]] = {
    # (stopwords, characteristic character n-grams)
    "en": (frozenset("""the and of to in is that it for on with as are was
        this be at by an have from or not but what all were when there can
        which their has will each about how up out them then she many some
        these would other into more her two him time very after our just
        first been who its over new""".split()),
        ("the", "and", "ing", "ion", " th", "of ", "to ", "ed ", " wi")),
    "nl": (frozenset("""de het een en van in is dat op te zijn met voor niet
        aan er ook als bij maar om uit door over ze zich naar dan nog wordt
        worden heeft hebben deze onder tussen geen al naar werd kunnen moet
        tegen hun meer""".split()),
        ("de ", "en ", "ij ", "ijk", "sch", "een", "aar", " ge", "cht")),
    "de": (frozenset("""der die das und ist nicht ein eine zu den von mit
        sich des auf für im dem ein als auch es an werden aus er hat dass
        sie nach wird bei einer um am sind noch wie über einem können""".split()),
        ("der", "ein", "ich", "sch", "und", "die", " de", "cht", "en ")),
    "es": (frozenset("""el la los las de que y en un una es no por con para
        su al lo se del más como pero sus le ya este si entre cuando muy
        sin sobre también hasta donde desde todo esta son fue había tiene
        esto nos durante siempre""".split()),
        ("de ", "la ", "ión", "ado", "os ", " es", "nte", "ción", "ara")),
    "fr": (frozenset("""le la les de des du un une et en est que qui dans
        pour pas sur au avec ne se ce il elle nous vous ils par plus mais
        ou si leur sont aux cette ces son sa ses été comme tout aussi bien
        être fait même où""".split()),
        ("le ", "es ", "de ", "ent", " qu", "ait", "eur", "oux", "ais")),
    "it": (frozenset("""il lo la gli le di che e un una in per non sono con
        si del della dei delle da su al anche come più ma se questo questa
        alla nel sono stato essere hanno ha loro suo sua quando dove molto
        già però""".split()),
        ("di ", "che", "to ", "re ", "ione", "gli", "ell", "zza", "chè")),
    "pt": (frozenset("""o os as de que e do da em um uma para com não por
        mais se na no dos das ao como mas foi ele isso ou quando muito nos
        já está eu também só pelo pela até ser tem seu sua entre sem mesmo
        ainda""".split()),
        ("de ", "ão ", "da ", "do ", "ção", "os ", "ara", "nto", "ois")),
    "ru": (frozenset("""и в не на что он с как это по но они она мы а то
        все же из у за бы для о так его к был была были есть от при этом
        которые чтобы если когда уже или нет том только может очень даже
        них её ещё""".split()),
        ("ого", "ени", " пр", "ть ", "ани", "ост", "ние", "ств", "ется")),
    # CJK: no space-delimited words — the run regex yields clause-long
    # tokens the stopword term never matches (scores 0), so detection
    # rides entirely on the character-gram densities
    "ja": (frozenset(["の"]),
           ("の", "した", "です", "ます", "する", "こと", "てい", "ない",
            "れた")),
    "zh": (frozenset(["的"]),
           ("的", "是", "了", "在", "一", "有", "和", "个", "不")),
}

# word-run character class — shared verbatim by the kernel, the native
# Catalyst expression and the DuckDB oracle (literal characters, so
# Java regex / RE2 / Python re agree): Latin + Latin-1 letters,
# Cyrillic, kana, CJK unified ideographs
WORD_CLASS = "a-zà-ÿа-яё぀-ヿ一-鿿"
WORD_RE = f"[{WORD_CLASS}]+"
_RE_WORD = re.compile(WORD_RE)


def language_scores(text: str, sample_size: int = 10000) -> dict[str, float]:
    sample = text if len(text) < sample_size else text[:sample_size]
    low = sample.lower()
    words = _RE_WORD.findall(low)
    if not words:
        return {lang: 0.0 for lang in _PROFILES}
    n_words = len(words)
    padded = " " + " ".join(words) + " "
    n_chars = max(len(padded) - 2, 1)
    scores: dict[str, float] = {}
    for lang, (stop, grams) in _PROFILES.items():
        stop_hits = sum(1 for w in words if w in stop)
        gram_hits = sum(padded.count(g) for g in grams)
        scores[lang] = (stop_hits / n_words) + 0.5 * (gram_hits / n_chars) * 10
    return scores


def detect_lang(text: str, sample_size: int = 10000,
                margin: float = 0.08) -> str:
    """Best language, or 'unknown' when the top score is weak/ambiguous."""
    scores = language_scores(text, sample_size)
    # deterministic tie-break: score desc, language name asc
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    best_lang, best = ranked[0]
    runner = ranked[1][1] if len(ranked) > 1 else 0.0
    if best < margin or (best - runner) < 1e-9:
        return "unknown"
    return best_lang
