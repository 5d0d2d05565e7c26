"""F8: deterministic n-gram / stopword language identification.

The reference gates on ``langdetect.detect(text[:10000]) == 'en'``
(``scripts/clean.py:46-55``) without pinning the detector seed — a
documented nondeterminism (SURVEY.md §2.11). langdetect is not available
here; this is a from-scratch deterministic detector over stopword hits and
characteristic character n-grams for the corpus languages (en/nl/de),
returning 'unknown' when no signal clears the margin — same API shape:
``detect_lang(text, sample_size=10000)``.
"""

from __future__ import annotations

import re

_PROFILES: dict[str, tuple[frozenset[str], tuple[str, ...]]] = {
    # (stopwords, characteristic character trigrams)
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
}

_RE_WORD = re.compile(r"[a-zà-ÿ]+")


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
