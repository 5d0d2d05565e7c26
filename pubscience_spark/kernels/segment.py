"""Segmentation kernels (operator family G): sentences, chunks, spans.

Re-derived semantics:

- sentence split: the reference uses pysbd/nltk (``translate/ntm.py:345-353``);
  neither is available, so this is a deterministic rule-based splitter
  (terminator + following-capital heuristic, abbreviation guard) — G1
- token-budget chunking: greedy sentence packing ≤ max_tokens with
  long-sentence hard split (``translate/ntm.py:355-410``) — G2
- span records ``{start, end, kind, text}`` char offsets
  (``parse/pubtator.py:39-47``) — G3
"""

from __future__ import annotations

import re

_ABBREV = frozenset((
    "dr", "mr", "mrs", "ms", "prof", "st", "vs", "etc", "e.g", "i.e",
    "fig", "al", "no", "vol", "pp", "ca", "approx",
))

_RE_BOUNDARY = re.compile(r"([.!?])(\s+)(?=[A-Z0-9À-Ü])")
_RE_WS = re.compile(r"\s+")


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence segmentation with char-offset fidelity lost
    (whitespace between sentences is the delimiter); G1."""
    if not text:
        return []
    out: list[str] = []
    start = 0
    for m in _RE_BOUNDARY.finditer(text):
        end = m.end(1)
        candidate = text[start:end]
        last_word = candidate.rsplit(None, 1)[-1].rstrip(".!?").lower() \
            if candidate.split() else ""
        if last_word in _ABBREV or (len(last_word) == 1 and last_word.isalpha()):
            continue
        sentence = candidate.strip()
        if sentence:
            out.append(sentence)
        start = m.end()
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    return out


def sentence_spans(text: str) -> list[tuple[int, int, str, str]]:
    """G3: (start, end, 'sentence', text) char spans into the original."""
    spans = []
    cursor = 0
    for s in split_sentences(text):
        idx = text.find(s, cursor)
        if idx < 0:
            continue
        spans.append((idx, idx + len(s), "sentence", s))
        cursor = idx + len(s)
    return spans


def _n_tokens(s: str) -> int:
    return len(s.split())


def chunk_sentences(sentences: list[str], max_tokens: int = 256,
                    joiner: str = " ") -> list[str]:
    """G2: greedy packing; a single over-budget sentence is hard-split on
    word boundaries."""
    chunks: list[str] = []
    cur: list[str] = []
    cur_tokens = 0
    for s in sentences:
        n = _n_tokens(s)
        if n > max_tokens:
            if cur:
                chunks.append(joiner.join(cur))
                cur, cur_tokens = [], 0
            words = s.split()
            for i in range(0, len(words), max_tokens):
                chunks.append(" ".join(words[i:i + max_tokens]))
            continue
        if cur_tokens > 0 and cur_tokens + n > max_tokens:
            chunks.append(joiner.join(cur))
            cur, cur_tokens = [s], n
        else:
            cur.append(s)
            cur_tokens += n
    if cur:
        chunks.append(joiner.join(cur))
    return chunks


def chunk_text(text: str, max_tokens: int = 256) -> list[str]:
    return chunk_sentences(split_sentences(text), max_tokens)
