"""C5: spurious-repetition removal via sliding-window character entropy.

Re-derived from ``clean/cleaner.py:41-127,178-191``: Shannon entropy over
ord() codes in a window (default 5, stride 1); windows with entropy below
the threshold (default 1.0) mark their [start, end) span for removal; the
surviving characters are re-joined. Opt-in operator — the reference defines
it but never wires it into ``Cleaner.clean()`` (SURVEY.md §2.8 note).
"""

from __future__ import annotations

import math
from collections import Counter


def window_entropies(seq: list[int], window: int = 5,
                     stride: int = 1) -> tuple[list[float], list[tuple[int, int]]]:
    entropies: list[float] = []
    spans: list[tuple[int, int]] = []
    n = len(seq)
    for start in range(0, n - window + 1, stride):
        end = start + window
        counts = Counter(seq[start:end])
        total = window
        e = -sum((c / total) * math.log2(c / total) for c in counts.values())
        entropies.append(e)
        spans.append((start, end))
    return entropies, spans


def remove_spurious_repetitions(text: str, window: int = 5,
                                threshold: float = 1.0) -> str:
    seq = [ord(ch) for ch in text]
    entropies, spans = window_entropies(seq, window=window)
    to_remove: set[int] = set()
    for e, (start, end) in zip(entropies, spans):
        if e < threshold:
            to_remove.update(range(start, end))
    if not to_remove:
        return text
    return "".join(ch for i, ch in enumerate(text) if i not in to_remove)
