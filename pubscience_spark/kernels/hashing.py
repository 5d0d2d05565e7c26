"""Dedup hashing kernels: shingles, MinHash, SimHash, n-gram Jaccard.

The reference specifies MinHash near-dup but never implements it
(``README.md:89-93``; unused fuzzy imports ``deduplicate/deduplicater.py:6``);
exact sha256 dedup is X1 (``deduplicate/deduplicater.py:47-60``). These are
from-scratch deterministic implementations sized for LSH band-bucketing at
cluster scale (shingle → minhash → band → bucket-join, per the task spec).

All hashing is seeded md5/blake2b — stable across Python processes
(unlike ``hash()``), so executors agree without PYTHONHASHSEED pinning.
"""

from __future__ import annotations

import hashlib
import re
import struct

_RE_WORD = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 32) - 1


def normalize_words(text: str) -> list[str]:
    return _RE_WORD.findall(text.lower())


def word_shingles(text: str, k: int = 3) -> set[str]:
    words = normalize_words(text)
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def _hash32(s: str) -> int:
    return struct.unpack("<I", hashlib.md5(s.encode("utf-8")).digest()[:4])[0]


def _hash64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for universal hashing h(x)=(a*x+b) % p."""
    params = []
    for i in range(num_perm):
        d = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=16).digest()
        a = (struct.unpack("<Q", d[:8])[0] % (_MERSENNE - 1)) + 1
        b = struct.unpack("<Q", d[8:])[0] % _MERSENNE
        params.append((a, b))
    return params


_PERM_CACHE: dict[tuple[int, int], list[tuple[int, int]]] = {}


def minhash_signature(text: str, num_perm: int = 128, k: int = 3,
                      seed: int = 42) -> list[int]:
    key = (num_perm, seed)
    params = _PERM_CACHE.get(key)
    if params is None:
        params = _PERM_CACHE[key] = _perm_params(num_perm, seed)
    shingles = word_shingles(text, k)
    if not shingles:
        return [0] * num_perm
    base = [_hash32(s) for s in shingles]
    sig = []
    for a, b in params:
        sig.append(min(((a * x + b) % _MERSENNE) & _MAXH for x in base))
    return sig


def minhash_bands(signature: list[int], bands: int = 16) -> list[str]:
    """LSH band keys: 'band_idx:hash(rows)' — equal key ⇒ candidate pair."""
    rows = len(signature) // bands
    keys = []
    for b in range(bands):
        chunk = signature[b * rows:(b + 1) * rows]
        digest = hashlib.md5(
            (str(b) + ":" + ",".join(map(str, chunk))).encode()).hexdigest()[:16]
        keys.append(f"{b}:{digest}")
    return keys


def simhash(text: str, k: int = 3) -> int:
    """64-bit SimHash over word shingles."""
    weights = [0] * 64
    for sh in word_shingles(text, k):
        h = _hash64(sh)
        for bit in range(64):
            weights[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if weights[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return (len(sa & sb) / union) if union else 0.0


def sha256_hex(text: str) -> str:
    """X1 exact-dedup key (deduplicate/deduplicater.py:107-111)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
