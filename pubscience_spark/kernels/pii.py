"""PII masking kernels (operator family D, the ★ regex tier).

Re-derived from ``anonymise/deduce.py:17-34,145-271`` — the regex + checksum
tier only; the DEDUCE-model pass (D3 ◇) is model-dependent and excluded
from the byte contract. The reference validates phone candidates with the
``phonenumbers`` package (absent here); our validator accepts NL-shaped
digit counts — deterministic and documented as the stand-in.
"""

from __future__ import annotations

import re

RE_WEBLINK = re.compile(
    r"(https?\:\/\/[A-z0-9.\/\?\-\=]+)|(www\.[A-z0-9.\/\?\-\=]+)", re.IGNORECASE)
RE_DOI = re.compile(r"DOI\s[0-9\.\/\-\_]+", re.IGNORECASE)
RE_BSN = re.compile(r"[^0-9]{1,}([0-9]{9})[^0-9]{1,}")
RE_DATES = [
    re.compile(r"[12][0-9]{3}[\-\/\\]?[0-9]{1,2}[\-\/\\]?[0-9]{1,2}"),
    re.compile(r"[0-9]{1,2}[\-\/\\]?[0-9]{1,2}[\-\/\\]?[12][0-9]{3}"),
]
RE_PHONES = [
    re.compile(r"((\+31|0|0031)[\s\-]?[1-9]{1}[0-9]{8})(?![^<]*>)"),
    re.compile(r"((0)[1-9]{2}[0-9]{1,2}[\s\-]?[1-9][0-9]{5})(?![^<]*>)"),
    re.compile(r"((\\+31|0|0031)[1-9][0-9][\s\-]?[1-9][0-9]{6})(?![^<]*>)"),
    re.compile(r"((\(\d{3}\)|\d{3})\s?\d{3}\s?\d{2}\s?\d{2})(?![^<]*>)"),
    re.compile(r"[0\+][0-9]{2,3}[\-\s]\d{4,8}"),
]
RE_PATID = re.compile(
    r"((verwijzersnummer|verwijsnummer|pati[eë]ntnummer|patientnr|patnummer"
    r"|patid|pat\.?num\.?)[\s\:\;]\s?([0-9]{5,12}))", re.IGNORECASE)


def bsn_is_valid(digits: str) -> bool:
    """Dutch BSN 11-proof: weighted digit sum (last weight -1) % 11 == 0."""
    if len(digits) not in (9, 10):
        return False
    total = 0
    for pos, weight in enumerate(range(len(digits), 0, -1), 1):
        d = int(digits[pos - 1])
        total += d * (-1 if weight == 1 else weight)
    return total % 11 == 0


def mask_bsn(text: str) -> str:
    for cand in RE_BSN.findall(text):
        if bsn_is_valid(cand):
            text = text.replace(cand, "[BSN]")
    return text


def mask_patient_ids(text: str) -> str:
    for full, _, _ in RE_PATID.findall(text):
        text = text.replace(full, "[PATIENTNUMMER]")
    return text


def mask_urls(text: str) -> str:
    for grp in RE_WEBLINK.findall(text):
        for hit in grp:
            if hit:
                text = text.replace(hit, "[URL]")
    return text


def mask_dois(text: str) -> str:
    for hit in RE_DOI.findall(text):
        text = text.replace(hit, "[DOI]")
    return text


def mask_dates(text: str) -> str:
    for rx in RE_DATES:
        for hit in rx.findall(text):
            text = text.replace(hit, "[DATUM]")
    return text


def _phone_plausible(candidate: str) -> bool:
    digits = re.sub(r"\D", "", candidate)
    return 9 <= len(digits) <= 13


def mask_phones(text: str) -> str:
    for rx in RE_PHONES:
        for hit in rx.findall(text):
            cand = (hit[0] if isinstance(hit, tuple) else hit).strip()
            if cand and _phone_plausible(cand):
                text = text.replace(cand, "[TELEFOONNUMMER]")
    return text


def mask_numbers(text: str) -> str:
    """D4: floats → [FLOAT], remaining integers → [INT]."""
    text = re.sub(r"\d+\.\d+", "[FLOAT]", text)
    text = re.sub(r"\d+", "[INT]", text)
    return text


def anonymise(text: str, *, bsn: bool = True, patient_ids: bool = True,
              phones: bool = True, dates: bool = True, urls: bool = False,
              dois: bool = False, numbers: bool = False) -> str:
    """D1+D2(+D4) composite in the reference's application order
    (anonymise/deduce.py:240-271)."""
    if bsn:
        text = mask_bsn(text)
    if patient_ids:
        text = mask_patient_ids(text)
    if phones:
        text = mask_phones(text)
    if dates:
        text = mask_dates(text)
    if urls:
        text = mask_urls(text)
    if dois:
        text = mask_dois(text)
    if numbers:
        text = mask_numbers(text)
    return text
