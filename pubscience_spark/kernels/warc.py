"""WARC (ISO 28500) record parsing — pure stdlib.

Common Crawl ships its corpus as gzip WARC segment files (one gzip
member per record, ~1 GB/segment); this kernel turns segment BYTES into
records so the Spark source (``sources.readers.read_warc``) can feed the
extraction pipeline directly from crawl segments instead of a
pre-built pages table.

- multi-member gzip transparently unwrapped (a plain uncompressed WARC
  also parses),
- WARC named headers + Content-Length framing per the public spec,
- HTTP response payloads: status line, headers, chunked
  transfer-encoding de-chunked, Content-Encoding gzip/deflate
  decompressed — the three forms crawlers actually store,
- malformed records are SKIPPED with a counter, never a raise (one bad
  record must not kill a 1 GB segment task).

Reference behavior: the reference consumes pre-extracted article dumps
(`scripts/clean.py` file readers); WARC ingestion is the upstream step
its pipeline assumes — re-expressed here because the north rule's input
is Common-Crawl-style web pages.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator


def _split_headers(block: bytes) -> tuple[dict[str, str], bytes]:
    """(headers, rest) at the first blank line; header keys lowercased.
    Tolerates bare-LF line endings (seen in the wild)."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = block.find(sep)
        if idx >= 0:
            head, rest = block[:idx], block[idx + len(sep):]
            break
    else:
        head, rest = block, b""
    headers: dict[str, str] = {}
    for line in head.replace(b"\r\n", b"\n").split(b"\n"):
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("latin-1")] = \
            v.strip().decode("latin-1", "replace")
    return headers, rest


def _dechunk(body: bytes) -> bytes:
    """RFC 7230 chunked transfer-encoding decode; returns the input
    unchanged if the framing is broken mid-stream (truncated captures
    are common — partial content beats none)."""
    out = bytearray()
    i = 0
    n = len(body)
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            return bytes(body)                     # broken framing
        size_tok = body[i:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            break
        start = eol + 2
        out += body[start:start + size]
        i = start + size + 2                       # skip trailing CRLF
    return bytes(out)


def parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, body) from a captured HTTP response:
    status line parsed, chunked encoding removed, gzip/deflate content
    encoding decompressed (best-effort — a corrupt stream yields the
    raw bytes rather than an error)."""
    headers, body = _split_headers(payload)
    status = 0
    first = payload.split(b"\n", 1)[0]
    parts = first.split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = 0
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if "gzip" in enc:
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError, zlib.error):
            pass
    elif "deflate" in enc:
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:                                   # raw-deflate servers
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except zlib.error:
                pass
    ctype = headers.get("content-type", "").split(";")[0].strip()
    return status, ctype, body


def _gunzip_members(raw: bytes) -> bytes:
    """Concatenate every member of a multi-member gzip stream (the CC
    segment layout — one member per record). Plain input passes
    through. Decompression is PER MEMBER, so a corrupt/truncated member
    or trailing garbage loses only that member — every record decoded
    before it survives (round-5 review: a whole-stream ``GzipFile.read``
    raised after the fact and discarded the entire segment)."""
    if raw[:2] != b"\x1f\x8b":
        return raw
    out = bytearray()
    pos = 0
    n = len(raw)
    while pos < n and raw[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)                 # one gzip member
        try:
            member = d.decompress(raw[pos:])
        except zlib.error:
            break                                  # corrupt member
        out += member
        if not d.eof:
            break                                  # truncated tail
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break                                  # no forward progress
        pos += consumed
    return bytes(out)


def iter_warc_records(raw: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record:
    ``{type, uri, date, content_length, block, skipped}`` — ``skipped``
    counts malformed records dropped since the previous yield (the
    caller's data-quality counter)."""
    data = _gunzip_members(raw)
    i = 0
    n = len(data)
    skipped = 0
    while i < n:
        ver = data.find(b"WARC/", i)
        if ver < 0:
            break
        if ver != i:
            skipped += 1                           # garbage between
        hdr_end = -1
        for sep in (b"\r\n\r\n", b"\n\n"):
            idx = data.find(sep, ver)
            if idx >= 0 and (hdr_end < 0 or idx < hdr_end):
                hdr_end = idx
                sep_len = len(sep)
        if hdr_end < 0:
            break
        headers, _ = _split_headers(data[ver:hdr_end + sep_len])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:                             # missing/garbage/
            skipped += 1                           # negative length:
            i = hdr_end + sep_len                  # a negative value
            continue                               # would rewind the
                                                   # scan index forever
        block_start = hdr_end + sep_len
        block = data[block_start:block_start + length]
        i = block_start + length
        # consume the record separator (two CRLFs per spec, tolerant)
        while data[i:i + 2] in (b"\r\n",) or data[i:i + 1] == b"\n":
            i += 2 if data[i:i + 2] == b"\r\n" else 1
        if len(block) < length:
            skipped += 1                           # truncated final rec
            break
        yield {
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "content_length": length,
            "block": block,
            "skipped": skipped,
        }
        skipped = 0


def write_warc(records: "list[dict]", *, compress: bool = True) -> bytes:
    """Test/datagen-side writer: one gzip member per record (the CC
    layout). Each record dict: ``{type, uri, date, block}``."""
    out = bytearray()
    for r in records:
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: {r['type']}\r\n"
               f"WARC-Target-URI: {r['uri']}\r\n"
               f"WARC-Date: {r['date']}\r\n"
               f"Content-Length: {len(r['block'])}\r\n"
               f"\r\n").encode("latin-1")
        rec = hdr + r["block"] + b"\r\n\r\n"
        out += gzip.compress(rec) if compress else rec
    return bytes(out)
