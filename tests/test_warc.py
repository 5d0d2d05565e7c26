"""WARC ingestion (kernels/warc + sources.read_warc): record framing,
HTTP payload handling (status, chunked, content-encoding), malformed-
record skip counters, and the end-to-end Common-Crawl story — a gzip
WARC segment driven through read_warc into run_extraction."""

from __future__ import annotations

import gzip

from pubscience_spark.kernels import warc as W


def _http(body: bytes, *, ctype: str = "text/html",
          chunked: bool = False, gzipped: bool = False) -> bytes:
    hdrs = [b"HTTP/1.1 200 OK", f"Content-Type: {ctype}".encode()]
    if gzipped:
        body = gzip.compress(body)
        hdrs.append(b"Content-Encoding: gzip")
    if chunked:
        hdrs.append(b"Transfer-Encoding: chunked")
        mid = len(body) // 2
        body = (f"{mid:x}\r\n".encode() + body[:mid] + b"\r\n"
                + f"{len(body) - mid:x}\r\n".encode() + body[mid:]
                + b"\r\n0\r\n\r\n")
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + body


def _segment(compress=True):
    recs = [
        {"type": "warcinfo", "uri": "", "date": "2024-01-01T00:00:00Z",
         "block": b"software: test"},
        {"type": "response", "uri": "http://a.example/plain",
         "date": "2024-01-01T00:00:01Z",
         "block": _http(b"<html><body><p>Plain page body text here."
                        b"</p></body></html>")},
        {"type": "response", "uri": "http://a.example/chunked",
         "date": "2024-01-01T00:00:02Z",
         "block": _http(b"<html><body><p>Chunked transfer body."
                        b"</p></body></html>", chunked=True)},
        {"type": "response", "uri": "http://a.example/gz",
         "date": "2024-01-01T00:00:03Z",
         "block": _http(b"<html><body><p>Gzip content encoding."
                        b"</p></body></html>", gzipped=True)},
        {"type": "request", "uri": "http://a.example/plain",
         "date": "2024-01-01T00:00:01Z",
         "block": b"GET /plain HTTP/1.1\r\n\r\n"},
    ]
    return W.write_warc(recs, compress=compress)


def test_iter_records_plain_and_gzip():
    for compress in (False, True):
        recs = list(W.iter_warc_records(_segment(compress)))
        assert [r["type"] for r in recs] == \
            ["warcinfo", "response", "response", "response", "request"]
        assert recs[1]["uri"] == "http://a.example/plain"
        assert all(r["skipped"] == 0 for r in recs)


def test_http_payload_decoding():
    recs = [r for r in W.iter_warc_records(_segment())
            if r["type"] == "response"]
    for rec, want in zip(recs, (b"Plain page body", b"Chunked transfer",
                                b"Gzip content")):
        status, mime, body = W.parse_http_response(rec["block"])
        assert status == 200 and mime == "text/html"
        assert want in body


def test_malformed_records_skipped_and_counted():
    good = _segment(compress=False)
    # garbage between records + a record with a broken Content-Length
    broken = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: http://bad\r\n"
              b"Content-Length: nope\r\n\r\n")
    blob = broken + b"JUNKJUNK" + good
    recs = list(W.iter_warc_records(blob))
    assert [r["type"] for r in recs][:2] == ["warcinfo", "response"]
    assert recs[0]["skipped"] >= 1                # the broken one counted
    # truncated final record is dropped, earlier ones survive
    recs2 = list(W.iter_warc_records(good[: len(good) - 40]))
    assert len(recs2) >= 1


def test_dechunk_broken_framing_returns_input():
    assert W._dechunk(b"not chunked at all") == b"not chunked at all"
    assert W._dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"


def test_read_warc_to_extraction_end_to_end(spark, tmp_path):
    """The Common-Crawl story: gzip WARC segments on disk → read_warc →
    run_extraction produces extracted text per url."""
    import os

    from pubscience_spark.plans.pipeline import run_extraction
    from pubscience_spark.sources.readers import read_warc

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg-00000.warc.gz").write_bytes(_segment())
    (seg_dir / "seg-00001.warc.gz").write_bytes(_segment())

    pages = read_warc(spark, str(seg_dir))
    rows = {r["url"]: r for r in pages.collect()}
    # 3 responses per segment; request/warcinfo filtered
    assert len(rows) == 3 and all(r["http_status"] == 200
                                  for r in rows.values())
    assert rows["http://a.example/gz"]["warc_ts"] is not None
    assert b"Gzip content" in bytes(rows["http://a.example/gz"]["html"])

    res = run_extraction(
        spark,
        pages.select("url", "warc_ts", "html").dropDuplicates(["url"]),
        os.path.join(str(tmp_path), "out"), n_buckets=2)
    assert res["rows_written"] == 3
    ext = spark.read.parquet(res["extracted_path"])
    texts = {r["url"]: r["extracted_text"] for r in ext.collect()}
    assert "Chunked transfer body." in texts["http://a.example/chunked"]
    assert "Gzip content encoding." in texts["http://a.example/gz"]


def test_gunzip_members_survive_corruption():
    """Round-5 review (execution-confirmed bugs): a truncated tail or
    trailing garbage must lose only the bad member; a negative
    Content-Length must not loop the record scanner forever."""
    good = gzip.compress(b"A" * 100)
    # trailing garbage
    assert W._gunzip_members(good + b"JUNKJUNK") == b"A" * 100
    # truncated second member: first survives
    two = good + gzip.compress(b"B" * 50)[:-8]
    assert W._gunzip_members(two).startswith(b"A" * 100)
    # corrupt middle member: members before it survive
    mid = bytearray(gzip.compress(b"C" * 80))
    mid[15] ^= 0xFF
    assert W._gunzip_members(good + bytes(mid)) == b"A" * 100
    # negative Content-Length: generator terminates with a skip
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x\r\n"
           b"Content-Length: -1000\r\n\r\n")
    recs = list(W.iter_warc_records(bad + _segment(compress=False)))
    assert [r["type"] for r in recs][:1] == ["warcinfo"]
    assert recs[0]["skipped"] >= 1


def test_streaming_parse_peak_memory_is_one_record():
    """Round-6 contract (VERDICT r5 weak #1): parsing a multi-member
    segment through the streaming reader must buffer O(one record), not
    the whole decompressed segment."""
    import io

    rec_size = 10_000
    n_rec = 60                      # 600 KB decompressed total
    recs = [{"type": "response", "uri": f"http://m.example/{i}",
             "date": "2024-01-01T00:00:00Z",
             "block": _http(bytes([65 + i % 26]) * rec_size)}
            for i in range(n_rec)]
    seg = W.write_warc(recs, compress=True)
    tally: dict = {}
    out = list(W.iter_warc_records_stream(
        W.GzipMemberReader(io.BytesIO(seg)), tally=tally))
    assert len(out) == n_rec
    total = n_rec * rec_size
    # bound: one record + decode windows + chunk slack, far below total
    assert tally["peak_buffered"] < rec_size + (1 << 18) + 65536 * 2
    assert tally["peak_buffered"] < total // 2


def test_streaming_matches_bytes_parse():
    """iter_warc_records (bytes) and iter_warc_records_stream must
    agree record-for-record, including skip counters, on a segment with
    embedded garbage and a broken record."""
    import io

    broken = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: http://bad\r\n"
              b"Content-Length: nope\r\n\r\n")
    blob = broken + b"JUNKJUNK" + _segment(compress=False)
    a = list(W.iter_warc_records(blob))
    b = list(W.iter_warc_records_stream(
        W.GzipMemberReader(io.BytesIO(blob))))
    assert [(r["type"], r["uri"], r["block"], r["skipped"])
            for r in a] == \
        [(r["type"], r["uri"], r["block"], r["skipped"]) for r in b]


def test_trailing_skips_surface(spark, tmp_path):
    """ADVICE r5: malformed records AFTER the last kept row must not
    vanish — iter's tally carries them; read_warc merges them into
    the segment's LAST kept row (no synthetic row enters the
    documented extraction path)."""
    from pubscience_spark.sources.readers import read_warc

    truncated = _segment(compress=False)[:-40]    # cuts the final rec
    tally: dict = {}
    recs = list(W.iter_warc_records(truncated, tally=tally))
    assert len(recs) >= 1 and tally["skipped"] >= 1

    d = tmp_path / "seg"
    d.mkdir()
    (d / "s.warc").write_bytes(truncated)
    rows = read_warc(spark, str(d)).collect()
    assert all(r["rec_type"] is not None for r in rows)  # no sentinel
    assert len(rows) == sum(1 for r in recs if r["type"] == "response")
    last = max(rows, key=lambda r: r["warc_ts"])
    assert last["n_skipped"] >= 1                 # merged trailing skip


def test_fully_garbage_segment_emits_null_url_sentinel(spark, tmp_path):
    """A segment with NO kept rows still surfaces its counts — via a
    counts-only sentinel whose url is NULL (not ''), so it cannot
    collide with or pose as a document downstream."""
    from pubscience_spark.sources.readers import read_warc

    d = tmp_path / "seg"
    d.mkdir()
    (d / "s.warc").write_bytes(b"not a warc at all" * 10)
    rows = read_warc(spark, str(d)).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["rec_type"] is None and r["url"] is None         and r["html"] is None
    assert r["n_skipped"] >= 1


def test_giant_header_counts_one_skip():
    """A record whose header exceeds the cap with no blank line must
    count as ONE skip, not two (cap hit + garbage resync)."""
    giant = (b"WARC/1.0\r\nWARC-Type: response\r\n"
             + b"X-Pad: " + b"a" * (2 * 1024 * 1024) + b"\r\n")
    seg = giant + _segment(compress=False)
    tally: dict = {}
    recs = list(W.iter_warc_records(seg, tally=tally))
    good = [r for r in recs if r["uri"]]
    assert len(good) >= 1
    total = sum(r["skipped"] for r in recs) + tally["skipped"]
    assert total == 1


def test_record_types_optin_and_revisit_counter(spark, tmp_path):
    """warcinfo/request surface raw blocks when opted in; revisit
    records are counted (n_revisit) when filtered out."""
    from pubscience_spark.sources.readers import read_warc

    recs = [
        {"type": "warcinfo", "uri": "", "date": "2024-01-01T00:00:00Z",
         "block": b"software: test"},
        {"type": "revisit", "uri": "http://a.example/seen",
         "date": "2024-01-01T00:00:01Z", "block": b""},
        {"type": "response", "uri": "http://a.example/p",
         "date": "2024-01-01T00:00:02Z",
         "block": _http(b"<html><body><p>Body.</p></body></html>")},
        {"type": "request", "uri": "http://a.example/p",
         "date": "2024-01-01T00:00:02Z",
         "block": b"GET /p HTTP/1.1\r\n\r\n"},
    ]
    d = tmp_path / "seg"
    d.mkdir()
    (d / "s.warc.gz").write_bytes(W.write_warc(recs))

    # default: responses only; the revisit rides n_revisit
    rows = read_warc(spark, str(d)).collect()
    kept = [r for r in rows if r["rec_type"] is not None]
    assert [r["rec_type"] for r in kept] == ["response"]
    assert sum(r["n_revisit"] for r in rows) == 1

    # opted in: raw blocks, no HTTP parse, record-level mime
    rows2 = {r["rec_type"]: r for r in read_warc(
        spark, str(d),
        record_types=("response", "warcinfo", "request")).collect()}
    assert bytes(rows2["warcinfo"]["html"]) == b"software: test"
    assert rows2["warcinfo"]["http_status"] is None
    assert rows2["request"]["url"] == "http://a.example/p"
    assert rows2["response"]["http_status"] == 200


def test_read_warc_skip_counts_survive_type_filter(spark, tmp_path):
    """Skips attached to filtered-out record types (warcinfo/request)
    must ride the next kept row, not vanish."""
    from pubscience_spark.sources.readers import read_warc
    broken = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: http://bad\r\n"
              b"Content-Length: nope\r\n\r\n")
    seg = broken + _segment(compress=False)
    d = tmp_path / "seg"
    d.mkdir()
    (d / "s.warc").write_bytes(seg)
    rows = sorted(read_warc(spark, str(d)).collect(),
                  key=lambda r: r["url"])
    assert sum(r["n_skipped"] for r in rows) >= 1


def test_gzip_reader_socket_like_partial_reads():
    """ADVICE r6: a BinaryIO source that returns 1-byte partial reads
    mid-stream (socket-like) must still be sniffed as gzip and
    decompress fully — the old 2-byte sniff misclassified it as plain
    input with premature EOF."""
    import io

    class Drip(io.RawIOBase):
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def read(self, n=-1):
            return self._b.read(min(n, 1) if n and n > 0 else n)

    payload = b"hello warc world " * 500
    gz = gzip.compress(payload[:4000]) + gzip.compress(payload[4000:])
    r = W.GzipMemberReader(Drip(gz))
    out = bytearray()
    while chunk := r.read(1 << 16):
        out += chunk
    assert bytes(out) == payload

    # plain (non-gzip) drip-fed input passes through unchanged too
    r2 = W.GzipMemberReader(Drip(payload))
    out2 = bytearray()
    while chunk := r2.read(1 << 16):
        out2 += chunk
    assert bytes(out2) == payload

    # 1-byte total stream: classified plain, yields that byte, EOF
    r3 = W.GzipMemberReader(Drip(b"x"))
    assert r3.read(10) == b"x" and r3.read(10) == b""
