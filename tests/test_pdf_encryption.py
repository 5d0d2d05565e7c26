"""PDF standard security handler (kernels/pdfobj): RC4 R2/R3, AES-128
R4 (AESV2), AES-256 R6 — the empty-user-password "encrypted but freely
readable" shape pypdf opens transparently for the reference
(/root/reference/src/pubscience/retrieve/OAI/parse_pdfs.py:112-241).

Fixtures are built by an in-test encryptor. The RC4 primitive is pinned
to the RFC 6229-style known vector (non-circular); the O-entry
generation and AES sides use independent code paths (hashlib chains /
the cryptography package), so a key-derivation bug cannot cancel out
between encrypt and decrypt for those parts.
"""

from __future__ import annotations

import hashlib
import zlib

from pubscience_spark.kernels import pdfmini, pdfobj

PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A")
FILE_ID = bytes.fromhex("0123456789abcdef0123456789abcdef")
BODY = b"BT (secret article text extracted fine) Tj ET"


def test_rc4_known_vector():
    # classic test vector: RC4("Key", "Plaintext")
    assert pdfobj.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    # symmetry
    assert pdfobj.rc4(b"k2", pdfobj.rc4(b"k2", b"payload")) == b"payload"


# --------------------------------------------------- fixture encryptors ---

def _owner_entry(owner: bytes, n: int, r: int,
                 user_pw: bytes = b"") -> tuple[bytes, bytes]:
    h = hashlib.md5((owner + PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    o = pdfobj.rc4(okey, (user_pw + PAD)[:32])   # padded user password
    if r >= 3:
        for i in range(1, 20):
            o = pdfobj.rc4(bytes(b ^ i for b in okey), o)
    return o, okey


def _make_rc4_encrypt(r: int, nbits: int,
                      user_pw: bytes = b"") -> tuple[dict, bytes]:
    n = nbits // 8
    o, _ = _owner_entry(b"own3r-pw", n, r, user_pw)
    enc = {"Filter": "Standard", "R": r, "V": 1 if r == 2 else 2,
           "Length": nbits, "O": o, "P": -44}
    fkey = pdfobj._std_file_key(enc, FILE_ID, user_pw)
    if r >= 3:
        u = hashlib.md5(PAD + FILE_ID).digest()
        u = pdfobj.rc4(fkey, u)
        for i in range(1, 20):
            u = pdfobj.rc4(bytes(b ^ i for b in fkey), u)
        enc["U"] = u + b"\x00" * 16
    else:
        enc["U"] = pdfobj.rc4(fkey, PAD[:32])
    return enc, fkey


def _make_aesv2_encrypt() -> tuple[dict, bytes]:
    enc, fkey = _make_rc4_encrypt(4, 128)
    enc.update({"V": 4, "R": 4, "StmF": "StdCF", "StrF": "StdCF",
                "CF": {"StdCF": {"CFM": "AESV2", "Length": 16}}})
    return enc, fkey


def _make_r6_encrypt(user_pw: bytes = b"", r: int = 6) -> tuple[dict, bytes]:
    """R6 (Algorithm 2.B) or legacy R5 (single SHA-256, Acrobat 9)."""
    fkey = bytes(range(32))
    vsalt, ksalt = b"VSALT--1", b"KSALT--2"
    if r == 5:
        u_hash = hashlib.sha256(user_pw + vsalt).digest()
        ikey = hashlib.sha256(user_pw + ksalt).digest()
    else:
        u_hash = pdfobj._hash_2b(user_pw, vsalt)
        ikey = pdfobj._hash_2b(user_pw, ksalt)
    ue = pdfobj._aes_cbc(ikey, b"\x00" * 16, fkey, encrypt=True)
    u = u_hash + vsalt + ksalt
    ovsalt, oksalt = b"OVSALT-1", b"OKSALT-2"
    opw = b"own3r-pw"
    if r == 5:
        o_hash = hashlib.sha256(opw + ovsalt + u[:48]).digest()
        oikey = hashlib.sha256(opw + oksalt + u[:48]).digest()
    else:
        o_hash = pdfobj._hash_2b(opw, ovsalt, u[:48])
        oikey = pdfobj._hash_2b(opw, oksalt, u[:48])
    oe = pdfobj._aes_cbc(oikey, b"\x00" * 16, fkey, encrypt=True)
    enc = {"Filter": "Standard", "R": r, "V": 5, "Length": 256,
           "O": o_hash + ovsalt + oksalt, "U": u,
           "UE": ue, "OE": oe, "P": -44}
    return enc, fkey


def _obj_key(fkey: bytes, num: int, aes: bool) -> bytes:
    k = hashlib.md5(fkey + num.to_bytes(3, "little") + b"\x00\x00"
                    + (b"sAlT" if aes else b"")).digest()
    return k[:min(len(fkey) + 5, 16)]


def _val_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return b"<" + v.hex().encode() + b">"
    if isinstance(v, str):
        return b"/" + v.encode()
    if isinstance(v, dict):
        return _enc_dict_bytes(v)
    return str(v).encode()


def _enc_dict_bytes(enc: dict) -> bytes:
    parts = [f"/{k} ".encode() + _val_bytes(v) for k, v in enc.items()]
    return b"<< " + b" ".join(parts) + b" >>"


def build_encrypted_pdf(enc: dict, fkey: bytes, mode: str) -> bytes:
    """Minimal 1-page PDF with a Flate content stream encrypted per the
    handler: deflate → encrypt (decrypt side inverts in that order)."""
    deflated = zlib.compress(BODY)
    if mode == "rc4":
        stream_data = pdfobj.rc4(_obj_key(fkey, 4, False), deflated)
    elif mode == "aesv2":
        iv = b"\x01" * 16
        padlen = 16 - len(deflated) % 16
        stream_data = iv + pdfobj._aes_cbc(
            _obj_key(fkey, 4, True), iv, deflated + bytes([padlen]) * padlen,
            encrypt=True)
    else:                                          # aesv3 / R6
        iv = b"\x02" * 16
        padlen = 16 - len(deflated) % 16
        stream_data = iv + pdfobj._aes_cbc(
            fkey, iv, deflated + bytes([padlen]) * padlen, encrypt=True)
    out = bytearray(b"%PDF-1.6\n")
    offs = {}

    def emit(num: int, body: bytes):
        offs[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    emit(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    emit(4, (f"<< /Length {len(stream_data)} /Filter /FlateDecode "
             f">>\nstream\n").encode() + stream_data + b"\nendstream")
    emit(5, _enc_dict_bytes(enc))
    out.extend(b"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R /ID [<"
               + FILE_ID.hex().encode() + b"> <" + FILE_ID.hex().encode()
               + b">] >>\n%%EOF\n")
    return bytes(out)


# --------------------------------------------------------------- tests ----

def _assert_extracts(raw: bytes):
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert error is None, error
    assert pages == ["secret article text extracted fine"]


def test_rc4_r3_128_decrypts():
    enc, fkey = _make_rc4_encrypt(3, 128)
    _assert_extracts(build_encrypted_pdf(enc, fkey, "rc4"))


def test_rc4_r2_40_decrypts():
    enc, fkey = _make_rc4_encrypt(2, 40)
    _assert_extracts(build_encrypted_pdf(enc, fkey, "rc4"))


def test_aesv2_r4_decrypts():
    enc, fkey = _make_aesv2_encrypt()
    _assert_extracts(build_encrypted_pdf(enc, fkey, "aesv2"))


def test_aes256_r6_decrypts():
    enc, fkey = _make_r6_encrypt()
    _assert_extracts(build_encrypted_pdf(enc, fkey, "aesv3"))


def test_nonempty_user_password_surfaces_error():
    enc, fkey = _make_rc4_encrypt(3, 128)
    # corrupt U: the empty-password check must fail closed
    enc["U"] = b"\xff" * 32
    raw = build_encrypted_pdf(enc, fkey, "rc4")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"


def test_r6_wrong_password_surfaces_error():
    enc, fkey = _make_r6_encrypt()
    enc["U"] = b"\x00" * 32 + enc["U"][32:]
    raw = build_encrypted_pdf(enc, fkey, "aesv3")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"


def test_encrypted_strings_and_links_decrypt():
    """Info metadata strings and /URI link targets inside an encrypted
    file decrypt with the per-object keys (string pass before ObjStm
    expansion)."""
    enc, fkey = _make_rc4_encrypt(3, 128)
    deflated = zlib.compress(BODY)
    stream_data = pdfobj.rc4(_obj_key(fkey, 4, False), deflated)
    producer = b"Encrypted Producer 9000"
    uri = b"https://example.org/encrypted-link"
    enc_producer = pdfobj.rc4(_obj_key(fkey, 6, False), producer)
    enc_uri = pdfobj.rc4(_obj_key(fkey, 7, False), uri)
    out = bytearray(b"%PDF-1.6\n")

    def emit(num, body):
        out.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    emit(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Annots [7 0 R] >>")
    emit(4, (f"<< /Length {len(stream_data)} /Filter /FlateDecode "
             f">>\nstream\n").encode() + stream_data + b"\nendstream")
    emit(5, _enc_dict_bytes(enc))
    emit(6, b"<< /Producer <" + enc_producer.hex().encode() + b"> >>")
    emit(7, b"<< /Type /Annot /Subtype /Link /A << /S /URI /URI <"
            + enc_uri.hex().encode() + b"> >> >>")
    out.extend(b"trailer\n<< /Size 8 /Root 1 0 R /Encrypt 5 0 R /ID [<"
               + FILE_ID.hex().encode() + b"> <" + FILE_ID.hex().encode()
               + b">] >>\n%%EOF\n")
    raw = bytes(out)
    pages, error, _, prod = pdfmini.pdf_to_pages(raw)
    assert error is None
    assert pages == ["secret article text extracted fine"]
    assert prod == "Encrypted Producer 9000"
    assert pdfmini.pdf_links(raw) == ["https://example.org/encrypted-link"]


def test_encrypted_modern_layout_objstm_cmap():
    """Interaction coverage: RC4 encryption OVER the PDF 1.5 layout —
    the ObjStm must decrypt before expansion, the CMap stream before
    parsing, and Identity-H text still comes out as Unicode."""
    import test_pdfobj as M

    enc, fkey = _make_rc4_encrypt(3, 128)
    raw = M.build_modern_pdf([T_PAGE], producer="enc-writer")
    # re-encrypt every stream body in place: walk 'N 0 obj ... stream'
    import re
    out = bytearray()
    pos = 0
    for m in re.finditer(rb"(\d+) 0 obj\n(<<.*?>>)\nstream\n", raw,
                         re.DOTALL):
        num = int(m.group(1))
        hdr_end = m.end()
        body_end = raw.find(b"\nendstream", hdr_end)
        body = raw[hdr_end:body_end]
        is_xref = b"/XRef" in m.group(2)
        new_body = body if is_xref else pdfobj.rc4(
            _obj_key(fkey, num, False), body)
        out.extend(raw[pos:hdr_end])
        out.extend(new_body)
        pos = body_end
    out.extend(raw[pos:])
    # lengths unchanged (RC4 is length-preserving) → offsets/xref valid
    out = out.replace(
        b"startxref",
        b"90 0 obj\n" + _enc_dict_bytes(enc) + b"\nendobj\n"
        b"trailer\n<< /Encrypt 90 0 R /ID [<" + FILE_ID.hex().encode()
        + b"> <" + FILE_ID.hex().encode() + b">] >>\nstartxref")
    pages, error, scanned, producer = pdfmini.pdf_to_pages(bytes(out))
    assert error is None, error
    assert pages[0].startswith(T_PAGE)
    assert pages[0].splitlines()[1] == "abcd"     # bfrange via enc CMap
    assert producer == "enc-writer"               # Info inside enc ObjStm


T_PAGE = "Encrypted modern page with Identity-H text."


# ------------------------------------- round 4: non-empty user passwords ---

def _assert_extracts_with(raw: bytes, password):
    pages, error, _, _ = pdfmini.pdf_to_pages(raw, password=password)
    assert error is None, error
    assert pages == ["secret article text extracted fine"]


def test_rc4_r3_user_password_unlocks():
    enc, fkey = _make_rc4_encrypt(3, 128, user_pw=b"s3cret")
    raw = build_encrypted_pdf(enc, fkey, "rc4")
    # no password → fails closed
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"
    # wrong password → fails closed (empty fallback also wrong)
    pages, error, _, _ = pdfmini.pdf_to_pages(raw, password=b"nope")
    assert pages == [] and error == "pdf-password-protected"
    # right password (bytes and str forms)
    _assert_extracts_with(raw, b"s3cret")
    _assert_extracts_with(raw, "s3cret")


def test_rc4_r2_user_password_unlocks():
    enc, fkey = _make_rc4_encrypt(2, 40, user_pw=b"pw40")
    raw = build_encrypted_pdf(enc, fkey, "rc4")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"
    _assert_extracts_with(raw, b"pw40")


def test_aesv2_r4_user_password_unlocks():
    enc, fkey = _make_rc4_encrypt(4, 128, user_pw=b"aes-pw")
    enc.update({"V": 4, "R": 4, "StmF": "StdCF", "StrF": "StdCF",
                "CF": {"StdCF": {"CFM": "AESV2", "Length": 16}}})
    raw = build_encrypted_pdf(enc, fkey, "aesv2")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"
    _assert_extracts_with(raw, b"aes-pw")


def test_aes256_r6_user_password_unlocks():
    enc, fkey = _make_r6_encrypt(user_pw=b"utf8-pw")
    raw = build_encrypted_pdf(enc, fkey, "aesv3")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"
    pages, error, _, _ = pdfmini.pdf_to_pages(raw, password=b"wrong")
    assert pages == [] and error == "pdf-password-protected"
    _assert_extracts_with(raw, "utf8-pw")


def test_aes256_r5_single_hash_decrypts():
    """ADVICE r3: legacy Acrobat 9 R5 uses a single SHA-256, not the
    R6 2.B loop — both the empty and non-empty password paths."""
    enc, fkey = _make_r6_encrypt(r=5)
    _assert_extracts(build_encrypted_pdf(enc, fkey, "aesv3"))
    enc, fkey = _make_r6_encrypt(user_pw=b"r5pw", r=5)
    raw = build_encrypted_pdf(enc, fkey, "aesv3")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"
    _assert_extracts_with(raw, b"r5pw")


def test_empty_password_still_tried_with_wrong_supplied():
    """A wrong supplied password must not break freely-readable files:
    the empty password is always tried as fallback."""
    enc, fkey = _make_rc4_encrypt(3, 128)
    raw = build_encrypted_pdf(enc, fkey, "rc4")
    _assert_extracts_with(raw, b"irrelevant-wrong-password")


def test_r2_bad_u_fails_closed():
    """R2 now validates U (Algorithm 4) instead of decrypting garbage."""
    enc, fkey = _make_rc4_encrypt(2, 40)
    enc["U"] = b"\xff" * 32
    raw = build_encrypted_pdf(enc, fkey, "rc4")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"


def test_rc4_r3_owner_password_unlocks():
    """Algorithm 7: the owner password recovers the padded user password
    from /O and unlocks a file whose user password is unknown."""
    enc, fkey = _make_rc4_encrypt(3, 128, user_pw=b"unknown-user")
    raw = build_encrypted_pdf(enc, fkey, "rc4")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"
    _assert_extracts_with(raw, b"own3r-pw")       # owner path
    _assert_extracts_with(raw, b"unknown-user")   # user path still works


def test_rc4_r2_owner_password_unlocks():
    enc, fkey = _make_rc4_encrypt(2, 40, user_pw=b"u2")
    raw = build_encrypted_pdf(enc, fkey, "rc4")
    _assert_extracts_with(raw, b"own3r-pw")


def test_aes256_r6_owner_password_unlocks():
    """R6 owner unlock: /O validation (udata = U[0:48]) + /OE unwrap."""
    enc, fkey = _make_r6_encrypt(user_pw=b"hidden")
    raw = build_encrypted_pdf(enc, fkey, "aesv3")
    pages, error, _, _ = pdfmini.pdf_to_pages(raw)
    assert pages == [] and error == "pdf-password-protected"
    _assert_extracts_with(raw, b"own3r-pw")
    _assert_extracts_with(raw, b"hidden")


def test_aes256_r5_owner_password_unlocks():
    enc, fkey = _make_r6_encrypt(user_pw=b"hidden5", r=5)
    raw = build_encrypted_pdf(enc, fkey, "aesv3")
    _assert_extracts_with(raw, b"own3r-pw")
