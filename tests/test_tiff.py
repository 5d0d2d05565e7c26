"""TIFF 6.0 decoder (kernels/tiff): exact round trips against an
in-test writer for every supported compression (none / LZW / Deflate /
PackBits), Predictor 2, both byte orders, WhiteIsZero, RGBA, multi-
strip layouts, and the named error paths. TIFF is lossless, so every
round trip is exact equality, not PSNR."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pubscience_spark.kernels import media, tiff
from pubscience_spark.kernels.pdfobj import lzw_decode


# ----------------------------------------------------- mini writer ----

def _lzw_encode(data: bytes) -> bytes:
    """TIFF/PDF LZW (early-change variable width); the decoder round
    trip in the tests is the alignment proof."""
    out = bytearray()
    bitbuf = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    d = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    put(256, width)
    prev = b""
    for b in data:
        nxt = prev + bytes([b])
        if nxt in d:
            prev = nxt
            continue
        put(d[prev], width)
        d[nxt] = next_code
        next_code += 1
        # the encoder's next_code runs one emission AHEAD of the
        # decoder's, so early-change alignment needs no +1 here
        if next_code >= (1 << width) and width < 12:
            width += 1
        prev = bytes([b])
        if next_code >= 4093:
            put(256, width)
            d = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
    if prev:
        put(d[prev], width)
    put(257, width)
    if nbits:
        put(0, 8 - nbits)
    return bytes(out)


def _compress_seg(raw_seg: bytes, comp: int) -> bytes:
    """One strip/tile payload → compressed bytes (writer side)."""
    if comp == 1:
        return raw_seg
    if comp == 5:
        return _lzw_encode(raw_seg)
    if comp in (8, 32946):
        return zlib.compress(raw_seg)
    if comp == 32773:
        # naive packbits: literal runs of ≤128 + replicate runs
        sb = bytearray()
        i = 0
        s = raw_seg
        while i < len(s):
            j = i
            while j + 1 < len(s) and s[j + 1] == s[j] and j - i < 127:
                j += 1
            if j > i:                               # replicate run
                sb += bytes([257 - (j - i + 1), s[i]])
                i = j + 1
            else:
                j = i
                while j < len(s) and j - i < 128 \
                        and not (j + 1 < len(s) and s[j + 1] == s[j]):
                    j += 1
                sb += bytes([j - i - 1]) + s[i:j]
                i = j
        return bytes(sb)
    raise AssertionError(comp)


def _write_tiff(arr: np.ndarray, *, comp: int = 1, endian: str = "<",
                photometric: int | None = None,
                predictor: int = 1,
                rows_per_strip: int | None = None) -> bytes:
    h, w = arr.shape[:2]
    spp = arr.shape[2] if arr.ndim == 3 else 1
    data = arr.reshape(h, w * spp)
    if predictor == 2:
        # first sample of each row stays raw; the rest become deltas
        px = data.reshape(h, w, spp).astype(np.int16)
        data = np.diff(px, axis=1,
                       prepend=np.zeros((h, 1, spp), dtype=np.int16)) \
            .astype(np.uint8).reshape(h, w * spp)
    if photometric is None:
        photometric = 1 if spp == 1 else 2
    if photometric == 0:
        data = 255 - data
    rps = rows_per_strip or h
    strips = [_compress_seg(data[y0:y0 + rps].tobytes(), comp)
              for y0 in range(0, h, rps)]

    e = endian
    header_mag = b"II*\x00" if e == "<" else b"MM\x00*"
    n_strips = len(strips)
    tags = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, spp, None),
            (259, 3, 1, comp), (262, 3, 1, photometric),
            (273, 4, n_strips, None), (277, 3, 1, spp),
            (278, 3, 1, rps), (279, 4, n_strips, None),
            (284, 3, 1, 1), (317, 3, 1, predictor)]
    # layout: header(8) + IFD + value arrays + strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_size
    extras = bytearray()

    def arr_value(typ, values):
        nonlocal extras
        fmt = "H" if typ == 3 else "I"
        size = 2 if typ == 3 else 4
        packed = b"".join(struct.pack(e + fmt, v) for v in values)
        if len(packed) <= 4:
            return None, packed.ljust(4, b"\x00")
        off = extra_off + len(extras)
        extras += packed
        return off, None

    strip_data_off = None  # patched later
    body = bytearray()
    body += struct.pack(e + "H", len(tags))
    deferred = {}
    for tag, typ, cnt, val in tags:
        if tag == 258:
            values = [8] * spp
        elif tag == 273:
            values = [0] * n_strips                 # patch later
            deferred[273] = len(body) + 8
        elif tag == 279:
            values = [len(s) for s in strips]
        else:
            values = [val]
        off, inline = arr_value(typ, values)
        body += struct.pack(e + "HHI", tag, typ, cnt)
        if inline is not None:
            if tag == 273:
                deferred[273] = ("inline", len(body))
            body += inline
        else:
            if tag == 273:
                deferred[273] = ("extra", off - extra_off)
            body += struct.pack(e + "I", off)
    body += struct.pack(e + "I", 0)                 # next IFD

    strip_base = extra_off + len(extras)
    offs = []
    pos = strip_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    kind, where = deferred[273]
    packed = b"".join(struct.pack(e + "I", o) for o in offs)
    if kind == "inline":
        body[where:where + 4] = packed.ljust(4, b"\x00")
    else:
        extras[where:where + len(packed)] = packed
    return header_mag + struct.pack(e + "I", ifd_off) + bytes(body) \
        + bytes(extras) + b"".join(strips)


def _img(h=23, w=31, c=3, seed=5):
    rng = np.random.RandomState(seed)
    base = np.linspace(0, 255, w)[None, :, None] * np.ones((h, 1, c))
    noise = rng.randint(0, 40, (h, w, c))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# ----------------------------------------------------------- tests ----

def test_lzw_encoder_roundtrips_through_kernel_decoder():
    rng = np.random.RandomState(1)
    cases = [b"", b"a", b"ab" * 3000, bytes(rng.randint(0, 8, 20000,
                                                        dtype=np.uint8)),
             bytes(rng.randint(0, 256, 6000, dtype=np.uint8)),
             bytes(10000)]
    for data in cases:
        assert lzw_decode(_lzw_encode(data), early_change=1) == data


def test_roundtrip_all_compressions():
    img = _img()
    for comp in (1, 5, 8, 32946, 32773):
        raw = _write_tiff(img, comp=comp)
        dec = tiff.decode_tiff(raw)
        assert np.array_equal(dec, img), comp


def test_roundtrip_big_endian_and_gray():
    g = _img(c=1)
    for e in ("<", ">"):
        assert np.array_equal(tiff.decode_tiff(_write_tiff(g, endian=e)),
                              g)


def test_white_is_zero_inverts():
    g = _img(c=1)
    raw = _write_tiff(g, photometric=0)
    assert np.array_equal(tiff.decode_tiff(raw), g)


def test_predictor2_horizontal_differencing():
    img = _img()
    for comp in (5, 8):
        raw = _write_tiff(img, comp=comp, predictor=2)
        assert np.array_equal(tiff.decode_tiff(raw), img), comp


def test_multi_strip_layouts():
    img = _img(h=37)
    for rps in (1, 5, 16, 37):
        for comp in (1, 5, 32773):
            raw = _write_tiff(img, comp=comp, rows_per_strip=rps)
            assert np.array_equal(tiff.decode_tiff(raw), img), (rps, comp)


def test_rgba_drops_alpha():
    img4 = _img(c=4)
    dec = tiff.decode_tiff(_write_tiff(img4))
    assert np.array_equal(dec, img4[:, :, :3])


def test_media_dispatch_and_features():
    img = _img()
    arr = media.decode_image(_write_tiff(img, comp=8))
    assert np.array_equal(arr, img)
    feats = media.image_feature_vec(arr)
    assert len(feats) > 0 and all(np.isfinite(feats))


def test_error_paths():
    with pytest.raises(tiff.TiffError, match="not-a-tiff"):
        tiff.decode_tiff(b"nope")
    raw = bytearray(_write_tiff(_img()))
    with pytest.raises(tiff.TiffError):
        tiff.decode_tiff(bytes(raw[:40]))           # truncated
    # unsupported compression id -> named error
    bad = bytearray(_write_tiff(_img(), comp=1))
    i = bad.find(struct.pack("<HHI", 259, 3, 1))
    bad[i + 8:i + 10] = struct.pack("<H", 34712)    # JPEG2000
    with pytest.raises(tiff.TiffError, match="compression-34712"):
        tiff.decode_tiff(bytes(bad))


def _write_fax_tiff(black: np.ndarray, *, comp: int = 4,
                    photometric: int = 0,
                    t4_options: int = 0,
                    rows_per_strip: int | None = None) -> bytes:
    """Bilevel fax TIFF (compression 3/4, bits=1) writer: per-strip
    CCITT encoding via the kernel's spec encoder; T4Options bit 0
    selects mixed 2-D coding for compression 3."""
    from pubscience_spark.kernels.ccitt import (encode_g3_1d,
                                                encode_g3_2d, encode_g4)
    h, w = black.shape
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        part = black[y0:y0 + rps]
        if comp == 4:
            strips.append(encode_g4(part))
        elif t4_options & 1:
            strips.append(encode_g3_2d(part))
        else:
            strips.append(encode_g3_1d(part))
    e = "<"
    n_strips = len(strips)
    tags = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
            (259, 3, 1, comp), (262, 3, 1, photometric),
            (273, 4, n_strips, None), (277, 3, 1, 1),
            (278, 3, 1, rps), (279, 4, n_strips, None),
            (292, 4, 1, t4_options)]
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_size
    extras = bytearray()
    body = bytearray()
    body += struct.pack(e + "H", len(tags))
    deferred = None
    for tag, typ, cnt, val in tags:
        if tag == 273:
            values = [0] * n_strips
        elif tag == 279:
            values = [len(s) for s in strips]
        else:
            values = [val]
        fmt = "H" if typ == 3 else "I"
        packed = b"".join(struct.pack(e + fmt, v) for v in values)
        body += struct.pack(e + "HHI", tag, typ, cnt)
        if len(packed) <= 4:
            if tag == 273:
                deferred = ("inline", len(body))
            body += packed.ljust(4, b"\x00")
        else:
            if tag == 273:
                deferred = ("extra", len(extras))
            body += struct.pack(e + "I", extra_off + len(extras))
            extras += packed
    body += struct.pack(e + "I", 0)
    strip_base = extra_off + len(extras)
    offs = []
    pos = strip_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    packed = b"".join(struct.pack(e + "I", o) for o in offs)
    kind, where = deferred
    if kind == "inline":
        body[where:where + 4] = packed.ljust(4, b"\x00")
    else:
        extras[where:where + len(packed)] = packed
    return b"II*\x00" + struct.pack(e + "I", ifd_off) + bytes(body) \
        + bytes(extras) + b"".join(strips)


def _fax_img(h=40, w=70, seed=3):
    rng = np.random.RandomState(seed)
    black = np.zeros((h, w), dtype=np.uint8)
    black[5:30, 10:50] = 1
    black[rng.randint(0, h, 60), rng.randint(0, w, 60)] ^= 1
    return black


def test_tiff_g4_decode():
    """Compression 4 (T.6) strips decode to display-space gray. The
    decoded bit is the stored sample, so photo 0 (the normal fax
    sense) shows codec-black dark and photo 1 (MinIsBlack) shows it
    white — libtiff's BWmap semantics."""
    black = _fax_img()
    raw = _write_fax_tiff(black, comp=4, photometric=0)
    out = tiff.decode_tiff(raw)
    assert out.shape == (40, 70, 1)
    assert np.array_equal(out[:, :, 0], (1 - black) * 255)
    raw = _write_fax_tiff(black, comp=4, photometric=1)
    assert np.array_equal(tiff.decode_tiff(raw)[:, :, 0], black * 255)


def test_tiff_fax_fillorder2():
    """FillOrder 2 (LSB-first bytes, Class-F fax): per-byte bit
    reversal recovers the MSB-first stream; FillOrder 2 on the 8-bit
    path is a named error."""
    black = _fax_img(seed=31)
    raw = bytearray(_write_fax_tiff(black, comp=4))
    # the writer emits no tag 266: repurpose tag 292 (T4Options,
    # unused for comp 4) into FillOrder=2 and bit-reverse the payload
    i = raw.find(struct.pack("<H", 292))
    assert i > 0
    raw[i:i + 2] = struct.pack("<H", 266)
    raw[i + 8:i + 12] = struct.pack("<I", 2)
    rev = bytes(int(f"{b:08b}"[::-1], 2) for b in range(256))
    # the single strip is the file tail for this writer: re-encode to
    # locate it, then bit-reverse it in place
    from pubscience_spark.kernels.ccitt import encode_g4
    enc = encode_g4(black)
    assert raw.endswith(bytes(enc))
    raw[-len(enc):] = bytes(enc).translate(rev)
    out = tiff.decode_tiff(bytes(raw))
    assert np.array_equal(out[:, :, 0], (1 - black) * 255)


def test_tiff_g3_decode_and_strips():
    black = _fax_img(seed=9)
    raw = _write_fax_tiff(black, comp=3)
    assert np.array_equal(tiff.decode_tiff(raw)[:, :, 0],
                          (1 - black) * 255)
    # multi-strip G4: each strip is an independent coding unit
    raw = _write_fax_tiff(black, comp=4, rows_per_strip=16)
    assert np.array_equal(tiff.decode_tiff(raw)[:, :, 0],
                          (1 - black) * 255)


def test_tiff_fax_unsupported_variants_are_named_errors():
    black = _fax_img()
    raw = bytearray(_write_fax_tiff(black, comp=3))
    # set T4Options (292) bit 0 → 2-D G3, unsupported: append a new
    # IFD is overkill — instead corrupt the strip and expect TiffError
    raw[-7:] = b"\x00" * 7
    with pytest.raises(tiff.TiffError):
        tiff.decode_tiff(bytes(raw))


def test_tiff_g3_2d_decode():
    """Compression 3 with T4Options bit 0 (mixed 2-D) decodes via the
    round-6 decode_g3_2d path."""
    black = _fax_img(seed=21)
    raw = _write_fax_tiff(black, comp=3, t4_options=1)
    assert np.array_equal(tiff.decode_tiff(raw)[:, :, 0],
                          (1 - black) * 255)


# ------------------------------------------- tiles + palette (r6) ----

def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Full JPEG → (tables-only stream, abbreviated stream): DQT/DHT
    segments move into a SOI..EOI tables stream (the JPEGTables tag
    payload), everything else stays — the TTN2 strip layout."""
    i = 2
    tables = b""
    rest = b"\xff\xd8"
    while i + 4 <= len(stream):
        assert stream[i] == 0xFF, hex(stream[i])
        m = stream[i + 1]
        if m == 0xDA:                               # SOS → tail as-is
            rest += stream[i:]
            break
        ln = int.from_bytes(stream[i + 2:i + 4], "big")
        seg = stream[i:i + 2 + ln]
        if m in (0xDB, 0xC4):                       # DQT / DHT
            tables += seg
        else:
            rest += seg
        i += 2 + ln
    return b"\xff\xd8" + tables + b"\xff\xd9", rest


def _write_tiff2(arr: np.ndarray, *, comp: int = 1, endian: str = "<",
                 tile: tuple[int, int] | None = None,
                 predictor: int = 1,
                 photometric: int | None = None,
                 colormap: list[int] | None = None,
                 rows_per_strip: int | None = None,
                 planar: int = 1,
                 jpeg_quality: int = 90,
                 jpeg_abbrev: bool = False) -> bytes:
    """Generic writer: tile organization (tags 322-325), palette
    (photometric 3 + ColorMap), and new-style JPEG (comp 7, optional
    shared JPEGTables). Photometric 1/2/3/6 only."""
    h, w = arr.shape[:2]
    spp = arr.shape[2] if arr.ndim == 3 else 1
    data = arr.reshape(h, w, spp)
    bps = 2 if arr.dtype == np.uint16 else 1
    sdt = np.dtype(endian + "u2") if bps == 2 else np.dtype(np.uint8)
    if photometric is None:
        photometric = (3 if colormap is not None else
                       6 if comp == 7 and spp == 3 else
                       1 if spp == 1 else 2)

    def seg_bytes(px: np.ndarray) -> bytes:
        if predictor == 2:
            px = np.diff(px.astype(np.int32), axis=1,
                         prepend=np.zeros((px.shape[0], 1,
                                           px.shape[2]),
                                          dtype=np.int32))
        return px.astype(sdt).tobytes()

    seg_px = []
    if tile:
        tw, tl = tile
        across, down = -(-w // tw), -(-h // tl)
        padded = np.zeros((down * tl, across * tw, spp),
                          dtype=arr.dtype)
        padded[:h, :w] = data
        for ty in range(down):
            for tx in range(across):
                seg_px.append(padded[ty * tl:(ty + 1) * tl,
                                     tx * tw:(tx + 1) * tw])
    elif planar == 2:                       # one plane's strips, then
        rps = rows_per_strip or h           # the next plane's (spec)
        for pl in range(spp):
            seg_px += [data[y0:y0 + rps, :, pl:pl + 1]
                       for y0 in range(0, h, rps)]
    else:
        rps = rows_per_strip or h
        seg_px = [data[y0:y0 + rps] for y0 in range(0, h, rps)]

    jpeg_tables = None
    if comp == 7:
        from pubscience_spark.kernels.jpeg import encode_jpeg
        segs = [encode_jpeg(np.ascontiguousarray(px.squeeze(axis=2)
                                                 if spp == 1 else px),
                            quality=jpeg_quality) for px in seg_px]
        if jpeg_abbrev:
            split = [_split_jpeg_tables(s) for s in segs]
            jpeg_tables = split[0][0]
            segs = [r for _, r in split]
    else:
        segs = [_compress_seg(seg_bytes(px), comp) for px in seg_px]

    entries = [(256, 3, [w]), (257, 3, [h]), (258, 3, [8 * bps] * spp),
               (259, 3, [comp]), (262, 3, [photometric]),
               (277, 3, [spp]), (284, 3, [planar]),
               (317, 3, [predictor])]
    if jpeg_tables is not None:
        entries.append((347, 7, list(jpeg_tables)))
    if tile:
        entries += [(322, 3, [tile[0]]), (323, 3, [tile[1]]),
                    (324, 4, None), (325, 4, [len(s) for s in segs])]
    else:
        entries += [(278, 3, [rows_per_strip or h]), (273, 4, None),
                    (279, 4, [len(s) for s in segs])]
    if colormap is not None:
        entries.append((320, 3, list(colormap)))
    entries.sort()

    e = endian
    n = len(entries)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    vsize = {3: 2, 7: 1}
    extras_size = sum(vsize.get(typ, 4)
                      * (len(segs) if vals is None else len(vals))
                      for _, typ, vals in entries
                      if vsize.get(typ, 4)
                      * (len(segs) if vals is None else len(vals)) > 4)
    seg_base = extra_off + extras_size
    offs = []
    pos = seg_base
    for s in segs:
        offs.append(pos)
        pos += len(s)

    body = bytearray(struct.pack(e + "H", n))
    extras = bytearray()
    for tag, typ, vals in entries:
        if vals is None:
            vals = offs
        fmt = {3: "H", 7: "B"}.get(typ, "I")
        packed = b"".join(struct.pack(e + fmt, v) for v in vals)
        body += struct.pack(e + "HHI", tag, typ, len(vals))
        if len(packed) <= 4:
            body += packed.ljust(4, b"\x00")
        else:
            body += struct.pack(e + "I", extra_off + len(extras))
            extras += packed
    body += struct.pack(e + "I", 0)
    magic = b"II*\x00" if e == "<" else b"MM\x00*"
    return magic + struct.pack(e + "I", ifd_off) + bytes(body) \
        + bytes(extras) + b"".join(segs)


def test_tiled_roundtrip_all_compressions():
    """23x31 with 16x16 tiles: 2x2 grid, both edges padded."""
    img = _img(23, 31, 3, seed=11)
    for comp in (1, 5, 8, 32773):
        raw = _write_tiff2(img, comp=comp, tile=(16, 16))
        assert np.array_equal(tiff.decode_tiff(raw), img), comp


def test_tiled_gray_big_endian_and_exact_fit():
    img = _img(32, 48, 1, seed=12)
    raw = _write_tiff2(img, comp=8, tile=(16, 16), endian=">")
    assert np.array_equal(tiff.decode_tiff(raw), img)


def test_tiled_predictor2_is_per_tile_row():
    img = _img(20, 40, 3, seed=13)
    raw = _write_tiff2(img, comp=5, tile=(16, 16), predictor=2)
    assert np.array_equal(tiff.decode_tiff(raw), img)


def test_palette_16bit_and_8bit_quirk():
    rng = np.random.RandomState(14)
    idx = rng.randint(0, 256, (17, 29, 1)).astype(np.uint8)
    lut8 = rng.randint(0, 256, (256, 3))
    # spec form: 16-bit channel values; decoder takes the high byte
    cmap16 = [int(v) * 257 for v in lut8.T.ravel()]
    raw = _write_tiff2(idx, colormap=cmap16)
    assert np.array_equal(tiff.decode_tiff(raw),
                          lut8[idx[:, :, 0]].astype(np.uint8))
    # writer quirk: 8-bit values left unscaled in the 16-bit fields
    cmap8 = [int(v) for v in lut8.T.ravel()]
    raw = _write_tiff2(idx, colormap=cmap8)
    assert np.array_equal(tiff.decode_tiff(raw),
                          lut8[idx[:, :, 0]].astype(np.uint8))


def test_palette_tiled_packbits():
    rng = np.random.RandomState(15)
    idx = (rng.randint(0, 8, (21, 37, 1)) * 31).astype(np.uint8)
    lut8 = rng.randint(0, 256, (256, 3))
    cmap16 = [int(v) * 257 for v in lut8.T.ravel()]
    raw = _write_tiff2(idx, comp=32773, tile=(16, 16), colormap=cmap16)
    assert np.array_equal(tiff.decode_tiff(raw),
                          lut8[idx[:, :, 0]].astype(np.uint8))


def test_tile_and_palette_error_paths():
    img = _img(20, 20, 3, seed=16)
    raw = _write_tiff2(img, tile=(16, 16))
    # truncate the last tile's payload
    with pytest.raises(tiff.TiffError):
        tiff.decode_tiff(raw[:-8])
    # palette without a colormap
    idx = _img(9, 9, 1, seed=17)
    raw = _write_tiff2(idx, photometric=3)
    with pytest.raises(tiff.TiffError, match="colormap"):
        tiff.decode_tiff(raw)
    # short colormap
    raw = _write_tiff2(idx, colormap=[1000] * 100)
    with pytest.raises(tiff.TiffError, match="colormap"):
        tiff.decode_tiff(raw)
    # a fax file claiming tiles but carrying no TileLength (tag 278
    # patched into 322, round 7: tiled fax now decodes, so the absent
    # companion tag surfaces as its own named error)
    black = _fax_img(24, 32)
    fax = bytearray(_write_fax_tiff(black, comp=4))
    i = fax.find(struct.pack("<H", 278))
    assert i > 0
    fax[i:i + 2] = struct.pack("<H", 322)
    with pytest.raises(tiff.TiffError, match="missing-tag-323"):
        tiff.decode_tiff(bytes(fax))


# --------------------------------------- new-style JPEG, comp 7 (r6) ----

def test_jpeg_in_tiff_strips_match_direct_decode():
    """Comp-7 strips: the TIFF path must equal decoding the same
    per-strip JPEG streams directly and stacking them (JPEG is lossy,
    so the invariant is same-decoder equality, not pixel identity)."""
    from pubscience_spark.kernels.jpeg import decode_jpeg, encode_jpeg
    img = _img(40, 56, 3, seed=41)
    raw = _write_tiff2(img, comp=7, rows_per_strip=16)
    want = np.concatenate(
        [decode_jpeg(encode_jpeg(img[y0:y0 + 16]), apply_orientation=False)
         for y0 in range(0, 40, 16)], axis=0)
    assert np.array_equal(tiff.decode_tiff(raw), want)
    # lossy but close
    assert np.mean(np.abs(tiff.decode_tiff(raw).astype(float)
                          - img.astype(float))) < 6


def test_jpeg_in_tiff_abbreviated_tables():
    """Shared DQT/DHT in JPEGTables (tag 347), strips abbreviated —
    the dominant libtiff layout. Must equal the non-abbreviated file
    bit-exactly after decode."""
    img = _img(33, 48, 3, seed=42)
    full = tiff.decode_tiff(_write_tiff2(img, comp=7,
                                         rows_per_strip=16))
    abbr = tiff.decode_tiff(_write_tiff2(img, comp=7, rows_per_strip=16,
                                         jpeg_abbrev=True))
    assert np.array_equal(full, abbr)


def test_jpeg_in_tiff_tiled_gray():
    from pubscience_spark.kernels.jpeg import decode_jpeg, encode_jpeg
    img = _img(24, 40, 1, seed=43)
    raw = _write_tiff2(img, comp=7, tile=(16, 16), jpeg_abbrev=True)
    out = tiff.decode_tiff(raw)
    assert out.shape == (24, 40, 1)
    # spot-check one interior tile against a direct decode
    tile = decode_jpeg(encode_jpeg(
        np.ascontiguousarray(img[0:16, 16:32, 0])),
        apply_orientation=False)
    assert np.array_equal(out[0:16, 16:32], tile.reshape(16, 16, 1))


def test_jpeg_in_tiff_error_paths():
    img = _img(16, 16, 3, seed=44)
    raw = _write_tiff2(img, comp=7)
    # strip payload that is not a JPEG stream (clobber the SOI)
    bad = bytearray(raw)
    soi = bytes(raw).rfind(b"\xff\xd8")
    bad[soi:soi + 2] = b"\x00\x00"
    with pytest.raises(tiff.TiffError, match="missing-soi"):
        tiff.decode_tiff(bytes(bad))
    # comp patched 7 -> 6 (round 7: old-style JPEG now decodes via the
    # single-strip SOI scan, and this file's strip IS a full stream)
    i = bytes(raw).find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    old = bytearray(raw)
    old[i + 8:i + 10] = struct.pack("<H", 6)
    assert np.array_equal(tiff.decode_tiff(bytes(old)),
                          tiff.decode_tiff(raw))


# --------------------------------------------- 16-bit samples (r6) ----

def _img16(h, w, c, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 1 << 16, (h, w, c)).astype(np.uint16)


def test_16bit_gray_strips_high_byte():
    img = _img16(19, 27, 1, seed=51)
    raw = _write_tiff2(img, comp=8, rows_per_strip=7)
    assert np.array_equal(tiff.decode_tiff(raw),
                          (img >> 8).astype(np.uint8))


def test_16bit_rgb_tiled_big_endian_predictor2():
    img = _img16(20, 36, 3, seed=52)
    raw = _write_tiff2(img, comp=5, tile=(16, 16), endian=">",
                       predictor=2)
    assert np.array_equal(tiff.decode_tiff(raw),
                          (img >> 8).astype(np.uint8))


def test_16bit_white_is_zero_and_palette_error():
    img = _img16(9, 9, 1, seed=53)
    raw = _write_tiff2(img, photometric=0)
    assert np.array_equal(tiff.decode_tiff(raw),
                          255 - (img >> 8).astype(np.uint8))
    lut = [0] * 768
    raw = _write_tiff2(img, colormap=lut)
    with pytest.raises(tiff.TiffError, match="palette-16bit"):
        tiff.decode_tiff(raw)


def test_jpeg_in_tiff_validation_guards():
    """Second-review findings: short strip tables, planar config, and
    mixed bit depths must be named errors, not silent wrong output."""
    img = _img(32, 16, 3, seed=45)
    raw = _write_tiff2(img, comp=7, rows_per_strip=16)
    # declare a taller image than the strips supply (patch tag 257)
    bad = bytearray(raw)
    i = bad.find(struct.pack("<HHI", 257, 3, 1))
    bad[i + 8:i + 12] = struct.pack("<I", 64)
    with pytest.raises(tiff.TiffError, match="missing-strips"):
        tiff.decode_tiff(bytes(bad))
    # planar configuration 2 (patch tag 284)
    bad = bytearray(raw)
    i = bad.find(struct.pack("<HHI", 284, 3, 1))
    bad[i + 8:i + 10] = struct.pack("<H", 2)
    with pytest.raises(tiff.TiffError, match="planar"):
        tiff.decode_tiff(bytes(bad))


def test_mixed_bitdepth_is_named_error():
    img = _img(8, 8, 3, seed=46)
    raw = bytearray(_write_tiff2(img))
    # BitsPerSample [8,8,8] count 3 lives in the extras area; patch the
    # third value to 16
    i = bytes(raw).find(struct.pack("<HHH", 8, 8, 8))
    assert i > 0
    raw[i + 4:i + 6] = struct.pack("<H", 16)
    with pytest.raises(tiff.TiffError, match="mixed-bitdepth"):
        tiff.decode_tiff(bytes(raw))


# ------------------------------------------ planar config 2 (r6) ----

def test_planar_rgb_strips_roundtrip():
    """PlanarConfiguration 2: one plane's strips, then the next's —
    must equal the chunky decode of the same pixels."""
    img = _img(21, 33, 3, seed=61)
    for comp in (1, 8, 32773):
        raw = _write_tiff2(img, comp=comp, planar=2, rows_per_strip=8)
        assert np.array_equal(tiff.decode_tiff(raw), img), comp


def test_planar_16bit_predictor2():
    img = _img16(14, 22, 3, seed=62)
    raw = _write_tiff2(img, comp=5, planar=2, predictor=2,
                       rows_per_strip=6)
    assert np.array_equal(tiff.decode_tiff(raw),
                          (img >> 8).astype(np.uint8))


def test_planar_tiled_and_short_plane_errors():
    img = _img(16, 16, 3, seed=63)
    raw = _write_tiff2(img, planar=2)
    # tiled planar is a named error: patch planar into a tiled file
    tiled = bytearray(_write_tiff2(img, tile=(16, 16)))
    i = tiled.find(struct.pack("<HHI", 284, 3, 1))
    tiled[i + 8:i + 10] = struct.pack("<H", 2)
    with pytest.raises(tiff.TiffError, match="planar-tiled"):
        tiff.decode_tiff(bytes(tiled))
    # fewer strips than planes need
    short = bytearray(raw)
    i = short.find(struct.pack("<HHI", 277, 3, 1))
    short[i + 8:i + 10] = struct.pack("<H", 4)   # claim 4 planes
    with pytest.raises(tiff.TiffError, match="missing-strips"):
        tiff.decode_tiff(bytes(short))


def test_tiff_fax_missing_strips_named_error():
    """ADVICE r6: a fax TIFF whose strip count does not cover
    ceil(h/rows_per_strip) must fail as 'tiff-missing-strips', not the
    generic reshape ValueError. Built by writing a single-strip fax
    file then patching RowsPerStrip (278) down to h//2."""
    black = _fax_img()
    raw = bytearray(_write_fax_tiff(black, comp=4, photometric=0))
    i = raw.find(struct.pack("<HHI", 278, 3, 1))
    assert i > 0
    raw[i + 8:i + 10] = struct.pack("<H", black.shape[0] // 2)
    with pytest.raises(tiff.TiffError, match="tiff-missing-strips"):
        tiff.decode_tiff(bytes(raw))


def _pack_tiff(entries, segs, endian="<"):
    """Minimal IFD packer for the round-7 layouts (entries: (tag, typ,
    vals) with vals=None meaning the per-seg offsets; typ 3=SHORT,
    4=LONG, 11=FLOAT)."""
    e = endian
    entries = sorted(entries)
    n = len(entries)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    vsize = {3: 2, 11: 4}
    extras_size = sum(vsize.get(typ, 4)
                      * (len(segs) if vals is None else len(vals))
                      for _, typ, vals in entries
                      if vsize.get(typ, 4)
                      * (len(segs) if vals is None else len(vals)) > 4)
    seg_base = extra_off + extras_size
    offs = []
    pos = seg_base
    for s in segs:
        offs.append(pos)
        pos += len(s)
    body = bytearray(struct.pack(e + "H", n))
    extras = bytearray()
    for tag, typ, vals in entries:
        if vals is None:
            vals = offs
        fmt = {3: "H", 11: "f"}.get(typ, "I")
        packed = b"".join(struct.pack(e + fmt, v) for v in vals)
        body += struct.pack(e + "HHI", tag, typ, len(vals))
        if len(packed) <= 4:
            body += packed.ljust(4, b"\x00")
        else:
            body += struct.pack(e + "I", extra_off + len(extras))
            extras += packed
    body += struct.pack(e + "I", 0)
    magic = b"II*\x00" if e == "<" else b"MM\x00*"
    return magic + struct.pack(e + "I", ifd_off) + bytes(body) \
        + bytes(extras) + b"".join(segs)


def test_tiff_fax_tiles():
    """Round 7: tiled G4 and mixed-2D G3 fax — each tile an
    independent fax stream of TileWidth columns, edges padded."""
    from pubscience_spark.kernels.ccitt import encode_g3_2d, encode_g4
    black = _fax_img(h=37, w=53, seed=21)
    for comp, enc, t4opt in ((4, encode_g4, 0), (3, encode_g3_2d, 1)):
        tw, tl = 32, 16
        across, down = -(-53 // tw), -(-37 // tl)
        padded = np.zeros((down * tl, across * tw), dtype=np.uint8)
        padded[:37, :53] = black
        segs = [enc(padded[ty * tl:(ty + 1) * tl,
                           tx * tw:(tx + 1) * tw])
                for ty in range(down) for tx in range(across)]
        raw = _pack_tiff(
            [(256, 3, [53]), (257, 3, [37]), (258, 3, [1]),
             (259, 3, [comp]), (262, 3, [0]), (277, 3, [1]),
             (292, 4, [t4opt]),
             (322, 3, [tw]), (323, 3, [tl]),
             (324, 4, None), (325, 4, [len(s) for s in segs])], segs)
        got = tiff.decode_tiff(raw)
        want = ((1 - black) * 255).reshape(37, 53, 1)
        assert np.array_equal(got, want), comp
        # missing tiles stay the named error
        short = _pack_tiff(
            [(256, 3, [53]), (257, 3, [37]), (258, 3, [1]),
             (259, 3, [comp]), (262, 3, [0]), (277, 3, [1]),
             (322, 3, [tw]), (323, 3, [tl]),
             (324, 4, None), (325, 4, [len(segs[0])])], segs[:1])
        with pytest.raises(tiff.TiffError, match="missing-tiles"):
            tiff.decode_tiff(short)


def test_tiff_old_jpeg_interchange_and_soi_scan():
    """Round 7 compression 6: JPEGInterchangeFormat (513/514) layout
    and the single-strip SOI-scan fallback; tag-assembled multi-strip
    stays named."""
    from pubscience_spark.kernels.jpeg import decode_jpeg, encode_jpeg
    img = _img(24, 32, 3, seed=22)
    jpg = encode_jpeg(img, quality=92)
    want = decode_jpeg(jpg)                  # lossy reference decode
    base = [(256, 3, [32]), (257, 3, [24]), (258, 3, [8, 8, 8]),
            (259, 3, [6]), (262, 3, [6]), (277, 3, [3])]
    # layout A: 513/514 point into the file (the seg IS the stream)
    raw = _pack_tiff(base + [(513, 4, None), (514, 4, [len(jpg)])],
                     [jpg])
    assert np.array_equal(tiff.decode_tiff(raw), want)
    # layout B: single strip, stream preceded by pad bytes → SOI scan
    padded = b"\x00" * 7 + jpg
    raw = _pack_tiff(base + [(273, 4, None), (279, 4, [len(padded)])],
                     [padded])
    assert np.array_equal(tiff.decode_tiff(raw), want)
    # multi-strip without 513 → named error
    raw = _pack_tiff(base + [(273, 4, None),
                             (279, 4, [10, len(jpg) - 10])],
                     [jpg[:10], jpg[10:]])
    with pytest.raises(tiff.TiffError, match="old-jpeg-multistrip"):
        tiff.decode_tiff(raw)
    # no SOI anywhere → named error
    raw = _pack_tiff(base + [(273, 4, None), (279, 4, [16])],
                     [b"\x00" * 16])
    with pytest.raises(tiff.TiffError, match="old-jpeg-no-soi"):
        tiff.decode_tiff(raw)


def test_tiff_float_samples():
    """Round 7 SampleFormat 3: float32/float64 gray and RGB strips
    normalize min->0 max->255; NaN/Inf display 0; photometric 0
    inverts; big-endian f4 honors the file byte order."""
    rng = np.random.RandomState(23)
    f = (rng.rand(10, 14).astype(np.float32) * 37.5 - 5.0)
    f[0, 0], f[9, 13] = -5.0, 32.5             # pin min/max
    norm = (f - f.min()) / (f.max() - f.min())
    want = np.clip(np.rint(norm * 255.0), 0, 255) \
        .astype(np.uint8).reshape(10, 14, 1)

    def ftiff(data, *, comp=1, endian="<", photo=1, fmt=3, bits=32,
              spp=1, tile=False, rps=None, width=None):
        width = width or data.shape[1]
        segs_px = [data] if rps is None else \
            [data[y0:y0 + rps] for y0 in range(0, data.shape[0], rps)]
        segs = [p.astype(np.dtype(
            endian + ("f4" if bits == 32 else "f8"))).tobytes()
            for p in segs_px]
        if comp == 8:
            segs = [zlib.compress(s) for s in segs]
        ent = [(256, 3, [width]), (257, 3, [data.shape[0]]),
               (258, 3, [bits] * spp), (259, 3, [comp]),
               (262, 3, [photo]), (277, 3, [spp]), (339, 3, [fmt] * spp)]
        if tile:
            ent += [(322, 3, [8]), (323, 3, [8]), (324, 4, None),
                    (325, 4, [len(s) for s in segs])]
        else:
            ent += [(278, 3, [rps or data.shape[0]]), (273, 4, None),
                    (279, 4, [len(s) for s in segs])]
        return _pack_tiff(ent, segs, endian)

    assert np.array_equal(tiff.decode_tiff(ftiff(f)), want)
    assert np.array_equal(tiff.decode_tiff(ftiff(f, comp=8, rps=4)),
                          want)
    assert np.array_equal(tiff.decode_tiff(ftiff(f, endian=">")), want)
    assert np.array_equal(tiff.decode_tiff(ftiff(f, bits=64)), want)
    # WhiteIsZero inverts
    assert np.array_equal(tiff.decode_tiff(ftiff(f, photo=0)),
                          255 - want)
    # NaN/Inf → 0, finite scaling unaffected
    g = f.copy()
    g[3, 3], g[4, 4] = np.nan, np.inf
    got = tiff.decode_tiff(ftiff(g))
    assert got[3, 3, 0] == 0 and got[4, 4, 0] == 0
    assert got[0, 0, 0] == want[0, 0, 0]
    # float RGB
    c = rng.rand(6, 5, 3).astype(np.float32)
    got = tiff.decode_tiff(ftiff(c.reshape(6, 15), spp=3, width=5))
    assert got.shape == (6, 5, 3)
    cn = (c - c.min()) / (c.max() - c.min())
    assert np.array_equal(
        got, np.clip(np.rint(cn * 255.0), 0, 255).astype(np.uint8))
    # float tiles and signed ints decode since r7d — see
    # test_tiff_float_tiles_and_predictor3 / test_tiff_signed_samples;
    # planar float stays the named residue
    ent = [(256, 3, [14]), (257, 3, [10]), (258, 3, [32]),
           (259, 3, [1]), (262, 3, [1]), (277, 3, [1]),
           (284, 3, [2]), (339, 3, [3]),
           (278, 3, [10]), (273, 4, None), (279, 4, None)]
    seg = f.astype("<f4").tobytes()
    with pytest.raises(tiff.TiffError, match="float-planar"):
        tiff.decode_tiff(_pack_tiff(
            [e if e[0] != 279 else (279, 4, [len(seg)]) for e in ent],
            [seg], "<"))


def test_tiff_float_tiles_and_predictor3():
    """Round 7d: float TILES place/crop like integer tiles; predictor 3
    (TechNote 3 byte-plane differencing) round-trips on strips AND
    tiles, both byte orders, f4 and f8."""
    rng = np.random.RandomState(31)
    f = (rng.rand(10, 13).astype(np.float32) * 9.0 - 2.0)
    f[0, 0], f[9, 12] = -2.0, 7.0
    norm = (f - f.min()) / (f.max() - f.min())
    want = np.clip(np.rint(norm * 255.0), 0, 255) \
        .astype(np.uint8).reshape(10, 13, 1)

    def pred3_rows(block, bits, endian):
        be = block.astype(np.dtype(">" + ("f4" if bits == 32
                                          else "f8")))
        rows, width = block.shape[:2]
        spp = block.shape[2] if block.ndim == 3 else 1
        bps = bits // 8
        a = np.frombuffer(be.tobytes(), dtype=np.uint8) \
            .reshape(rows, width * spp, bps)
        planes = a.transpose(0, 2, 1).reshape(rows, width * bps, spp)
        # libtiff fpDiff: byte[i] -= byte[i - spp] on the plane bytes
        out = np.diff(planes.astype(np.int16), axis=1,
                      prepend=np.zeros((rows, 1, spp), np.int16)) \
            .astype(np.uint8)
        return out.tobytes()

    def ftiff(data, *, bits=32, endian="<", tile=None, pred=1):
        h, w = data.shape[:2]
        spp = data.shape[2] if data.ndim == 3 else 1
        d3 = data.reshape(h, w, spp)
        ent = [(256, 3, [w]), (257, 3, [h]), (258, 3, [bits] * spp),
               (259, 3, [1]), (262, 3, [1]), (277, 3, [spp]),
               (339, 3, [3] * spp), (317, 3, [pred])]
        if tile:
            tw, tl = tile
            segs = []
            for ty in range(0, h, tl):
                for tx in range(0, w, tw):
                    block = np.zeros((tl, tw, spp), data.dtype)
                    sub = d3[ty:ty + tl, tx:tx + tw]
                    block[:sub.shape[0], :sub.shape[1]] = sub
                    segs.append(
                        pred3_rows(block, bits, endian) if pred == 3
                        else block.astype(np.dtype(
                            endian + ("f4" if bits == 32 else "f8"))
                        ).tobytes())
            ent += [(322, 3, [tw]), (323, 3, [tl]), (324, 4, None),
                    (325, 4, [len(s) for s in segs])]
        else:
            seg = pred3_rows(d3, bits, endian) if pred == 3 \
                else d3.astype(np.dtype(
                    endian + ("f4" if bits == 32 else "f8"))).tobytes()
            segs = [seg]
            ent += [(278, 3, [h]), (273, 4, None),
                    (279, 4, [len(s) for s in segs])]
        return _pack_tiff(ent, segs, endian)

    assert np.array_equal(tiff.decode_tiff(ftiff(f, tile=(8, 8))),
                          want)
    assert np.array_equal(
        tiff.decode_tiff(ftiff(f, tile=(8, 8), bits=64)), want)
    # predictor 3: strips and tiles; for pred 3 the bytes are
    # big-endian planes regardless of file order
    assert np.array_equal(tiff.decode_tiff(ftiff(f, pred=3)), want)
    assert np.array_equal(
        tiff.decode_tiff(ftiff(f, pred=3, tile=(8, 8))), want)
    assert np.array_equal(
        tiff.decode_tiff(ftiff(f, pred=3, bits=64)), want)
    # RGB float tiles, and RGB predictor 3 (stride = spp — the review
    # caught a stride-1 accumulate that garbled multi-sample files)
    c = rng.rand(6, 5, 3).astype(np.float32)
    cn = (c - c.min()) / (c.max() - c.min())
    cwant = np.clip(np.rint(cn * 255.0), 0, 255).astype(np.uint8)
    assert np.array_equal(tiff.decode_tiff(ftiff(c, tile=(4, 4))),
                          cwant)
    assert np.array_equal(tiff.decode_tiff(ftiff(c, pred=3)), cwant)
    assert np.array_equal(
        tiff.decode_tiff(ftiff(c, pred=3, tile=(4, 4))), cwant)
    # a malformed EXTRA strip entry must not append garbage rows or
    # skew the normalization (review: the loop now caps at the strips
    # the geometry needs)
    h, w = f.shape
    seg = f.astype("<f4").tobytes()
    junk = (np.full((5, w), 99.0, np.float32)).astype("<f4").tobytes()
    ent = [(256, 3, [w]), (257, 3, [h]), (258, 3, [32]),
           (259, 3, [1]), (262, 3, [1]), (277, 3, [1]),
           (339, 3, [3]), (278, 3, [h]), (273, 4, None),
           (279, 4, [len(seg), len(junk)])]
    got = tiff.decode_tiff(_pack_tiff(ent, [seg, junk], "<"))
    assert np.array_equal(got, want)


def test_tiff_signed_samples():
    """Round 7d SampleFormat 2: two's-complement samples shift to
    display (top-bit flip), incl. 16-bit high-byte display and
    predictor 2; palette+signed stays a named error."""
    rng = np.random.RandomState(33)
    s8 = rng.randint(-128, 128, size=(9, 11), dtype=np.int16)

    def stiff(data, *, bits=8, pred=1, photo=1):
        h, w = data.shape
        if bits == 8:
            raw = data.astype(np.int8)
        else:
            raw = data.astype("<i2")
        if pred == 2:
            raw = np.diff(raw.astype(np.int32), axis=1,
                          prepend=np.zeros((h, 1), np.int32))
            raw = raw.astype(np.int8 if bits == 8 else "<i2")
        seg = raw.tobytes()
        ent = [(256, 3, [w]), (257, 3, [h]), (258, 3, [bits]),
               (259, 3, [1]), (262, 3, [photo]), (277, 3, [1]),
               (339, 3, [2]), (317, 3, [pred]), (278, 3, [h]),
               (273, 4, None), (279, 4, [len(seg)])]
        if photo == 3:
            ent += [(320, 3, list(range(768)))]
        return _pack_tiff(ent, [seg], "<")

    want8 = (s8 + 128).astype(np.uint8).reshape(9, 11, 1)
    assert np.array_equal(tiff.decode_tiff(stiff(s8)), want8)
    assert np.array_equal(tiff.decode_tiff(stiff(s8, pred=2)), want8)
    s16 = rng.randint(-32768, 32768, size=(7, 6), dtype=np.int32)
    want16 = (((s16 + 32768) >> 8).astype(np.uint8)).reshape(7, 6, 1)
    assert np.array_equal(tiff.decode_tiff(stiff(s16, bits=16)),
                          want16)
    assert np.array_equal(
        tiff.decode_tiff(stiff(s16, bits=16, pred=2)), want16)
    # photometric 0 inverts the shifted display value
    assert np.array_equal(tiff.decode_tiff(stiff(s8, photo=0)),
                          255 - want8)
    with pytest.raises(tiff.TiffError, match="palette-signed"):
        tiff.decode_tiff(stiff(s8, photo=3))
