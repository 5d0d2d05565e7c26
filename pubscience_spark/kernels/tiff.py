"""Baseline TIFF 6.0 decoder — stdlib (zlib) + numpy + the LZW kernel.

TIFF is the remaining common still-image container after PNG/BMP/PNM/
JPEG/GIF (scanned documents, print pipelines, and the EXIF structure
itself is a TIFF IFD). Supported, per the public TIFF 6.0 spec:

- both byte orders (II/MM), classic 32-bit offsets,
- strip organization (RowsPerStrip + StripOffsets/StripByteCounts) AND
  tile organization (TileWidth/TileLength + TileOffsets/TileByteCounts,
  tags 322-325; right/bottom edge tiles padded per spec, round 6),
- compression: 1 none, 5 LZW (the PDF ``LZWDecode`` algorithm —
  :func:`kernels.pdfobj.lzw_decode` is reused), 8 / 32946 Deflate,
  32773 PackBits, 3 / 4 CCITT fax (T.4 1-D + 2-D and T.6 G4 bilevel strips via
  :mod:`kernels.ccitt`, round 6), 7 new-style JPEG (per-strip/tile
  abbreviated streams + shared JPEGTables through :mod:`kernels.jpeg`,
  round 6),
- Predictor 2 (horizontal differencing; per tile scanline when tiled),
- PhotometricInterpretation 0 (WhiteIsZero, inverted), 1 (BlackIsZero),
  2 (RGB), 3 (palette via ColorMap tag 320, incl. the widespread
  8-bit-values-in-16-bit-fields writer quirk, round 6); 8-bit and
  16-bit samples (16-bit follows the file byte order and displays the
  high byte, round 6), chunky AND separate-plane strip layouts
  (PlanarConfiguration 2, round 6), 1 / 3 / 4 samples per pixel
  (4 = RGB + unassociated alpha, alpha dropped).

Round 7 closes six more named-error classes: old-style JPEG
(compression 6, interchange-stream / SOI-scan layouts), IEEE float
samples (SampleFormat 3 → min/max-normalized display; strips AND
tiles, predictor 3 byte-plane differencing per TIFF TechNote 3),
tiled fax, and signed-int samples (SampleFormat 2 → top-bit-flip
display shift, predictor-2-safe).

Anything else (tag-assembled old JPEG, planar tiles, planar float,
palette+signed) is a named :class:`TiffError` — the error-column
contract.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class TiffError(ValueError):
    pass


# (tag) -> short name, for errors only
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}

# FillOrder 2 (LSB-first bytes, Class-F fax output): per-byte bit
# reversal table for bytes.translate
_BITREV = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))


def _read_ifd(raw: bytes, e: str, off: int) -> dict[int, list[int]]:
    if off + 2 > len(raw):
        raise TiffError("tiff-truncated-ifd")
    n = struct.unpack(e + "H", raw[off:off + 2])[0]
    tags: dict[int, list[int]] = {}
    for k in range(n):
        p = off + 2 + 12 * k
        ent = raw[p:p + 12]
        if len(ent) < 12:
            raise TiffError("tiff-truncated-ifd")
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * cnt
        data = ent[8:12] if total <= 4 else None
        if data is None:
            voff = struct.unpack(e + "I", ent[8:12])[0]
            data = raw[voff:voff + total]
            if len(data) < total:
                raise TiffError("tiff-truncated-value")
        if typ in (3,):                            # SHORT
            vals = list(struct.unpack(e + "H" * cnt, data[:2 * cnt]))
        elif typ in (4, 9):                        # LONG/SLONG
            vals = list(struct.unpack(e + "I" * cnt, data[:4 * cnt]))
        elif typ in (1, 2, 6, 7):                  # BYTE-ish
            vals = list(data[:cnt])
        else:                                      # RATIONAL etc: skip
            continue
        tags[tag] = vals
    return tags


def _unpackbits(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c < 128:                                # literal run
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:                              # replicate run
            if i >= n:
                raise TiffError("tiff-truncated-packbits")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # 128 = no-op
    # tolerate writers whose final run pads past the strip boundary
    # (libtiff accepts these) — the caller sized ``expect`` exactly
    return bytes(out[:expect])


def decode_tiff(raw: bytes) -> np.ndarray:
    """(H, W, C) uint8 (C = 1 gray or 3 RGB). Raises :class:`TiffError`
    on malformed or unsupported input, never IndexError & co."""
    try:
        return _decode(raw)
    except TiffError:
        raise
    except (IndexError, KeyError, ValueError, struct.error,
            zlib.error) as exc:
        raise TiffError(f"tiff-corrupt: {type(exc).__name__}") from exc


def _decompress_segment(data: bytes, comp: int, expect: int) -> bytes:
    """One strip or tile → exactly ``expect`` decompressed bytes."""
    if comp == 1:
        chunk = data[:expect]
    elif comp == 5:
        from .pdfobj import lzw_decode
        chunk = lzw_decode(data, early_change=1)[:expect]
    elif comp in (8, 32946):
        chunk = zlib.decompress(data)[:expect]
    elif comp == 32773:
        chunk = _unpackbits(data, expect)
    else:
        raise TiffError(f"tiff-compression-{comp}-unsupported")
    if len(chunk) < expect:
        raise TiffError("tiff-short-strip")
    return chunk


def _decode_fax(raw: bytes, t: dict, one, comp: int) -> np.ndarray:
    """Compression 3 (T.4, 1-D or 2-D per T4Options bit 0) / 4 (T.6
    G4) bilevel strips OR tiles (round 7 — each tile is an
    independent fax stream of TileWidth columns) → (H, W, 1) uint8
    via :mod:`kernels.ccitt` (round 6). Uncompressed-mode G4
    (T6Options bit 1) stays a named error."""
    from .ccitt import (CCITTError, decode_g3_1d, decode_g3_2d,
                        decode_g4)
    w, h = one(256), one(257)
    if not (w and h):
        raise TiffError("tiff-zero-dims")
    if one(277, 1) != 1:
        raise TiffError("tiff-fax-multisample-unsupported")
    if t.get(258, [1]) != [1]:
        raise TiffError("tiff-fax-bits-unsupported")
    photo = one(262, 0)
    if photo not in (0, 1):
        raise TiffError(f"tiff-photometric-{photo}-unsupported")
    g3_2d = comp == 3 and bool(one(292, 0) & 1)
    if comp == 4 and one(293, 0) & 2:
        raise TiffError("tiff-g4-uncompressed-unsupported")
    fill_order = one(266, 1)
    if fill_order not in (1, 2):
        raise TiffError(f"tiff-fillorder-{fill_order}-unsupported")

    def seg(data: bytes, cols: int, nrows: int) -> np.ndarray:
        if fill_order == 2:                        # LSB-first bytes
            data = data.translate(_BITREV)
        try:
            if comp == 4:
                return decode_g4(data, cols, nrows)
            if g3_2d:
                return decode_g3_2d(data, cols, nrows)
            return decode_g3_1d(data, cols, nrows)
        except CCITTError as exc:
            raise TiffError(str(exc)) from exc

    if 322 in t or 323 in t:                       # tiled fax (r7)
        tw, tl = one(322), one(323)
        if not (tw and tl):
            raise TiffError("tiff-zero-tile-dims")
        offsets, counts = t.get(324), t.get(325)
        across, down = -(-w // tw), -(-h // tl)
        if not offsets or not counts or len(offsets) != len(counts) \
                or len(offsets) < across * down:
            raise TiffError("tiff-missing-tiles")
        canvas = np.zeros((down * tl, across * tw), dtype=np.uint8)
        for ti in range(across * down):
            off, cnt = offsets[ti], counts[ti]
            data = raw[off:off + cnt]
            if len(data) < cnt:
                raise TiffError("tiff-truncated-tile")
            ty, tx = divmod(ti, across)
            canvas[ty * tl:(ty + 1) * tl,
                   tx * tw:(tx + 1) * tw] = seg(data, tw, tl)
        black = np.ascontiguousarray(canvas[:h, :w])
    else:
        offsets = t.get(273)
        counts = t.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("tiff-missing-strips")
        rows_per_strip = one(278, h)
        if rows_per_strip <= 0 \
                or len(offsets) < -(-h // rows_per_strip):
            raise TiffError("tiff-missing-strips")
        planes = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            data = raw[off:off + cnt]
            if len(data) < cnt:
                raise TiffError("tiff-truncated-strip")
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            planes.append(seg(data, w, nrows))
        black = np.concatenate(planes, axis=0)
    # decode_tiff returns DISPLAY-space gray. The decoded bit IS the
    # stored sample (codec-black run → 1). Photo 0 (WhiteIsZero, the
    # normal fax sense): sample max = black → codec-black displays
    # dark (0). Photo 1 (MinIsBlack): sample 0 = black → codec-black
    # runs display WHITE — libtiff's BWmap semantics; the 8-bit path
    # applies the same rule.
    bit = (1 - black) if photo == 0 else black
    gray = bit.astype(np.uint8) * np.uint8(255)
    return gray.reshape(h, w, 1)


def _decode_jpeg6(raw: bytes, t: dict, one) -> np.ndarray:
    """Compression 6 (old-style JPEG, TIFF 6.0 §22 — deprecated by
    TTN2 but still produced by 90s scanners): the common layouts carry
    a complete JPEG interchange stream, either pointed at by
    JPEGInterchangeFormat (513) / ...Length (514) or embedded in the
    single strip — found by the SOI scan most libtiffs use as the
    fallback. The fully tag-assembled variant (tables split across
    JPEGQTables/JPEGDCTables/JPEGACTables with bare scan strips)
    remains a named error."""
    from .jpeg import JpegError, decode_jpeg

    w, h = one(256), one(257)
    if not (w and h):
        raise TiffError("tiff-zero-dims")
    if 513 in t:
        off = one(513)
        ln = one(514, len(raw) - off)
        data = raw[off:off + ln]
        if data[:2] != b"\xff\xd8":
            raise TiffError("tiff-old-jpeg-no-soi")
    else:
        offsets, counts = t.get(273), t.get(279)
        if not offsets:
            raise TiffError("tiff-old-jpeg-no-stream")
        if len(offsets) > 1:
            raise TiffError("tiff-old-jpeg-multistrip-unsupported")
        end = offsets[0] + (counts[0] if counts
                            else len(raw) - offsets[0])
        data = raw[offsets[0]:end]
        i = data.find(b"\xff\xd8")
        if i < 0:
            raise TiffError("tiff-old-jpeg-no-soi")
        data = data[i:]
    try:
        img = decode_jpeg(data, apply_orientation=False)
    except JpegError as exc:
        raise TiffError(f"tiff-old-jpeg: {exc}") from exc
    if img.shape[0] < h or img.shape[1] < w:
        raise TiffError("tiff-old-jpeg-dims-mismatch")
    return np.ascontiguousarray(img[:h, :w])


def _decode_float(raw: bytes, t: dict, one, e: str,
                  comp: int) -> np.ndarray:
    """SampleFormat 3 (IEEE float, 32- or 64-bit) strips OR tiles →
    normalized display: finite values scale min→0, max→255 over the
    whole image (the float data has no intrinsic display range);
    non-finite samples display as 0; photometric 0 (WhiteIsZero)
    inverts the normalized value. Predictor 3 (floating-point
    horizontal differencing, TIFF TechNote 3: big-endian byte planes,
    byte-wise differenced) is undone per row. Planar float layouts
    stay named errors."""
    w, h = one(256), one(257)
    spp = one(277, 1)
    bits = t.get(258, [32])
    if one(284, 1) != 1:
        raise TiffError("tiff-float-planar-unsupported")
    predictor = one(317, 1)
    if predictor not in (1, 3):
        raise TiffError(f"tiff-float-predictor-{predictor}"
                        "-unsupported")
    photo = one(262, 1)
    if photo not in (0, 1, 2):
        raise TiffError(f"tiff-photometric-{photo}-unsupported")
    if spp not in (1, 3):
        raise TiffError(f"tiff-float-{spp}-samples-unsupported")
    bps = bits[0] // 8
    sdtype = np.dtype(e + ("f4" if bits[0] == 32 else "f8"))

    def undiff(chunk: bytes, rows: int, width: int) -> np.ndarray:
        """One decompressed segment → (rows, width, spp) float64."""
        if predictor == 3:
            # byte-wise accumulate with STRIDE = spp (libtiff fpAcc:
            # byte[i] += byte[i - spp]), i.e. one chain per residue
            # class mod spp, then deinterleave the big-endian planes
            a = np.frombuffer(chunk, dtype=np.uint8) \
                .reshape(rows, width * bps, spp)
            a = np.cumsum(a, axis=1, dtype=np.uint8)
            a = a.reshape(rows, bps, width * spp) \
                .transpose(0, 2, 1)
            return np.frombuffer(a.tobytes(),
                                 dtype=np.dtype(">" + sdtype.str[1:])
                                 ).reshape(rows, width, spp) \
                .astype(np.float64)
        return np.frombuffer(chunk, dtype=sdtype) \
            .reshape(rows, width, spp).astype(np.float64)

    if 322 in t or 323 in t:                       # tile organization
        tw, tl = one(322), one(323)
        if not (tw and tl):
            raise TiffError("tiff-zero-tile-dims")
        offsets, counts = t.get(324), t.get(325)
        across, down = -(-w // tw), -(-h // tl)
        if not offsets or not counts or len(offsets) != len(counts) \
                or len(offsets) < across * down:
            raise TiffError("tiff-missing-tiles")
        canvas = np.zeros((down * tl, across * tw, spp),
                          dtype=np.float64)
        for ti in range(across * down):
            off, cnt = offsets[ti], counts[ti]
            data = raw[off:off + cnt]
            if len(data) < cnt:
                raise TiffError("tiff-truncated-tile")
            chunk = _decompress_segment(data, comp,
                                        tl * tw * spp * bps)
            ty, tx = divmod(ti, across)
            canvas[ty * tl:(ty + 1) * tl,
                   tx * tw:(tx + 1) * tw] = undiff(chunk, tl, tw)
        arr = np.ascontiguousarray(canvas[:h, :w])
    else:
        offsets = t.get(273)
        counts = t.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("tiff-missing-strips")
        rps = one(278, h)
        n_strips = -(-h // rps) if rps > 0 else 0
        if rps <= 0 or len(offsets) < n_strips:
            raise TiffError("tiff-missing-strips")
        rows_list = []
        # cap at the strips the geometry needs: extra StripOffsets
        # entries in a malformed file must not append garbage rows
        # (which would also skew the whole-image normalization)
        for si in range(n_strips):
            off, cnt = offsets[si], counts[si]
            data = raw[off:off + cnt]
            if len(data) < cnt:
                raise TiffError("tiff-truncated-strip")
            nrows = min(rps, h - si * rps)
            chunk = _decompress_segment(data, comp,
                                        nrows * w * spp * bps)
            rows_list.append(undiff(chunk, nrows, w))
        arr = np.concatenate(rows_list, axis=0)
        if arr.shape[0] != h:
            raise TiffError("tiff-float-rows-mismatch")
    finite = np.isfinite(arr)
    vals = arr[finite]
    norm = np.zeros_like(arr)
    if vals.size and vals.max() > vals.min():
        lo, hi = vals.min(), vals.max()
        norm[finite] = (arr[finite] - lo) / (hi - lo)
    if photo == 0:                                 # WhiteIsZero
        norm = 1.0 - norm
        norm[~finite] = 0.0
    return np.clip(np.rint(norm * 255.0), 0, 255).astype(np.uint8)


def _decode_jpeg7(raw: bytes, t: dict, one) -> np.ndarray:
    """Compression 7 (new-style JPEG-in-TIFF, TTN2): each strip/tile
    is a complete or abbreviated JPEG stream; shared DQT/DHT live in
    a tables-only stream in the JPEGTables tag (347), merged after
    each segment's SOI — the libtiff recipe. A segment's own tables
    come after the shared ones, so per-segment redefinitions win.
    PhotometricInterpretation 6 (YCbCr) is the JPEG decoder's own
    color path; output channels follow the stream (1 gray / 3 RGB)."""
    from .jpeg import JpegError, decode_jpeg

    w, h = one(256), one(257)
    if not (w and h):
        raise TiffError("tiff-zero-dims")
    if one(284, 1) != 1:       # per-plane JPEG strips: not supported
        raise TiffError("tiff-planar-unsupported")
    photo = one(262, 6)
    if photo not in (1, 2, 6):  # 6 = YCbCr, the JPEG color path
        raise TiffError(f"tiff-photometric-{photo}-unsupported")
    body = b""
    tables = t.get(347)
    if tables:
        tb = bytes(tables)
        if len(tb) >= 4 and tb[:2] == b"\xff\xd8" \
                and tb[-2:] == b"\xff\xd9":
            body = tb[2:-2]
        else:
            raise TiffError("tiff-jpegtables-malformed")

    def seg_decode(data: bytes, exp_h: int, exp_w: int) -> np.ndarray:
        if data[:2] != b"\xff\xd8":
            raise TiffError("tiff-jpeg-missing-soi")
        merged = b"\xff\xd8" + body + data[2:] if body else data
        try:
            img = decode_jpeg(merged, apply_orientation=False)
        except JpegError as exc:
            raise TiffError(str(exc)) from exc
        if img.shape[0] < exp_h or img.shape[1] < exp_w:
            raise TiffError("tiff-jpeg-segment-short")
        return img[:exp_h, :exp_w]

    if 322 in t or 323 in t:                       # tile organization
        tw, tl = one(322), one(323)
        if not (tw and tl):
            raise TiffError("tiff-zero-tile-dims")
        offsets = t.get(324)
        counts = t.get(325)
        across = -(-w // tw)
        down = -(-h // tl)
        if not offsets or not counts or len(offsets) != len(counts) \
                or len(offsets) < across * down:
            raise TiffError("tiff-missing-tiles")
        canvas = None
        for ti in range(across * down):
            data = raw[offsets[ti]:offsets[ti] + counts[ti]]
            if len(data) < counts[ti]:
                raise TiffError("tiff-truncated-tile")
            img = seg_decode(data, tl, tw)
            if canvas is None:
                canvas = np.zeros((down * tl, across * tw,
                                   img.shape[2]), dtype=np.uint8)
            elif img.shape[2] != canvas.shape[2]:
                raise TiffError("tiff-jpeg-mixed-channels")
            ty, tx = divmod(ti, across)
            canvas[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = img
        return np.ascontiguousarray(canvas[:h, :w])

    offsets = t.get(273)                           # strip organization
    counts = t.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("tiff-missing-strips")
    rps = one(278, h)
    if rps <= 0 or len(offsets) < -(-h // rps):
        raise TiffError("tiff-missing-strips")
    parts = []
    for si in range(-(-h // rps)):
        off, cnt = offsets[si], counts[si]
        data = raw[off:off + cnt]
        if len(data) < cnt:
            raise TiffError("tiff-truncated-strip")
        part = seg_decode(data, min(rps, h - si * rps), w)
        if parts and part.shape[2] != parts[0].shape[2]:
            raise TiffError("tiff-jpeg-mixed-channels")
        parts.append(part)
    return parts[0] if len(parts) == 1 else np.concatenate(parts,
                                                           axis=0)


def _decode(raw: bytes) -> np.ndarray:
    if raw[:4] == b"II*\x00":
        e = "<"
    elif raw[:4] == b"MM\x00*":
        e = ">"
    else:
        raise TiffError("not-a-tiff")
    ifd_off = struct.unpack(e + "I", raw[4:8])[0]
    t = _read_ifd(raw, e, ifd_off)

    def one(tag, default=None):
        v = t.get(tag)
        if v is None:
            if default is None:
                raise TiffError(f"tiff-missing-tag-{tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    if not (w and h):
        raise TiffError("tiff-zero-dims")
    spp = one(277, 1)
    bits = t.get(258, [8])
    comp = one(259, 1)
    if comp in (3, 4):
        return _decode_fax(raw, t, one, comp)
    if comp == 7:
        return _decode_jpeg7(raw, t, one)
    if comp == 6:
        return _decode_jpeg6(raw, t, one)
    sample_fmt = one(339, 1)
    if sample_fmt == 3:                            # IEEE float (r7)
        if len(set(bits)) > 1 or bits[0] not in (32, 64):
            raise TiffError("tiff-float-bitdepth-unsupported")
        return _decode_float(raw, t, one, e, comp)
    if sample_fmt not in (1, 2, 4):                # unsigned/signed/undef
        raise TiffError(f"tiff-sampleformat-{sample_fmt}-unsupported")
    signed = sample_fmt == 2                       # r7: shift to display
    if all(b == 8 for b in bits):
        bps = 1                                    # bytes per sample
    elif all(b == 16 for b in bits):
        bps = 2                                    # 16-bit (scanners)
    elif len(set(bits)) > 1:
        raise TiffError("tiff-mixed-bitdepth-unsupported")
    else:
        raise TiffError(f"tiff-{bits[0]}bit-unsupported")
    photo = one(262, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    if planar not in (1, 2):
        raise TiffError(f"tiff-planar-{planar}-unsupported")
    if planar == 2 and (322 in t or 323 in t):
        raise TiffError("tiff-planar-tiled-unsupported")
    if one(266, 1) != 1:      # FillOrder 2 is bilevel-only in practice
        raise TiffError(f"tiff-fillorder-{one(266, 1)}-unsupported")
    if photo == 3:
        if spp != 1:
            raise TiffError("tiff-palette-multisample-unsupported")
        if bps != 1:
            raise TiffError("tiff-palette-16bit-unsupported")
        if signed:
            raise TiffError("tiff-palette-signed-unsupported")
        if not t.get(320):
            raise TiffError("tiff-palette-missing-colormap")
    elif photo not in (0, 1, 2):
        raise TiffError(f"tiff-photometric-{photo}-unsupported")
    # a stray ColorMap alongside photometric 0/1/2 is meaningless per
    # spec — ignored, as libtiff does
    if spp not in (1, 3, 4):
        raise TiffError(f"tiff-{spp}-samples-unsupported")
    if predictor not in (1, 2):
        raise TiffError(f"tiff-predictor-{predictor}-unsupported")

    # sample dtype follows the FILE byte order for 16-bit; predictor 2
    # differencing operates on full sample values (spec section 14)
    sdtype = np.uint8 if bps == 1 else np.dtype(e + "u2")

    if 322 in t or 323 in t:                       # tile organization
        tw, tl = one(322), one(323)
        if not (tw and tl):
            raise TiffError("tiff-zero-tile-dims")
        offsets = t.get(324)
        counts = t.get(325)
        across = -(-w // tw)
        down = -(-h // tl)
        if not offsets or not counts or len(offsets) != len(counts) \
                or len(offsets) < across * down:
            raise TiffError("tiff-missing-tiles")
        expect = tl * tw * spp * bps
        canvas = np.zeros((down * tl, across * tw, spp),
                          dtype=np.uint8 if bps == 1 else np.uint16)
        for ti in range(across * down):
            off, cnt = offsets[ti], counts[ti]
            data = raw[off:off + cnt]
            if len(data) < cnt:
                raise TiffError("tiff-truncated-tile")
            chunk = _decompress_segment(data, comp, expect)
            tile = np.frombuffer(chunk, dtype=sdtype) \
                .reshape(tl, tw, spp).astype(canvas.dtype)
            if predictor == 2:                     # per TILE scanline
                np.cumsum(tile, axis=1, dtype=canvas.dtype, out=tile)
            ty, tx = divmod(ti, across)
            canvas[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = tile
        arr = np.ascontiguousarray(canvas[:h, :w])  # crop edge padding
    elif planar == 2:                              # separate planes
        offsets = t.get(273)
        counts = t.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("tiff-missing-strips")
        rps = one(278, h)
        if rps <= 0:
            raise TiffError("tiff-missing-strips")
        spn = -(-h // rps)                         # strips per plane
        if len(offsets) < spn * spp:
            raise TiffError("tiff-missing-strips")
        planes = []
        for p in range(spp):
            out = bytearray()
            for si in range(spn):
                off, cnt = offsets[p * spn + si], counts[p * spn + si]
                data = raw[off:off + cnt]
                if len(data) < cnt:
                    raise TiffError("tiff-truncated-strip")
                nrows = min(rps, h - si * rps)
                out += _decompress_segment(data, comp,
                                           nrows * w * bps)
            planes.append(np.frombuffer(bytes(out), dtype=sdtype)
                          .reshape(h, w))
        arr = np.stack(planes, axis=2) \
            .astype(np.uint8 if bps == 1 else np.uint16)
        if predictor == 2:                         # per plane scanline
            np.cumsum(arr, axis=1, dtype=arr.dtype, out=arr)
    else:                                          # strip organization
        offsets = t.get(273)
        counts = t.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("tiff-missing-strips")
        rows_per_strip = one(278, h)
        if rows_per_strip <= 0 \
                or len(offsets) < -(-h // rows_per_strip):
            raise TiffError("tiff-missing-strips")

        row_bytes = w * spp * bps
        out = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            data = raw[off:off + cnt]
            if len(data) < cnt:
                raise TiffError("tiff-truncated-strip")
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            out += _decompress_segment(data, comp, nrows * row_bytes)

        arr = np.frombuffer(bytes(out), dtype=sdtype) \
            .reshape(h, w, spp)
        arr = arr.astype(np.uint8 if bps == 1 else np.uint16)
        if predictor == 2:                         # horizontal diff
            np.cumsum(arr, axis=1, dtype=arr.dtype, out=arr)

    if signed:
        # two's-complement → display: value + 2^(bits-1) mod 2^bits is
        # a top-bit flip, correct even after predictor-2 cumsum (the
        # differencing is mod 2^bits either way)
        arr = arr ^ (np.uint8(0x80) if bps == 1 else np.uint16(0x8000))
    if bps == 2:                                   # display: high byte
        arr = (arr >> 8).astype(np.uint8)

    if photo == 3:                                 # palette lookup
        cmap = t[320]
        if len(cmap) < 3 * 256:
            raise TiffError("tiff-colormap-short")
        lut = np.array(cmap[:3 * 256], dtype=np.uint16) \
            .reshape(3, 256).T                     # (256, 3) RGB
        # spec: 16-bit channel values (0..65535) → take the high byte;
        # widespread writer quirk: 8-bit values stored unscaled — if
        # nothing exceeds 255 treat the map as 8-bit (libtiff heuristic)
        if lut.max() > 255:
            lut >>= 8
        arr = lut.astype(np.uint8)[arr[:, :, 0]]
    elif photo == 0:                               # WhiteIsZero
        arr = 255 - arr
    if arr.shape[2] == 4:                          # drop alpha
        arr = np.ascontiguousarray(arr[:, :, :3])
    return arr
