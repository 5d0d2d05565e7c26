"""JPEG (ITU T.81 DCT, Huffman entropy coding) codec — stdlib + numpy.

JPEG is the dominant web image format; without it the multimodal tier's
"decode real bytes" claim had a hole (JPEG surfaced as an
``unsupported-format`` error row). This implements the Huffman DCT
processes from the public spec:

- marker parse (SOI/APPn/DQT/SOF0-2/DHT/SOS/DRI/RSTn/EOI),
- canonical Huffman tables rebuilt from the file's own DHT segments,
- entropy decode with byte-unstuffing, DC prediction, AC run-length,
  restart-interval resets,
- MULTI-SCAN: baseline files with one non-interleaved scan per
  component, and full progressive (SOF2) — spectral selection,
  successive approximation (DC/AC first + refinement passes, EOB runs)
  — the libjpeg-default scan scripts most of the progressive web uses,
- dequantize → de-zigzag → vectorized 8×8 IDCT (orthonormal DCT matrix,
  one einsum over every block of a component at once),
- 4:4:4 / 4:2:2 / 4:2:0 chroma upsampling, BT.601 YCbCr→RGB,
- 4-component Adobe CMYK / YCCK (APP14 transform byte; Adobe files
  store ink-inverted values — converted to RGB multiplicatively).

Arithmetic-coded, lossless, and hierarchical processes raise a named
error (the error-column path); they are vanishingly rare on the web.

``encode_jpeg`` (the test/datagen side) writes spec-valid files with
flat-length canonical Huffman tables (DHT carries the tables, so custom
tables are fully legal) at 4:4:4 or 4:2:0, baseline single- or
multi-scan, or PROGRESSIVE with a libjpeg-style successive-approximation
scan script — the round-trip PSNR tests drive the decoder through every
path. The zigzag order and DCT matrix are generated, not transcribed,
to avoid table typos.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# --------------------------------------------------------------- tables --

def _zigzag() -> np.ndarray:
    """Flat indices (row*8+col) in zigzag scan order."""
    out = []
    for s in range(15):
        cells = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            cells.reverse()
        out.extend(r * 8 + c for r, c in cells)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()

# Annex-K quantization tables (the quality knob scales them, IJG rule)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n[:, None]
    c = np.cos((2 * n[None, :] + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return (c * 0.5).astype(np.float64)          # orthonormal


_C = _dct_matrix()


# -------------------------------------------------------------- huffman --

class _HuffTable:
    """Canonical table from DHT (bits[1..16] counts + symbol list);
    decode via (length, code) dict."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                self.lookup[(length, code)] = sym
                self.enc[sym] = (length, code)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise JpegError("jpeg-truncated-entropy")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("jpeg-bad-huffman-code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# -------------------------------------------------------------- decoder --

def _exif_orientation(seg: bytes) -> int:
    """Orientation (1-8) from an APP1 Exif payload; 1 when absent or
    unparseable. Honoring it matters: phone cameras store portrait
    shots rotated with orientation=6/8 — browsers auto-apply it."""
    if not seg.startswith(b"Exif\x00\x00"):
        return 1
    t = seg[6:]
    if t[:2] == b"II":
        endian = "<"
    elif t[:2] == b"MM":
        endian = ">"
    else:
        return 1
    try:
        ifd0 = struct.unpack(endian + "I", t[4:8])[0]
        n = struct.unpack(endian + "H", t[ifd0:ifd0 + 2])[0]
        for k in range(n):
            e = t[ifd0 + 2 + 12 * k: ifd0 + 14 + 12 * k]
            tag, typ = struct.unpack(endian + "HH", e[:4])
            if tag == 0x0112 and typ == 3:
                val = struct.unpack(endian + "H", e[8:10])[0]
                return val if 1 <= val <= 8 else 1
    except (struct.error, IndexError):
        return 1
    return 1


def _apply_orientation(img: np.ndarray, o: int) -> np.ndarray:
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return np.transpose(img, (1, 0, 2))
    if o == 6:
        return np.rot90(img, -1)                  # 90° clockwise
    if o == 7:
        return np.transpose(img, (1, 0, 2))[::-1, ::-1]
    if o == 8:
        return np.rot90(img, 1)                   # 90° counter-clockwise
    return img

def _entropy_span(raw: bytes, start: int) -> tuple[bytes, int]:
    """Unstuffed entropy bytes of one scan starting at ``start``, plus
    the file offset of the next marker (EOI / DHT / SOS / ...). 0xFF00
    stuffing is stripped and RSTn markers are dropped (the decoder
    resynchronizes by restart-interval counting + bit alignment)."""
    out = bytearray()
    i = start
    n = len(raw)
    while i < n:
        b = raw[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            i = n
            break
        m = raw[i + 1]
        if m == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:                   # RSTn
            i += 2
        else:                                     # EOI / next segment
            break
    return bytes(out), i


def decode_jpeg(raw: bytes, apply_orientation: bool = True) -> np.ndarray:
    """(H, W, C) uint8 — C=3 RGB for YCbCr files, C=1 for grayscale.
    EXIF orientation is applied by default (the browser behavior).
    Truncated/corrupt input raises :class:`JpegError` (never IndexError
    etc. — the operators' error-column contract)."""
    try:
        return _decode(raw, apply_orientation)
    except JpegError:
        raise
    except (IndexError, KeyError, ValueError, struct.error) as exc:
        # ValueError covers numpy frombuffer/broadcast errors from
        # truncated DQT/DHT segments (JpegError re-raised above first)
        raise JpegError(f"jpeg-corrupt: {type(exc).__name__}") from exc


def _block_full(br: _BitReader, blk: np.ndarray, dct: _HuffTable,
                act: _HuffTable, preds: dict, cid: int) -> None:
    """Baseline DC+AC decode of one block (coefficients land in zigzag
    index order; de-zigzag happens at IDCT time)."""
    s = br.decode(dct)
    diff = _extend(br.read_bits(s), s)
    preds[cid] += diff
    blk[0] = preds[cid]
    k = 1
    while k < 64:
        rs = br.decode(act)
        r, sz = rs >> 4, rs & 15
        if sz == 0:
            if r == 15:                            # ZRL
                k += 16
                continue
            break                                  # EOB
        k += r
        if k > 63:
            raise JpegError("jpeg-coef-overrun")
        blk[k] = _extend(br.read_bits(sz), sz)
        k += 1


def _block_ac_first(br: _BitReader, act: _HuffTable, blk: np.ndarray,
                    ss: int, se: int, al: int, eobrun: list[int]) -> None:
    """Progressive AC first scan (Ah=0): band Ss..Se at precision Al,
    with EOB-run codes spanning all-zero-band blocks."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:                            # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1               # EOBn: this block is
            if r:                                  # one of the 2^r+bits
                eobrun[0] += br.read_bits(r)
            break
        k += r
        if k > se:
            raise JpegError("jpeg-coef-overrun")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _block_ac_refine(br: _BitReader, act: _HuffTable, blk: np.ndarray,
                     ss: int, se: int, al: int, eobrun: list[int]) -> None:
    """Progressive AC refinement (Ah>0): one correction bit per
    already-nonzero coefficient, newly-nonzero coefficients coded with
    zero-HISTORY run lengths (the T.81 G.1.2.3 algorithm — history runs
    count only coefficients still zero, with correction bits of the
    nonzero ones interleaved)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = br.decode(act)
            r, s = rs >> 4, rs & 15
            if s:
                if s != 1:                         # new coef is ±1·2^Al
                    raise JpegError("jpeg-bad-refinement-size")
                s = p1 if br.read_bit() else m1
            else:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += br.read_bits(r)
                    break                          # EOB logic below
                # ZRL: s stays 0, skip 16 zero-history coefficients
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    # correction bit; (c & p1) == 0 guards double-apply
                    if br.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break                      # target zero position
                k += 1
            if s:
                if k > se:
                    raise JpegError("jpeg-coef-overrun")
                blk[k] = s
            k += 1
    if eobrun[0] > 0:
        while k <= se:                             # EOB region still
            c = int(blk[k])                        # carries correction
            if c != 0:                             # bits for nonzeroes
                if br.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def _decode_scan(entropy: bytes, scan_comps: list, ss: int, se: int,
                 ah: int, al: int, *, progressive: bool,
                 huff_dc: dict, huff_ac: dict, planes: dict,
                 compinfo: dict, mcux: int, mcuy: int,
                 restart_interval: int) -> None:
    """Decode one scan's entropy data into the coefficient planes.
    Interleaved scans traverse MCUs; single-component scans traverse
    that component's own block grid (T.81 A.2.2 — its dimensions come
    from ceil(W·h/hmax), NOT from the MCU grid)."""
    br = _BitReader(entropy)
    if not progressive:
        kind = "full"
    elif ss == 0:
        if se != 0:
            raise JpegError("jpeg-bad-progressive-scan")
        kind = "dc-first" if ah == 0 else "dc-refine"
    else:
        if len(scan_comps) != 1:
            raise JpegError("jpeg-bad-progressive-scan")
        kind = "ac-first" if ah == 0 else "ac-refine"

    tabs = {}
    for cid, td, ta in scan_comps:
        dct = huff_dc.get(td)
        act = huff_ac.get(ta)
        if kind in ("full", "dc-first") and dct is None:
            raise JpegError("jpeg-missing-huff-table")
        if kind in ("full", "ac-first", "ac-refine") and act is None:
            raise JpegError("jpeg-missing-huff-table")
        tabs[cid] = (dct, act)

    if len(scan_comps) > 1:                        # interleaved: MCUs
        def units():
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for cid, _td, _ta in scan_comps:
                        ch, cv = compinfo[cid][0], compinfo[cid][1]
                        for by in range(cv):
                            for bx in range(ch):
                                blocks.append((cid, my * cv + by,
                                               mx * ch + bx))
                    yield blocks
    else:                                          # single comp: its grid
        cid0 = scan_comps[0][0]
        wb, hb = compinfo[cid0][3], compinfo[cid0][4]

        def units():
            for by in range(hb):
                for bx in range(wb):
                    yield [(cid0, by, bx)]

    preds = {c[0]: 0 for c in scan_comps}
    eobrun = [0]
    unit_idx = 0
    for blocks in units():
        if restart_interval and unit_idx \
                and unit_idx % restart_interval == 0:
            br.align()
            preds = dict.fromkeys(preds, 0)
            eobrun[0] = 0
        for cid, by, bx in blocks:
            blk = planes[cid][by, bx]
            dct, act = tabs[cid]
            if kind == "full":
                _block_full(br, blk, dct, act, preds, cid)
            elif kind == "dc-first":
                s = br.decode(dct)
                diff = _extend(br.read_bits(s), s)
                preds[cid] += diff
                blk[0] = preds[cid] << al
            elif kind == "dc-refine":
                if br.read_bit():
                    blk[0] |= 1 << al
            elif kind == "ac-first":
                _block_ac_first(br, act, blk, ss, se, al, eobrun)
            else:
                _block_ac_refine(br, act, blk, ss, se, al, eobrun)
        unit_idx += 1


def _decode(raw: bytes, apply_orientation: bool = True) -> np.ndarray:
    if raw[:2] != b"\xff\xd8":
        raise JpegError("not-a-jpeg")
    orientation = 1
    adobe_transform = None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps = None            # list of (cid, h, v, tq)
    size = None
    progressive = False
    restart_interval = 0
    planes: dict[int, np.ndarray] = {}
    compinfo: dict[int, tuple] = {}
    mcux = mcuy = 0
    n_scans = 0
    i = 2
    while i + 2 <= len(raw):
        if raw[i] != 0xFF:
            raise JpegError("jpeg-bad-marker")
        marker = raw[i + 1]
        if marker == 0xFF:                         # fill byte padding
            i += 1
            continue
        if marker == 0xD9:                         # EOI
            break
        if i + 4 > len(raw):
            raise JpegError("jpeg-truncated")
        seglen = struct.unpack(">H", raw[i + 2:i + 4])[0]
        seg = raw[i + 4:i + 2 + seglen]
        if marker == 0xE1 and seg.startswith(b"Exif\x00\x00"):
            # only the Exif APP1 — a later XMP APP1 (the standard
            # phone/Photoshop layout) must not clobber the orientation
            orientation = _exif_orientation(seg)
        elif marker == 0xEE and seg.startswith(b"Adobe"):
            if len(seg) >= 12:                     # transform byte:
                adobe_transform = seg[11]          # 0 CMYK/RGB, 1 YCC,
        elif marker == 0xDB:                       # DQT       2 YCCK
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128],
                                         dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64],
                                         dtype=np.uint8).astype(np.int64)
                    p += 64
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals               # stored in zigzag order
                qt[tq] = table
        elif marker in (0xC0, 0xC1, 0xC2):         # SOF0/1 baseline, SOF2
            if comps is not None:
                raise JpegError("jpeg-multiple-frames")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            size = (h, w)
            if not (h and w):
                raise JpegError("jpeg-zero-dims")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if not (hmax and vmax):
                raise JpegError("jpeg-zero-sampling")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, ch, cv, tq in comps:
                # own-grid dims for non-interleaved scans (T.81 A.1.1)
                cw = -(-w * ch // hmax)            # component pixel dims
                chh = -(-h * cv // vmax)
                compinfo[cid] = (ch, cv, tq,
                                 -(-cw // 8), -(-chh // 8))
                planes[cid] = np.zeros((mcuy * cv, mcux * ch, 64),
                                       dtype=np.int64)
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("jpeg-arithmetic-unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise JpegError("jpeg-lossless-or-hierarchical-unsupported")
        elif marker == 0xC4:                       # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nsym = sum(counts)
                symbols = seg[p + 17:p + 17 + nsym]
                (huff_ac if tc else huff_dc)[th] = _HuffTable(counts,
                                                              symbols)
                p += 17 + nsym
        elif marker == 0xDD:                       # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                       # SOS: decode the scan
            if comps is None:                      # with the table state
                raise JpegError("jpeg-sos-before-sof")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                if cid not in planes:
                    raise JpegError("jpeg-scan-unknown-component")
                scan_comps.append((cid, seg[2 + 2 * c] >> 4,
                                   seg[2 + 2 * c] & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            entropy, nxt = _entropy_span(raw, i + 2 + seglen)
            _decode_scan(entropy, scan_comps, ss, se,
                         ahal >> 4, ahal & 15, progressive=progressive,
                         huff_dc=huff_dc, huff_ac=huff_ac, planes=planes,
                         compinfo=compinfo, mcux=mcux, mcuy=mcuy,
                         restart_interval=restart_interval)
            n_scans += 1
            i = nxt
            continue
        i = i + 2 + seglen
    if comps is None or size is None or n_scans == 0:
        raise JpegError("jpeg-missing-sof-or-sos")

    H, W = size
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # dequantize -> de-zigzag -> IDCT, one shot per component
    out_planes = {}
    for cid, ch, cv, tq in comps:
        q = qt.get(tq)
        if q is None:
            raise JpegError("jpeg-missing-quant-table")
        # entropy decode filled blocks in zigzag sequence — de-zigzag to
        # natural (row-major) order before dequant/IDCT
        zz = planes[cid].reshape(-1, 64)
        coefs = np.zeros_like(zz)
        coefs[:, ZIGZAG] = zz
        coefs = coefs * q[None, :]
        blocks = coefs.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C)
        by, bx = mcuy * cv, mcux * ch
        img = (spatial.reshape(by, bx, 8, 8)
               .transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        img = img + 128.0
        # upsample to full resolution and crop
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        out_planes[cid] = img[:H, :W]

    def _ycc_to_rgb(y, cb, cr):
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return r, g, b

    ids = [c[0] for c in comps]
    if len(ids) == 1:
        # round-then-clip, matching the RGB path (round-4 review: the
        # truncating variant was off by one on *.5 samples)
        out = np.clip(np.round(out_planes[ids[0]]),
                      0, 255).astype(np.uint8)[:, :, None]
    elif len(ids) == 3:
        p0, p1_, p2 = (out_planes[i] for i in ids)
        if adobe_transform == 0:                   # Adobe RGB (rare)
            r, g, b = p0, p1_, p2
        else:                                      # YCbCr (the default)
            r, g, b = _ycc_to_rgb(p0, p1_, p2)
        out = np.clip(np.round(np.stack([r, g, b], axis=2)),
                      0, 255).astype(np.uint8)
    elif len(ids) == 4:
        # Adobe CMYK/YCCK. Adobe writers store INK-INVERTED values
        # (255 = no ink); YCCK additionally runs the YCC transform over
        # the inverted C'M'Y'. RGB via the multiplicative blend
        # R = C'·K'/255 (the PIL/libjpeg-consumer convention). Without
        # an APP14 marker values are taken as straight CMYK.
        p0, p1_, p2, p3 = (out_planes[i] for i in ids)
        if adobe_transform == 2:                   # YCCK
            c_, m_, y_ = _ycc_to_rgb(p0, p1_, p2)
            k_ = p3
        elif adobe_transform is not None:          # Adobe CMYK (inverted)
            c_, m_, y_, k_ = p0, p1_, p2, p3
        else:                                      # straight CMYK
            c_, m_, y_, k_ = (255.0 - p0, 255.0 - p1_,
                              255.0 - p2, 255.0 - p3)
        c_ = np.clip(c_, 0, 255)
        m_ = np.clip(m_, 0, 255)
        y_ = np.clip(y_, 0, 255)
        k_ = np.clip(k_, 0, 255)
        rgb = np.stack([c_ * k_, m_ * k_, y_ * k_], axis=2) / 255.0
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    else:
        raise JpegError(f"jpeg-{len(ids)}-component-unsupported")
    if apply_orientation and orientation != 1:
        out = np.ascontiguousarray(_apply_orientation(out, orientation))
    return out


# -------------------------------------------------------------- encoder --

def _flat_table(symbols: list[int], length: int) -> tuple[list[int], bytes]:
    """All symbols at one code length — valid iff len(symbols) < 2**length
    (strict, so the all-ones code stays unused as the spec wants)."""
    assert len(symbols) < (1 << length)
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return counts, bytes(symbols)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)          # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)                       # pad with 1-bits


def _quant_blocks(pp: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(hb, wb, 64) natural-order quantized coefficients for a padded
    (hb·8, wb·8) sample plane — whole-plane DCT in one einsum."""
    hb, wb = pp.shape[0] // 8, pp.shape[1] // 8
    blocks = pp.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    f = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)
    qq = np.round(f.reshape(-1, 64) / q.astype(np.float64)).astype(np.int64)
    return qq.reshape(hb, wb, 64)


def _emit_sym(bw: _BitWriter, tab: _HuffTable, sym: int) -> None:
    ln, code = tab.enc[sym]
    bw.write(code, ln)


class _ProgState:
    """Cross-block AC-scan state: pending EOB run + the correction bits
    deferred from EOB-run blocks (refinement scans)."""
    __slots__ = ("eobrun", "bits")

    def __init__(self) -> None:
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self, bw: _BitWriter, ac: _HuffTable) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            _emit_sym(bw, ac, nbits << 4)          # EOBn
            if nbits:
                bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.bits:
            bw.write(b, 1)
        self.bits = []


def _emit_dc(bw: _BitWriter, dc: _HuffTable, v: int, pred: int) -> int:
    """Huffman DC difference coding; returns the new predictor."""
    diff = v - pred
    s = abs(diff).bit_length()
    _emit_sym(bw, dc, s)
    if s:
        mag = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(mag & ((1 << s) - 1), s)
    return v


def _emit_ac_first(bw: _BitWriter, ac: _HuffTable, zz: np.ndarray,
                   ss: int, se: int, al: int, state: _ProgState) -> None:
    """Progressive AC first scan for one block (also the baseline AC
    path at ss=1, se=63, al=0 — baseline callers flush per block so the
    EOB run never spans blocks there)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (-v if v < 0 else v) >> al
        if t == 0:
            r += 1
            continue
        state.flush(bw, ac)                        # pending EOB run
        while r > 15:
            _emit_sym(bw, ac, 0xF0)                # ZRL
            r -= 16
        s = t.bit_length()
        _emit_sym(bw, ac, (r << 4) | s)
        t2 = t if v >= 0 else ~t                   # one's-complement neg
        bw.write(t2 & ((1 << s) - 1), s)
        r = 0
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush(bw, ac)


def _emit_ac_refine(bw: _BitWriter, ac: _HuffTable, zz: np.ndarray,
                    ss: int, se: int, al: int, state: _ProgState) -> None:
    """Progressive AC refinement for one block: newly-nonzero coefs
    (magnitude>>al == 1) run-length coded over zero-HISTORY positions,
    correction bits of already-nonzero coefs interleaved / deferred
    into the EOB-run buffer (T.81 G.1.2.3)."""
    absv = {k: (abs(int(zz[k])) >> al) for k in range(ss, se + 1)}
    eobpos = ss - 1
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eobpos = k                             # last newly-nonzero
    r = 0
    br_bits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:              # ZRLs not foldable
            state.flush(bw, ac)                    # into the EOB run
            _emit_sym(bw, ac, 0xF0)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:                                  # already nonzero:
            br_bits.append(t & 1)                  # one correction bit
            continue
        state.flush(bw, ac)
        _emit_sym(bw, ac, (r << 4) | 1)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)   # sign of the new coef
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        state.eobrun += 1
        state.bits.extend(br_bits)
        if state.eobrun == 0x7FFF or len(state.bits) > 900:
            state.flush(bw, ac)


def _default_script(nc: int) -> list[tuple[list[int], int, int, int, int]]:
    """libjpeg-style successive-approximation scan script: DC first at
    Al=1, split AC bands at Al=2, two AC refinement rounds, DC
    refinement — exercises every progressive decode path."""
    everyone = list(range(nc))
    scans: list[tuple[list[int], int, int, int, int]] = [
        (everyone, 0, 0, 0, 1)]
    for ci in everyone:
        scans.append(([ci], 1, 5, 0, 2))
    for ci in everyone:
        scans.append(([ci], 6, 63, 0, 2))
    for ci in everyone:
        scans.append(([ci], 1, 63, 2, 1))
    scans.append((everyone, 0, 0, 1, 0))
    for ci in everyone:
        scans.append(([ci], 1, 63, 1, 0))
    return scans


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0,
                progressive: bool = False,
                separate_scans: bool = False,
                adobe_transform: int | None = None) -> bytes:
    """JPEG bytes from (H, W, 3) RGB, (H, W[, 1]) grayscale, or
    (H, W, 4) Adobe-convention inverted-CMYK uint8.

    - ``subsample=True`` writes 4:2:0 (2×2-averaged chroma);
    - ``restart_interval`` > 0 emits DRI + RSTn markers every that many
      MCUs/blocks (exercises the decoder's restart/resync path in every
      scan type);
    - ``progressive=True`` writes SOF2 with a libjpeg-style successive-
      approximation scan script (DC/AC first + refinement passes, EOB
      runs);
    - ``separate_scans=True`` (baseline only) writes one non-interleaved
      scan per component — the legal baseline multi-scan layout;
    - 4-channel input stores the planes as given (Adobe ink-inverted
      convention) with an APP14 marker: ``adobe_transform=0`` (CMYK,
      the default) or ``2`` (YCCK — YCC transform over C'M'Y')."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    H, W = arr.shape[:2]
    nch = arr.shape[2]
    if nch not in (1, 3, 4):
        raise ValueError(f"encode_jpeg: {nch}-channel input unsupported")
    if nch == 4 and subsample:
        raise ValueError("encode_jpeg: CMYK is written 4:4:4 only")
    if progressive and separate_scans:
        raise ValueError("encode_jpeg: separate_scans is a baseline "
                         "layout (progressive has its own scan script)")
    gray = nch == 1
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    dc_syms = list(range(12))
    # EOBn symbols (r<<4, s=0) are required by progressive refinement
    ac_syms = sorted({0xF0} | {r << 4 for r in range(15)}
                     | {(r << 4) | s for r in range(16)
                        for s in range(1, 11)})
    dc_tab = _HuffTable(*_flat_table(dc_syms, 5))
    ac_tab = _HuffTable(*_flat_table(ac_syms, 9))

    def _fwd_ycc(r, g, b):
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        return y, cb, cr

    if gray:
        planes = [(arr[:, :, 0].astype(np.float64) - 128.0, ql, 1, 1)]
    elif nch == 4:
        cmyk = arr.astype(np.float64)
        if adobe_transform is None:
            adobe_transform = 0
        if adobe_transform == 2:                   # YCCK
            y, cb, cr = _fwd_ycc(cmyk[:, :, 0], cmyk[:, :, 1],
                                 cmyk[:, :, 2])
            chans = [y, cb, cr, cmyk[:, :, 3]]
        elif adobe_transform == 0:
            chans = [cmyk[:, :, c] for c in range(4)]
        else:
            raise ValueError("encode_jpeg: adobe_transform must be 0 "
                             "(CMYK) or 2 (YCCK) for 4-channel input")
        planes = [(c - 128.0, ql, 1, 1) for c in chans]
    else:
        rgb = arr.astype(np.float64)
        y, cb, cr = _fwd_ycc(rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2])
        y = y - 128.0
        cb = cb - 128.0
        cr = cr - 128.0
        if subsample:
            def _avg2(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return (pp.reshape(hh // 2, 2, ww // 2, 2)
                        .mean(axis=(1, 3)))
            planes = [(y, ql, 2, 2), (_avg2(cb), qc, 1, 1),
                      (_avg2(cr), qc, 1, 1)]
        else:
            planes = [(y, ql, 1, 1), (cb, qc, 1, 1), (cr, qc, 1, 1)]

    nc = len(planes)
    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    qcoef = []                                     # natural-order ints
    grids = []                                     # own-grid (wb, hb)
    for p, q, ch, cv in planes:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        qcoef.append(_quant_blocks(pp, q))
        cw = -(-W * ch // hmax)
        chh = -(-H * cv // vmax)
        grids.append((-(-cw // 8), -(-chh // 8)))

    def _rst_break(bw: _BitWriter, rst_n: int,
                   states: "list[_ProgState] | None" = None) -> None:
        if states:
            for st in states:
                st.flush(bw, ac_tab)
        bw.flush()
        bw.out.extend(bytes([0xFF, 0xD0 + (rst_n & 7)]))

    # ---- entropy emission per scan -> list of (sos_header, bytes) ----
    scan_payloads: list[tuple[bytes, bytes]] = []

    def _sos_header(comp_ids: list[int], ss: int, se: int,
                    ah: int, al: int) -> bytes:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])           # DC table 0, AC table 0
        return sos + bytes([ss, se, (ah << 4) | al])

    def _units(comp_ids: list[int]):
        if len(comp_ids) > 1:                      # interleaved MCUs
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for ci in comp_ids:
                        ch, cv = planes[ci][2], planes[ci][3]
                        for by in range(cv):
                            for bx in range(ch):
                                blocks.append((ci, my * cv + by,
                                               mx * ch + bx))
                    yield blocks
        else:                                      # own grid
            ci = comp_ids[0]
            wb, hb = grids[ci]
            for by in range(hb):
                for bx in range(wb):
                    yield [(ci, by, bx)]

    def _emit_scan(comp_ids: list[int], ss: int, se: int,
                   ah: int, al: int) -> None:
        bw = _BitWriter()
        preds = {ci: 0 for ci in comp_ids}
        state = _ProgState()
        rst_n = 0
        unit_idx = 0
        for blocks in _units(comp_ids):
            if restart_interval and unit_idx \
                    and unit_idx % restart_interval == 0:
                _rst_break(bw, rst_n, [state])
                rst_n += 1
                preds = dict.fromkeys(preds, 0)
            for ci, by, bx in blocks:
                nat = qcoef[ci][by, bx]
                zz = nat[ZIGZAG]
                if not progressive:                # baseline full block
                    preds[ci] = _emit_dc(bw, dc_tab, int(zz[0]),
                                         preds[ci])
                    _emit_ac_first(bw, ac_tab, zz, 1, 63, 0, state)
                    state.flush(bw, ac_tab)        # plain EOB per block
                elif ss == 0 and ah == 0:          # DC first
                    preds[ci] = _emit_dc(bw, dc_tab,
                                         int(zz[0]) >> al, preds[ci])
                elif ss == 0:                      # DC refine
                    bw.write((int(zz[0]) >> al) & 1, 1)
                elif ah == 0:                      # AC first
                    _emit_ac_first(bw, ac_tab, zz, ss, se, al, state)
                else:                              # AC refine
                    _emit_ac_refine(bw, ac_tab, zz, ss, se, al, state)
            unit_idx += 1
        state.flush(bw, ac_tab)
        bw.flush()
        scan_payloads.append((_sos_header(comp_ids, ss, se, ah, al),
                              bytes(bw.out)))

    if progressive:
        for comp_ids, ss, se, ah, al in _default_script(nc):
            _emit_scan(comp_ids, ss, se, ah, al)
    elif separate_scans:
        for ci in range(nc):
            _emit_scan([ci], 0, 63, 0, 0)
    else:
        _emit_scan(list(range(nc)), 0, 63, 0, 0)

    # ------------------------------------------------ file assembly --
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    if nch == 4:
        seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0,
                                         adobe_transform))
    seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if nc > 1:
        seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, H, W, nc)
    for ci in range(nc):
        ch, cv = (planes[ci][2], planes[ci][3])
        q_id = 0 if (gray or nch == 4 or ci == 0) else 1
        sof += bytes([ci + 1, (ch << 4) | cv, q_id])
    seg(0xC2 if progressive else 0xC0, sof)
    counts, syms = _flat_table(dc_syms, 5)
    seg(0xC4, bytes([0x00]) + bytes(counts) + syms)
    counts, syms = _flat_table(ac_syms, 9)
    seg(0xC4, bytes([0x10]) + bytes(counts) + syms)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    for sos, payload in scan_payloads:
        seg(0xDA, sos)
        out.extend(payload)
    out.extend(b"\xff\xd9")
    return bytes(out)
