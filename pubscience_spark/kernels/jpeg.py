"""Baseline JPEG (ITU T.81 sequential DCT) decoder — pure stdlib + numpy.

JPEG is the dominant web image format; without it the multimodal tier's
"decode real bytes" claim had a hole (JPEG surfaced as an
``unsupported-format`` error row). This implements the baseline
sequential Huffman process from the public spec:

- marker parse (SOI/APPn/DQT/SOF0-1/DHT/SOS/DRI/RSTn/EOI),
- canonical Huffman tables rebuilt from the file's own DHT segments,
- entropy decode with byte-unstuffing, DC prediction, AC run-length,
  restart-interval resets,
- dequantize → de-zigzag → vectorized 8×8 IDCT (orthonormal DCT matrix,
  one einsum over every block of a component at once),
- 4:4:4 / 4:2:2 / 4:2:0 chroma upsampling, BT.601 YCbCr→RGB.

Progressive (SOF2) and arithmetic-coded files raise a named error (the
error-column path); they are rare on the web relative to baseline.

``encode_jpeg`` (the test/datagen side) writes spec-valid baseline files
with flat-length canonical Huffman tables (DHT carries the tables, so
custom tables are fully legal) at 4:4:4 or 4:2:0 — the round-trip PSNR
tests drive the decoder through every path. The zigzag order and DCT
matrix are generated, not transcribed, to avoid table typos.
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

def _unstuff(scan: bytes) -> tuple[bytes, list[int]]:
    """Strip 0xFF00 stuffing; record restart-marker positions (offsets
    into the UNSTUFFED stream). Stops at any non-RST marker."""
    out = bytearray()
    restarts = []
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = scan[i + 1]
        if m == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:                   # RSTn
            restarts.append(len(out))
            i += 2
        else:                                     # EOI / next segment
            break
    return bytes(out), restarts


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


def _decode(raw: bytes, apply_orientation: bool = True) -> np.ndarray:
    if raw[:2] != b"\xff\xd8":
        raise JpegError("not-a-jpeg")
    orientation = 1
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps = None            # list of (cid, h, v, tq)
    size = None
    restart_interval = 0
    i = 2
    scan_info = None
    while i + 4 <= len(raw):
        if raw[i] != 0xFF:
            raise JpegError("jpeg-bad-marker")
        marker = raw[i + 1]
        if marker == 0xFF:                         # fill byte padding
            i += 1
            continue
        if marker == 0xD9:                         # EOI
            break
        seglen = struct.unpack(">H", raw[i + 2:i + 4])[0]
        seg = raw[i + 4:i + 2 + seglen]
        if marker == 0xE1 and seg.startswith(b"Exif\x00\x00"):
            # only the Exif APP1 — a later XMP APP1 (the standard
            # phone/Photoshop layout) must not clobber the orientation
            orientation = _exif_orientation(seg)
        elif marker == 0xDB:                       # DQT
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
        elif marker in (0xC0, 0xC1):               # SOF0/1 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            size = (h, w)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("jpeg-progressive-or-nonbaseline")
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
        elif marker == 0xDA:                       # SOS
            ns = seg[0]
            scan_info = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                          seg[2 + 2 * c] & 15) for c in range(ns)]
            i = i + 2 + seglen
            break
        i = i + 2 + seglen
    if comps is None or size is None or scan_info is None:
        raise JpegError("jpeg-missing-sof-or-sos")

    H, W = size
    if not (H and W):
        raise JpegError("jpeg-zero-dims")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    entropy, restarts = _unstuff(raw[i:])
    br = _BitReader(entropy)

    # per-component coefficient stores
    planes = {}
    for cid, ch, cv, tq in comps:
        planes[cid] = np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int64)
    order = []                                     # interleaved MCU order
    by_id = {c[0]: c for c in comps}
    for cid, td, ta in scan_info:
        if cid not in by_id:
            raise JpegError("jpeg-scan-unknown-component")
        order.append((cid, by_id[cid][1], by_id[cid][2], td, ta))

    preds = {cid: 0 for cid, *_ in order}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.align()
                preds = {cid: 0 for cid in preds}
            for cid, ch, cv, td, ta in order:
                dct = huff_dc.get(td)
                act = huff_ac.get(ta)
                if dct is None or act is None:
                    raise JpegError("jpeg-missing-huff-table")
                for by in range(cv):
                    for bx in range(ch):
                        blk = planes[cid][my * cv + by, mx * ch + bx]
                        s = br.decode(dct)
                        diff = _extend(br.read_bits(s), s)
                        preds[cid] += diff
                        blk[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = br.decode(act)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:        # ZRL
                                    k += 16
                                    continue
                                break              # EOB
                            k += r
                            if k > 63:
                                raise JpegError("jpeg-coef-overrun")
                            blk[k] = _extend(br.read_bits(sz), sz)
                            k += 1
            mcu_count += 1

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

    ids = [c[0] for c in comps]
    if len(ids) == 1:
        # round-then-clip, matching the RGB path (round-4 review: the
        # truncating variant was off by one on *.5 samples)
        out = np.clip(np.round(out_planes[ids[0]]),
                      0, 255).astype(np.uint8)[:, :, None]
    elif len(ids) != 3:
        raise JpegError(f"jpeg-{len(ids)}-component-unsupported")
    else:
        y, cb, cr = (out_planes[i] for i in ids)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
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


def _encode_block(bw: _BitWriter, coefs: np.ndarray, pred: int,
                  dc: _HuffTable, ac: _HuffTable) -> int:
    zz = coefs[ZIGZAG]
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    mag = diff if diff >= 0 else diff + (1 << s) - 1
    ln, code = dc.enc[s]
    bw.write(code, ln)
    if s:
        bw.write(mag & ((1 << s) - 1), s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac.enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        mag = v if v >= 0 else v + (1 << s) - 1
        ln, code = ac.enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(mag & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        ln, code = ac.enc[0x00]                    # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG bytes from (H, W, 3) RGB or (H, W[, 1]) grayscale
    uint8. ``subsample=True`` writes 4:2:0 (2×2-averaged chroma);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart/resync path)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    H, W = arr.shape[:2]
    gray = arr.shape[2] == 1
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    dc_syms = list(range(12))
    ac_syms = sorted({0x00, 0xF0} | {(r << 4) | s
                                     for r in range(16)
                                     for s in range(1, 11)})
    dc_tab = _HuffTable(*_flat_table(dc_syms, 5))
    ac_tab = _HuffTable(*_flat_table(ac_syms, 9))

    if gray:
        y = arr[:, :, 0].astype(np.float64) - 128.0
        planes = [(y, ql, 1, 1)]
    else:
        rgb = arr.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2]) - 128.0
        cb = 128.0 + (-0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
                      + 0.5 * rgb[:, :, 2]) - 128.0
        cr = 128.0 + (0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
                      - 0.081312 * rgb[:, :, 2]) - 128.0
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

    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    padded = []
    for p, q, ch, cv in planes:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        padded.append((pp, q, ch, cv))

    def _coef(pp, q, by, bx):
        block = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
        f = _C @ block @ _C.T
        return np.round(f.reshape(64) / q.astype(np.float64)
                        ).astype(np.int64)

    bw = _BitWriter()
    preds = [0] * len(padded)
    mcu_n = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n \
                    and mcu_n % restart_interval == 0:
                bw.flush()
                bw.out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                preds = [0] * len(padded)
            for ci, (pp, q, ch, cv) in enumerate(padded):
                for by in range(cv):
                    for bx in range(ch):
                        coefs = _coef(pp, q, my * cv + by, mx * ch + bx)
                        preds[ci] = _encode_block(bw, coefs, preds[ci],
                                                  dc_tab, ac_tab)
            mcu_n += 1
    bw.flush()

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, H, W, nc)
    for ci in range(nc):
        ch, cv = (planes[ci][2], planes[ci][3])
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    counts, syms = _flat_table(dc_syms, 5)
    seg(0xC4, bytes([0x00]) + bytes(counts) + syms)
    counts, syms = _flat_table(ac_syms, 9)
    seg(0xC4, bytes([0x10]) + bytes(counts) + syms)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])               # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
