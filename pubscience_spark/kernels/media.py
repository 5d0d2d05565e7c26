"""Pure-stdlib media decoders + feature kernels (multimodal tier).

The container has no Pillow/soundfile/ffmpeg, but the formats that matter
need no codec library — PNG is zlib (stdlib) + per-scanline filters, BMP
and PGM/PPM are raw pixels, TIFF is strips of raw/LZW/Deflate/PackBits
samples (:mod:`.tiff`), WAV is framed PCM, and JPEG (the dominant
web format — baseline AND progressive, multi-scan, Adobe CMYK/YCCK) is
implemented from the public T.81 spec in :mod:`.jpeg` (markers →
Huffman entropy decode → vectorized IDCT → chroma upsample). Remaining
compressed formats (arithmetic-coded JPEG, MP3, H.264, …) surface as an
``unsupported-format``/named error column, never a task failure. Swap in Pillow/soundfile on a production cluster for the
long tail; the Spark plan and schemas do not change.

All features are deterministic functions of the pixel/sample data, so the
operators stay oracle/fixture-checkable.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


class UnsupportedFormat(ValueError):
    pass


# --------------------------------------------------------------- images ---

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int, nchan: int,
                  bitdepth: int) -> np.ndarray:
    """Reconstruct scanlines (filters 0-4, 8-bit samples)."""
    if bitdepth != 8:
        raise UnsupportedFormat(f"png bitdepth {bitdepth}")
    stride = width * nchan
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos).copy()
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:            # Sub: prefix-sum per channel lane
            # out[x] = Σ deltas mod 256 — addition mod 256 is associative,
            # so a vectorized cumsum replaces the per-pixel loop
            lanes = line.astype(np.int64).reshape(-1, nchan)
            cur = (np.cumsum(lanes, axis=0) & 0xFF) \
                .astype(np.uint8).reshape(stride)
        elif ftype == 2:            # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:            # Average
            cur = line
            for x in range(stride):
                left = cur[x - nchan] if x >= nchan else 0
                cur[x] = (cur[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:            # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - nchan]) if x >= nchan else 0
                b = int(prev[x])
                c = int(prev[x - nchan]) if x >= nchan else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise UnsupportedFormat(f"png filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, nchan)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_deinterlace(scan: bytes, width: int, height: int,
                       nchan: int, bitdepth: int) -> np.ndarray:
    """Adam7: seven filtered sub-images, each scattered onto the full
    canvas at its (x0, y0, xstep, ystep) grid."""
    out = np.zeros((height, width, nchan), dtype=np.uint8)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (width - x0 + xs - 1) // xs
        ph = (height - y0 + ys - 1) // ys
        if not (pw and ph):
            continue
        n = ph * (1 + pw * nchan)          # 1 filter byte per scanline
        sub = _png_unfilter(scan[pos:pos + n], pw, ph, nchan, bitdepth)
        pos += n
        out[y0::ys, x0::xs] = sub
    return out


def decode_png(raw: bytes) -> np.ndarray:
    """(H, W, C) uint8 for 8-bit gray/RGB/RGBA/palette; Adam7
    interlacing supported."""
    if raw[:8] != _PNG_MAGIC:
        raise UnsupportedFormat("not a png")
    pos, width = 8, None
    idat, plte = b"", None
    while pos + 8 <= len(raw):
        (length,), ctype = struct.unpack(">I", raw[pos:pos + 4]), \
            raw[pos + 4:pos + 8]
        data = raw[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            if len(data) < 13:                  # truncated mid-header
                raise UnsupportedFormat("png truncated IHDR")
            width, height, bitdepth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data[:13])
            if interlace not in (0, 1):
                raise UnsupportedFormat(f"png interlace {interlace}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedFormat("png missing IHDR")
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nchan is None:
        raise UnsupportedFormat(f"png color type {color}")
    scan = zlib.decompress(idat)
    if interlace:
        arr = _adam7_deinterlace(scan, width, height, nchan, bitdepth)
    else:
        arr = _png_unfilter(scan, width, height, nchan, bitdepth)
    if color == 3:
        if plte is None:
            raise UnsupportedFormat("palette png without PLTE")
        arr = plte[arr[:, :, 0]]
    return arr


def decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit bottom-up BMP → (H, W, 3|4) uint8."""
    if raw[:2] != b"BM":
        raise UnsupportedFormat("not a bmp")
    data_off = struct.unpack("<I", raw[10:14])[0]
    hdr_size = struct.unpack("<I", raw[14:18])[0]
    if hdr_size < 40:
        raise UnsupportedFormat("bmp core header")
    width, height = struct.unpack("<ii", raw[18:26])
    planes, bpp = struct.unpack("<HH", raw[26:30])
    compression = struct.unpack("<I", raw[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedFormat(f"bmp bpp={bpp} compression={compression}")
    nchan = bpp // 8
    row_bytes = (width * nchan + 3) & ~3
    flip = height > 0
    height = abs(height)
    arr = np.zeros((height, width, nchan), dtype=np.uint8)
    for y in range(height):
        off = data_off + y * row_bytes
        row = np.frombuffer(raw, dtype=np.uint8, count=width * nchan,
                            offset=off).reshape(width, nchan)
        arr[height - 1 - y if flip else y] = row
    return arr[:, :, [2, 1, 0]] if nchan == 3 else \
        arr[:, :, [2, 1, 0, 3]]     # BGR(A) → RGB(A)


def decode_pnm(raw: bytes) -> np.ndarray:
    """Binary PGM (P5) / PPM (P6), 8-bit."""
    if raw[:2] not in (b"P5", b"P6"):
        raise UnsupportedFormat("not a binary pnm")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1                        # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise UnsupportedFormat("16-bit pnm")
    nchan = 3 if raw[:2] == b"P6" else 1
    return np.frombuffer(raw, dtype=np.uint8, count=width * height * nchan,
                         offset=pos).reshape(height, width, nchan)


def decode_image(raw: bytes) -> np.ndarray:
    """Dispatch by magic → (H, W, C) uint8. JPEG & co →
    :class:`UnsupportedFormat`."""
    if raw[:8] == _PNG_MAGIC:
        return decode_png(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:2] in (b"P5", b"P6"):
        return decode_pnm(raw)
    if raw[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(raw)
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif
        return decode_gif(raw)
    if raw[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff
        return decode_tiff(raw)
    if raw[:2] == b"\xff\x4f" \
            or raw[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n":
        from .jpeg2000 import decode_jpx, to_display_uint8
        return to_display_uint8(decode_jpx(raw))
    raise UnsupportedFormat("unsupported-format: "
                            + (raw[:4].hex() if raw else "empty"))


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps (pure numpy)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]


def image_feature_vec(arr: np.ndarray) -> list[float]:
    """8-dim deterministic feature: per-channel means (RGB), gray std,
    aspect, horizontal & vertical edge energy, entropy (4-bit bins)."""
    a = arr.astype(np.float64)
    if a.shape[2] == 1:
        rgb = np.repeat(a, 3, axis=2)
    else:
        rgb = a[:, :, :3]
    gray = rgb.mean(axis=2)
    h, w = gray.shape
    dx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    dy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
    hist = np.bincount((gray.astype(np.uint8) >> 4).ravel(),
                       minlength=16).astype(np.float64)
    p = hist / hist.sum()
    ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
    return [round(float(x), 6) for x in
            (rgb[:, :, 0].mean() / 255.0, rgb[:, :, 1].mean() / 255.0,
             rgb[:, :, 2].mean() / 255.0, gray.std() / 255.0,
             w / h, dx / 255.0, dy / 255.0, ent / 4.0)]


# ---------------------------------------------------------------- audio ---

def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV → (sample_rate, float64 mono in [-1, 1])."""
    try:
        with wave.open(io.BytesIO(raw)) as wf:
            rate = wf.getframerate()
            nchan = wf.getnchannels()
            sampwidth = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        raise UnsupportedFormat(f"wav: {exc}") from exc
    if sampwidth == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise UnsupportedFormat(f"wav sampwidth {sampwidth}")
    if nchan > 1:
        x = x.reshape(-1, nchan).mean(axis=1)
    return rate, x


def audio_feature_vec(rate: int, x: np.ndarray) -> list[float]:
    """8-dim deterministic feature: duration, rms, peak, zero-cross rate,
    mean |x|, spectral centroid (normalized), low/high band energy split."""
    n = len(x)
    if n == 0:
        return [0.0] * 8
    dur = n / rate
    rms = float(np.sqrt((x * x).mean()))
    peak = float(np.abs(x).max())
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n > 1 \
        else 0.0
    mav = float(np.abs(x).mean())
    spec = np.abs(np.fft.rfft(x[:min(n, 1 << 16)]))
    power = spec * spec
    total = power.sum()
    if total > 0:
        freqs = np.arange(len(spec)) / len(spec)
        centroid = float((freqs * power).sum() / total)
        low = float(power[:len(power) // 4].sum() / total)
        high = float(power[len(power) // 2:].sum() / total)
    else:
        centroid = low = high = 0.0
    return [round(v, 6) for v in
            (dur, rms, peak, zcr, mav, centroid, low, high)]


# -------------------------------------------------------------- encoders --
# (test/fixture side: build valid bytes without any codec library)

def encode_png(arr: np.ndarray) -> bytes:
    """Minimal non-interlaced PNG writer (filter 0) for tests/fixtures."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    scan = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))


def encode_wav(rate: int, x: np.ndarray) -> bytes:
    """PCM16 mono WAV writer for tests/fixtures."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()
