"""GIF87a/89a decoder (first frame) — pure stdlib + numpy.

Web corpora are full of GIFs (logos, old diagrams, animations); this
decodes the first image of a file from the public GIF89a specification:
logical screen + global/local color tables, extension-block skipping,
variable-width LSB-first LZW with dictionary resets, and Adam-less GIF
4-pass interlacing. Animation frames beyond the first are out of scope
(the multimodal tier treats a GIF as one image); transparency index is
honored by emitting an alpha channel when a GCE declares one.

``encode_gif`` (test side) writes a spec-valid single-frame GIF with a
real LZW compressor, so the decoder round-trips against original
pixels.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def _color_table(data: bytes, n: int) -> np.ndarray:
    return np.frombuffer(data[:3 * n], dtype=np.uint8).reshape(n, 3)


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """Variable-width LSB-first GIF LZW → palette indices."""
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.int32)
    npix = 0
    # bit reader (LSB first)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1
    dict_entries: list[bytes] = []

    def reset() -> None:
        nonlocal width, dict_entries
        width = min_code + 1
        dict_entries = [bytes([i]) for i in range(clear)] + [b"", b""]

    reset()
    prev: bytes | None = None
    while npix < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise GifError("gif-truncated-lzw")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(dict_entries):
                raise GifError("gif-bad-first-code")
            entry = dict_entries[code]
        elif code < len(dict_entries):
            entry = dict_entries[code]
            dict_entries.append(prev + entry[:1])
        elif code == len(dict_entries):        # KwKwK case
            entry = prev + prev[:1]
            dict_entries.append(entry)
        else:
            raise GifError("gif-bad-code")
        take = min(len(entry), n_pixels - npix)
        out[npix:npix + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        npix += take
        if len(dict_entries) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if npix < n_pixels:
        raise GifError("gif-short-pixel-data")
    return out


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(raw: bytes) -> np.ndarray:
    """(H, W, 3) uint8 (or (H, W, 4) when a transparency index is
    declared) — the FIRST image frame."""
    try:
        return _decode(raw)
    except GifError:
        raise
    except (IndexError, struct.error, ValueError) as exc:
        raise GifError(f"gif-corrupt: {type(exc).__name__}") from exc


def _decode(raw: bytes) -> np.ndarray:
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not-a-gif")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", raw[6:13])
    if not (sw and sh):
        raise GifError("gif-zero-dims")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = _color_table(raw[pos:], n)
        pos += 3 * n
    transparent = None
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:                              # trailer
            break
        if b == 0x21:                              # extension
            label = raw[pos + 1]
            pos += 2
            if label == 0xF9 and raw[pos] >= 4:    # GCE
                packed = raw[pos + 1]
                # a newer GCE supersedes: flag off must CLEAR the index
                transparent = raw[pos + 4] if packed & 1 else None
            while raw[pos]:                        # skip sub-blocks
                pos += raw[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise GifError(f"gif-unknown-block-{b:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", raw[pos + 1:pos + 10])
        if not (w and h):
            raise GifError("gif-zero-dims")
        pos += 10
        table = gct
        if iflags & 0x80:                          # local color table
            n = 2 << (iflags & 7)
            table = _color_table(raw[pos:], n)
            pos += 3 * n
        if table is None:
            raise GifError("gif-no-color-table")
        min_code = raw[pos]
        pos += 1
        chunks = []
        while raw[pos]:
            ln = raw[pos]
            chunks.append(raw[pos + 1:pos + 1 + ln])
            pos += ln + 1
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, w * h).reshape(h, w)
        if iflags & 0x40:                          # deinterlace (4 passes)
            out_rows = np.empty((h, w), dtype=np.int32)
            src = 0
            for start, step in _INTERLACE:
                for y in range(start, h, step):
                    out_rows[y] = idx[src]
                    src += 1
            idx = out_rows
        if (idx >= len(table)).any():
            raise GifError("gif-index-out-of-palette")
        rgb = table[idx]
        alpha = None
        if transparent is not None:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            # composite onto the logical screen (what every viewer
            # reports as the image): background color under the frame,
            # alpha 0 outside it when transparency is in play
            bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
                      else np.zeros(3, dtype=np.uint8))
            canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
            y0, x0 = min(top, sh), min(left, sw)
            y1, x1 = min(top + h, sh), min(left + w, sw)
            canvas[y0:y1, x0:x1] = rgb[:y1 - y0, :x1 - x0]
            if alpha is not None:
                acanvas = np.zeros((sh, sw), dtype=np.uint8)
                acanvas[y0:y1, x0:x1] = alpha[:y1 - y0, :x1 - x0]
                return np.dstack([canvas, acanvas])
            return canvas
        if alpha is not None:
            return np.dstack([rgb, alpha])
        return rgb
    raise GifError("gif-no-image-block")


# -------------------------------------------------------------- encoder --

def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear, width)
    cur = b""
    for v in indices.tolist():
        cand = cur + bytes([v])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt >= 4096:
            emit(clear, width)
            width = min_code + 1
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
        cur = bytes([v])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray, *, interlace: bool = False,
               transparent: int | None = None) -> bytes:
    """Single-frame GIF89a from (H, W, 3) uint8. Pixels are mapped onto
    a palette built from the distinct colors (≤256 required)."""
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError("gif-encode: more than 256 distinct colors")
    depth = max(1, int(len(colors) - 1).bit_length())
    n = 1 << depth
    palette = np.zeros((n, 3), dtype=np.uint8)
    palette[:len(colors)] = colors
    idx = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = []
        for start, step in _INTERLACE:
            rows.extend(range(start, h, step))
        idx_out = idx[rows]
    else:
        idx_out = idx
    min_code = max(2, depth)
    data = _lzw_encode(idx_out.reshape(-1), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
