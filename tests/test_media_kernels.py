"""Real stdlib media decoders (kernels/media) + the multimodal operators'
real-decode path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pubscience_spark.kernels import media


def _gradient(h, w, c):
    y, x = np.mgrid[0:h, 0:w]
    arr = np.zeros((h, w, c), dtype=np.uint8)
    for ch in range(c):
        arr[:, :, ch] = ((x * 7 + y * 13 + ch * 29) % 256).astype(np.uint8)
    return arr


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_roundtrip(c):
    arr = _gradient(9, 13, c)
    out = media.decode_png(media.encode_png(arr))
    assert out.shape == arr.shape and (out == arr).all()


def _forward_filter(arr, ftypes):
    """Apply PNG filters forward (test side) to exercise reconstruction."""
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int16)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = flat[y]
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            enc = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else cc)
                enc[x] = cur[x] - pred
        out.append(ft)
        out += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def test_png_all_filter_types_reconstruct():
    arr = _gradient(10, 8, 3)
    scan = _forward_filter(arr, [0, 1, 2, 3, 4])
    got = media._png_unfilter(scan, 8, 10, 3, 8)
    assert (got == arr).all()


def test_png_palette():
    idx = _gradient(6, 6, 1)
    idx = (idx % 4).astype(np.uint8)
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                    dtype=np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))

    def chunk(t, d):
        body = t + d
        return struct.pack(">I", len(d)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    raw = (media._PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 6, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", plte.tobytes())
           + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    out = media.decode_png(raw)
    assert (out == plte[idx[:, :, 0]]).all()


def test_bmp_24bit():
    arr = _gradient(5, 7, 3)
    h, w = 5, 7
    row_bytes = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):          # bottom-up
        row = arr[y][:, [2, 1, 0]].tobytes()    # RGB → BGR
        pix += row + b"\x00" * (row_bytes - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                            2835, 2835, 0, 0))
    out = media.decode_bmp(header + bytes(pix))
    assert out.shape == (5, 7, 3) and (out == arr).all()


def test_pnm():
    arr = _gradient(4, 5, 3)
    raw = b"P6\n# comment\n5 4\n255\n" + arr.tobytes()
    assert (media.decode_pnm(raw) == arr).all()
    gray = _gradient(4, 5, 1)
    raw = b"P5 5 4 255\n" + gray.tobytes()
    assert (media.decode_pnm(raw) == gray).all()


def test_decode_image_dispatch_and_unsupported():
    arr = _gradient(4, 4, 3)
    assert (media.decode_image(media.encode_png(arr)) == arr).all()
    # JPEG decodes for real since round 4 — corrupt jpeg bytes raise a
    # jpeg-named error (still ValueError family -> error column)
    from pubscience_spark.kernels.jpeg import JpegError, encode_jpeg
    with pytest.raises(JpegError):
        media.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    assert media.decode_image(encode_jpeg(arr, 95)).shape == arr.shape
    from pubscience_spark.kernels.gif import GifError, encode_gif
    with pytest.raises(GifError):
        media.decode_image(b"GIF89a corrupt body")
    assert media.decode_image(encode_gif(arr)).shape == arr.shape
    with pytest.raises(media.UnsupportedFormat):
        media.decode_image(b"RIFF....WEBP not supported")


def test_resize_nearest():
    arr = _gradient(8, 8, 3)
    up = media.resize_nearest(arr, 16, 16)
    assert up.shape == (16, 16, 3)
    assert (up[::2, ::2] == arr).all()
    down = media.resize_nearest(arr, 4, 4)
    assert (down == arr[::2, ::2]).all()


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(rate) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    rate2, y = media.decode_wav(media.encode_wav(rate, x))
    assert rate2 == rate and len(y) == len(x)
    assert np.abs(y - x).max() < 1e-3           # int16 quantization
    dur, rms, peak, zcr, _mav, centroid, low, high = \
        media.audio_feature_vec(rate2, y)
    assert dur == 1.0
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3   # sine rms = amp/sqrt(2)
    assert abs(peak - 0.5) < 1e-3
    assert 0 < centroid < 0.5


def test_image_features_real_path_spark(spark):
    arr = _gradient(6, 9, 3)
    rows = [("u_png", bytearray(media.encode_png(arr))),
            ("u_jpeg", bytearray(b"\xff\xd8\xff\xe0 not decodable")),
            ("u_empty", bytearray(b""))]
    df = spark.createDataFrame(rows, "url string, media binary")
    from pubscience_spark.operators.multimodal import image_features
    out = {r["url"]: r for r in image_features(df, fake=False).collect()}
    ok = out["u_png"]
    assert (ok["width"], ok["height"]) == (9, 6) and ok["error"] is None
    assert ok["feature"] == [pytest.approx(v, abs=1e-5) for v in
                             media.image_feature_vec(arr)]
    assert "jpeg" in out["u_jpeg"]["error"]      # corrupt jpeg named
    assert out["u_empty"]["error"] is not None


def test_audio_features_real_path_spark(spark):
    rate = 8000
    x = 0.25 * np.sin(2 * np.pi * 220 * np.arange(rate // 2) / rate)
    rows = [("u_wav", bytearray(media.encode_wav(rate, x))),
            ("u_mp3", bytearray(b"ID3\x03 not pcm"))]
    df = spark.createDataFrame(rows, "url string, media binary")
    from pubscience_spark.operators.multimodal import audio_features
    out = {r["url"]: r for r in audio_features(df, fake=False).collect()}
    assert out["u_wav"]["sample_rate"] == rate
    assert out["u_wav"]["duration_s"] == pytest.approx(0.5)
    assert out["u_mp3"]["error"] is not None


def test_png_adam7_interlaced_roundtrip():
    """Adam7 deinterlacing: a test-side interlaced writer (7 filtered
    sub-images in pass order) decodes byte-identically (round 4)."""
    def encode_interlaced(arr):
        h, w, c = arr.shape
        passes = b""
        for x0, y0, xs, ys in media._ADAM7:
            sub = arr[y0::ys, x0::xs]
            if sub.size == 0:
                continue
            passes += b"".join(b"\x00" + sub[y].tobytes()
                               for y in range(sub.shape[0]))

        def chunk(t, d):
            body = t + d
            return struct.pack(">I", len(d)) + body + \
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

        color = {1: 0, 3: 2, 4: 6}[c]
        return (media._PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8,
                                             color, 0, 0, 1))
                + chunk(b"IDAT", zlib.compress(passes))
                + chunk(b"IEND", b""))

    for c in (1, 3, 4):
        for h, w in ((13, 11), (8, 8), (3, 5), (1, 9)):
            arr = _gradient(h, w, c)
            out = media.decode_png(encode_interlaced(arr))
            assert out.shape == arr.shape and (out == arr).all(), (c, h, w)
