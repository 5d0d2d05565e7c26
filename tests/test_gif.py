"""GIF decoder (kernels/gif): LZW round trips (incl. dict resets at
4096 entries), interlace, transparency, palette edge cases, error paths,
and media dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from pubscience_spark.kernels import gif, media


def _paletted(h, w, ncolors, seed=3):
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, size=(ncolors, 3), dtype=np.uint8)
    # distinct colors guaranteed distinct via index trick
    palette[:, 0] = (np.arange(ncolors) * 7 % 256).astype(np.uint8)
    idx = rng.randint(0, ncolors, size=(h, w))
    return palette[idx]


def test_gif_roundtrip_exact():
    for ncolors in (2, 5, 17, 200):
        img = _paletted(21, 33, ncolors)
        out = gif.decode_gif(gif.encode_gif(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img), ncolors


def test_gif_large_forces_dict_reset():
    """Enough pixel variety to push LZW past 4096 entries → the encoder
    emits a mid-stream CLEAR and the decoder resyncs."""
    img = _paletted(120, 130, 256, seed=9)
    raw = gif.encode_gif(img)
    assert np.array_equal(gif.decode_gif(raw), img)


def test_gif_interlaced():
    img = _paletted(29, 16, 12)
    raw = gif.encode_gif(img, interlace=True)
    assert np.array_equal(gif.decode_gif(raw), img)


def test_gif_transparency_alpha_channel():
    img = _paletted(10, 10, 4)
    raw = gif.encode_gif(img, transparent=2)
    out = gif.decode_gif(raw)
    assert out.shape == (10, 10, 4)
    assert np.array_equal(out[:, :, :3], img)
    # alpha 0 exactly where palette index 2 was used
    colors, idx = np.unique(img.reshape(-1, 3), axis=0,
                            return_inverse=True)
    assert np.array_equal(out[:, :, 3].reshape(-1) == 0, idx == 2)


def test_gif_error_paths():
    with pytest.raises(gif.GifError):
        gif.decode_gif(b"NOTGIF1234")
    good = gif.encode_gif(_paletted(12, 12, 8))
    with pytest.raises(gif.GifError):
        gif.decode_gif(good[: len(good) // 2])    # truncated
    y, x = np.mgrid[0:32, 0:32]
    truecolor = np.dstack([y * 8, x * 8, x * 0]).astype(np.uint8)
    with pytest.raises(gif.GifError):                # 1024 distinct colors
        gif.encode_gif(truecolor)


def test_gif_media_dispatch():
    img = _paletted(8, 9, 6)
    arr = media.decode_image(gif.encode_gif(img))
    assert np.array_equal(arr, img)


def test_gif_frame_offset_composites_on_screen():
    """A first frame smaller than the logical screen composites at its
    (left, top) offset over the background color — matching what
    browsers report for such files (round-4 review)."""
    import struct as st
    img = _paletted(4, 4, 3)
    raw = bytearray(gif.encode_gif(img))
    # patch logical screen to 8x8 and the image descriptor to (2,2,4,4)
    raw[6:10] = st.pack("<HH", 8, 8)
    i = bytes(raw).index(b"\x2c")
    raw[i + 1:i + 9] = st.pack("<HHHH", 2, 2, 4, 4)
    out = gif.decode_gif(bytes(raw))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[2:6, 2:6], img)
    # background (palette color of bg index 0) everywhere else
    assert (out[0, 0] == out[7, 7]).all()


def test_gif_gce_flag_off_clears_transparency():
    img = _paletted(6, 6, 4)
    raw = gif.encode_gif(img, transparent=1)
    assert gif.decode_gif(raw).shape == (6, 6, 4)
    # splice a second GCE with the transparency flag OFF after the first
    i = raw.index(b"\x2c")
    raw2 = raw[:i] + bytes([0x21, 0xF9, 4, 0x00, 0, 0, 0, 0]) + raw[i:]
    out = gif.decode_gif(raw2)
    assert out.shape == (6, 6, 3)                  # newer GCE supersedes


def test_gif_zero_dims_named_error():
    import struct as st
    raw = bytearray(gif.encode_gif(_paletted(4, 4, 2)))
    raw[6:10] = st.pack("<HH", 0, 0)
    with pytest.raises(gif.GifError, match="zero-dims"):
        gif.decode_gif(bytes(raw))
