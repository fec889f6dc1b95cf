"""Real GIF codec tests (LZW encode/decode, no PIL needed).

GIF is lossless for palettized content, so every roundtrip asserts exact
pixel equality — covering min-code-size edges, 12-bit code-width growth,
dictionary reset at 4096 entries, interlace reordering, and the dispatch
seam that previously stubbed foreign-GIF decode to None.
"""

import numpy as np
import pytest

from data_validation_spark.stats import imagecodec as codec


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_exact(interlace):
    rng = np.random.RandomState(0)
    pal = rng.randint(0, 256, (13, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 13, (37, 53))]
    data = codec.encode_gif_baseline(img, interlace=interlace)
    assert codec.sniff_format(data) == "gif"
    assert codec.gif_dimensions(data) == (53, 37)
    out = codec.decode(data)
    assert out is not None and np.array_equal(out, img)


def test_gif_two_color_min_code_size():
    rng = np.random.RandomState(1)
    img = np.where(
        rng.rand(64, 64)[:, :, None] > 0.5,
        np.array([255, 255, 255], dtype=np.uint8),
        np.array([0, 0, 0], dtype=np.uint8),
    )
    assert np.array_equal(codec.decode(codec.encode_gif_baseline(img)), img)


def test_gif_dictionary_growth_and_reset():
    # 19200 random pixels over 200 colors force code widths up to 12 bits
    # and at least one CLEAR-code dictionary reset at 4096 entries.
    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, (200, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 200, (120, 160))]
    assert np.array_equal(codec.decode(codec.encode_gif_baseline(img)), img)


def test_gif_run_heavy_sequences():
    g = np.repeat(np.arange(0, 250, 10, dtype=np.uint8), 40).reshape(25, 40)
    img = np.stack([g, g // 2, 255 - g], axis=2)
    assert np.array_equal(codec.decode(codec.encode_gif_baseline(img)), img)


def test_gif_too_many_colors_rejected():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(ValueError):
        codec.encode_gif_baseline(img)


def test_gif_stub_container_still_lossless():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode("gif", img)), img)


def test_gif_garbage_and_truncation_return_none():
    assert codec.decode(b"GIF89a\x00\x00\x00\x00\x00\x00") is None
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (4, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 4, (16, 16))]
    data = codec.encode_gif_baseline(img)
    assert codec.decode(data[: len(data) // 2]) is None
