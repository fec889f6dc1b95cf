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


# ----------------------------------------------------------- animation -----
def test_animation_roundtrip_full_frames():
    import numpy as np
    from data_validation_spark.stats.imagecodec import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    f1 = np.zeros((10, 12, 3), np.uint8); f1[:, :, 0] = 200
    f2 = np.zeros((10, 12, 3), np.uint8); f2[:, :, 1] = 150
    f3 = np.zeros((10, 12, 3), np.uint8); f3[:, :, 2] = 99
    d = encode_gif_animation([f1, f2, f3])
    frames = decode_gif_frames(d)
    assert len(frames) == 3
    for got, exp in zip(frames, [f1, f2, f3]):
        assert np.array_equal(got, exp)
    # first-frame API unchanged on animated inputs
    assert np.array_equal(decode_gif(d), f1)
    assert decode_gif_frames(d, max_frames=2) is not None
    assert len(decode_gif_frames(d, max_frames=2)) == 2


def test_animation_subregion_composites_over_previous():
    import numpy as np
    from data_validation_spark.stats.imagecodec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    f1 = np.zeros((10, 12, 3), np.uint8); f1[:, :, 0] = 200
    patch = f1.copy(); patch[2:6, 3:7] = [1, 2, 3]
    d = encode_gif_animation([f1, patch], regions=[None, (3, 2, 4, 4)])
    frames = decode_gif_frames(d)
    exp = f1.copy(); exp[2:6, 3:7] = [1, 2, 3]
    assert np.array_equal(frames[1], exp)


def test_animation_disposal_background_and_previous():
    """GIF89a disposal semantics: 2 = restore region to the background
    color, 3 = restore the pre-frame canvas. A fully-transparent third
    frame exposes whatever the disposal of frame 2 left behind."""
    import numpy as np
    from data_validation_spark.stats.imagecodec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    tcol = (7, 7, 7)
    fA = np.full((8, 8, 3), 50, np.uint8)
    fB = fA.copy(); fB[0:2, 0:2] = [9, 9, 9]
    fC = np.full((8, 8, 3), 7, np.uint8)  # == tcol → draws nothing

    d2 = encode_gif_animation([fA, fB, fC], disposals=[1, 2, 1], transparent_color=tcol)
    fr = decode_gif_frames(d2)
    assert np.array_equal(fr[0], fA) and np.array_equal(fr[1], fB)
    # background color = global palette entry 0 = sorted-unique [7,7,7]
    assert np.array_equal(fr[2], np.full((8, 8, 3), 7, np.uint8))

    d3 = encode_gif_animation([fA, fB, fC], disposals=[1, 3, 1], transparent_color=tcol)
    fr = decode_gif_frames(d3)
    assert np.array_equal(fr[2], fA)  # restore-to-previous undid frame B
