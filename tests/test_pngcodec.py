"""Foreign-PNG decode: scanline filters 0-4 and all 8-bit color types.

The filter algebra is pinned by streams BUILT IN-TEST with each filter
applied on the encode side (the module's own encoder only emits filter 0,
so these are independent of it), plus real libpng-encoded files shipped in
the OS image (palette and RGBA with mixed per-row filters)."""

import os
import struct
import zlib

import numpy as np
import pytest

from data_validation_spark.stats.imagecodec import decode_png, encode_png


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_row(ftype, row, prev, bpp):
    """Apply a PNG filter on the ENCODE side (the inverse of the decoder)."""
    out = bytearray()
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = row[x]
        elif ftype == 1:
            v = row[x] - a
        elif ftype == 2:
            v = row[x] - b
        elif ftype == 3:
            v = row[x] - ((a + b) >> 1)
        else:
            v = row[x] - _paeth(a, b, c)
        out.append(v & 0xFF)
    return bytes(out)


def _build_png(pixels: np.ndarray, ctype: int, ftypes: list[int], plte=None) -> bytes:
    h, w, bpp = pixels.shape
    raw = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        row = bytes(pixels[y].reshape(-1))
        raw += bytes([ftypes[y % len(ftypes)]])
        raw += _filter_row(ftypes[y % len(ftypes)], row, prev, bpp)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte.reshape(-1)))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_type_rgb(ftype):
    rng = np.random.default_rng(ftype)
    px = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    data = _build_png(px, 2, [ftype])
    got = decode_png(data)
    assert got is not None and np.array_equal(got, px)


def test_mixed_filters_per_row():
    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (20, 17, 3), dtype=np.uint8)
    data = _build_png(px, 2, [0, 1, 2, 3, 4])  # cycle all five
    assert np.array_equal(decode_png(data), px)


def test_rgba_drops_alpha():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    data = _build_png(px, 6, [4, 1, 3])
    assert np.array_equal(decode_png(data), px[:, :, :3])


def test_grayscale_and_gray_alpha():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (6, 7, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(_build_png(g, 0, [2, 4])), np.repeat(g, 3, 2))
    ga = rng.integers(0, 256, (6, 7, 2), dtype=np.uint8)
    assert np.array_equal(
        decode_png(_build_png(ga, 4, [1])), np.repeat(ga[:, :, :1], 3, 2)
    )


def test_palette():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)[:, :, None]
    data = _build_png(idx, 3, [0, 1], plte=plte)
    assert np.array_equal(decode_png(data), plte[idx[:, :, 0]])


def test_own_encoder_still_roundtrips():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


_FOREIGN = [
    ("/usr/share/gitweb/static/git-logo.png", (27, 72)),   # palette, libpng
    ("/usr/share/doc/python3/_static/file.png", (16, 16)),  # RGBA
    ("/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/idle_256.png", (256, 256)),
]


@pytest.mark.parametrize("path,hw", _FOREIGN)
def test_decodes_foreign_libpng_files(path, hw):
    if not os.path.exists(path):
        pytest.skip(f"{path} not in this image")
    img = decode_png(open(path, "rb").read())
    assert img is not None and img.shape == hw + (3,)
    assert img.dtype == np.uint8
    # content sanity: real icons/logos aren't constant
    assert img.min() < img.max()


def test_unsupported_depth_returns_none():
    path = "/usr/share/gitweb/static/git-favicon.png"  # 2-bit palette
    if os.path.exists(path):
        assert decode_png(open(path, "rb").read()) is None
