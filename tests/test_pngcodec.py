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


def test_sub8bit_palette_external_file():
    path = "/usr/share/gitweb/static/git-favicon.png"  # 2-bit palette, libpng
    if not os.path.exists(path):
        pytest.skip("favicon absent")
    img = decode_png(open(path, "rb").read())
    assert img is not None and img.shape == (16, 16, 3)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) <= 4  # 2-bit palette


def _build_sub8_png(idx: np.ndarray, depth: int, ctype: int, plte=None) -> bytes:
    """Hand-pack a sub-8-bit gray/palette PNG (filter 0 rows)."""
    h, w = idx.shape
    rb = (w * depth + 7) // 8
    raw = bytearray()
    for y in range(h):
        bits = "".join(format(v, f"0{depth}b") for v in idx[y])
        bits += "0" * (rb * 8 - len(bits))
        raw += b"\x00" + int(bits, 2).to_bytes(rb, "big")
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte.reshape(-1)))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub8bit_gray_and_palette_golden(depth):
    rng = np.random.default_rng(depth)
    idx = rng.integers(0, 1 << depth, (5, 11), dtype=np.uint8)
    # grayscale: values expand to full 0-255 range
    g = decode_png(_build_sub8_png(idx, depth, 0))
    scale = 255 // ((1 << depth) - 1)
    assert np.array_equal(g, np.repeat((idx * scale)[:, :, None], 3, 2))
    # palette
    plte = rng.integers(0, 256, (1 << depth, 3), dtype=np.uint8)
    p = decode_png(_build_sub8_png(idx, depth, 3, plte=plte))
    assert np.array_equal(p, plte[idx])


# -------------------------------------------------- Adam7 + 16-bit depth ---
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _build_interlaced_png(pixels: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-assemble an Adam7-interlaced RGB PNG (encode-side pass split +
    per-pass filtering), independent of the decoder under test."""
    h, w, bpp = pixels.shape
    raw = bytearray()
    fi = 0
    for x0, y0, dx, dy in _ADAM7:
        sub = pixels[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        prev = bytes(pw * bpp)
        for y in range(ph):
            row = bytes(sub[y].reshape(-1))
            ft = ftypes[fi % len(ftypes)]
            fi += 1
            raw += bytes([ft]) + _filter_row(ft, row, prev, bpp)
            prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_adam7_interlaced_roundtrip():
    rng = np.random.default_rng(21)
    for shape in [(16, 16, 3), (13, 9, 3), (7, 5, 3), (1, 1, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        data = _build_interlaced_png(px, [0, 1, 2, 3, 4])
        assert np.array_equal(decode_png(data), px), shape


def test_16bit_depth_reduces_to_high_byte():
    rng = np.random.default_rng(5)
    hi = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    px16 = np.stack([hi, lo], axis=-1).reshape(9, 11, 6)  # big-endian u16
    data = _build_png(px16.view(np.uint8), 2, [0, 2])
    # _build_png treats the 6 bytes/px as bpp=6 — rewrite IHDR depth to 16
    data = bytearray(data)
    data[24] = 16  # IHDR depth byte
    # fix the IHDR CRC after the depth edit
    ihdr = bytes(data[12:29])
    data[29:33] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    got = decode_png(bytes(data))
    assert np.array_equal(got, hi)


_EXTERNAL_DEEP = [
    "/usr/share/doc/libpng-dev/examples/pngtest.png",  # libpng canonical, Adam7 RGBA
    "/root/.pyenv/versions/3.7.16/lib/python3.7/idlelib/Icons/idle_32.png",  # 16-bit
]


def test_libpng_canonical_interlaced_file():
    path = _EXTERNAL_DEEP[0]
    if not os.path.exists(path):
        pytest.skip("pngtest.png absent")
    img = decode_png(open(path, "rb").read())
    assert img is not None and img.shape == (69, 91, 3)


def test_16bit_external_matches_8bit_sibling_exactly():
    """The 3.7-era idle icons are 16-bit encodes of the same artwork the
    3.13 icons carry at 8 bits — decoding both must agree byte-for-byte
    (independent files, independent encoders)."""
    p16 = _EXTERNAL_DEEP[1]
    p8 = "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/idle_32.png"
    if not (os.path.exists(p16) and os.path.exists(p8)):
        pytest.skip("idle icon pair absent")
    a16 = decode_png(open(p16, "rb").read())
    a8 = decode_png(open(p8, "rb").read())
    assert np.array_equal(a16, a8)
