"""Baseline JPEG codec tests (pure-numpy, no PIL needed).

No independent JPEG codec exists in this container, so compliance is
checked three ways: the transform constants against an FFT-derived DCT-II,
structural parity with the independent SOF dimension parser, and roundtrip
PSNR across subsampling modes / restart markers / pathological content.
The ≥40 dB assertion mirrors the pipeline's decoded-pixel integrity
invariant (PSNR ≥ 40 dB for lossy codecs).
"""

import numpy as np
import pytest

from data_validation_spark.stats import imagecodec as codec
from data_validation_spark.stats import jpegcodec as jc


def _psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return float("inf") if mse == 0 else 20 * np.log10(255) - 10 * np.log10(mse)


def _gradient(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=2
    ).astype(np.uint8)


def test_dct_basis_matches_fft_dct2():
    # Orthonormal DCT-II via FFT (no scipy in the image): for each basis row
    # k, DCT[k, n] must equal the closed-form cosine — evaluated through an
    # independent FFT construction of DCT-II of the identity.
    x = np.eye(8)
    # DCT-II of each column via FFT of the even extension
    ext = np.concatenate([x, x[::-1]], axis=0)  # (16, 8)
    X = np.fft.fft(ext, axis=0)[:8]
    phase = np.exp(-1j * np.pi * np.arange(8) / 16)[:, None]
    dct2 = (X * phase).real / 2.0  # unnormalized DCT-II matrix applied to I
    scale = np.ones((8, 1)) * np.sqrt(2.0 / 8.0)
    scale[0] = np.sqrt(1.0 / 8.0)
    assert np.allclose(jc._DCT, scale * dct2, atol=1e-12)
    # orthonormality: A @ A.T == I
    assert np.allclose(jc._DCT @ jc._DCT.T, np.eye(8), atol=1e-12)


def test_roundtrip_444_meets_integrity_invariant():
    img = _gradient()
    data = jc.encode(img, quality=90, subsampling="444")
    out = jc.decode(data)
    assert out is not None and out.shape == img.shape
    assert _psnr(img, out) >= 40.0
    # independent dimension parser agrees
    assert codec.jpeg_dimensions(data) == (64, 48)
    assert codec.sniff_format(data) == "jpeg"


def test_roundtrip_420_and_odd_dimensions():
    img = _gradient()[:45, :61]
    data = jc.encode(img, quality=90, subsampling="420")
    out = jc.decode(data)
    assert out is not None and out.shape == (45, 61, 3)
    assert _psnr(img, out) >= 38.0


def test_roundtrip_restart_markers():
    img = _gradient()
    plain = jc.decode(jc.encode(img, quality=90))
    rst = jc.decode(jc.encode(img, quality=90, restart_interval=3))
    assert rst is not None
    # restart markers change framing, not pixels
    assert np.array_equal(plain, rst)


def test_solid_color_exact_and_noise_survives():
    solid = np.full((16, 16, 3), 137, dtype=np.uint8)
    assert _psnr(solid, jc.decode(jc.encode(solid, quality=90))) == float("inf")
    # uniform noise maximally exercises ZRL/EOB runs and byte stuffing
    noisy = np.random.RandomState(0).randint(0, 256, (40, 56, 3), dtype=np.uint8)
    data = jc.encode(noisy, quality=95)
    # entropy-coded stream of noise at q95 contains stuffed 0xFF bytes
    assert b"\xff\x00" in data
    out = jc.decode(data)
    assert out is not None and _psnr(noisy, out) > 30.0


def test_decode_reencode_stable():
    # decode → re-encode → decode must not drift (fixed-point of the codec)
    img = _gradient()
    once = jc.decode(jc.encode(img, quality=90))
    twice = jc.decode(jc.encode(once, quality=90))
    assert _psnr(once, twice) >= 45.0


def test_foreign_jpeg_decodes_through_seam_without_pil():
    # Real baseline JPEG bytes (no APP15 stub payload) must decode through
    # imagecodec.decode()'s dispatch even with PIL absent — the seam that was
    # previously a stub returning None.
    img = _gradient()
    data = jc.encode(img, quality=90)
    out = codec.decode(data)
    assert out is not None
    assert _psnr(img, out) >= 40.0
    # the stub container still round-trips losslessly through the same entry
    stub = codec.encode("jpeg", img)
    assert np.array_equal(codec.decode(stub), img)


def test_truncated_and_garbage_bytes_return_none():
    img = _gradient()
    data = jc.encode(img, quality=90)
    assert jc.decode(data[:20]) is None
    assert jc.decode(b"\xff\xd8\xff\xe0" + b"\x00" * 50) is None
    assert jc.decode(b"not a jpeg") is None
    # progressive SOF2 is explicitly unsupported → None (PIL seam covers it)
    prog = bytearray(data)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert jc.decode(bytes(prog)) is None


def test_two_component_jpeg_decodes_as_luma():
    """2-component baseline JPEGs (legal per T.81, Nf=1..4) decode with
    plane 0 treated as luma and replicated to RGB, instead of erroring into
    decode() -> None. The stream is hand-assembled from the module's own
    encode primitives (interleaved 1x1/1x1 sampling)."""
    import struct

    rng = np.random.default_rng(7)
    h, w = 24, 40
    y_plane = np.clip(
        np.linspace(30, 220, w)[None, :] + rng.normal(0, 2, (h, w)), 0, 255
    )
    c_plane = np.full((h, w), 128.0)

    qlum = jc._quality_scaled(jc.QTBL_LUM, 97)
    qch = jc._quality_scaled(jc.QTBL_CHROM, 97)
    yb = jc._plane_blocks(jc._pad_edge(y_plane, 8), qlum)
    cb = jc._plane_blocks(jc._pad_edge(c_plane, 8), qch)
    dc_l = jc._build_codes(jc.DC_LUM_BITS, jc.DC_LUM_VALS)
    ac_l = jc._build_codes(jc.AC_LUM_BITS, jc.AC_LUM_VALS)
    dc_c = jc._build_codes(jc.DC_CHROM_BITS, jc.DC_CHROM_VALS)
    ac_c = jc._build_codes(jc.AC_CHROM_BITS, jc.AC_CHROM_VALS)
    bw = jc._BitWriter()
    preds = [0, 0]
    for mv in range(yb.shape[0]):
        for mh in range(yb.shape[1]):
            preds[0] = jc._encode_block(bw, yb[mv, mh], preds[0], dc_l, ac_l)
            preds[1] = jc._encode_block(bw, cb[mv, mh], preds[1], dc_c, ac_c)
    bw.pad_to_byte()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(qlum[jc.ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qch[jc.ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 2) + bytes([1, 0x11, 0, 2, 0x11, 1]))
    for cls_id, bits, vals in (
        (0x00, jc.DC_LUM_BITS, jc.DC_LUM_VALS),
        (0x10, jc.AC_LUM_BITS, jc.AC_LUM_VALS),
        (0x01, jc.DC_CHROM_BITS, jc.DC_CHROM_VALS),
        (0x11, jc.AC_CHROM_BITS, jc.AC_CHROM_VALS),
    ):
        out += seg(0xC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, b"\x02" + bytes([1, 0x00, 2, 0x11]) + b"\x00\x3f\x00")
    out += bw.buf
    out += b"\xff\xd9"

    rgb = jc.decode(bytes(out))
    assert rgb is not None and rgb.shape == (h, w, 3)
    # all three channels replicate plane 0
    assert np.array_equal(rgb[..., 0], rgb[..., 1])
    assert np.array_equal(rgb[..., 0], rgb[..., 2])
    assert _psnr(rgb[..., 0], np.round(y_plane).astype(np.uint8)) >= 40.0
