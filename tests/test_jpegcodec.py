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
    # lossless SOF3 is explicitly unsupported → None (PIL seam covers it);
    # progressive SOF2 is handled natively since round 5 (tests below)
    lossless = bytearray(data)
    idx = bytes(lossless).find(b"\xff\xc0")
    lossless[idx + 1] = 0xC3
    assert jc.decode(bytes(lossless)) is None


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


# ---------------------------------------------------------- progressive ----
def _rand_img(shape, seed=7):
    rng = np.random.default_rng(seed)
    img = (rng.random(shape) * 255).astype(np.uint8)
    return (img.astype(np.int32) // 2 + 64).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,sub,q",
    [
        ((64, 64, 3), "444", 85),
        ((56, 72, 3), "444", 85),   # AC grid < DC grid on one axis
        ((60, 60, 3), "420", 85),
        ((41, 53, 3), "420", 85),   # odd dims + subsampling
        ((8, 8, 3), "444", 95),     # single block
        ((129, 17, 3), "420", 50),
        ((64, 64, 3), "444", 10),   # coarse quant → long zero runs
    ],
)
def test_progressive_equals_baseline_exactly(shape, sub, q):
    """Same quantized coefficients flow through both entropy codings, so the
    decoded pixels must be IDENTICAL — any off-by-one in the Annex G scan
    logic (EOB runs, refinement bits, point transforms) breaks equality."""
    img = _rand_img(shape)
    base = jc.decode(jc.encode(img, q, sub))
    prog = jc.decode(jc.encode_progressive(img, q, sub))
    assert prog is not None
    assert np.array_equal(base, prog)


def test_progressive_equals_baseline_flat_noise_gradient():
    flat = np.full((48, 48, 3), 200, np.uint8)  # every AC band is an EOB
    rng = np.random.default_rng(3)
    noisy = (rng.random((72, 88, 3)) * 255).astype(np.uint8)  # ZRL paths
    grad = np.tile(np.arange(100, dtype=np.uint8)[None, :, None] * 2, (60, 1, 3))
    for img, sub in [(flat, "444"), (noisy, "444"), (noisy, "420"), (grad, "420")]:
        assert np.array_equal(
            jc.decode(jc.encode(img, 88, sub)),
            jc.decode(jc.encode_progressive(img, 88, sub)),
        )


def test_progressive_stream_structure():
    img = _rand_img((32, 40, 3))
    data = jc.encode_progressive(img, 85, "444")
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data  # SOF2, no SOF0
    assert data.count(b"\xff\xda") >= 10  # multi-scan script
    # the pipeline's PSNR integrity invariant holds through the progressive
    # path on smooth content (noise PSNR is quantization-bound by design)
    smooth = _gradient()
    dec = jc.decode(jc.encode_progressive(smooth, 90, "444"))
    assert _psnr(smooth.astype(np.float64), dec.astype(np.float64)) >= 40.0


_EXTERNAL_PROGRESSIVE = [
    # libjpeg-encoded progressive JPEGs shipped in the OS image: independent
    # vectors for EOBn run codes and AC successive approximation, which our
    # fixed-table encoder cannot produce
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", (58, 493)),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", (312, 493)),
]


@pytest.mark.parametrize("path,hw", _EXTERNAL_PROGRESSIVE)
def test_decodes_external_libjpeg_progressive(path, hw):
    import os

    if not os.path.exists(path):
        pytest.skip(f"{path} not in this image")
    data = open(path, "rb").read()
    # confirm it IS progressive (SOF2)
    assert b"\xff\xc2" in data[:2048]
    img = jc.decode(data)
    assert img is not None and img.shape == hw + (3,)
    # white-stripe content: bright overall, and the brightest row is ~white
    assert img.mean() > 180
    assert img.max() >= 250


def test_progressive_prefix_scans_approximate_image():
    """The defining property of progressive JPEG: truncating the stream
    after the early scans still yields a coarse approximation. Decode with
    only the first scans' data and require bounded deviation from full."""
    import os

    path = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not os.path.exists(path):
        pytest.skip("external progressive file absent")
    data = open(path, "rb").read()
    # cut after the 5th SOS's entropy data (DC + first luma AC bands),
    # appending EOI so the parser stops cleanly
    idx = 0
    for _ in range(6):
        idx = data.find(b"\xff\xda", idx + 2)
    truncated = data[:idx] + b"\xff\xd9"
    full = jc.decode(data)
    coarse = jc.decode(truncated)
    assert coarse is not None and coarse.shape == full.shape
    assert abs(float(full.mean()) - float(coarse.mean())) < 10.0
