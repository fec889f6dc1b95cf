"""Native FLAC codec (RFC 9639). FLAC is lossless, so the roundtrip tests
pin the full stack bit-exactly — no tolerance anywhere. Decoder-only paths
the fixture encoder never emits (LPC subframes, wasted bits, Rice escapes)
are pinned with hand-assembled frames built directly from the bit-writer
and CRC primitives."""

import struct

import numpy as np
import pytest

from data_validation_spark.stats import flaccodec as fc
from data_validation_spark.stats.flaccodec import (
    BitReader,
    BitWriter,
    crc8,
    crc16,
    decode,
    decode_full,
    encode,
)


def _signals():
    rng = np.random.default_rng(5)
    t = np.arange(10000)
    return {
        "sine": (np.sin(t / 20) * 12000).astype(np.int16),
        "noise": rng.integers(-32768, 32767, 10000).astype(np.int16),
        "const": np.full(5000, -123, np.int16),
        "ramp": (t % 4096 - 2048).astype(np.int16)[:7000],
    }


@pytest.mark.parametrize("name", ["sine", "noise", "const", "ramp"])
def test_roundtrip_mono_lossless(name):
    x = _signals()[name]
    out = decode(encode(x, 22050))
    assert out is not None
    y, rate = out
    assert rate == 22050
    assert np.array_equal(y[:, 0], x.astype(np.int32))


@pytest.mark.parametrize("mode", ["indep", "leftside", "midside"])
def test_roundtrip_stereo_modes_lossless(mode):
    t = np.arange(9000)
    x = np.stack(
        [
            (np.sin(t / 15) * 9000).astype(np.int16),
            (np.sin(t / 23) * 7000 + 100).astype(np.int16),
        ],
        axis=1,
    )
    y, rate = decode(encode(x, 44100, stereo_mode=mode))
    assert np.array_equal(y, x.astype(np.int32))


def test_roundtrip_partial_final_frame_and_odd_blocksize():
    x = (np.sin(np.arange(5001) / 9) * 5000).astype(np.int16)
    y, _ = decode(encode(x, 8000, block_size=1000))
    assert np.array_equal(y[:, 0], x.astype(np.int32))


def test_crc_detects_corruption():
    d = encode(_signals()["sine"], 22050)
    bad = bytearray(d)
    bad[len(d) // 2] ^= 0x40
    assert decode(bytes(bad)) is None
    assert decode(b"not flac at all") is None
    assert decode(d[:30]) is None


def test_rice_bit_golden():
    """Hand-computed Rice encoding: residuals [0, -1, 3], parameter 1.
    zigzag: 0→0, -1→1, 3→6; (q unary, low bits): (1,0)(1,1)(0001,0) —
    preceded by method=00, partition order=0000, param=0001."""
    bw = BitWriter()
    fc._write_residual(bw, [0, -1, 3])
    bw.align()
    got = bw.getvalue()
    bits = "00" + "0000" + "0001" + "10" + "11" + "0001" + "0"
    bits += "0" * (-len(bits) % 8)
    assert got == int(bits, 2).to_bytes(len(bits) // 8, "big")
    # and the decoder reads it back
    br = BitReader(got)
    assert fc._decode_residual(br, 3, 0) == [0, -1, 3]


def test_escape_residual_roundtrip(monkeypatch):
    """Force the raw-escape residual path (unreachable from int16 via
    FIXED≤2) and require the decoder to read it losslessly."""
    monkeypatch.setattr(fc, "_ESCAPE_WIDTH", 4)
    x = _signals()["noise"][:4096]
    d = encode(x, 16000)
    y, _ = decode(d)
    assert np.array_equal(y[:, 0], x.astype(np.int32))


_BPS_CODE = {8: 0x1, 12: 0x2, 16: 0x4, 20: 0x5, 24: 0x6}


def _stream_with_manual_subframe(write_subframe, block_size, bps=16, rate=8000):
    """Minimal single-frame FLAC stream around a caller-written subframe."""
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # 1 channel
    si.write(bps - 1, 5)
    si.write(block_size, 36)
    body = si.getvalue() + bytes(16)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    hdr = BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 2)
    hdr.write(0x7, 4)  # 16-bit block size follows
    hdr.write(0, 4)  # rate from streaminfo
    hdr.write(0, 4)  # 1 channel
    hdr.write(_BPS_CODE[bps], 3)
    hdr.write(0, 1)
    hdr.write(0, 8)  # frame number 0
    hdr.write(block_size - 1, 16)
    hdr.align()
    hb = hdr.getvalue()
    bw = BitWriter()
    for b in hb:
        bw.write(b, 8)
    bw.write(crc8(hb), 8)
    write_subframe(bw)
    bw.align()
    frame = bw.getvalue()
    out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


def test_lpc_subframe_decodes():
    """Hand-assembled LPC subframe: warmup + quantized coefficients + Rice
    residuals computed in-test; decode must reproduce the chosen signal."""
    n = 64
    order, precision, shift = 2, 12, 9
    coefs = [1843, -871]  # ~ x[i] ≈ (1843*x[i-1] - 871*x[i-2]) >> 9
    x = [int(3000 * np.sin(i / 5)) for i in range(n)]

    def write_subframe(bw):
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)  # LPC, order 2
        bw.write(0, 1)  # no wasted bits
        for i in range(order):
            bw.write(x[i] & 0xFFFF, 16)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & ((1 << precision) - 1), precision)
        resid = []
        for i in range(order, n):
            pred = (coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift
            resid.append(x[i] - pred)
        fc._write_residual(bw, resid)

    data = _stream_with_manual_subframe(write_subframe, n)
    y, rate, bps = decode_full(data)
    assert (rate, bps) == (8000, 16)
    assert y[:, 0].tolist() == x


def test_wasted_bits_subframe_decodes():
    """VERBATIM subframe with 2 wasted bits: stored samples are x >> 2;
    the decoder must shift them back."""
    n = 32
    x = [(i - 16) * 4 for i in range(n)]  # all multiples of 4

    def write_subframe(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(1)  # unary(k-1)=1 → k=2 wasted bits
        for v in x:
            bw.write((v >> 2) & 0x3FFF, 14)  # bps 16 - 2 wasted

    data = _stream_with_manual_subframe(write_subframe, n)
    y, _, _ = decode_full(data)
    assert y[:, 0].tolist() == x


def test_fixed_order_selection_exercised():
    """The encoder picks FIXED order per channel; a constant-slope ramp must
    compress far below raw (order 2 zeroes the residual)."""
    x = np.arange(-4000, 4000, 2, dtype=np.int16)
    d = encode(x, 16000)
    assert len(d) < x.nbytes / 10
    y, _ = decode(d)
    assert np.array_equal(y[:, 0], x.astype(np.int32))


def test_decode_audio_seam_flac():
    from data_validation_spark.stats.multimodal import decode_audio, sniff_media

    x = (np.sin(np.arange(6000) / 11) * 15000).astype(np.int16)
    d = encode(x, 32000)
    assert sniff_media(d) == "flac"
    samples, rate = decode_audio(d)
    assert rate == 32000
    assert samples.dtype == np.int16
    # format-independent (frames, channels) contract: mono -> (n, 1)
    assert samples.shape == (len(x), 1)
    assert np.array_equal(samples[:, 0], x)
    with pytest.raises(ValueError):
        decode_audio(d[:40])  # sniffs flac, fails decode → corrupt


def test_audio_features_over_flac_column(spark):
    """The distributed audio-feature pass accepts FLAC payloads natively."""
    from data_validation_spark.stats.multimodal import audio_features, encode_wav

    x1 = (np.sin(np.arange(4000) / 7) * 8000).astype(np.int16)
    x2 = (np.sin(np.arange(2000) / 3) * 2000).astype(np.int16)
    rows = [
        ("a", encode(x1, 16000)),           # flac
        ("b", encode_wav(x2, 16000)),       # wav, same pass
        ("c", b"\xff\xfbgarbage-mp3-ish"),  # undecodable → NULL features
    ]
    df = spark.createDataFrame(rows, "id string, audio binary")
    feats = {r["id"]: r for r in audio_features(df, "id", "audio").collect()}
    assert feats["a"]["duration_s"] == pytest.approx(4000 / 16000)
    assert feats["b"]["duration_s"] == pytest.approx(2000 / 16000)
    assert feats["a"]["rms"] > 0.1 and feats["a"]["peak"] <= 1.0
    assert feats["c"]["rms"] is None
    # FLAC and WAV of the SAME signal give identical features (lossless)
    both = [("w", encode_wav(x1, 16000)), ("f", encode(x1, 16000))]
    df2 = spark.createDataFrame(both, "id string, audio binary")
    got = {r["id"]: r for r in audio_features(df2, "id", "audio").collect()}
    for k in ("rms", "peak", "zero_crossing_rate", "duration_s"):
        assert got["w"][k] == pytest.approx(got["f"][k], abs=0)


def test_utf8_frame_number_boundaries():
    from data_validation_spark.stats.flaccodec import (
        _read_utf8_number,
        _write_utf8_number,
    )

    for v in [0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, (1 << 31) - 1, (1 << 36) - 1]:
        bw = BitWriter()
        _write_utf8_number(bw, v)
        assert _read_utf8_number(BitReader(bw.getvalue())) == v


def test_long_stream_many_frames_lossless():
    """Frame indices past 0x800 need the 3-byte UTF-8 coded-number form; a
    long encode must still roundtrip (regression: 2-byte-only encoding
    produced undecodable streams beyond 2048 frames)."""
    n_frames = 0x800 + 3
    x = (np.arange(n_frames * 256) % 251 - 125).astype(np.int16)
    d = encode(x, 16000, block_size=256)
    y, _ = decode(d)
    assert np.array_equal(y[:, 0], x.astype(np.int32))


def test_decode_audio_normalizes_non16bit_flac():
    """12-bit streams scale UP to int16 full scale; features use the native
    depth for [-1, 1] normalization (regression: raw /32768 was 16x off)."""
    from data_validation_spark.stats.multimodal import decode_audio

    n = 64
    val = 1024  # half of 12-bit full scale

    def write_subframe(bw):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(val & 0xFFF, 12)

    data = _stream_with_manual_subframe(write_subframe, n, bps=12)
    y, rate, bps = decode_full(data)
    assert (bps, y[0, 0]) == (12, val)
    samples, _ = decode_audio(data)
    assert samples.shape[1] == 1  # (frames, channels) contract
    assert samples[0, 0] == val << 4  # int16 full-scale contract


def test_audio_features_scale_by_native_depth(spark):
    from data_validation_spark.stats.multimodal import audio_features

    def write_subframe(bw):
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(1024 & 0xFFF, 12)

    d12 = _stream_with_manual_subframe(write_subframe, 64, bps=12)
    df = spark.createDataFrame([("a", d12)], "id string, audio binary")
    row = audio_features(df, "id", "audio").first()
    assert row["peak"] == pytest.approx(1024 / 2048)  # NOT 1024/32768
