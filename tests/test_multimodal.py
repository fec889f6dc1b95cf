"""Multimodal (audio/video binary column) tests — WAV real, others stubbed
with real Spark plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_validation_spark.stats.multimodal import (
    audio_features,
    decode_audio,
    decode_wav,
    encode_wav,
    extract_media_metadata,
    media_chunks,
    mp4_major_brand,
    sample_frames,
    sniff_media,
    sniff_media_col,
    wav_metadata,
)


def make_wav(freq=440.0, secs=0.25, rate=8000):
    t = np.arange(int(secs * rate)) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
    return encode_wav(samples, rate)


def test_wav_roundtrip():
    data = make_wav()
    assert sniff_media(data) == "wav"
    arr, rate = decode_wav(data)
    assert rate == 8000
    assert arr.shape == (2000, 1)
    meta = wav_metadata(data)
    assert meta["duration_s"] == pytest.approx(0.25)
    assert meta["channels"] == 1


def test_sniffing():
    assert sniff_media(b"fLaC....") == "flac"
    assert sniff_media(b"OggS....") == "ogg"
    assert sniff_media(b"ID3\x04...") == "mp3"
    assert sniff_media(b"\x00\x00\x00\x18ftypisom....") == "mp4"
    assert sniff_media(b"\x1a\x45\xdf\xa3....") == "webm"
    assert sniff_media(b"RIFF1234AVI ....") == "avi"
    assert sniff_media(b"garbage") == "UNKNOWN"
    assert mp4_major_brand(b"\x00\x00\x00\x18ftypisom....") == "isom"


def test_decode_stubs():
    assert decode_audio(make_wav())[1] == 8000
    with pytest.raises(NotImplementedError, match="STUB"):
        decode_audio(b"ID3\x04 fake mp3 payload")
    with pytest.raises(NotImplementedError, match="STUB"):
        sample_frames(b"\x00\x00\x00\x18ftypisom fake")


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("a1", bytearray(make_wav(440.0, 0.25))),
        ("a2", bytearray(make_wav(880.0, 0.5, rate=16000))),
        ("v1", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 100)),
        ("x1", bytearray(b"not media at all")),
        ("n1", None),
    ]
    return spark.createDataFrame(rows, "id string, payload binary")


def test_sniff_media_col(spark, media_df):
    got = {r["id"]: r["f"] for r in media_df.select("id", sniff_media_col("payload").alias("f")).collect()}
    assert got == {"a1": "wav", "a2": "wav", "v1": "mp4", "x1": "UNKNOWN", "n1": None}


def test_extract_media_metadata(media_df):
    rows = {r["id"]: r for r in extract_media_metadata(media_df, "id", "payload").collect()}
    assert rows["a1"]["media_format"] == "wav"
    assert rows["a1"]["sample_rate"] == 8000
    assert rows["a1"]["duration_s"] == pytest.approx(0.25)
    assert rows["a2"]["n_frames"] == 8000
    assert rows["v1"]["media_format"] == "mp4"
    assert rows["v1"]["mp4_brand"] == "mp42"
    assert rows["x1"]["media_format"] == "UNKNOWN"
    assert rows["x1"]["channels"] is None


def test_audio_features(media_df):
    rows = {r["id"]: r for r in audio_features(media_df, "id", "payload").collect()}
    # pure sine: rms ≈ amplitude/√2 = (20000/32768)/1.414 ≈ 0.432
    assert rows["a1"]["rms"] == pytest.approx(0.432, abs=0.01)
    assert rows["a1"]["peak"] == pytest.approx(20000 / 32768, abs=0.01)
    # 440 Hz at 8 kHz → ~880 zero crossings/sec → zcr ≈ 0.11
    assert rows["a1"]["zero_crossing_rate"] == pytest.approx(0.11, abs=0.02)
    assert rows["v1"]["rms"] is None  # undecodable → NULL features


def test_media_chunks(media_df):
    chunks = media_chunks(media_df, "id", "payload", chunk_bytes=1000).collect()
    by_id = {}
    for r in chunks:
        by_id.setdefault(r["id"], []).append(r)
    # a2: 8000 frames × 2B + 44B header = 16044 bytes → 17 chunks of ≤1000
    assert len(by_id["a2"]) == 17
    assert sorted(r["chunk_idx"] for r in by_id["a2"]) == list(range(17))
    reassembled = b"".join(
        bytes(r["chunk"]) for r in sorted(by_id["a2"], key=lambda r: r["chunk_idx"])
    )
    assert decode_wav(reassembled)[1] == 16000
    assert "n1" not in by_id  # null payloads skipped


# ----------------------------------------------------- MJPEG-in-AVI video ---
def _make_frames(n=10, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.clip(np.stack([xx * 5 + i * 10, yy * 7, xx + yy], axis=2), 0, 255).astype(
            np.uint8
        )
        for i in range(n)
    ]


def _psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return float("inf") if mse == 0 else 20 * np.log10(255) - 10 * np.log10(mse)


def test_avi_mjpeg_sample_frames_real():
    # Real video frame sampling without any codec lib: RIFF/movi parse +
    # baseline JPEG decode, meeting the >=40 dB pixel-integrity invariant.
    from data_validation_spark.stats.multimodal import (
        avi_metadata,
        encode_avi_mjpeg,
        sample_frames,
        sniff_media,
    )

    frames = _make_frames()
    avi = encode_avi_mjpeg(frames, fps=10, quality=90)
    assert sniff_media(avi) == "avi"
    assert avi_metadata(avi) == {
        "n_frames": 10, "width": 48, "height": 32, "duration_s": 1.0,
    }
    sampled = sample_frames(avi, every_n=3)
    assert len(sampled) == 4  # frames 0, 3, 6, 9
    for got, want in zip(sampled, (frames[0], frames[3], frames[6], frames[9])):
        assert got.shape == want.shape
        assert _psnr(want, got) >= 40.0
    # compressed-codec seam still raises
    with pytest.raises(NotImplementedError, match="STUB"):
        sample_frames(b"\x1a\x45\xdf\xa3" + b"\x00" * 100)


def test_avi_metadata_through_spark_pass(spark):
    from data_validation_spark.stats.multimodal import encode_avi_mjpeg

    avi = encode_avi_mjpeg(_make_frames(6), fps=3, quality=85)
    df = spark.createDataFrame(
        [("vid1", bytearray(avi)), ("a1", bytearray(make_wav()))],
        "id string, payload binary",
    )
    rows = {r["id"]: r for r in extract_media_metadata(df, "id", "payload").collect()}
    v = rows["vid1"]
    assert v["media_format"] == "avi"
    assert v["n_frames"] == 6
    assert v["duration_s"] == pytest.approx(2.0)
    assert v["channels"] is None  # video: no audio metadata claimed
    assert rows["a1"]["media_format"] == "wav"
