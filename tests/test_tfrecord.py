"""TFRecord + tf.Example source (io/tfrecord.py) — the reference's native
input format (stats_gen_lib.generate_statistics_from_tfrecord), readable
without TensorFlow. Self-verifying via the included writer, plus a
fixed-bytes golden so reader and writer can't share a mirrored bug."""

import struct

import numpy as np
import pytest

from data_validation_spark.io import tfrecord as tfr


def test_example_wire_format_golden():
    # Hand-assembled serialized tf.Example (public protobuf wire format):
    # features { feature { key: "x" value { int64_list { value: 7 } } } }
    # tag bytes: Example.features = field1 LEN; map entry field1 LEN;
    # key field1 LEN; value field2 LEN; Int64List = Feature field3 LEN;
    # packed value field1 LEN.
    int64_list = b"\x0a\x01\x07"            # Int64List.value (packed): [7]
    feature = b"\x1a" + bytes([len(int64_list)]) + int64_list
    entry = b"\x0a\x01x" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert tfr.parse_example(example) == {"x": [7]}
    # our encoder produces byte-identical output for this case
    assert tfr.encode_example({"x": [7]}) == example


def test_example_roundtrip_all_types():
    ex = {
        "b": [b"\x00\xff", b"hello"],
        "f": [1.5, -2.25],
        "i": [0, -1, 2**40, -(2**40)],
        "s": [b"one"],
    }
    back = tfr.parse_example(tfr.encode_example(ex))
    assert back["b"] == ex["b"]
    assert back["f"] == ex["f"]  # 1.5/-2.25 exact in f32
    assert back["i"] == ex["i"]
    assert back["s"] == ex["s"]


def test_unpacked_int64_and_float_variants():
    # unpacked encodings (one tag per element) must parse identically
    def ld(field, payload):
        return tfr._ld(field, payload)

    unpacked_ints = b"".join(b"\x08" + tfr._varint(v) for v in (3, 5))
    feat_i = ld(3, unpacked_ints)
    unpacked_floats = b"".join(b"\x0d" + struct.pack("<f", v) for v in (0.5, 2.0))
    feat_f = ld(2, unpacked_floats)
    entry_i = ld(1, ld(1, b"i") + ld(2, feat_i))
    entry_f = ld(1, ld(1, b"f") + ld(2, feat_f))
    example = ld(1, entry_i + entry_f)
    parsed = tfr.parse_example(example)
    assert parsed["i"] == [3, 5]
    assert parsed["f"] == [0.5, 2.0]


def test_framing_roundtrip_and_crc():
    import tempfile, os

    recs = [b"alpha", b"", b"\xff" * 1000]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.tfrecord")
        tfr.write_frames(p, recs)
        assert list(tfr.read_frames(p)) == recs
        assert list(tfr.read_frames(p, verify_crc=True)) == recs
        # corrupt one data byte → crc check raises, unchecked read does not
        raw = bytearray(open(p, "rb").read())
        raw[13] ^= 0x01  # inside record 0 payload
        open(p, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            list(tfr.read_frames(p, verify_crc=True))


def test_crc32c_known_vectors():
    # public test vectors (RFC 3720 / common crc32c suites)
    assert tfr.crc32c(b"") == 0x00000000
    assert tfr.crc32c(b"123456789") == 0xE3069283
    assert tfr.crc32c(b"a") == 0xC1D04330


def test_read_tfrecord_dataframe_and_stats(spark, tmp_path):
    examples = [
        {"id": [i], "x": [float(i)], "tag": [b"even" if i % 2 == 0 else b"odd"],
         "vec": [float(i), float(i + 1)]}
        for i in range(50)
    ]
    # two shards → two tasks
    tfr.write_tfrecord_examples(str(tmp_path / "part-0.tfrecord"), examples[:30])
    tfr.write_tfrecord_examples(str(tmp_path / "part-1.tfrecord"), examples[30:])

    df = tfr.read_tfrecord(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() == 2
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert len(rows) == 50
    assert rows[7]["x"] == 7.0 and bytes(rows[7]["tag"]) == b"odd"
    assert rows[7]["vec"] == [7.0, 8.0]

    # stats over the TFRecord source == stats over the same data in memory
    from data_validation_spark.stats.engine import compute_statistics

    stats = compute_statistics(df.select("x", "vec"))
    n = stats.default_slice().feature("x").numeric
    assert n.min == 0.0 and n.max == 49.0
    assert n.mean == pytest.approx(24.5)
    assert stats.default_slice().feature("vec").common.tot_num_values == 100


def test_read_tfrecord_missing_feature_and_explicit_schema(spark, tmp_path):
    examples = [{"a": [1], "b": [b"x"]}, {"a": [2]}]
    p = str(tmp_path / "data.tfrecord")
    tfr.write_tfrecord_examples(p, examples)
    df = tfr.read_tfrecord(spark, p, schema={"a": "int", "b": "bytes"})
    rows = sorted(df.collect(), key=lambda r: r["a"])
    assert rows[1]["b"] is None  # missing feature → NULL
    assert bytes(rows[0]["b"]) == b"x"


def test_generate_statistics_from_tfrecord_entry(spark, tmp_path):
    import data_validation_spark as dvs

    tfr.write_tfrecord_examples(
        str(tmp_path / "d.tfrecord"),
        [{"v": [float(i)]} for i in range(10)],
    )
    stats = dvs.generate_statistics_from_tfrecord(spark, str(tmp_path / "d.tfrecord"))
    n = stats.default_slice().feature("v").numeric
    assert n.min == 0.0 and n.max == 9.0


def test_validate_examples_in_tfrecord_and_csv(spark, tmp_path):
    import data_validation_spark as dvs
    from data_validation_spark.schema import FeatureSpec, FeatureType, IntDomain, Schema

    schema = Schema(feature=[FeatureSpec(
        name="v", type=FeatureType.INT, int_domain=IntDomain(min=0, max=5))])

    tfr.write_tfrecord_examples(
        str(tmp_path / "v.tfrecord"),
        [{"rid": [b"r1"], "v": [3]}, {"rid": [b"r2"], "v": [99]}],
    )
    viol = dvs.validate_examples_in_tfrecord(
        spark, str(tmp_path / "v.tfrecord"), schema, key_col="rid"
    ).collect()
    assert [bytes(r["row_key"]) if isinstance(r["row_key"], (bytes, bytearray))
            else r["row_key"] for r in viol] in ([b"r2"], ["r2"])

    csv_path = str(tmp_path / "v.csv")
    with open(csv_path, "w") as f:
        f.write("rid,v\nr1,3\nr2,99\n")
    viol2 = dvs.validate_examples_in_csv(spark, csv_path, schema, key_col="rid").collect()
    assert [r["row_key"] for r in viol2] == ["r2"]


def test_truncated_header_raises(tmp_path):
    """A file cut mid-header (1-11 bytes of a 12-byte header) is corruption,
    not clean EOF."""
    recs = [b"payload-one"]
    p = str(tmp_path / "t.tfrecord")
    tfr.write_frames(p, recs)
    data = open(p, "rb").read()
    cut = str(tmp_path / "cut.tfrecord")
    with open(cut, "wb") as f:
        f.write(data + b"\x05\x00\x00")  # 3 stray header bytes at EOF
    with pytest.raises(IOError, match="truncated TFRecord header"):
        list(tfr.read_frames(cut))
    # exact record boundary is still clean EOF
    assert list(tfr.read_frames(p)) == recs


def test_infer_schema_skips_empty_value_lists():
    """Empty value lists carry no type evidence: a feature that is empty in
    early records but bytes later must infer as bytes, not int."""
    sample = [
        {"f": [], "g": [1]},
        {"f": [b"abc", b"de"], "g": [2]},
    ]
    inferred = tfr._infer_schema(sample)
    assert inferred["f"] == "array<bytes>"
    assert inferred["g"] == "int"
    # all-empty stays defaulted (int), shaped as a list
    assert tfr._infer_schema([{"e": []}])["e"] == "array<int>"


def test_read_frames_gzip_roundtrip(tmp_path):
    """GZIP TFRecord files are sniffed by magic bytes and decompressed."""
    recs = [b"Foo", b"Bar", b"x" * 1000]
    p = str(tmp_path / "recs.tfrecord.gz")
    tfr.write_frames(p, recs, compression="gzip")
    with open(p, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    assert list(tfr.read_frames(p)) == recs
    assert list(tfr.read_frames(p, verify_crc=True)) == recs


def test_load_vocab_text_file(tmp_path):
    # vocab_util_test.py:25-32
    from data_validation_spark.io.vocab import load_vocab

    p = str(tmp_path / "vocab.txt")
    with open(p, "wb") as f:
        f.write(b"Foo\nBar\n")
    vocab, reverse_vocab = load_vocab(p)
    assert vocab == {"Foo": 0, "Bar": 1}
    assert reverse_vocab == {0: "Foo", 1: "Bar"}


def test_load_vocab_gz_recordio_file(tmp_path):
    # vocab_util_test.py:34-44
    from data_validation_spark.io.vocab import load_vocab

    p = str(tmp_path / "vocab.tfrecord.gz")
    tfr.write_frames(p, [b"Foo", b"Bar"], compression="gzip")
    vocab, reverse_vocab = load_vocab(p)
    assert vocab == {"Foo": 0, "Bar": 1}
    assert reverse_vocab == {0: "Foo", 1: "Bar"}


def test_load_vocab_missing_path():
    from data_validation_spark.io.vocab import load_vocab

    with pytest.raises(ValueError, match="does not exist"):
        load_vocab("/nonexistent/vocab.txt")


def test_read_vocab_df(spark, tmp_path):
    from data_validation_spark.io.vocab import read_vocab_df

    p = str(tmp_path / "vocab.txt")
    with open(p, "w") as f:
        f.write("the\nquick\nfox\n")
    rows = {r["token"]: r["index"] for r in read_vocab_df(spark, p).collect()}
    assert rows == {"the": 0, "quick": 1, "fox": 2}
