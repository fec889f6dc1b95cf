"""TFRecord + tf.Example source/sink — pure-Python, no TensorFlow needed.

The reference's native input is TFRecord files of serialized tf.Example
protos (``stats_gen_lib.generate_statistics_from_tfrecord``,
``tfx_bsl`` TFXIO). This module reads that format Spark-natively so a
reference user can point the engine at their existing data:

* **Framing** (public TFRecord spec): each record is
  ``uint64 length | uint32 masked-crc32c(length) | bytes data |
  uint32 masked-crc32c(data)``. CRC verification is optional (crc32c is
  implemented in vectorized numpy; off by default — flip ``verify_crc``
  for integrity sweeps).
* **tf.Example** (public protobuf wire format, parsed directly):
  ``Example.features.feature: map<string, Feature>`` where ``Feature`` is
  oneof ``bytes_list | float_list | int64_list``. Packed and unpacked
  repeated encodings are both handled.
* **Distribution**: one Spark task per file (TFRecord shards are the
  reference's unit of parallelism too); each task streams frames →
  Arrow batches. Schema is inferred from a sample of records, or pass an
  explicit mapping.

Writer included (framing + wire-format encode) so tests are
self-verifying without TensorFlow.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from typing import Iterator, Optional

import numpy as np

# --------------------------------------------------------------- crc32c -----
# Castagnoli polynomial (reversed) — table-driven, numpy-vectorized over the
# payload; only used when verify_crc=True.
_CRC32C_POLY = 0x82F63B78


def _make_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ np.uint32(_CRC32C_POLY), t >> 1)
    return t


_CRC_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    crc = np.uint32(0xFFFFFFFF)
    arr = np.frombuffer(data, dtype=np.uint8)
    table = _CRC_TABLE
    for b in arr:  # byte-serial; fine for opt-in verification of headers
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# -------------------------------------------------------------- framing -----
def read_frames(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Yield record payloads from one TFRecord file. GZIP-compressed files
    are detected by magic bytes and decompressed transparently."""
    import gzip

    with open(path, "rb") as raw:
        magic = raw.read(2)
        raw.seek(0)
        f = gzip.GzipFile(fileobj=raw) if magic == b"\x1f\x8b" else raw
        while True:
            header = f.read(12)
            if not header:
                return
            if len(header) < 12:
                # a file cut mid-header is corruption, not clean EOF
                raise IOError(f"truncated TFRecord header in {path}")
            (length,) = struct.unpack("<Q", header[:8])
            if verify_crc:
                (lcrc,) = struct.unpack("<I", header[8:12])
                if _masked_crc(header[:8]) != lcrc:
                    raise IOError(f"corrupt TFRecord length crc in {path}")
            data = f.read(length)
            tail = f.read(4)
            if len(data) < length or len(tail) < 4:
                raise IOError(f"truncated TFRecord in {path}")
            if verify_crc:
                (dcrc,) = struct.unpack("<I", tail)
                if _masked_crc(data) != dcrc:
                    raise IOError(f"corrupt TFRecord data crc in {path}")
            yield data


def write_frames(path: str, records: list[bytes], compression: str | None = None) -> None:
    import gzip

    opener = gzip.open if compression == "gzip" else open
    with opener(path, "wb") as f:
        for rec in records:
            header = struct.pack("<Q", len(rec))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(rec)
            f.write(struct.pack("<I", _masked_crc(rec)))


# ------------------------------------------------- protobuf wire format -----
def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, pos = _read_varint(buf, pos)
            yield field, wt, v
        elif wt == 1:  # 64-bit
            yield field, wt, buf[pos : pos + 8]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _zigzagless_int64(v: int) -> int:
    # int64 fields are plain (non-zigzag) varints; wrap to signed
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_feature(buf: bytes) -> list:
    """Serialized Feature message → list of bytes|float|int."""
    values: list = []
    for f4, wt4, v4 in _iter_fields(buf):
        if f4 == 1:  # BytesList
            values = [bv for f5, _, bv in _iter_fields(v4) if f5 == 1]
        elif f4 == 2:  # FloatList
            floats: list = []
            for f5, wt5, v5 in _iter_fields(v4):
                if f5 != 1:
                    continue
                if wt5 == 2:  # packed
                    floats.extend(np.frombuffer(v5, dtype="<f4").tolist())
                else:  # unpacked 32-bit
                    floats.append(struct.unpack("<f", v5)[0])
            values = floats
        elif f4 == 3:  # Int64List
            ints: list = []
            for f5, wt5, v5 in _iter_fields(v4):
                if f5 != 1:
                    continue
                if wt5 == 2:  # packed varints
                    pos = 0
                    while pos < len(v5):
                        iv, pos = _read_varint(v5, pos)
                        ints.append(_zigzagless_int64(iv))
                else:
                    ints.append(_zigzagless_int64(v5))
            values = ints
    return values


def _parse_features(buf: bytes) -> dict[str, list]:
    """Serialized Features message → {name: value list}."""
    out: dict[str, list] = {}
    for f2, wt2, entry in _iter_fields(buf):
        if f2 != 1 or wt2 != 2:  # Features.feature map entry
            continue
        name = None
        values: list = []
        for f3, wt3, v3 in _iter_fields(entry):
            if f3 == 1:  # key
                name = v3.decode("utf-8")
            elif f3 == 2:  # value: Feature
                values = _parse_feature(v3)
        if name is not None:
            out[name] = values
    return out


def parse_example(buf: bytes) -> dict[str, list]:
    """Serialized tf.Example → {feature_name: list of bytes|float|int}."""
    out: dict[str, list] = {}
    for field, wt, val in _iter_fields(buf):
        if field == 1 and wt == 2:  # Example.features
            out.update(_parse_features(val))
    return out


def parse_sequence_example(
    buf: bytes,
) -> tuple[dict[str, list], dict[str, list[list]]]:
    """Serialized tf.SequenceExample → (context, sequences).

    ``context`` is {name: value list} like :func:`parse_example`;
    ``sequences`` is {name: list of per-step value lists} — one inner list
    per Feature entry of the FeatureList (an empty/kind-less entry decodes
    to ``[]``, preserving the reference's missing-step shape).
    Wire format (public example.proto): SequenceExample{1: Features context,
    2: FeatureLists}, FeatureLists{1: map<string, FeatureList>},
    FeatureList{1: repeated Feature}.
    """
    context: dict[str, list] = {}
    sequences: dict[str, list[list]] = {}
    for field, wt, val in _iter_fields(buf):
        if field == 1 and wt == 2:  # context: Features
            context.update(_parse_features(val))
        elif field == 2 and wt == 2:  # feature_lists: FeatureLists
            for f2, wt2, entry in _iter_fields(val):
                if f2 != 1 or wt2 != 2:  # map entry
                    continue
                name = None
                steps: list[list] = []
                for f3, wt3, v3 in _iter_fields(entry):
                    if f3 == 1:
                        name = v3.decode("utf-8")
                    elif f3 == 2:  # FeatureList
                        steps = [
                            _parse_feature(v4)
                            for f4, wt4, v4 in _iter_fields(v3)
                            if f4 == 1 and wt4 == 2
                        ]
                if name is not None:
                    sequences[name] = steps
    return context, sequences


# --------------------------------------------------------------- encoder ----
def _varint(v: int) -> bytes:
    out = bytearray()
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _encode_feature(values: list) -> bytes:
    """Value list → serialized Feature message payload."""
    if values and isinstance(values[0], (bytes, bytearray, str)):
        items = b"".join(
            _ld(1, v.encode("utf-8") if isinstance(v, str) else bytes(v))
            for v in values
        )
        return _ld(1, items)
    if values and isinstance(values[0], float):
        packed = np.asarray(values, dtype="<f4").tobytes()
        return _ld(2, _ld(1, packed))
    packed = b"".join(_varint(int(v)) for v in values)
    return _ld(3, _ld(1, packed))


def _encode_features(features: dict[str, list]) -> bytes:
    """{name: values} → serialized Features message payload."""
    entries = b""
    for name, values in features.items():
        entries += _ld(
            1, _ld(1, name.encode("utf-8")) + _ld(2, _encode_feature(values))
        )
    return entries


def encode_example(features: dict[str, list]) -> bytes:
    """{name: list of bytes|str|float|int} → serialized tf.Example."""
    return _ld(1, _encode_features(features))


def encode_sequence_example(
    context: dict[str, list], sequences: dict[str, list[list]]
) -> bytes:
    """(context, {name: per-step value lists}) → serialized
    tf.SequenceExample. A ``None`` step encodes as a kind-less Feature entry
    (the reference's 'missing step'); ``[]`` as an empty int64_list. Both
    decode back to ``[]``."""
    lists = b""
    for name, steps in sequences.items():
        fl = b"".join(
            _ld(1, b"" if s is None else _encode_feature(s)) for s in steps
        )
        lists += _ld(1, _ld(1, name.encode("utf-8")) + _ld(2, fl))
    return _ld(1, _encode_features(context)) + _ld(2, lists)


def write_tfrecord_examples(
    path: str, examples: list[dict[str, list]]
) -> None:
    write_frames(path, [encode_example(e) for e in examples])


# ----------------------------------------------------------- Spark source ---
def _resolve_paths(path) -> list[str]:
    """Expand a path / glob / directory / list thereof into sorted files."""
    paths = sorted(
        p
        for pat in ([path] if isinstance(path, str) else path)
        for p in (
            _glob.glob(os.path.join(pat, "*"))
            if os.path.isdir(pat)
            else _glob.glob(pat)
        )
        if os.path.isfile(p)
    )
    if not paths:
        raise FileNotFoundError(f"no TFRecord files match {path!r}")
    return paths


def _value_kind(values: list) -> Optional[str]:
    """'bytes'|'float'|'int' from a value list; None when empty (an empty
    list carries no type evidence)."""
    if not values:
        return None
    v = values[0]
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, float):
        return "float"
    return "int"


def _append_feature_values(rows, ex, names, schema) -> None:
    """Append one parsed record's values per column (scalar unwrap, missing
    → NULL) — shared by the Example and SequenceExample loaders."""
    for n in names:
        values = ex.get(n)
        spec = schema[n]
        if values is None:
            rows[n].append(None)
        elif spec.startswith("array<"):
            rows[n].append(list(values))
        else:
            rows[n].append(values[0] if values else None)


def _infer_schema(sample: list[dict[str, list]]) -> dict[str, str]:
    """feature → 'bytes'|'float'|'int' plus scalar/list shape from a sample."""
    kinds: dict[str, tuple[Optional[str], bool]] = {}
    for ex in sample:
        for name, values in ex.items():
            # untyped until a non-empty occurrence (default 'int' at the end)
            kind = _value_kind(values)
            prev = kinds.get(name)
            multi = len(values) != 1 or (prev[1] if prev else False)
            kinds[name] = (kind if prev is None or prev[0] is None else prev[0], multi)
    return {
        name: ((kind or "int") if not multi else f"array<{kind or 'int'}>")
        for name, (kind, multi) in kinds.items()
    }


_SPARK_TYPES = {"bytes": "binary", "float": "double", "int": "bigint"}


def read_tfrecord(
    spark,
    path: str,
    schema: Optional[dict[str, str]] = None,
    verify_crc: bool = False,
    sample_records: int = 100,
):
    """TFRecord(tf.Example) files → DataFrame; one task per file shard.

    ``schema`` maps feature name → 'bytes'|'float'|'int' or
    'array<bytes|float|int>'; inferred from the first ``sample_records``
    of the first file when omitted. Scalar columns unwrap one-element
    lists (the reference's TFXIO does the same via the TFMD schema);
    missing features are NULL.
    """
    import pandas as pd

    paths = _resolve_paths(path)

    if schema is None:
        sample = []
        for frame in read_frames(paths[0], verify_crc):
            sample.append(parse_example(frame))
            if len(sample) >= sample_records:
                break
        schema = _infer_schema(sample)

    names = sorted(schema)
    ddl = ", ".join(
        f"`{n}` " + (
            f"array<{_SPARK_TYPES[schema[n][6:-1]]}>"
            if schema[n].startswith("array<")
            else _SPARK_TYPES[schema[n]]
        )
        for n in names
    )
    fixed_schema = dict(schema)

    def load(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            for fpath in pdf["path"]:
                rows: dict[str, list] = {n: [] for n in names}
                for frame in read_frames(fpath, verify_crc):
                    _append_feature_values(
                        rows, parse_example(frame), names, fixed_schema
                    )
                yield pd.DataFrame(rows, columns=names)

    files_df = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        len(paths)
    )
    return files_df.mapInPandas(load, ddl)


SEQUENCE_STRUCT = "##SEQUENCE##"


def write_tfrecord_sequence_examples(
    path: str, examples: list[tuple[dict[str, list], dict[str, list[list]]]]
) -> None:
    write_frames(path, [encode_sequence_example(c, s) for c, s in examples])


def read_tfrecord_sequence_examples(
    spark,
    path: str,
    context_schema: Optional[dict[str, str]] = None,
    sequence_kinds: Optional[dict[str, str]] = None,
    verify_crc: bool = False,
    sample_records: int = 100,
):
    """TFRecord(tf.SequenceExample) files → DataFrame; one task per shard.

    Context features become top-level columns (scalar unwrap, like
    :func:`read_tfrecord`); sequence features become fields of ONE struct
    column named ``##SEQUENCE##`` typed ``array<array<T>>`` — the engine's
    struct flattening then names their stats ``##SEQUENCE##.<name>`` with
    nestedness 2, matching the reference TFXIO's SERIALIZED_PATH naming
    (``tf_sequence_example_record.TFSequenceExampleRecord``;
    integration_tests/sequence_example_e2e_test.py). A feature list absent
    from a record is NULL; a present list keeps one inner list per step.

    ``context_schema`` / ``sequence_kinds`` override inference (feature →
    'bytes'|'float'|'int', context also 'array<...>'): like
    :func:`read_tfrecord`'s ``schema``, the escape hatch when a feature
    first appears past the first ``sample_records`` records of the first
    shard — inference only sees that prefix.
    """
    import pandas as pd

    paths = _resolve_paths(path)

    if context_schema is None or sequence_kinds is None:
        ctx_sample, seq_kinds = [], {}
        for i, frame in enumerate(read_frames(paths[0], verify_crc)):
            if i >= sample_records:
                break
            ctx, seqs = parse_sequence_example(frame)
            ctx_sample.append(ctx)
            for name, steps in seqs.items():
                flat = [v for s in steps for v in s]
                if seq_kinds.get(name) is None:
                    seq_kinds[name] = _value_kind(flat)
        if context_schema is None:
            context_schema = _infer_schema(ctx_sample)
        if sequence_kinds is None:
            sequence_kinds = seq_kinds
    ctx_schema = context_schema
    seq_kinds = sequence_kinds

    ctx_names = sorted(ctx_schema)
    seq_names = sorted(seq_kinds)
    ddl_parts = [
        f"`{n}` " + (
            f"array<{_SPARK_TYPES[ctx_schema[n][6:-1]]}>"
            if ctx_schema[n].startswith("array<")
            else _SPARK_TYPES[ctx_schema[n]]
        )
        for n in ctx_names
    ]
    if seq_names:
        fields = ", ".join(
            f"`{n}`: array<array<{_SPARK_TYPES[seq_kinds[n] or 'int']}>>"
            for n in seq_names
        )
        ddl_parts.append(f"`{SEQUENCE_STRUCT}` struct<{fields}>")
    ddl = ", ".join(ddl_parts)
    fixed_ctx = dict(ctx_schema)

    def load(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ctx_names + ([SEQUENCE_STRUCT] if seq_names else [])
        for pdf in iterator:
            for fpath in pdf["path"]:
                rows: dict[str, list] = {n: [] for n in cols}
                for frame in read_frames(fpath, verify_crc):
                    ctx, seqs = parse_sequence_example(frame)
                    _append_feature_values(rows, ctx, ctx_names, fixed_ctx)
                    if seq_names:
                        rows[SEQUENCE_STRUCT].append(
                            {
                                n: (
                                    [list(s) for s in seqs[n]]
                                    if n in seqs
                                    else None
                                )
                                for n in seq_names
                            }
                        )
                yield pd.DataFrame(rows, columns=cols)

    files_df = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        len(paths)
    )
    return files_df.mapInPandas(load, ddl)
