"""Pure-Python Apache Avro object-container-file reader/writer.

Implements the public Avro 1.x specification (binary encoding + object
container files, https://avro.apache.org/docs/current/specification/) from
scratch — no ``fastavro``/``avro`` package in this image. Scope is the subset
Iceberg metadata needs (null, boolean, int, long, float, double, bytes,
string, fixed, enum, record, array, map, union; ``null`` and ``deflate``
codecs), which is also enough for general small-metadata Avro IO.

Cross-implementation parity is pinned in ``tests/test_iceberg_native.py``:
files written here are read back by the JVM's ``org.apache.avro`` 1.12 (on
the Spark classpath) and vice versa, so the encoding is verified against the
Apache implementation, not just against itself.

Reference context: tensorflow/data-validation reads TFRecord/CSV only; Avro
appears in this repo because the Iceberg table format (the north rule's
storage layer) serializes its manifest metadata as Avro.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from hashlib import sha256
from typing import Any, BinaryIO, Iterable, Optional, Union

MAGIC = b"Obj\x01"

SchemaType = Union[str, dict, list]


# --------------------------------------------------------------------------
# binary decoder
# --------------------------------------------------------------------------
class _Decoder:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise EOFError("Avro: truncated data")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        """Zigzag varint (int and long share the encoding)."""
        shift = 0
        accum = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            accum |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise ValueError("Avro: varint too long")
        return (accum >> 1) ^ -(accum & 1)

    def read_boolean(self) -> bool:
        return self.read(1) != b"\x00"

    def read_float(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def read_double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


# --------------------------------------------------------------------------
# binary encoder
# --------------------------------------------------------------------------
class _Encoder:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def write_long(self, n: int) -> None:
        n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
        # the expression above zigzags two's-complement longs for any Python int
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.out.write(bytes([b | 0x80]))
            else:
                self.out.write(bytes([b]))
                break

    def write_boolean(self, v: bool) -> None:
        self.out.write(b"\x01" if v else b"\x00")

    def write_float(self, v: float) -> None:
        self.out.write(struct.pack("<f", v))

    def write_double(self, v: float) -> None:
        self.out.write(struct.pack("<d", v))

    def write_bytes(self, v: bytes) -> None:
        self.write_long(len(v))
        self.out.write(v)

    def write_string(self, v: str) -> None:
        self.write_bytes(v.encode("utf-8"))

    def getvalue(self) -> bytes:
        return self.out.getvalue()


# --------------------------------------------------------------------------
# schema resolution (named-type registry + reference strings)
# --------------------------------------------------------------------------
def _full_name(schema: dict, namespace: Optional[str]) -> Optional[str]:
    name = schema.get("name")
    if name is None:
        return None
    if "." in name:
        return name
    ns = schema.get("namespace", namespace)
    return f"{ns}.{name}" if ns else name


class _Names:
    """Registry mapping full names of record/enum/fixed to their schemas."""

    def __init__(self):
        self.names: dict[str, dict] = {}

    def register(self, schema: dict, namespace: Optional[str]) -> None:
        fn = _full_name(schema, namespace)
        if fn is not None:
            self.names[fn] = schema
            # also allow the bare name as a reference (common in practice)
            self.names.setdefault(schema["name"], schema)

    def resolve(self, ref: str, namespace: Optional[str]) -> dict:
        if namespace and f"{namespace}.{ref}" in self.names:
            return self.names[f"{namespace}.{ref}"]
        if ref in self.names:
            return self.names[ref]
        raise ValueError(f"Avro: unknown named type {ref!r}")


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _walk_register(schema: SchemaType, names: _Names, namespace: Optional[str]) -> None:
    """Pre-register every named type so forward/backward references resolve."""
    if isinstance(schema, list):
        for s in schema:
            _walk_register(s, names, namespace)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "error", "enum", "fixed"):
        names.register(schema, namespace)
        namespace = schema.get("namespace", namespace)
    if t in ("record", "error"):
        for f in schema.get("fields", []):
            _walk_register(f["type"], names, namespace)
    elif t == "array":
        _walk_register(schema.get("items"), names, namespace)
    elif t == "map":
        _walk_register(schema.get("values"), names, namespace)
    elif isinstance(t, (dict, list)):
        _walk_register(t, names, namespace)


def parse_schema(schema: Union[str, SchemaType]) -> tuple[SchemaType, _Names]:
    if isinstance(schema, str) and schema.lstrip()[:1] in "{[":
        schema = json.loads(schema)
    names = _Names()
    _walk_register(schema, names, None)
    return schema, names


# --------------------------------------------------------------------------
# datum reader / writer
# --------------------------------------------------------------------------
def _read_datum(dec: _Decoder, schema: SchemaType, names: _Names) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return dec.read_boolean()
        if t in ("int", "long"):
            return dec.read_long()
        if t == "float":
            return dec.read_float()
        if t == "double":
            return dec.read_double()
        if t == "bytes":
            return dec.read_bytes()
        if t == "string":
            return dec.read_string()
        return _read_datum(dec, names.resolve(t, None), names)
    if isinstance(schema, list):  # union: long branch index then datum
        idx = dec.read_long()
        if idx < 0 or idx >= len(schema):
            raise ValueError(f"Avro: union branch {idx} out of range")
        return _read_datum(dec, schema[idx], names)
    t = schema["type"]
    if isinstance(t, (dict, list)):
        return _read_datum(dec, t, names)
    if t in _PRIMITIVES:
        return _read_datum(dec, t, names)
    if t in ("record", "error"):
        return {
            f["name"]: _read_datum(dec, f["type"], names)
            for f in schema["fields"]
        }
    if t == "enum":
        return schema["symbols"][dec.read_long()]
    if t == "fixed":
        return dec.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = dec.read_long()
            if n == 0:
                break
            if n < 0:  # negative count → block byte size follows (skippable)
                n = -n
                dec.read_long()
            for _ in range(n):
                out.append(_read_datum(dec, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = dec.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                dec.read_long()
            for _ in range(n):
                k = dec.read_string()
                out[k] = _read_datum(dec, schema["values"], names)
        return out
    raise ValueError(f"Avro: unsupported schema {schema!r}")


def _union_branch(schema: list, datum: Any, names: _Names) -> int:
    """Pick the union branch for a Python datum (spec-order first match)."""
    for i, s in enumerate(schema):
        t = s if isinstance(s, str) else (s.get("type") if isinstance(s, dict) else None)
        if datum is None and t == "null":
            return i
        if datum is not None and t != "null":
            if isinstance(datum, bool):
                if t == "boolean":
                    return i
                continue
            if isinstance(datum, int) and t in ("int", "long"):
                return i
            if isinstance(datum, float) and t in ("float", "double"):
                return i
            if isinstance(datum, str) and t in ("string", "enum"):
                return i
            if isinstance(datum, (bytes, bytearray)) and t in ("bytes", "fixed"):
                return i
            if isinstance(datum, dict) and (
                t in ("record", "error", "map") or (isinstance(t, str) and t not in _PRIMITIVES)
            ):
                return i
            if isinstance(datum, (list, tuple)) and t == "array":
                return i
    raise ValueError(f"Avro: no union branch in {schema!r} for {type(datum)}")


def _write_datum(enc: _Encoder, schema: SchemaType, datum: Any, names: _Names) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            if datum is not None:
                raise ValueError("Avro: non-null datum for null schema")
            return
        if t == "boolean":
            enc.write_boolean(bool(datum))
        elif t in ("int", "long"):
            enc.write_long(int(datum))
        elif t == "float":
            enc.write_float(float(datum))
        elif t == "double":
            enc.write_double(float(datum))
        elif t == "bytes":
            enc.write_bytes(bytes(datum))
        elif t == "string":
            enc.write_string(datum)
        else:
            _write_datum(enc, names.resolve(t, None), datum, names)
        return
    if isinstance(schema, list):
        idx = _union_branch(schema, datum, names)
        enc.write_long(idx)
        _write_datum(enc, schema[idx], datum, names)
        return
    t = schema["type"]
    if isinstance(t, (dict, list)) or t in _PRIMITIVES:
        _write_datum(enc, t, datum, names)
        return
    if t in ("record", "error"):
        for f in schema["fields"]:
            if f["name"] in datum:
                _write_datum(enc, f["type"], datum[f["name"]], names)
            elif "default" in f:
                _write_datum(enc, f["type"], f["default"], names)
            elif isinstance(f["type"], list) and "null" in f["type"]:
                _write_datum(enc, f["type"], None, names)
            else:
                raise ValueError(f"Avro: missing required field {f['name']!r}")
        return
    if t == "enum":
        enc.write_long(schema["symbols"].index(datum))
        return
    if t == "fixed":
        if len(datum) != schema["size"]:
            raise ValueError("Avro: fixed size mismatch")
        enc.write(bytes(datum))
        return
    if t == "array":
        if datum:
            enc.write_long(len(datum))
            for item in datum:
                _write_datum(enc, schema["items"], item, names)
        enc.write_long(0)
        return
    if t == "map":
        if datum:
            enc.write_long(len(datum))
            for k, v in datum.items():
                enc.write_string(k)
                _write_datum(enc, schema["values"], v, names)
        enc.write_long(0)
        return
    raise ValueError(f"Avro: unsupported schema {schema!r}")


# --------------------------------------------------------------------------
# object container files
# --------------------------------------------------------------------------
_FILE_META_SCHEMA = {"type": "map", "values": "bytes"}


def read_container(fobj: BinaryIO) -> tuple[dict, SchemaType, list[Any]]:
    """Read an Avro OCF → (file metadata, parsed schema, records)."""
    data = fobj.read()
    dec = _Decoder(data)
    if dec.read(4) != MAGIC:
        raise ValueError("Avro: bad magic (not an object container file)")
    meta_raw = _read_datum(dec, _FILE_META_SCHEMA, _Names())
    meta = {k: v for k, v in meta_raw.items()}
    schema, names = parse_schema(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = dec.read(16)
    records: list[Any] = []
    while not dec.at_end():
        count = dec.read_long()
        size = dec.read_long()
        block = dec.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"Avro: unsupported codec {codec!r}")
        bdec = _Decoder(block)
        for _ in range(count):
            records.append(_read_datum(bdec, schema, names))
        if dec.read(16) != sync:
            raise ValueError("Avro: sync marker mismatch (corrupt block)")
    return meta, schema, records


def read_avro_file(path: str) -> tuple[dict, SchemaType, list[Any]]:
    with open(path, "rb") as f:
        return read_container(f)


def write_container(
    fobj: BinaryIO,
    schema: Union[str, SchemaType],
    records: Iterable[Any],
    codec: str = "deflate",
    metadata: Optional[dict[str, bytes]] = None,
    block_records: int = 1000,
) -> None:
    """Write records as an Avro OCF. ``metadata`` adds extra file-meta keys
    (Iceberg stores its manifest schema/spec JSON there)."""
    parsed, names = parse_schema(schema)
    schema_json = json.dumps(parsed, separators=(",", ":")) if not isinstance(schema, str) else schema
    meta: dict[str, bytes] = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    # deterministic sync marker derived from content identity (no RNG in the
    # write path → byte-stable fixtures and reproducible manifests)
    sync = sha256(schema_json.encode("utf-8") + str(sorted(meta)).encode()).digest()[:16]

    head = _Encoder()
    head.write(MAGIC)
    _write_datum(head, _FILE_META_SCHEMA, meta, _Names())
    head.write(sync)
    fobj.write(head.getvalue())

    buf: list[Any] = []

    def flush():
        if not buf:
            return
        benc = _Encoder()
        for r in buf:
            _write_datum(benc, parsed, r, names)
        payload = benc.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = comp.compress(payload) + comp.flush()
        elif codec != "null":
            raise ValueError(f"Avro: unsupported codec {codec!r}")
        blk = _Encoder()
        blk.write_long(len(buf))
        blk.write_long(len(payload))
        blk.write(payload)
        blk.write(sync)
        fobj.write(blk.getvalue())
        buf.clear()

    for rec in records:
        buf.append(rec)
        if len(buf) >= block_records:
            flush()
    flush()


def write_avro_file(
    path: str,
    schema: Union[str, SchemaType],
    records: Iterable[Any],
    codec: str = "deflate",
    metadata: Optional[dict[str, bytes]] = None,
) -> None:
    with open(path, "wb") as f:
        write_container(f, schema, records, codec=codec, metadata=metadata)
