"""Avro container-file scan (reference S3) without external dependencies.

The reference consumes Avro ``GenericRecord``s through a schema-driven
accessor plugin (aloha-io-avro/.../CompiledSemanticsAvroPlugin.scala);
Spark's ``format("avro")`` needs the spark-avro jar, which this sandbox
doesn't ship — so this module implements the (public, stable) Avro 1.x
specification directly:

* **binary encoding**: zigzag-varint int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, index-prefixed unions,
  block-encoded arrays/maps, enums as int index, records as field
  concatenation.
* **object container files**: magic ``Obj\\x01``, metadata map carrying
  ``avro.schema`` (JSON) and ``avro.codec`` (null | deflate), 16-byte
  sync marker, then blocks of ``(count, byte-size, payload, sync)``.

Scan model at scale: Avro files are the unit of parallelism (exactly how
Spark's own avro source splits work for container files): read with
``format("binaryFile")`` — one task per file — and decode blocks inside
``mapInPandas``.  The writer exists to build deterministic fixtures and
round-trip tests.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"Obj\x01"

_PRIMITIVE_SPARK = {
    "null": StringType(),     # standalone null column (rare)
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": StringType(),    # latin-1 string, same convention as proto.py
    "string": StringType(),
}


# -- schema ----------------------------------------------------------------

def spark_type_for(schema) -> DataType:
    """Avro schema (parsed JSON) -> Spark type (supported subset)."""
    if isinstance(schema, str):
        return _PRIMITIVE_SPARK[schema]
    if isinstance(schema, list):  # union: [null, T] and [T, null] only
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only unions with null supported: {schema}")
        return spark_type_for(non_null[0])
    t = schema["type"]
    if t == "record":
        return StructType([
            StructField(f["name"], spark_type_for(f["type"]), nullable=True)
            for f in schema["fields"]])
    if t == "array":
        return ArrayType(spark_type_for(schema["items"]))
    if t == "map":
        return MapType(StringType(), spark_type_for(schema["values"]))
    if t == "enum":
        return StringType()
    if t == "fixed":
        return StringType()
    return _PRIMITIVE_SPARK[t]


# -- binary decoder --------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return b

    def zigzag_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def value(self, schema):
        if isinstance(schema, str):
            return self._primitive(schema)
        if isinstance(schema, list):
            idx = self.zigzag_long()
            return self.value(schema[idx])
        t = schema["type"]
        if t == "record":
            return {f["name"]: self.value(f["type"])
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = self.zigzag_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size
                    n = -n
                    self.zigzag_long()
                for _ in range(n):
                    out.append(self.value(schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = self.zigzag_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.zigzag_long()
                for _ in range(n):
                    k = self._primitive("string")
                    out[k] = self.value(schema["values"])
        if t == "enum":
            return schema["symbols"][self.zigzag_long()]
        if t == "fixed":
            return self.read(schema["size"]).decode("latin-1")
        return self._primitive(t)

    def _primitive(self, t: str):
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) != b"\x00"
        if t in ("int", "long"):
            return self.zigzag_long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.zigzag_long()).decode("latin-1")
        if t == "string":
            return self.read(self.zigzag_long()).decode("utf-8")
        raise ValueError(f"unsupported avro type {t!r}")


# -- binary encoder (fixtures / round-trips) --------------------------------

def _zigzag_write(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def encode_value(out: bytearray, value, schema) -> None:
    if isinstance(schema, str):
        _encode_primitive(out, value, schema)
        return
    if isinstance(schema, list):
        if value is None and "null" in schema:
            _zigzag_write(out, schema.index("null"))
            return
        for i, s in enumerate(schema):
            if s != "null":
                _zigzag_write(out, i)
                encode_value(out, value, s)
                return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            encode_value(out, value.get(f["name"]), f["type"])
    elif t == "array":
        if value:
            _zigzag_write(out, len(value))
            for v in value:
                encode_value(out, v, schema["items"])
        _zigzag_write(out, 0)
    elif t == "map":
        if value:
            _zigzag_write(out, len(value))
            for k, v in value.items():
                _encode_primitive(out, k, "string")
                encode_value(out, v, schema["values"])
        _zigzag_write(out, 0)
    elif t == "enum":
        _zigzag_write(out, schema["symbols"].index(value))
    elif t == "fixed":
        out.extend(value.encode("latin-1"))
    else:
        _encode_primitive(out, value, t)


def _encode_primitive(out: bytearray, value, t: str) -> None:
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _zigzag_write(out, int(value))
    elif t == "float":
        out.extend(struct.pack("<f", value))
    elif t == "double":
        out.extend(struct.pack("<d", value))
    elif t in ("bytes", "string"):
        raw = value.encode("latin-1" if t == "bytes" else "utf-8")
        _zigzag_write(out, len(raw))
        out.extend(raw)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


# -- container files --------------------------------------------------------

def write_container(path: str, records: list, schema: dict,
                    codec: str = "null", sync: bytes = b"\x07" * 16,
                    records_per_block: int = 1000) -> None:
    """Write an Avro object container file (fixture/round-trip writer)."""
    out = bytearray()
    out.extend(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    _zigzag_write(out, len(meta))
    for k, v in meta.items():
        _encode_primitive(out, k, "string")
        _zigzag_write(out, len(v))
        out.extend(v)
    _zigzag_write(out, 0)
    out.extend(sync)
    for i in range(0, len(records), records_per_block):
        block = records[i:i + records_per_block]
        payload = bytearray()
        for rec in block:
            encode_value(payload, rec, schema)
        data = bytes(payload)
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate per spec
        _zigzag_write(out, len(block))
        _zigzag_write(out, len(data))
        out.extend(data)
        out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_container_bytes(blob: bytes) -> tuple[dict, list]:
    """Parse one container file: returns (schema, records)."""
    r = _Reader(blob)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro container file")
    meta = {}
    while True:
        n = r.zigzag_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.zigzag_long()
        for _ in range(n):
            k = r._primitive("string")
            v = r.read(r.zigzag_long())
            meta[k] = v
    schema = json.loads(meta[b"avro.schema"]
                        if b"avro.schema" in meta
                        else meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records = []
    while r.pos < len(blob):
        count = r.zigzag_long()
        size = r.zigzag_long()
        data = r.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        br = _Reader(data)
        for _ in range(count):
            records.append(br.value(schema))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records


def read_avro(spark: SparkSession, path: str,
              schema: Optional[dict] = None) -> DataFrame:
    """Distributed Avro container scan: ``binaryFile`` (one task per
    file, Avro's natural split unit) + block decode in ``mapInPandas``.

    ``schema``: reader schema as parsed Avro JSON; when None the first
    file's embedded writer schema is used (driver-side peek)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    if schema is None:
        first = files.select("content").first()
        if first is None:
            raise ValueError(f"no avro files under {path}")
        schema, _ = read_container_bytes(bytes(first[0]))
    spark_schema = spark_type_for(schema)
    if not isinstance(spark_schema, StructType):
        raise ValueError("top-level avro schema must be a record")
    names = [f.name for f in spark_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                _, records = read_container_bytes(bytes(blob))
                if records:
                    yield pd.DataFrame(
                        {n: [rec.get(n) for rec in records] for n in names})

    return files.select("content").mapInPandas(run, schema=spark_schema)


#: transcript-turn record matching the engine's input_hint schema
TRANSCRIPT_AVRO = {
    "type": "record", "name": "Turn", "fields": [
        {"name": "conv_id", "type": "string"},
        {"name": "turn_idx", "type": "long"},
        {"name": "role", "type": ["null", "string"]},
        {"name": "text", "type": ["null", "string"]},
        {"name": "tool", "type": ["null", "string"]},
        {"name": "ts_epoch_ms", "type": "long"},
    ],
}
