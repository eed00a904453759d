"""Protocol-Buffers wire-format scan (reference S2) without external
dependencies.

The reference ingests base64-encoded protobuf messages one per line and
parses them with the generated ``parseFrom``
(aloha-cli/src/main/scala/com/eharmony/aloha/cli/dataset/
datasetCli.scala:224-231).  Spark's built-in ``from_protobuf`` needs a
descriptor file and the spark-protobuf jar — neither ships in this
sandbox — so this module implements the (public, stable) protobuf wire
format directly: varint / 64-bit / length-delimited / 32-bit field
encodings per the protobuf encoding spec, driven by a declarative
``ProtoSchema``.  Decoding runs inside ``mapInPandas`` over Arrow
batches (one Python parse per message — the same cost profile as the
reference's per-line ``parseFrom``), and the resulting typed DataFrame
feeds the normal featurize pipeline.

Wire types: 0 = varint, 1 = 64-bit (fixed64/double), 2 = length-
delimited (string/bytes/embedded message/packed), 5 = 32-bit
(fixed32/float).  Unknown fields are skipped, as protobuf requires.
"""

from __future__ import annotations

import base64 as _b64
import struct
from dataclasses import dataclass, field
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# scalar type name -> (wire type, spark type)
_SCALARS = {
    "int32": (0, IntegerType()),
    "int64": (0, LongType()),
    "sint32": (0, IntegerType()),
    "sint64": (0, LongType()),
    "bool": (0, BooleanType()),
    "enum": (0, IntegerType()),
    "double": (1, DoubleType()),
    "fixed64": (1, LongType()),
    "string": (2, StringType()),
    "bytes": (2, StringType()),   # surfaced as latin-1 string for hashing
    "float": (5, FloatType()),
    "fixed32": (5, IntegerType()),
}


@dataclass
class Field:
    number: int
    name: str
    type: str                      # scalar name or "message"
    repeated: bool = False
    message: Optional["ProtoSchema"] = None
    enum_names: Optional[dict] = None   # enum value -> label (decode as string)


@dataclass
class ProtoSchema:
    fields: list[Field] = field(default_factory=list)

    def spark_type(self) -> StructType:
        out = []
        for f in self.fields:
            if f.type == "message":
                t: DataType = f.message.spark_type()
            elif f.enum_names is not None:
                t = StringType()
            else:
                t = _SCALARS[f.type][1]
            if f.repeated:
                t = ArrayType(t)
            out.append(StructField(f.name, t, nullable=True))
        return StructType(out)

    def by_number(self) -> dict:
        return {f.number: f for f in self.fields}


# -- wire-level primitives --------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed(v: int, bits: int) -> int:
    v &= (1 << bits) - 1
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def parse_message(buf: bytes, schema: ProtoSchema) -> dict:
    """One message -> dict (field name -> python value)."""
    fields = schema.by_number()
    out: dict = {}
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fnum, wire = tag >> 3, tag & 7
        f = fields.get(fnum)
        if wire == 0:
            raw, i = _read_varint(buf, i)
            if f is None:
                continue
            val = _decode_varint_value(raw, f)
        elif wire == 1:
            chunk = buf[i:i + 8]
            i += 8
            if f is None:
                continue
            val = (struct.unpack("<d", chunk)[0] if f.type == "double"
                   else struct.unpack("<q", chunk)[0])
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                # a declared length past the buffer is corruption; a
                # silent short slice would decode a TRUNCATED string/
                # bytes/message with no proto_error, while the fixed
                # wire types already raise on the same damage
                raise ValueError(
                    f"length-delimited field {fnum} declares {ln} bytes "
                    f"with only {n - i} remaining")
            chunk = buf[i:i + ln]
            i += ln
            if f is None:
                continue
            if f.type == "message":
                val = parse_message(chunk, f.message)
            elif f.type == "string":
                val = chunk.decode("utf-8")
            elif f.type == "bytes":
                val = chunk.decode("latin-1")
            else:
                # packed repeated scalars — element encoding depends on
                # the field's wire class (varint vs fixed32 vs fixed64)
                vals = []
                j = 0
                if f.type in ("float", "fixed32"):
                    fmt = "<f" if f.type == "float" else "<i"
                    while j + 4 <= ln:
                        vals.append(struct.unpack_from(fmt, chunk, j)[0])
                        j += 4
                elif f.type in ("double", "fixed64"):
                    fmt = "<d" if f.type == "double" else "<q"
                    while j + 8 <= ln:
                        vals.append(struct.unpack_from(fmt, chunk, j)[0])
                        j += 8
                else:
                    while j < ln:
                        raw, j = _read_varint(chunk, j)
                        vals.append(_decode_varint_value(raw, f))
                if f.repeated:
                    out.setdefault(f.name, []).extend(vals)
                    continue
                val = vals[-1] if vals else None
        elif wire == 5:
            chunk = buf[i:i + 4]
            i += 4
            if f is None:
                continue
            val = (struct.unpack("<f", chunk)[0] if f.type == "float"
                   else struct.unpack("<i", chunk)[0])
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if f.repeated:
            out.setdefault(f.name, []).append(val)
        else:
            out[f.name] = val   # last value wins (proto3 semantics)
    return out


def _decode_varint_value(raw: int, f: Field):
    if f.type in ("sint32", "sint64"):
        return _zigzag(raw)
    if f.type == "bool":
        return bool(raw)
    if f.type == "int32":
        return _to_signed(raw, 32)
    if f.type == "enum":
        v = _to_signed(raw, 32)
        if f.enum_names is not None:
            return f.enum_names.get(v, str(v))
        return v
    return _to_signed(raw, 64)


# -- encoder (tests / fixtures) --------------------------------------------

def _write_varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def encode_message(values: dict, schema: ProtoSchema) -> bytes:
    """Inverse of parse_message — used to build deterministic fixtures."""
    out = bytearray()
    for f in schema.fields:
        if f.name not in values or values[f.name] is None:
            continue
        vals = values[f.name] if f.repeated else [values[f.name]]
        for v in vals:
            if f.type == "message":
                chunk = encode_message(v, f.message)
                _write_varint(out, (f.number << 3) | 2)
                _write_varint(out, len(chunk))
                out.extend(chunk)
            elif f.type in ("string", "bytes"):
                chunk = (v.encode("utf-8") if f.type == "string"
                         else v.encode("latin-1"))
                _write_varint(out, (f.number << 3) | 2)
                _write_varint(out, len(chunk))
                out.extend(chunk)
            elif f.type == "double":
                _write_varint(out, (f.number << 3) | 1)
                out.extend(struct.pack("<d", v))
            elif f.type == "fixed64":
                _write_varint(out, (f.number << 3) | 1)
                out.extend(struct.pack("<q", v))
            elif f.type == "float":
                _write_varint(out, (f.number << 3) | 5)
                out.extend(struct.pack("<f", v))
            elif f.type == "fixed32":
                _write_varint(out, (f.number << 3) | 5)
                out.extend(struct.pack("<i", v))
            else:
                _write_varint(out, (f.number << 3) | 0)
                if f.type in ("sint32", "sint64"):
                    v = (v << 1) ^ (v >> 63)
                elif f.type == "enum" and f.enum_names is not None \
                        and isinstance(v, str):
                    v = {lbl: num for num, lbl in f.enum_names.items()}[v]
                _write_varint(out, int(v))
    return bytes(out)


# -- Spark integration ------------------------------------------------------

def decode_proto_lines(df: DataFrame, col: str, schema: ProtoSchema,
                       base64: bool = True,
                       keep_cols: Optional[list] = None,
                       errors_col: Optional[str] = "proto_error") -> DataFrame:
    """Decode a string/binary column of (optionally base64) protobuf
    messages into typed columns — the Spark analog of the reference's
    base64+parseFrom input extractor (datasetCli.scala:224-231).

    Malformed rows yield NULL fields plus the error text in
    ``errors_col`` (the reference swallows per-line errors,
    datasetCli.scala:93-96 — we keep them observable instead)."""
    import pandas as pd

    keep = keep_cols or []
    struct_t = schema.spark_type()
    out_schema = StructType(
        [f for f in df.schema.fields if f.name in keep]
        + list(struct_t.fields)
        + ([StructField(errors_col, StringType())] if errors_col else []))
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cols: dict = {c: pdf[c] for c in keep}
            decoded: dict = {nm: [] for nm in names}
            errs: list = []
            for raw in pdf[col]:
                err = None
                rec: dict = {}
                try:
                    if raw is None:
                        raise ValueError("null message")
                    buf = raw
                    if isinstance(buf, str):
                        buf = buf.encode("ascii") if base64 \
                            else buf.encode("latin-1")
                    if base64:
                        buf = _b64.b64decode(buf)
                    rec = parse_message(bytes(buf), schema)
                except Exception as e:  # malformed line -> error column
                    err = f"{type(e).__name__}: {e}"
                for nm in names:
                    decoded[nm].append(rec.get(nm))
                errs.append(err)
            for nm in names:
                cols[nm] = decoded[nm]
            if errors_col:
                cols[errors_col] = errs
            yield pd.DataFrame(cols)

    return df.mapInPandas(run, schema=out_schema)


#: transcript-turn message matching the engine's input_hint schema
TRANSCRIPT_PROTO = ProtoSchema([
    Field(1, "conv_id", "string"),
    Field(2, "turn_idx", "int32"),
    Field(3, "role", "string"),
    Field(4, "text", "string"),
    Field(5, "tool", "string"),
    Field(6, "ts_epoch_ms", "int64"),
])

#: reference UserProto, field-number-exact
#: (aloha-io-proto/src/test/proto/User.proto:11-23): id, name, gender
#: enum, bmi float, repeated photos(id, height int32, aspect_ratio
#: double) — so the reference's own protoc-encoded fixture lines
#: (aloha-core/src/test/resources/fizz_buzzs.proto) decode directly
USER_PROTO = ProtoSchema([
    Field(1, "user_id", "int64"),
    Field(2, "name", "string"),
    Field(3, "gender", "enum", enum_names={1: "MALE", 2: "FEMALE"}),
    Field(4, "bmi", "float"),
    Field(5, "photos", "message", repeated=True, message=ProtoSchema([
        Field(1, "id", "int64"),
        Field(2, "height", "int32"),
        Field(3, "aspect_ratio", "double"),
    ])),
])
