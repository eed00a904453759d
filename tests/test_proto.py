"""Protobuf wire-format scan (S2): golden byte layouts from the public
protobuf encoding documentation, encoder/decoder round-trips, and the
Spark base64-line decode path feeding the featurize pipeline to the
reference's documented proto->VW golden line."""

import base64

import pytest

from aloha_spark.sources.proto import (
    TRANSCRIPT_PROTO,
    USER_PROTO,
    Field,
    ProtoSchema,
    decode_proto_lines,
    encode_message,
    parse_message,
)


class TestWireFormat:
    def test_docs_golden_varint(self):
        # protobuf docs: `message Test1 { int32 a = 1; }` with a=150
        # encodes to 08 96 01
        sch = ProtoSchema([Field(1, "a", "int32")])
        assert encode_message({"a": 150}, sch) == bytes([0x08, 0x96, 0x01])
        assert parse_message(bytes([0x08, 0x96, 0x01]), sch) == {"a": 150}

    def test_docs_golden_string(self):
        # `message Test2 { string b = 2; }` with b="testing"
        # encodes to 12 07 74 65 73 74 69 6e 67
        sch = ProtoSchema([Field(2, "b", "string")])
        golden = bytes([0x12, 0x07]) + b"testing"
        assert encode_message({"b": "testing"}, sch) == golden
        assert parse_message(golden, sch) == {"b": "testing"}

    def test_docs_golden_embedded(self):
        # `message Test3 { Test1 c = 3; }` with c.a=150 -> 1a 03 08 96 01
        inner = ProtoSchema([Field(1, "a", "int32")])
        sch = ProtoSchema([Field(3, "c", "message", message=inner)])
        golden = bytes([0x1A, 0x03, 0x08, 0x96, 0x01])
        assert encode_message({"c": {"a": 150}}, sch) == golden
        assert parse_message(golden, sch) == {"c": {"a": 150}}

    def test_negative_int32_is_ten_bytes(self):
        # proto encodes negative int32 as a 10-byte 64-bit varint
        sch = ProtoSchema([Field(1, "a", "int32")])
        enc = encode_message({"a": -2}, sch)
        assert len(enc) == 11  # 1 tag + 10 varint
        assert parse_message(enc, sch) == {"a": -2}

    def test_zigzag_sint(self):
        sch = ProtoSchema([Field(1, "a", "sint64")])
        for v in (0, -1, 1, -2, 2, -(1 << 40), 1 << 40):
            assert parse_message(encode_message({"a": v}, sch), sch) == {"a": v}

    def test_unknown_fields_skipped(self):
        full = ProtoSchema([Field(1, "a", "int32"), Field(2, "b", "string"),
                            Field(3, "d", "double")])
        sub = ProtoSchema([Field(2, "b", "string")])
        enc = encode_message({"a": 7, "b": "x", "d": 1.5}, full)
        assert parse_message(enc, sub) == {"b": "x"}

    def test_packed_repeated_varints(self):
        # packed wire layout: tag(wire 2), byte length, then raw varints
        sch = ProtoSchema([Field(1, "xs", "int32", repeated=True)])
        packed = bytes([0x0A, 0x04, 0x03, 0x8E, 0x02, 0x9E, 0xA7, 0x05][:2]) \
            + bytes([0x03, 0x8E, 0x02, 0x9E, 0xA7, 0x05])
        packed = bytes([0x0A, 0x06, 0x03, 0x8E, 0x02, 0x9E, 0xA7, 0x05])
        assert parse_message(packed, sch) == {"xs": [3, 270, 86942]}

    def test_transcript_round_trip(self):
        msg = {"conv_id": "c-42", "turn_idx": 7, "role": "assistant",
               "text": "hello world", "tool": None,
               "ts_epoch_ms": 1700000000123}
        got = parse_message(encode_message(msg, TRANSCRIPT_PROTO),
                            TRANSCRIPT_PROTO)
        assert got == {k: v for k, v in msg.items() if v is not None}

    def test_user_proto_nested_repeated(self):
        msg = {"name": "Alan", "gender": "MALE", "bmi": 23.0,
               "photos": [{"id": 1, "height": 92, "aspect_ratio": 0.5},
                          {"id": 2, "height": 103, "aspect_ratio": 1.25}]}
        got = parse_message(encode_message(msg, USER_PROTO), USER_PROTO)
        assert got["gender"] == "MALE"
        assert [p["height"] for p in got["photos"]] == [92, 103]


class TestSparkProtoScan:
    def _lines(self, msgs, schema):
        return [base64.b64encode(encode_message(m, schema)).decode("ascii")
                for m in msgs]

    def test_base64_line_scan(self, spark):
        msgs = [{"conv_id": f"c{i}", "turn_idx": i, "role": "user",
                 "text": f"turn {i}", "ts_epoch_ms": 1000 * i}
                for i in range(50)]
        lines = self._lines(msgs, TRANSCRIPT_PROTO)
        df = spark.createDataFrame([(ln,) for ln in lines], "line string")
        out = decode_proto_lines(df, "line", TRANSCRIPT_PROTO)
        rows = out.orderBy("turn_idx").collect()
        assert len(rows) == 50
        assert rows[7].conv_id == "c7" and rows[7].text == "turn 7"
        assert rows[7].tool is None and rows[7].proto_error is None

    def test_malformed_line_reported_not_fatal(self, spark):
        good = self._lines([{"conv_id": "ok", "turn_idx": 1}],
                           TRANSCRIPT_PROTO)[0]
        df = spark.createDataFrame(
            [(good,), ("!!!not-base64!!!",), (None,)], "line string")
        out = decode_proto_lines(df, "line", TRANSCRIPT_PROTO).collect()
        errs = [r.proto_error for r in out]
        assert sum(e is None for e in errs) == 1
        assert sum(e is not None for e in errs) == 2
        ok = [r for r in out if r.proto_error is None][0]
        assert ok.conv_id == "ok"

    def test_proto_to_vw_docs_golden(self, spark):
        """Reference docs golden (docs/src/main/tut/docs/dataset.md:364-367):
        proto UserProto(Alan, MALE, bmi 23, 2 photos) featurized to VW ->
        `| name=Alan gender=MALE bmi:23 num_photos:2`."""
        from aloha_spark.plans.pipeline import FeaturePipeline
        from aloha_spark.plans.spec import PipelineSpec

        msg = {"name": "Alan", "gender": "MALE", "bmi": 23.0,
               "photos": [{"id": 1, "height": 92, "aspect_ratio": 0.5},
                          {"id": 2, "height": 103, "aspect_ratio": 1.25}]}
        line = self._lines([msg], USER_PROTO)[0]
        df = spark.createDataFrame([(line,)], "line string")
        typed = decode_proto_lines(df, "line", USER_PROTO)
        pipe = FeaturePipeline(PipelineSpec.from_json({
            "features": [
                {"name": "name", "spec": "ind(${name})"},
                {"name": "gender", "spec": "ind(${gender})"},
                {"name": "bmi", "spec": "${bmi}"},
                {"name": "num_photos", "spec": "len(${photos:-[]})"},
            ], "namespaces": {}, "numBits": 18}))
        out = pipe.to_vw_lines(typed).collect()
        assert out[0].vw_line == "| name=Alan gender=MALE bmi:23 num_photos:2"


class TestReferenceWireFixtures:
    """The reference's own protoc-generated base64 lines
    (aloha-core/src/test/resources/fizz_buzzs.proto, the getting_started
    docs walkthrough input) decoded by OUR wire-format implementation —
    byte-level interop with real protobuf output."""

    FIXTURES = [
        "CAESBEFsYW4YASUAALhBKg0IARABGQAAAAAAAPA/Kg0IAhACGQAAAAAAAABA",
        "CAISBEthdGUYAioNCAMQAxkAAAAAAAAIQA==",
    ]

    def test_decode_reference_lines(self):
        alan = parse_message(base64.b64decode(self.FIXTURES[0]), USER_PROTO)
        kate = parse_message(base64.b64decode(self.FIXTURES[1]), USER_PROTO)
        assert alan["user_id"] == 1 and alan["name"] == "Alan"
        assert alan["gender"] == "MALE" and alan["bmi"] == 23.0
        assert [(p["id"], p["height"], p["aspect_ratio"])
                for p in alan["photos"]] == [(1, 1, 1.0), (2, 2, 2.0)]
        assert kate["user_id"] == 2 and kate["name"] == "Kate"
        assert kate["gender"] == "FEMALE" and "bmi" not in kate
        assert [(p["id"], p["height"], p["aspect_ratio"])
                for p in kate["photos"]] == [(3, 3, 3.0)]

    def test_indexed_paths_over_reference_scan(self, spark):
        """${photos[0].height}-style accessors over the actual proto
        scan (the day-one repeated-field use case)."""
        from aloha_spark.plans.pipeline import FeaturePipeline
        from aloha_spark.plans.spec import PipelineSpec

        df = spark.createDataFrame([(ln,) for ln in self.FIXTURES],
                                   "line string")
        typed = decode_proto_lines(df, "line", USER_PROTO)
        pipe = FeaturePipeline(PipelineSpec.from_json({
            "features": [
                {"name": "name", "spec": "ind(${name})"},
                {"name": "gender", "spec": "ind(${gender})"},
                {"name": "bmi", "spec": "${bmi}"},
                {"name": "h0", "spec": "${photos[0].height}"},
                {"name": "h1", "spec": "${photos[1].height:--1}"},
                {"name": "ar0", "spec": "${photos[0].aspect_ratio}"},
            ], "namespaces": {}, "numBits": 18}))
        out = {r.name: r for r in pipe.featurize(
            typed, keep_cols=["name"]).collect()}
        assert out["Alan"].features[3] == {"h0": 1.0}
        assert out["Alan"].features[4] == {"h1": 2.0}
        assert out["Kate"].features[3] == {"h0": 3.0}
        assert out["Kate"].features[4] == {"h1": -1.0}   # default fills
        assert out["Kate"].features[5] == {"ar0": 3.0}
        # bmi missing for Kate -> UNK + missing_features
        assert out["Kate"].features[2] == {"bmi=UNK": 1.0}
        assert "bmi" in out["Kate"].missing_features

    def test_docs_walkthrough_vw_golden_end_to_end(self, spark):
        """The full getting_started walkthrough: the reference's wire
        fixtures through proto scan -> featurize -> labeled VW lines,
        byte-equal to the published dataset
        (docs/src/main/tut/docs/getting_started.md:113-114).  The avg
        uses Scala integer division ( hs.flatten.sum / hs.size ), hence
        the // in the spec."""
        from aloha_spark.plans.pipeline import FeaturePipeline
        from aloha_spark.plans.spec import PipelineSpec

        df = spark.createDataFrame([(ln,) for ln in self.FIXTURES],
                                   "line string")
        typed = decode_proto_lines(df, "line", USER_PROTO)
        pipe = FeaturePipeline(PipelineSpec.from_json({
            "features": [
                {"name": "name", "spec": "ind(${name})"},
                {"name": "gender", "spec": "ind(${gender})"},
                {"name": "bmi", "spec": "${bmi}"},
                {"name": "num_photos", "spec": "len(${photos})"},
                {"name": "avg_photo_height",
                 "spec": "sum(${photos.height}) "
                         "// max(len(${photos.height}), 1)"},
            ],
            "namespaces": {"photos": ["num_photos", "avg_photo_height"]},
            "label": "1"}))
        lines = [r.vw_line for r in
                 pipe.to_vw_lines(typed, keep_cols=["user_id"])
                 .orderBy("user_id").collect()]
        assert lines == [
            "1 1| name=Alan gender=MALE bmi:23 "
            "|photos num_photos:2 avg_photo_height",
            "1 1| name=Kate gender=FEMALE bmi=UNK "
            "|photos num_photos avg_photo_height:3",
        ]
