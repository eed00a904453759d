"""Avro container-file scan (S3): spec-golden byte encodings, container
round-trips (null + deflate codecs), and the distributed binaryFile +
mapInPandas scan."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aloha_spark.sources.avro import (
    TRANSCRIPT_AVRO,
    _Reader,
    encode_value,
    read_avro,
    read_container_bytes,
    write_container,
)


def _enc(value, schema) -> bytes:
    out = bytearray()
    encode_value(out, value, schema)
    return bytes(out)


class TestBinaryEncoding:
    def test_spec_golden_longs(self):
        # Avro spec: zigzag examples 0->00, -1->01, 1->02, -2->03, 2->04
        for v, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                     (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                     (64, b"\x80\x01")]:
            assert _enc(v, "long") == b, v
            assert _Reader(b).zigzag_long() == v

    def test_spec_golden_string(self):
        # spec: "foo" -> 06 66 6f 6f
        assert _enc("foo", "string") == bytes([0x06]) + b"foo"

    def test_union_null_encoding(self):
        sch = ["null", "string"]
        assert _enc(None, sch) == b"\x00"
        assert _enc("a", sch) == b"\x02\x02a"
        assert _Reader(b"\x00").value(sch) is None
        assert _Reader(b"\x02\x02a").value(sch) == "a"

    def test_array_and_map(self):
        arr = {"type": "array", "items": "long"}
        assert _Reader(_enc([3, 27], arr)).value(arr) == [3, 27]
        m = {"type": "map", "values": "long"}
        assert _Reader(_enc({"a": 1, "b": 2}, m)).value(m) == {"a": 1, "b": 2}

    def test_enum(self):
        sch = {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}
        assert _enc("B", sch) == b"\x02"
        assert _Reader(b"\x04").value(sch) == "C"

    @given(st.lists(st.fixed_dictionaries({
        "conv_id": st.text(max_size=12),
        "turn_idx": st.integers(min_value=-(2**62), max_value=2**62),
        "role": st.one_of(st.none(), st.text(max_size=6)),
        "text": st.one_of(st.none(), st.text(max_size=40)),
        "tool": st.one_of(st.none(), st.text(max_size=6)),
        "ts_epoch_ms": st.integers(min_value=0, max_value=2**50),
    }), max_size=20), st.sampled_from(["null", "deflate"]))
    @settings(max_examples=30, deadline=None)
    def test_container_round_trip(self, records, codec):
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".avro") as f:
            write_container(f.name, records, TRANSCRIPT_AVRO, codec=codec,
                            records_per_block=7)
            schema, got = read_container_bytes(open(f.name, "rb").read())
        assert schema == TRANSCRIPT_AVRO
        assert got == records


class TestSparkAvroScan:
    def test_distributed_scan_multi_file(self, spark, tmp_path):
        import os
        d = str(tmp_path / "avro_dir")
        os.makedirs(d)
        all_recs = []
        for fi in range(4):
            recs = [{"conv_id": f"c{fi}", "turn_idx": i, "role": "user",
                     "text": f"t{fi}-{i}", "tool": None,
                     "ts_epoch_ms": 1000 * i} for i in range(25)]
            codec = "deflate" if fi % 2 else "null"
            write_container(f"{d}/part-{fi}.avro", recs, TRANSCRIPT_AVRO,
                            codec=codec, records_per_block=10)
            all_recs.extend(recs)
        df = read_avro(spark, d)
        assert df.count() == 100
        rows = df.orderBy("conv_id", "turn_idx").collect()
        assert rows[0].conv_id == "c0" and rows[0].text == "t0-0"
        assert rows[0].tool is None
        got = {(r.conv_id, r.turn_idx, r.text) for r in rows}
        exp = {(r["conv_id"], r["turn_idx"], r["text"]) for r in all_recs}
        assert got == exp

    def test_scan_feeds_featurize(self, spark, tmp_path):
        """S3 -> feature pipeline: the avro scan's typed output drives
        the same spec the parquet path uses."""
        from pyspark.sql import functions as F

        from aloha_spark.plans.pipeline import FeaturePipeline
        from aloha_spark.plans.spec import PipelineSpec

        d = str(tmp_path / "av")
        import os
        os.makedirs(d)
        recs = [{"conv_id": "c", "turn_idx": i, "role": "user",
                 "text": "hello world", "tool": None, "ts_epoch_ms": i}
                for i in range(10)]
        write_container(f"{d}/x.avro", recs, TRANSCRIPT_AVRO)
        df = read_avro(spark, d)
        pipe = FeaturePipeline(PipelineSpec.from_json({
            "features": [{"name": "bow", "spec": "bag(${text})"},
                         {"name": "role", "spec": "ind(${role})"}],
            "namespaces": {}, "numBits": 18}))
        out = pipe.to_sparse_vectors(df, keep_cols=["conv_id", "turn_idx"])
        rows = out.collect()
        assert len(rows) == 10
        assert all(len(r.indices) == 3 for r in rows)  # hello, world, =user
