"""Structured Streaming sessionization vs the batch cumulative-gap ids:
session COUNTS and sizes must agree between session_window (streaming
aggregate) and the per-row cumulative form (batch)."""

import pandas as pd

from aloha_spark.data.transcripts import make_transcripts
from aloha_spark.operators.windows import with_session_id
from aloha_spark.streaming.sessionize import run_to_memory


def test_streaming_sessions_match_batch(spark, tmp_path):
    src = str(tmp_path / "turns")
    turns = make_transcripts(spark, n_convs=12, turns_per_conv=40)
    turns.write.mode("overwrite").parquet(src)

    run_to_memory(spark, src, gap="30 minutes", query_name="sess_test")
    got = spark.sql("select * from sess_test").toPandas()

    batch = with_session_id(spark.read.parquet(src), gap_seconds=1800.0,
                            order=["turn_idx"]).toPandas()
    exp = (batch.groupby(["conv_id", "session_id"]).size()
           .reset_index(name="n_turns"))

    # same number of sessions per conv and same multiset of session sizes
    g = got.groupby("conv_id")["n_turns"].apply(
        lambda s: sorted(s.tolist())).to_dict()
    e = exp.groupby("conv_id")["n_turns"].apply(
        lambda s: sorted(s.tolist())).to_dict()
    assert g == e
