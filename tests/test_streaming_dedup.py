"""Streaming dedup: dropDuplicatesWithinWatermark shapes vs the batch
exact_dedup digest — a streaming tail and a batch backfill must agree
on what counts as a duplicate."""

from pyspark.sql import functions as F

from aloha_spark.streaming.dedup import (
    streaming_event_dedup, streaming_exact_dedup)
from aloha_spark.streaming.sessionize import read_transcript_stream


def _write_turns_with_dups(spark, path):
    rows = []
    for i in range(40):
        # duplicate text contents in pairs; one NULL-text pair
        txt = None if i % 10 == 0 else f"content {i // 2}"
        rows.append((f"c{i % 4}", i, "user", txt, None,
                     f"2024-01-01 10:{i:02d}:00"))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string, "
              "tool string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    # re-deliver everything twice (at-least-once ingestion)
    df.unionAll(df).write.mode("overwrite").parquet(path)
    return df


def _drain(stream, name):
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def test_streaming_exact_dedup_matches_batch_digest(spark, tmp_path):
    from aloha_spark.operators.dedup import exact_dedup

    src = str(tmp_path / "turns")
    _write_turns_with_dups(spark, src)

    out = streaming_exact_dedup(
        read_transcript_stream(spark, src), cols=["text"])
    _drain(out, "sdedup")
    got = spark.sql("select * from sdedup").toPandas()

    # one survivor per distinct digest, digests equal to the batch op's
    batch = exact_dedup(spark.read.parquet(src), ["text"],
                        id_col="turn_idx").toPandas()
    assert sorted(got["content_hash"]) == sorted(batch["content_hash"])
    assert got["content_hash"].is_unique
    # NULL text kept distinct from empty/real contents
    null_digest = batch.loc[batch["dup_count"] == 8, "content_hash"]
    assert len(null_digest) == 1   # 4 NULL rows re-delivered twice


def test_streaming_event_dedup_idempotent(spark, tmp_path):
    src = str(tmp_path / "turns2")
    df = _write_turns_with_dups(spark, src)
    out = streaming_event_dedup(read_transcript_stream(spark, src))
    _drain(out, "ededup")
    got = spark.sql("select conv_id, turn_idx from ededup").toPandas()
    assert len(got) == df.count()            # doubled input -> one each
    assert got.duplicated().sum() == 0
