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


def test_streaming_snapshot_dedup(spark, tmp_path):
    """Stream-static anti-join against the persisted snapshot: content
    already in the snapshot never reaches the sink; fresh content
    passes once (in-stream re-deliveries collapsed); appending to the
    snapshot between runs absorbs previously-fresh content."""
    from aloha_spark.operators.snapshot import (
        append_to_snapshot, write_dedup_snapshot)
    from aloha_spark.streaming.dedup import streaming_snapshot_dedup

    old = spark.createDataFrame(
        [(100, "content 3"), (101, "content 7")],
        "doc_id long, text string")
    snap = str(tmp_path / "snap")
    write_dedup_snapshot(old, snap)

    src = str(tmp_path / "turns3")
    _write_turns_with_dups(spark, src)   # texts: content 0..19 (+NULLs)

    out = streaming_snapshot_dedup(
        read_transcript_stream(spark, src), snap, cols=["text"])
    _drain(out, "snapdedup")
    got = spark.sql("select text from snapdedup").toPandas()
    texts = set(got["text"].dropna())
    assert "content 3" not in texts and "content 7" not in texts
    assert "content 0" in texts and "content 19" in texts
    # in-stream duplicates collapsed: one row per surviving content
    assert len(got) == len(set(got["text"].fillna("\0NULL\0")))

    # fold the survivors into the snapshot -> a re-run absorbs them all
    surv = spark.createDataFrame(
        [(200 + i, t) for i, t in enumerate(sorted(texts))] + [(999, None)],
        "doc_id long, text string")
    append_to_snapshot(surv, snap)
    out2 = streaming_snapshot_dedup(
        read_transcript_stream(spark, src), snap, cols=["text"])
    _drain(out2, "snapdedup2")
    assert spark.sql("select * from snapdedup2").count() == 0


def test_streaming_snapshot_dedup_cols_contract(spark, tmp_path):
    from aloha_spark.operators.snapshot import write_dedup_snapshot
    from aloha_spark.streaming.dedup import streaming_snapshot_dedup
    import pytest as _pytest

    old = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    snap = str(tmp_path / "snap_c")
    write_dedup_snapshot(old, snap)
    stream = read_transcript_stream(spark, snap)  # any stream handle
    with _pytest.raises(ValueError, match="incomparable"):
        streaming_snapshot_dedup(stream, snap, cols=["role"])
