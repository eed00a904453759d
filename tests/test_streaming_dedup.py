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


def test_snapshot_dedup_batch_sink_append_visibility(spark, tmp_path):
    """The foreachBatch variant re-reads the digest table per
    micro-batch: digests appended DURING the run (here by the
    self-absorbing append_survivors mode in batch 0) dedup batch 1
    without a query restart — impossible for the plain streaming plan,
    whose static-side file listing is pinned at plan time.  A
    checkpointed restart over an extra file stays exact: old content
    never re-ships, only genuinely new rows do."""
    import os
    from aloha_spark.operators.snapshot import write_dedup_snapshot
    from aloha_spark.streaming.dedup import snapshot_dedup_batch_sink
    from aloha_spark.streaming.sessionize import read_transcript_stream

    snap = str(tmp_path / "snap_fb")
    write_dedup_snapshot(
        spark.createDataFrame([(100, "content snap")],
                              "doc_id long, text string"), snap)

    def turns(rows):
        return spark.createDataFrame(
            [(f"c{i}", i, "user", t, None, f"2024-01-01 10:{i:02d}:00")
             for i, t in enumerate(rows)],
            "conv_id string, turn_idx long, role string, text string, "
            "tool string, ts string") \
            .withColumn("ts", F.col("ts").cast("timestamp"))

    src = str(tmp_path / "src_fb")
    out_dir = str(tmp_path / "out_fb")
    ckpt = str(tmp_path / "ckpt_fb")
    os.makedirs(src)
    # two files -> two micro-batches (maxFilesPerTrigger=1); file B
    # repeats file A's fresh content plus one genuinely new row
    turns(["content snap", "fresh A", "fresh B"]) \
        .coalesce(1).write.parquet(src + "/f1")
    turns(["fresh A", "fresh B", "fresh C"]) \
        .coalesce(1).write.parquet(src + "/f2")

    def sink(df, batch_id):
        if not df.isEmpty():
            df.write.mode("append").parquet(out_dir)

    def run():
        q = (read_transcript_stream(spark, src + "/f*", max_files=1)
             .writeStream
             .foreachBatch(snapshot_dedup_batch_sink(
                 snap, sink, cols=["text"], append_survivors=True))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    got = spark.read.parquet(out_dir).toPandas()
    # snapshot content dropped in batch 0; batch 1's repeats dropped by
    # the digests batch 0 appended mid-run; each fresh content ONCE
    assert sorted(got["text"]) == ["fresh A", "fresh B", "fresh C"]

    # checkpointed restart with one more file: old content (snapshot,
    # already-shipped, in-file repeat) never re-ships; new row does
    turns(["fresh C", "content snap", "fresh D", "fresh D"]) \
        .coalesce(1).write.parquet(src + "/f3")
    run()
    got2 = spark.read.parquet(out_dir).toPandas()
    assert sorted(got2["text"]) == ["fresh A", "fresh B", "fresh C",
                                    "fresh D"]
