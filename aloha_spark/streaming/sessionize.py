"""Structured Streaming mode for the sessionization/featurization path.

The reference is batch/request-response only (SURVEY §2.9); this module
is the engine-side extension: the same transcript schema consumed as a
stream, with watermarked gap-sessionization via ``session_window`` and
the Aloha feature kernels applied per micro-batch.

Design notes for scale:
* ``session_window(ts, gap)`` + watermark keeps state bounded: a
  session's state is evicted once the watermark passes its close.
* per-turn features (lag/backfill) need ordered history — in streaming
  that is ``applyInPandasWithState``-territory; here we ship the
  aggregate path (per-session rollups), which is what a 100 TB
  backfill + streaming-tail architecture runs continuously, while the
  batch engine (operators/windows.py) recomputes per-turn features on
  bounded slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRANSCRIPT_DDL = ("conv_id string, turn_idx long, role string, "
                  "text string, tool string, ts timestamp")


def read_transcript_stream(spark, path: str, fmt: str = "parquet",
                           max_files: int = 16) -> DataFrame:
    return (spark.readStream.format(fmt)
            .schema(TRANSCRIPT_DDL)
            .option("maxFilesPerTrigger", max_files)
            .load(path))


def session_aggregates(stream: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Per (conv, session-window) aggregates with late-data watermark."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy("conv_id", F.session_window("ts", gap).alias("session"))
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.col("tool").isNotNull().cast("long"))
                 .alias("n_tool_turns"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))


def run_to_memory(spark, src_path: str, gap: str = "30 minutes",
                  query_name: str = "sessions") -> None:
    """Drain the source with availableNow into an in-memory sink
    (test/demo harness)."""
    agg = session_aggregates(read_transcript_stream(spark, src_path), gap)
    q = (agg.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
