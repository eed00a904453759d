"""Streaming deduplication (engine-side extension of the batch dedup
family in operators/dedup.py).

Two bounded-state shapes, both pure Structured Streaming — no custom
state handler:

* ``streaming_exact_dedup`` — drop re-deliveries of the same content
  forever-within-the-watermark: a 16-byte md5 content digest +
  ``dropDuplicatesWithinWatermark``.  State is bounded by the watermark
  horizon (a row's digest is evicted once the watermark passes its
  event time), which is the only state contract that survives an
  unbounded stream at 100 TB/day — exact-forever dedup belongs in the
  batch layer over bounded partitions (operators/dedup.py::exact_dedup).
* ``streaming_event_dedup`` — idempotent re-ingestion by (id, ts)
  within the watermark; the standard at-least-once -> effectively-once
  bridge in front of any downstream sink.

Digest parity: the NULL-sentinel encoding matches
``operators/dedup.py::exact_dedup`` (concat_ws silently drops NULL
columns, which would conflate distinct contents), so a streaming tail
and a batch backfill agree on what counts as a duplicate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

# the ONE digest definition, shared with batch exact_dedup — parity by
# construction, not by parallel implementation
from ..operators.dedup import content_digest


def streaming_exact_dedup(stream: DataFrame,
                          cols: Sequence[str] = ("text",),
                          ts_col: str = "ts",
                          watermark: str = "2 hours") -> DataFrame:
    """Keep the first delivery of each distinct content within the
    watermark horizon; duplicates arriving later than the watermark are
    the batch layer's job."""
    return (stream
            .withColumn("content_hash", content_digest(cols))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))


def streaming_snapshot_dedup(stream: DataFrame, snapshot_path: str,
                             cols: Sequence[str] = ("text",),
                             ts_col: str = "ts",
                             watermark: str = "2 hours",
                             in_stream: bool = True) -> DataFrame:
    """Streaming tail of the continuous-crawl contract
    (operators/snapshot.py): drop rows whose content already exists in
    the PERSISTED corpus snapshot — a stream-static LEFT ANTI join on
    the digest table — then, with ``in_stream`` (default), also drop
    in-stream re-deliveries within the watermark horizon.

    Snapshot-append visibility: a query START reads the digest table as
    of that moment; for a RUNNING query the static side's file listing
    is pinned at plan time (plain-parquet ``InMemoryFileIndex``), so
    digests appended mid-run are only guaranteed visible after the
    query restarts (cheap with a checkpoint — offsets and dedup state
    resume).  Restart-per-append is the deliberate contract here; a
    catalog table format (Iceberg/Delta) would refresh per batch, and
    the watermark-bounded in-stream stage already bounds how much a
    stale listing can admit between restarts.

    Three engines, one duplicate definition: batch ``exact_dedup``, the
    streaming tails here, and the snapshot increments all hash through
    ``content_digest``.  The stream NEVER holds snapshot state — the
    anti-join probes the parquet digest table (broadcast or shuffled by
    AQE's measured size), and the only streaming state is the
    watermark-bounded in-stream digest set."""
    import os

    from ..operators.snapshot import _DIGESTS, load_snapshot_meta

    meta = load_snapshot_meta(snapshot_path)
    if list(cols) != meta["cols"]:
        raise ValueError(
            f"streaming_snapshot_dedup: digest cols {list(cols)} != "
            f"snapshot's {meta['cols']} — the digests would be "
            f"incomparable")
    old = stream.sparkSession.read.parquet(
        os.path.join(snapshot_path, _DIGESTS))
    out = (stream
           .withColumn("content_hash", content_digest(cols))
           .join(old, "content_hash", "left_anti"))
    if in_stream:
        out = (out.withWatermark(ts_col, watermark)
                  .dropDuplicatesWithinWatermark(["content_hash"]))
    return out.drop("content_hash")


def snapshot_dedup_batch_sink(snapshot_path: str, sink,
                              cols: Sequence[str] = ("text",),
                              in_batch: bool = True,
                              append_survivors: bool = False,
                              id_col: str = None):
    """``foreachBatch`` counterpart of :func:`streaming_snapshot_dedup`
    for when snapshot APPENDS must become visible without restarting
    the query: returns a ``(batch_df, batch_id) -> None`` callable that
    re-reads the digest table on EVERY micro-batch (a fresh
    ``spark.read`` re-lists the files each call, unlike the streaming
    plan's pinned ``InMemoryFileIndex``), anti-joins the batch against
    it, and hands the survivors to ``sink(kept_df, batch_id)``.

    ``in_batch`` collapses same-digest rows within one micro-batch
    (arbitrary keeper, same as the batch layer's contract for
    re-deliveries).  ``append_survivors`` folds each batch's surviving
    digests back into the snapshot AFTER the sink returns — the stream
    becomes self-absorbing: batch N+1 drops content batch N already
    shipped, with NO watermark bound and no streaming state at all.

    Delivery contract: ``foreachBatch`` is at-least-once, so ``sink``
    must be idempotent per (batch content, batch_id).  With
    ``append_survivors``, a replay AFTER a completed batch re-runs the
    anti-join against the now-updated snapshot, so the replayed sink
    call receives an EMPTY frame — duplicates cannot re-ship; a crash
    between sink and append simply re-offers the same survivors.

    Use with ``.writeStream.foreachBatch(...)`` — cross-batch
    watermark dedup (``dropDuplicatesWithinWatermark``) can still be
    composed UPSTREAM in the streaming plan; with ``append_survivors``
    it is redundant."""
    import os

    from ..operators.snapshot import (_DIGESTS, append_to_snapshot,
                                      load_snapshot_meta)

    meta = load_snapshot_meta(snapshot_path)   # validate cols up front
    if list(cols) != meta["cols"]:
        raise ValueError(
            f"snapshot_dedup_batch_sink: digest cols {list(cols)} != "
            f"snapshot's {meta['cols']} — the digests would be "
            f"incomparable")
    digests_path = os.path.join(snapshot_path, _DIGESTS)

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        old = spark.read.parquet(digests_path)   # fresh listing per batch
        kept = (batch
                .withColumn("content_hash", content_digest(cols))
                .join(old, "content_hash", "left_anti"))
        if in_batch:
            kept = kept.dropDuplicates(["content_hash"])
        kept = kept.drop("content_hash")
        if append_survivors:
            # both the sink and the append consume `kept`; persist so
            # the anti-join runs once and both see the SAME survivors
            kept = kept.persist()
            try:
                sink(kept, batch_id)
                if not kept.isEmpty():
                    append_to_snapshot(kept, snapshot_path,
                                       id_col=id_col)
            finally:
                kept.unpersist()
        else:
            sink(kept, batch_id)

    return process


def streaming_event_dedup(stream: DataFrame,
                          id_cols: Sequence[str] = ("conv_id", "turn_idx"),
                          ts_col: str = "ts",
                          watermark: str = "2 hours") -> DataFrame:
    """Idempotent re-delivery filter keyed on the event identity."""
    return (stream
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(id_cols)))
