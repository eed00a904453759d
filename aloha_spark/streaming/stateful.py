"""Custom stateful streaming operator: per-turn features with
carried per-conversation state (``applyInPandasWithState``).

This is the streaming analog of the batch window operators
(operators/windows.py): for every arriving turn it emits
``dt_prev_sec`` (gap to the previous turn), ``last_tool``
(last-known-value backfill), and a gap-based ``session_id`` — but
instead of a shuffle+sort over history, a per-``conv_id`` state row
carries (last event-time, last tool, current session id) across
micro-batches, so state size is O(active conversations), not O(turns).

It is also the closest Spark analog of the reference's only stateful
primitive, ``StatefulRowCreator.statefulMap`` (aloha-core/.../dataset/
StatefulRowCreator.scala:36-75): referentially-transparent state
threaded through an ordered iterator, one state per unit of
parallelism — here the unit is the conversation group.

State TTL: idle-conversation eviction is available via
``state_ttl_seconds`` using ``GroupStateTimeout.EventTimeTimeout`` — a
conversation whose MAX event time seen falls ``ttl`` behind the
stream's watermark has its state removed.  The idle clock is the max
event time seen, not the last-processed row's: an out-of-order row
that is inside the watermark window but behind the group's max
regresses the latter, and arming off it would evict a conversation
that was active more recently (rows fully behind the watermark are
dropped by Spark before reaching the operator, so the regression is
bounded by the watermark delay; pinned by
``test_late_row_does_not_evict_active_conversation``).  (Verified
working in this PySpark
build; ``ProcessingTimeTimeout`` hard-crashes the Python worker here,
reproduced with a minimal canary independent of this module, so the
event-time path is the one offered).  TTL is OPT-IN because eviction
is a semantic trade, not just a resource knob: a conversation that
returns after eviction restarts as if new — ``dt_prev_sec`` is NULL,
``last_tool`` backfill restarts empty, and ``session_id`` restarts at
0 — whereas the batch recompute (and the NoTimeout default) carries
those across any idle gap.  Pick ``ttl >> gap_seconds`` so the only
rows that can diverge from batch are ones already starting a new
session.  Default ``None`` keeps NoTimeout and exact batch parity.

Ordering contract: rows are processed sorted by (ts, turn_idx) within
each micro-batch; turns that arrive in a *later* micro-batch with an
*earlier* event time are features-of-record only in the batch engine
(the streaming tail is approximate under out-of-order arrival; the
batch pipeline recomputes bounded slices exactly — see
streaming/sessionize.py design notes).  State for idle conversations is
bounded as described in the TTL note above.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TURN_FEATURES_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", LongType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", StringType()),            # ISO string (sink-friendly)
    StructField("dt_prev_sec", DoubleType()),
    StructField("last_tool", StringType()),
    StructField("session_id", LongType()),
])

# state: last event-time (epoch ns), last known tool, current session id,
# max event-time ever seen (epoch ns — the TTL idle clock; last_ts_ns can
# REGRESS when a late row arrives, max_ts_ns cannot)
STATE_SCHEMA = StructType([
    StructField("last_ts_ns", LongType()),
    StructField("last_tool", StringType()),
    StructField("session_id", LongType()),
    StructField("max_ts_ns", LongType()),
])


def _make_update_fn(gap_seconds: float,
                    ttl_seconds: Optional[float] = None):
    gap_ns = int(gap_seconds * 1_000_000_000)
    ttl_ms = None if ttl_seconds is None else int(ttl_seconds * 1_000)

    def _arm_ttl(state: GroupState, max_ts_ns) -> None:
        if ttl_ms is None or max_ts_ns is None:
            return
        # EventTimeTimeout: fire once the watermark passes
        # max-event-time-seen + ttl.  The basis is the max, NOT the
        # last-processed row's event time: a late out-of-order row
        # regresses last_ts_ns, and arming off that would evict a
        # conversation that was active minutes ago because one stale
        # row arrived.  Spark rejects timestamps at or behind the
        # current watermark, so clamp just past it for groups whose
        # entire history is already late.
        target = max_ts_ns // 1_000_000 + ttl_ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(target, wm + 1))

    def update(key: Tuple[str],
               pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-conversation eviction: drop the carried state; the
            # conversation restarts as-new if it ever returns
            state.remove()
            return
        last_ts_ns, last_tool, session_id, max_ts_ns = (
            state.get if state.exists else (None, None, 0, None))
        conv_id = key[0]
        # a group larger than one Arrow batch arrives as SEVERAL chunks
        # in arbitrary order — the (ts, turn_idx) ordering contract is
        # per micro-batch, so materialize + sort the whole group before
        # threading state through it (a conversation's rows in one
        # micro-batch are bounded; the unbounded dimension is the number
        # of conversations, which stays streamed)
        chunks = [c for c in pdfs if not c.empty]
        if not chunks:
            state.update((last_ts_ns, last_tool, session_id, max_ts_ns))
            _arm_ttl(state, max_ts_ns)
            return
        whole = (chunks[0] if len(chunks) == 1
                 else pd.concat(chunks, ignore_index=True))
        pdf = whole.sort_values(["ts", "turn_idx"], kind="mergesort")
        # normalize to ns regardless of the Arrow batch's unit
        ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
        out_dt, out_tool, out_sid = [], [], []
        for t_ns, tool in zip(ts_ns.tolist(), pdf["tool"].tolist()):
            if last_ts_ns is None:
                dt = None
            else:
                dt = (t_ns - last_ts_ns) / 1e9
                if t_ns - last_ts_ns > gap_ns:
                    session_id += 1
            if tool is not None and tool == tool:  # non-null, non-NaN
                last_tool = tool
            last_ts_ns = t_ns
            out_dt.append(dt)
            out_tool.append(last_tool)
            out_sid.append(session_id)
        yield pd.DataFrame({
            "conv_id": conv_id,
            "turn_idx": pdf["turn_idx"].astype("int64"),
            "role": pdf["role"],
            "text": pdf["text"],
            "tool": pdf["tool"],
            # fractional seconds kept (trimmed) so sub-second rows
            # byte-match the batch recompute; '.' guards the seconds
            # digits from the zero-strip
            "ts": (pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
                   .str.rstrip("0").str.rstrip(".")),
            "dt_prev_sec": out_dt,
            "last_tool": out_tool,
            "session_id": out_sid,
        })
        # within-batch rows are sorted, so last_ts_ns is this batch's
        # max; the all-time max only ever ratchets up
        if last_ts_ns is not None:
            max_ts_ns = (last_ts_ns if max_ts_ns is None
                         else max(max_ts_ns, last_ts_ns))
        state.update((last_ts_ns, last_tool, session_id, max_ts_ns))
        _arm_ttl(state, max_ts_ns)

    return update


def streaming_turn_features(stream: DataFrame,
                            gap_seconds: float = 1800.0,
                            state_ttl_seconds: Optional[float] = None,
                            watermark: str = "10 minutes") -> DataFrame:
    """Attach dt_prev_sec / last_tool backfill / session_id to a
    transcript stream, state carried per conv_id across micro-batches.

    ``state_ttl_seconds`` (opt-in) bounds state by activity: a
    conversation idle for ``ttl`` past the event-time watermark has its
    state evicted (see module docstring for the semantic trade).  The
    watermark delay only matters in TTL mode and controls how much
    event-time disorder is tolerated before eviction decisions fire.
    """
    if state_ttl_seconds is not None:
        stream = stream.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return (stream.groupBy("conv_id").applyInPandasWithState(
        _make_update_fn(gap_seconds, state_ttl_seconds),
        outputStructType=TURN_FEATURES_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout))


def run_turn_features_to_sink(spark, src_path: str, out_path: str,
                              checkpoint_path: str,
                              gap_seconds: float = 1800.0,
                              max_files: int = 1,
                              state_ttl_seconds: Optional[float] = None,
                              watermark: str = "10 minutes") -> None:
    """Production-shaped run: file source -> stateful turn features ->
    parquet sink with a checkpoint.  Restartable: re-invoking with the
    same checkpoint resumes from committed offsets with the per-
    conversation state restored from the state store, so a turn arriving
    after a stop/restart still sees dt_prev_sec / last_tool / session_id
    carried from before the restart, and already-committed micro-batches
    are never re-emitted (exactly-once file sink)."""
    from .sessionize import read_transcript_stream

    feats = streaming_turn_features(
        read_transcript_stream(spark, src_path, max_files=max_files),
        gap_seconds, state_ttl_seconds=state_ttl_seconds,
        watermark=watermark)
    q = (feats.writeStream.format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def run_turn_features_to_memory(spark, src_path: str,
                                gap_seconds: float = 1800.0,
                                query_name: str = "turn_features",
                                max_files: int = 1,
                                state_ttl_seconds: Optional[float] = None,
                                watermark: str = "10 minutes") -> None:
    """Drain ``src_path`` with availableNow (one file per micro-batch by
    default, exercising cross-batch state carry) into a memory sink."""
    from .sessionize import read_transcript_stream

    feats = streaming_turn_features(
        read_transcript_stream(spark, src_path, max_files=max_files),
        gap_seconds, state_ttl_seconds=state_ttl_seconds,
        watermark=watermark)
    q = (feats.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
