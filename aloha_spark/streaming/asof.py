"""Streaming as-of join: attach the latest-known feature state to each
arriving turn — the streaming-tail analog of ``operators/asof.py``
(Flink calls this a temporal join; Spark has no native equivalent, so
it is built on ``applyInPandasWithState``).

Both inputs are streams.  They are tagged and unioned (one shuffle on
the conversation key — the same single-exchange shape as the batch
window-mode join), and a per-``by`` state group carries a bounded
buffer of recent state rows across micro-batches:

* a STATE row appends ``(ts, payload)`` to the buffer (kept sorted,
  capped at ``buffer_size`` — newest retained);
* a TURN row binds to the latest buffered state with ``state.ts <=
  turn.ts`` (``<`` when ``allow_exact=False``) — exactly the batch
  backward contract, so ZERO temporal leakage by construction: a
  future-dated state row can be *in* the buffer but can never be
  chosen.

Ordering/lateness contract (same stance as ``streaming/stateful.py``):
rows are processed sorted by (ts, side) within each micro-batch — state
sorts before turns at equal ts iff ``allow_exact``, mirroring the batch
tie rule — so in-order arrival reproduces the batch join exactly
(pinned in ``tests/test_streaming_asof.py``).  Under out-of-order
arrival the binding is correct w.r.t. the state rows that have ARRIVED
(the Flink temporal-join caveat); a turn older than the oldest retained
buffer entry fails SAFE to NULL state (never to a newer state).  The
batch engine remains feature-of-record: it recomputes bounded slices
exactly, and this tail owns freshness.

State size is O(active conversations x buffer_size); idle-conversation
eviction reuses the event-time TTL design from ``streaming/stateful.py``
(``ProcessingTimeTimeout`` crashes this PySpark build's Python workers —
see that module's docstring).
"""

from __future__ import annotations

import bisect
from typing import Iterable, Iterator, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType)


def _out_schema(turns: DataFrame, by: str, on: str,
                turn_cols: Sequence[str], state: DataFrame,
                state_cols: Sequence[str]) -> StructType:
    fields = [StructField(by, turns.schema[by].dataType),
              StructField(on, StringType())]   # ISO string, sink-friendly
    for c in turn_cols:
        fields.append(StructField(c, turns.schema[c].dataType))
    for c in state_cols:
        fields.append(StructField(c, state.schema[c].dataType))
    return StructType(fields)


def _state_schema(state: DataFrame,
                  state_cols: Sequence[str]) -> StructType:
    fields = [StructField("buf_ts_ns", ArrayType(LongType()))]
    for c in state_cols:
        fields.append(StructField(
            f"buf_{c}", ArrayType(state.schema[c].dataType)))
    fields.append(StructField("max_ts_ns", LongType()))
    return StructType(fields)


def _make_update_fn(by: str, on: str, turn_cols: Sequence[str],
                    state_cols: Sequence[str], allow_exact: bool,
                    buffer_size: int, ttl_seconds: Optional[float]):
    ttl_ms = None if ttl_seconds is None else int(ttl_seconds * 1_000)
    n_state = len(state_cols)

    def _arm_ttl(state: GroupState, max_ts_ns) -> None:
        if ttl_ms is None or max_ts_ns is None:
            return
        target = max_ts_ns // 1_000_000 + ttl_ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(target, wm + 1))

    def update(key: Tuple,
               pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            stored = state.get
            buf_ts = list(stored[0] or [])
            buf_payload = [list(stored[1 + i] or []) for i in range(n_state)]
            max_ts_ns = stored[1 + n_state]
        else:
            buf_ts, buf_payload, max_ts_ns = [], [[] for _ in range(n_state)], None

        chunks = [c for c in pdfs if not c.empty]
        if not chunks:
            state.update(tuple([buf_ts] + buf_payload + [max_ts_ns]))
            _arm_ttl(state, max_ts_ns)
            return
        whole = (chunks[0] if len(chunks) == 1
                 else pd.concat(chunks, ignore_index=True))
        # batch tie rule: at equal ts, state binds iff allow_exact —
        # sorting state (side 0) before turns reproduces exact mode;
        # turns-first reproduces strict mode.  mergesort = stable, so
        # among equal-ts state rows the later-arrived one wins (the
        # batch join's default last-wins tiebreak).
        whole = whole.assign(_ord=whole["_side"] if allow_exact
                             else 1 - whole["_side"])
        whole = whole.sort_values([on, "_ord"], kind="mergesort")
        ts_ns = whole[on].astype("datetime64[ns]").astype("int64")

        out_rows = []
        for pos in range(len(whole)):
            row = whole.iloc[pos]
            t_ns = int(ts_ns.iloc[pos])
            if row["_side"] == 0:                     # state row
                # keep the buffer sorted by ts (arrival order preserved
                # among equal ts by inserting to the right)
                idx = bisect.bisect_right(buf_ts, t_ns)
                buf_ts.insert(idx, t_ns)
                for i, c in enumerate(state_cols):
                    v = row[c]
                    # the state store pickles through the JVM, which
                    # rejects numpy scalar types — store native Python
                    if v is not None and hasattr(v, "item"):
                        v = None if v != v else v.item()
                    buf_payload[i].insert(idx, v)
                if len(buf_ts) > buffer_size:         # newest retained
                    buf_ts.pop(0)
                    for p in buf_payload:
                        p.pop(0)
            else:                                     # turn row
                # latest buffered state with ts <= t, or ts < t when
                # strict — bisect_left in strict mode also excludes an
                # equal-ts state that arrived in an EARLIER micro-batch
                # (within-batch ordering alone can't, it only controls
                # this batch's insertions)
                idx = (bisect.bisect_right(buf_ts, t_ns) if allow_exact
                       else bisect.bisect_left(buf_ts, t_ns)) - 1
                payload = ([p[idx] for p in buf_payload]
                           if idx >= 0 else [None] * n_state)
                out_rows.append(
                    [row[by],
                     pd.Timestamp(t_ns).strftime("%Y-%m-%d %H:%M:%S.%f")
                     .rstrip("0").rstrip(".")]
                    + [row[c] for c in turn_cols] + payload)
            if max_ts_ns is None or t_ns > max_ts_ns:
                max_ts_ns = t_ns
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=[by, on] + list(turn_cols)
                + list(state_cols))
        state.update(tuple([buf_ts] + buf_payload + [max_ts_ns]))
        _arm_ttl(state, max_ts_ns)

    return update


def streaming_asof_state(turns: DataFrame, state: DataFrame, *,
                         by: str = "conv_id", on: str = "ts",
                         state_cols: Optional[Sequence[str]] = None,
                         allow_exact: bool = True,
                         buffer_size: int = 32,
                         state_ttl_seconds: Optional[float] = None,
                         watermark: str = "10 minutes") -> DataFrame:
    """Temporal join of a turn stream against a state stream.

    Returns a stream of turn rows with ``state_cols`` attached per the
    batch backward as-of contract (latest state at-or-before the turn;
    strictly-before when ``allow_exact=False``).  ``buffer_size`` bounds
    retained state history per conversation — the out-of-order window a
    late turn can still bind into; older turns fail safe to NULL."""
    if state_cols is None:
        state_cols = [c for c in state.columns if c not in (by, on)]
    turn_cols = [c for c in turns.columns if c not in (by, on)]
    overlap = set(turn_cols) & set(state_cols)
    if overlap:
        raise ValueError(
            f"streaming_asof_state: columns {sorted(overlap)} exist on "
            f"both sides — rename one side first")

    t = turns.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        *[F.col(c) for c in turn_cols],
        *[F.lit(None).cast(state.schema[c].dataType).alias(c)
          for c in state_cols])
    s = state.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        *[F.lit(None).cast(turns.schema[c].dataType).alias(c)
          for c in turn_cols],
        *[F.col(c) for c in state_cols])
    unioned = t.unionByName(s)
    if state_ttl_seconds is not None:
        unioned = unioned.withWatermark(on, watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return unioned.groupBy(by).applyInPandasWithState(
        _make_update_fn(by, on, turn_cols, state_cols, allow_exact,
                        buffer_size, state_ttl_seconds),
        outputStructType=_out_schema(turns, by, on, turn_cols,
                                     state, state_cols),
        stateStructType=_state_schema(state, state_cols),
        outputMode="append",
        timeoutConf=timeout)


def run_asof_to_memory(spark, turns_path: str, state_path: str,
                       state_schema_ddl: str, *,
                       query_name: str = "asof_stream",
                       max_files: int = 1,
                       allow_exact: bool = True,
                       buffer_size: int = 32) -> None:
    """Drain two file sources with availableNow (``max_files`` files per
    micro-batch each, exercising cross-batch buffer carry) into a memory
    sink."""
    from .sessionize import read_transcript_stream

    turns = read_transcript_stream(spark, turns_path, max_files=max_files)
    state = (spark.readStream.format("parquet")
             .schema(state_schema_ddl)
             .option("maxFilesPerTrigger", max_files)
             .load(state_path))
    joined = streaming_asof_state(turns, state, allow_exact=allow_exact,
                                  buffer_size=buffer_size)
    q = (joined.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
