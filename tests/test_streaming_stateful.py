"""applyInPandasWithState per-turn features: cross-micro-batch state
carry must reproduce the batch window operators exactly for in-order
arrival (one source file per micro-batch)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aloha_spark.operators.windows import (
    with_backfill,
    with_session_id,
    with_ts_delta,
)
from aloha_spark.streaming.stateful import (
    run_turn_features_to_memory,
    run_turn_features_to_sink,
)


def _write_sliced_turns(spark, path: str, n_convs: int = 6,
                        turns_per_conv: int = 30, slices: int = 3) -> None:
    """Deterministic turns, written as ``slices`` time-ordered files so
    availableNow(maxFilesPerTrigger=1) crosses state between batches."""
    rows = []
    for c in range(n_convs):
        t0 = 1_700_000_000 + c * 7_919
        for i in range(turns_per_conv):
            # occasional >30min gaps -> multiple sessions per conv
            t0 += 120 if (i % 7) else 2_400
            rows.append((f"c{c}", i, "user" if i % 2 else "assistant",
                         f"turn {i} of c{c}",
                         "search" if i % 5 == 0 else None, t0))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "epoch"])
    pdf["ts"] = pd.to_datetime(pdf["epoch"], unit="s")
    pdf = pdf.drop(columns=["epoch"]).sort_values(["ts", "conv_id"])
    per = (len(pdf) + slices - 1) // slices
    os.makedirs(path, exist_ok=True)
    for s in range(slices):
        chunk = pdf.iloc[s * per:(s + 1) * per]
        spark.createDataFrame(chunk).coalesce(1) \
            .write.mode("overwrite").parquet(f"{path}/slice={s}")
    # flatten: move part files up so the stream reads them as N files
    import glob
    import shutil
    for s in range(slices):
        for i, f in enumerate(
                sorted(glob.glob(f"{path}/slice={s}/part-*.parquet"))):
            shutil.move(f, f"{path}/{s:02d}_{i}.parquet")
        shutil.rmtree(f"{path}/slice={s}")


@pytest.mark.usefixtures("spark")
class TestStreamingTurnFeatures:
    def test_matches_batch_windows_across_microbatches(self, spark, tmp_path):
        src = str(tmp_path / "turns_stream")
        _write_sliced_turns(spark, src)

        run_turn_features_to_memory(spark, src, gap_seconds=1800.0,
                                    query_name="tf_test", max_files=1)
        got = (spark.table("tf_test")
               .select("conv_id", "turn_idx", "dt_prev_sec", "last_tool",
                       "session_id")
               .orderBy("conv_id", "turn_idx").toPandas())

        batch_src = spark.read.parquet(src)
        oracle = with_session_id(
            with_backfill(with_ts_delta(batch_src), ["tool"]),
            gap_seconds=1800.0)
        exp = (oracle.select("conv_id", "turn_idx", "dt_prev_sec",
                             F.col("last_tool"),
                             F.col("session_id").cast("long"))
               .orderBy("conv_id", "turn_idx").toPandas())

        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)
        # multiple sessions must actually occur (gap rows present)
        assert exp.groupby("conv_id")["session_id"].max().min() >= 1


T0 = 1_700_000_000


def _write_turn_file(spark, path: str, name: str, rows) -> None:
    """Write ``rows`` — (conv_id, turn_idx, tool, epoch_sec) tuples — as
    ONE parquet file ``{path}/{name}.parquet`` so maxFilesPerTrigger=1
    maps each call to exactly one micro-batch."""
    import glob
    import shutil
    pdf = pd.DataFrame(
        [(c, i, "user", f"t{i}", tool, pd.Timestamp(t, unit="s"))
         for c, i, tool, t in rows],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    schema = ("conv_id string, turn_idx long, role string, "
              "text string, tool string, ts timestamp")
    tmp = f"{path}/_tmp_{name}"
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(pdf, schema=schema).coalesce(1) \
        .write.mode("overwrite").parquet(tmp)
    f = sorted(glob.glob(f"{tmp}/part-*.parquet"))[0]
    shutil.move(f, f"{path}/{name}.parquet")
    shutil.rmtree(tmp)


class TestStateTTL:
    def _write_ttl_slices(self, spark, path: str) -> None:
        """Four files -> four micro-batches: conv a appears, goes idle
        while conv b advances the watermark past a's TTL, then returns."""
        batches = [
            [("a", 0, None, T0), ("a", 1, None, T0 + 120),
             ("a", 2, None, T0 + 240)],
            [("b", 0, None, T0 + 100_000)],
            # watermark now ~T0+99_400 > a's TTL
            [("b", 1, None, T0 + 100_060)],
            [("a", 3, None, T0 + 200_000), ("a", 4, None, T0 + 200_120)],
        ]
        for s, rows in enumerate(batches):
            _write_turn_file(spark, path, f"{s:02d}", rows)

    def _returning_rows(self, spark, src, ttl, name):
        run_turn_features_to_memory(spark, src, gap_seconds=1800.0,
                                    query_name=name, max_files=1,
                                    state_ttl_seconds=ttl)
        return (spark.table(name)
                .filter("conv_id = 'a'")
                .select("turn_idx", "dt_prev_sec", "last_tool",
                        "session_id")
                .orderBy("turn_idx").toPandas())

    def test_idle_conversation_evicted_and_restarts_fresh(self, spark,
                                                          tmp_path):
        src = str(tmp_path / "ttl_stream")
        self._write_ttl_slices(spark, src)
        got = self._returning_rows(spark, src, ttl=3600.0, name="tf_ttl")
        assert got["turn_idx"].tolist() == [0, 1, 2, 3, 4]
        # returning turn restarts as-new: no carried dt, session back to 0
        assert pd.isna(got.loc[got["turn_idx"] == 3, "dt_prev_sec"]).all()
        assert got.loc[got["turn_idx"] == 3, "session_id"].item() == 0
        assert got.loc[got["turn_idx"] == 4, "dt_prev_sec"].item() == 120.0

    def test_no_ttl_default_carries_state_across_idle_gap(self, spark,
                                                          tmp_path):
        src = str(tmp_path / "nottl_stream")
        self._write_ttl_slices(spark, src)
        got = self._returning_rows(spark, src, ttl=None, name="tf_nottl")
        # NoTimeout default: dt carried across the idle gap, session bumps
        assert got.loc[got["turn_idx"] == 3, "dt_prev_sec"].item() == \
            200_000.0 - 240.0
        assert got.loc[got["turn_idx"] == 3, "session_id"].item() == 1

    def test_late_row_does_not_evict_active_conversation(self, spark,
                                                         tmp_path):
        """The TTL idle clock is the MAX event time seen: an
        out-of-order row must not shrink it.  Rows fully behind the
        watermark are dropped by Spark before reaching the operator, so
        the dangerous case is a row that regresses the group's max while
        staying inside the watermark window (regression bounded by the
        watermark delay, 600s here).  Arming the timeout off the
        last-processed row's event time would fire ttl-after-the-stale-
        row and evict a conversation that was active more recently."""
        src = str(tmp_path / "late_stream")
        batches = [
            # a's max event time: T0+9_000 -> global wm = T0+8_400
            [("a", 0, "search", T0 + 7_000), ("a", 1, None, T0 + 9_000)],
            [("b", 0, None, T0 + 7_800)],
            # out-of-order a row: inside the wm window, behind a's max.
            # buggy basis T0+8_500 -> timeout T0+12_100;
            # fixed basis T0+9_000 -> timeout T0+12_600
            [("a", 2, None, T0 + 8_500)],
            [("b", 1, None, T0 + 12_800)],   # wm after batch: T0+12_200
            # a absent while T0+12_100 < wm < T0+12_600: the buggy arm
            # fires here and evicts a; the max-basis arm does not
            [("b", 2, None, T0 + 13_000)],
            [("a", 3, None, T0 + 13_200)],   # a returns, within ttl
        ]
        for s, rows in enumerate(batches):
            _write_turn_file(spark, src, f"{s:02d}", rows)
        got = self._returning_rows(spark, src, ttl=3600.0, name="tf_late")
        assert got["turn_idx"].tolist() == [0, 1, 2, 3]
        # state survived: dt computed against the out-of-order row's ts
        # (the ordering contract), sessions accumulated, tool backfill
        # carried — none of the fresh-restart signature (dt NULL, sid 0)
        row3 = got[got["turn_idx"] == 3]
        assert row3["dt_prev_sec"].item() == 13_200.0 - 8_500.0
        assert row3["last_tool"].item() == "search"
        assert row3["session_id"].item() == 2


class TestCheckpointRecovery:
    """Stop/restart against one checkpoint: per-conversation state must
    survive the restart (dt/session carried into post-restart turns) and
    committed micro-batches must not be re-emitted (exactly-once)."""

    def test_state_survives_restart_and_no_reemission(self, spark,
                                                      tmp_path):
        src = str(tmp_path / "ckpt_src")
        out = str(tmp_path / "ckpt_out")
        ckpt = str(tmp_path / "ckpt")

        # run 1: two files -> two committed micro-batches
        _write_turn_file(spark, src, "00",
                         [("a", 0, "search", T0), ("a", 1, None, T0 + 120)])
        _write_turn_file(spark, src, "01", [("a", 2, None, T0 + 240)])
        run_turn_features_to_sink(spark, src, out, ckpt, max_files=1)
        first = spark.read.parquet(out)
        assert first.count() == 3

        # "crash": the query object is gone; only src/out/ckpt persist.
        # run 2: two new files — one in-gap turn (state must carry) and
        # one past the 1800s gap (session must bump using carried ts)
        _write_turn_file(spark, src, "02", [("a", 3, None, T0 + 360)])
        _write_turn_file(spark, src, "03", [("a", 4, None, T0 + 9000)])
        run_turn_features_to_sink(spark, src, out, ckpt, max_files=1)

        got = (spark.read.parquet(out)
               .select("turn_idx", "dt_prev_sec", "last_tool",
                       "session_id")
               .orderBy("turn_idx").toPandas())
        # exactly-once: 5 rows total, each turn exactly once
        assert got["turn_idx"].tolist() == [0, 1, 2, 3, 4]
        # state carried across the restart: turn 3 sees turn 2's ts...
        assert got.loc[got["turn_idx"] == 3, "dt_prev_sec"].item() == 120.0
        # ...and the pre-restart tool backfill
        assert got.loc[got["turn_idx"] == 3, "last_tool"].item() == "search"
        assert got.loc[got["turn_idx"] == 3, "session_id"].item() == 0
        # gap turn after restart: session id increments off carried state
        assert got.loc[got["turn_idx"] == 4, "dt_prev_sec"].item() == 8640.0
        assert got.loc[got["turn_idx"] == 4, "session_id"].item() == 1

    def test_restart_with_no_new_files_emits_nothing(self, spark,
                                                     tmp_path):
        src = str(tmp_path / "ckpt_src2")
        out = str(tmp_path / "ckpt_out2")
        ckpt = str(tmp_path / "ckpt2")
        _write_turn_file(spark, src, "00",
                         [("a", 0, None, T0), ("a", 1, None, T0 + 60)])
        run_turn_features_to_sink(spark, src, out, ckpt, max_files=1)
        n1 = spark.read.parquet(out).count()
        run_turn_features_to_sink(spark, src, out, ckpt, max_files=1)
        assert spark.read.parquet(out).count() == n1 == 2


class TestStreamingFeaturize:
    def test_stream_vectors_match_batch_pipeline(self, spark, tmp_path):
        """foreachBatch featurization over the stateful stream must give
        the same hashed vectors as the batch pipeline over the same
        input (same spec, same kernels)."""
        from aloha_spark.plans.pipeline import FeaturePipeline
        from aloha_spark.plans.spec import PipelineSpec
        from aloha_spark.streaming.featurize import streaming_feature_vectors
        from aloha_spark.streaming.sessionize import read_transcript_stream

        src = str(tmp_path / "turns_stream2")
        _write_sliced_turns(spark, src, n_convs=4, turns_per_conv=20,
                            slices=2)
        spec = {"features": [
            {"name": "role", "spec": "ind(${role})"},
            {"name": "bow", "spec": "bag(${text})"},
            {"name": "tool", "spec": "ind(${last_tool})"},
            {"name": "dt", "spec": "clamp(${dt_prev_sec:-0}, 0, 86400)"},
        ], "namespaces": {}, "numBits": 18}

        collected = []
        start, _ = streaming_feature_vectors(
            read_transcript_stream(spark, src, max_files=1), spec,
            keep_cols=["conv_id", "turn_idx"])
        q = start(lambda df, bid: collected.append(df.toPandas()))
        q.awaitTermination()
        import pandas as pd
        got = pd.concat(collected).sort_values(["conv_id", "turn_idx"]) \
            .reset_index(drop=True)

        # batch oracle: same windows + same pipeline
        from aloha_spark.operators.windows import (
            with_backfill, with_session_id, with_ts_delta)
        batch_src = with_session_id(
            with_backfill(with_ts_delta(spark.read.parquet(src)), ["tool"]),
            gap_seconds=1800.0)
        pipe = FeaturePipeline(PipelineSpec.from_json(spec))
        exp = pipe.to_sparse_vectors(
            batch_src, keep_cols=["conv_id", "turn_idx"]) \
            .orderBy("conv_id", "turn_idx").toPandas()

        assert len(got) == len(exp) > 0
        import numpy as np
        for i in range(len(got)):
            assert np.array_equal(got["indices"][i], exp["indices"][i]), i
            assert np.allclose(got["values"][i], exp["values"][i]), i


class TestMultiChunkGroup:
    def test_group_spanning_arrow_batches_stays_ordered(self, spark, tmp_path):
        """One conversation larger than the Arrow batch size arrives as
        multiple chunks in the update fn; ordering must survive."""
        n = 5000
        rows = [("big", i, "user", f"t{i}",
                 "search" if i % 50 == 0 else None,
                 pd.Timestamp("2025-01-01") + pd.Timedelta(
                     seconds=i * 120 + (i // 1000) * 2400))
                for i in range(n)]
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                          "text", "tool", "ts"])
        src = str(tmp_path / "big_stream")
        os.makedirs(src, exist_ok=True)
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                             "10000")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
        try:
            run_turn_features_to_memory(spark, src, gap_seconds=1800.0,
                                        query_name="tf_big", max_files=16)
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           old)
        got = (spark.table("tf_big")
               .select("turn_idx", "dt_prev_sec", "session_id")
               .orderBy("turn_idx").toPandas())
        assert len(got) == n
        # in-order input: dt never negative, session ids non-decreasing
        assert (got["dt_prev_sec"].dropna() >= 0).all()
        assert got["session_id"].is_monotonic_increasing
        oracle = with_session_id(
            with_backfill(with_ts_delta(spark.read.parquet(src)), ["tool"]),
            gap_seconds=1800.0)
        exp = (oracle.select("turn_idx", "dt_prev_sec",
                             F.col("session_id").cast("long"))
               .orderBy("turn_idx").toPandas())
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)
