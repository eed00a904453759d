"""Streaming as-of (temporal) join: cross-micro-batch state-buffer carry
must reproduce the batch asof_join exactly for in-order arrival, never
leak future-dated state, and honor the strict/exact tie rule across
micro-batch boundaries."""

import glob
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aloha_spark.operators.asof import asof_join
from aloha_spark.streaming.asof import run_asof_to_memory

STATE_DDL = ("conv_id string, ts timestamp, state_score double, "
             "state_tag string")


def _flatten(path: str, tag: str) -> None:
    for s, d in enumerate(sorted(glob.glob(f"{path}/slice=*"))):
        for i, f in enumerate(sorted(glob.glob(f"{d}/part-*.parquet"))):
            shutil.move(f, f"{path}/{tag}_{s:02d}_{i}.parquet")
        shutil.rmtree(d)


def _write_sliced(spark, pdf: pd.DataFrame, path: str, slices: int,
                  tag: str) -> None:
    """Time-ordered slices, one file each, so availableNow(max_files=1)
    crosses the state buffer between micro-batches."""
    pdf = pdf.sort_values("ts", kind="mergesort")
    per = (len(pdf) + slices - 1) // slices
    os.makedirs(path, exist_ok=True)
    for s in range(slices):
        chunk = pdf.iloc[s * per:(s + 1) * per]
        spark.createDataFrame(chunk).coalesce(1) \
            .write.mode("overwrite").parquet(f"{path}/slice={s}")
    _flatten(path, tag)


def _mk_data(n_convs: int = 5, turns_per_conv: int = 24):
    """Turns + state with exact-tie probes and a FUTURE-dated poison
    state row per conversation (must never attach)."""
    turns, states = [], []
    for c in range(n_convs):
        t0 = 1_700_000_000 + c * 7_919
        for i in range(turns_per_conv):
            t0 += 90 + (i % 5) * 30
            turns.append((f"c{c}", i, "user" if i % 2 else "assistant",
                          f"turn {i}", "grep" if i % 6 == 0 else None, t0))
            if i % 4 == 0:
                # state dated exactly AT this turn's ts (tie probe)
                states.append((f"c{c}", t0, 10.0 * i + c, f"tag{i % 3}"))
        states.append((f"c{c}", t0 + 999_999, -1e9, "LEAKED_FROM_FUTURE"))
    tp = pd.DataFrame(turns, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "epoch"])
    tp["ts"] = pd.to_datetime(tp["epoch"], unit="s")
    sp = pd.DataFrame(states, columns=["conv_id", "epoch", "state_score",
                                       "state_tag"])
    sp["ts"] = pd.to_datetime(sp["epoch"], unit="s")
    return tp.drop(columns=["epoch"]), sp.drop(columns=["epoch"])


def _batch_oracle(spark, turns_path, state_path, allow_exact):
    t = spark.read.parquet(turns_path)
    s = spark.read.parquet(state_path)
    return (asof_join(t, s, state_cols=["state_score", "state_tag"],
                      allow_exact=allow_exact)
            .select("conv_id", "turn_idx", "state_score", "state_tag")
            .orderBy("conv_id", "turn_idx").toPandas())


def _got(spark, name):
    return (spark.table(name)
            .select("conv_id", "turn_idx", "state_score", "state_tag")
            .orderBy("conv_id", "turn_idx").toPandas())


@pytest.mark.usefixtures("spark")
class TestStreamingAsof:
    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        tp, sp = _mk_data()
        tdir, sdir = str(tmp_path / "turns"), str(tmp_path / "state")
        _write_sliced(spark, tp, tdir, slices=3, tag="t")
        _write_sliced(spark, sp, sdir, slices=2, tag="s")

        run_asof_to_memory(spark, tdir, sdir, STATE_DDL,
                           query_name="asof_exact", max_files=1)
        got = _got(spark, "asof_exact")
        exp = _batch_oracle(spark, tdir, sdir, allow_exact=True)
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)

    def test_strict_mode_matches_batch(self, spark, tmp_path):
        tp, sp = _mk_data(n_convs=3)
        tdir, sdir = str(tmp_path / "turns"), str(tmp_path / "state")
        _write_sliced(spark, tp, tdir, slices=3, tag="t")
        _write_sliced(spark, sp, sdir, slices=2, tag="s")

        run_asof_to_memory(spark, tdir, sdir, STATE_DDL,
                           query_name="asof_strict", max_files=1,
                           allow_exact=False)
        got = _got(spark, "asof_strict")
        exp = _batch_oracle(spark, tdir, sdir, allow_exact=False)
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)

    def test_strict_excludes_equal_ts_from_earlier_batch(self, spark,
                                                         tmp_path):
        """The cross-batch tie: an equal-ts state row arriving in an
        EARLIER micro-batch is already buffered when the turn arrives —
        strict mode must still skip it."""
        ts = pd.to_datetime([1_700_000_100], unit="s")
        sp = pd.DataFrame({"conv_id": ["c0"], "ts": ts,
                           "state_score": [42.0], "state_tag": ["tie"]})
        tp = pd.DataFrame({"conv_id": ["c0"], "turn_idx": [0],
                           "role": ["user"], "text": ["x"],
                           "tool": ["grep"], "ts": ts})
        tdir, sdir = str(tmp_path / "turns"), str(tmp_path / "state")
        _write_sliced(spark, sp, sdir, slices=1, tag="s")
        _write_sliced(spark, tp, tdir, slices=1, tag="t")

        run_asof_to_memory(spark, tdir, sdir, STATE_DDL,
                           query_name="asof_tie", max_files=1,
                           allow_exact=False)
        got = _got(spark, "asof_tie")
        assert len(got) == 1
        assert got["state_score"].isna().all()

    def test_never_leaks_future_state(self, spark, tmp_path):
        tp, sp = _mk_data()
        tdir, sdir = str(tmp_path / "turns"), str(tmp_path / "state")
        _write_sliced(spark, tp, tdir, slices=2, tag="t")
        _write_sliced(spark, sp, sdir, slices=1, tag="s")
        run_asof_to_memory(spark, tdir, sdir, STATE_DDL,
                           query_name="asof_leak", max_files=4)
        got = _got(spark, "asof_leak")
        assert not (got["state_tag"] == "LEAKED_FROM_FUTURE").any()
        # first turn of each conv has an equal-ts state (tie probe):
        # exact mode binds it — score was built as 10*i + conv = conv
        firsts = got[got["turn_idx"] == 0].sort_values("conv_id")
        assert firsts["state_score"].tolist() == [0.0, 1.0, 2.0, 3.0, 4.0]

    def test_buffer_overflow_fails_safe_to_null(self, spark, tmp_path):
        """A turn older than the oldest retained buffer entry gets NULL
        state — never a newer state's payload."""
        base = 1_700_000_000
        # batch 1: 5 state rows; batch 2: one LATE turn older than all
        sp = pd.DataFrame({
            "conv_id": ["c0"] * 5,
            "ts": pd.to_datetime([base + 100 * i for i in range(1, 6)],
                                 unit="s"),
            "state_score": [float(i) for i in range(1, 6)],
            "state_tag": [f"s{i}" for i in range(1, 6)]})
        tp = pd.DataFrame({
            "conv_id": ["c0"], "turn_idx": [0], "role": ["user"],
            "text": ["late"], "tool": ["grep"],
            "ts": pd.to_datetime([base + 50], unit="s")})
        tdir, sdir = str(tmp_path / "turns"), str(tmp_path / "state")
        _write_sliced(spark, sp, sdir, slices=1, tag="s")
        _write_sliced(spark, tp, tdir, slices=1, tag="t")
        run_asof_to_memory(spark, tdir, sdir, STATE_DDL,
                           query_name="asof_buf", max_files=1,
                           buffer_size=2)   # only s4, s5 retained
        got = _got(spark, "asof_buf")
        assert len(got) == 1
        assert got["state_score"].isna().all()

    def test_column_overlap_is_loud(self, spark):
        from aloha_spark.streaming.asof import streaming_asof_state
        t = spark.createDataFrame([], "conv_id string, ts timestamp, "
                                      "x double")
        s = spark.createDataFrame([], "conv_id string, ts timestamp, "
                                      "x double")
        with pytest.raises(ValueError, match="both sides"):
            streaming_asof_state(t, s)
