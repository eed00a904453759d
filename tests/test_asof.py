"""As-of join engine vs the single-node pandas oracle (pd.merge_asof).

Covers: backward semantics with exact-match ties, strict (<) mode,
zero temporal leakage (future state rows never observed), multi-column
state row atomicity (NULL inside a state row must not inherit older
values), skew salting equivalence, and stable output ordering.
"""

import numpy as np
import pandas as pd
import pytest

from aloha_spark.data.transcripts import make_state, make_transcripts
from aloha_spark.operators.asof import asof_join
from aloha_spark.operators.windows import stable_output_order


def _oracle(turns_pd, state_pd, state_cols, allow_exact=True,
            direction="backward"):
    t = turns_pd.sort_values(["ts", "conv_id"]).reset_index(drop=True)
    s = (state_pd.sort_values(["ts", "conv_id"]).reset_index(drop=True))
    out = pd.merge_asof(
        t, s[["conv_id", "ts"] + state_cols], on="ts", by="conv_id",
        direction=direction, allow_exact_matches=allow_exact)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _collect_sorted(df):
    pdf = df.toPandas()
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _assert_frames_match(got, exp, state_cols):
    assert len(got) == len(exp)
    for c in exp.columns:
        g, e = got[c], exp[c]
        if e.dtype.kind == "f":
            assert np.allclose(g.astype(float).to_numpy(), e.to_numpy(),
                               equal_nan=True), c
        else:
            ge = g.where(pd.notna(g), None)
            ee = e.where(pd.notna(e), None)
            assert ge.tolist() == ee.tolist(), c


@pytest.fixture(scope="module")
def small(spark):
    turns = make_transcripts(spark, n_convs=30, turns_per_conv=15).cache()
    state = make_state(spark, turns).cache()
    return turns, state, turns.toPandas(), state.toPandas()


class TestAsofJoin:
    @pytest.mark.parametrize("mode", ["window", "merge"])
    def test_null_keys_never_match(self, spark, mode):
        """NULL join keys follow SQL equi-join / pd.merge_asof
        semantics in BOTH modes: NULL-key state rows match nothing and
        NULL-key turns keep NULL state (the window mode's partitionBy
        would otherwise group NULLs together and forward-fill)."""
        turns = spark.createDataFrame(
            [("a", 0, 100.0), (None, 0, 100.0), (None, 1, 200.0)],
            "conv_id string, turn_idx long, ts double")
        state = spark.createDataFrame(
            [("a", 50.0, 1.5), (None, 50.0, 9.9)],
            "conv_id string, ts double, state_score double")
        got = _collect_sorted(
            asof_join(turns, state, state_cols=["state_score"], mode=mode))
        by_key = {(r["conv_id"] if pd.notna(r["conv_id"]) else None,
                   r["turn_idx"]):
                  r["state_score"] for _, r in got.iterrows()}
        assert by_key[("a", 0)] == 1.5
        assert pd.isna(by_key[(None, 0)])
        assert pd.isna(by_key[(None, 1)])

    @pytest.mark.parametrize("mode", ["window", "merge"])
    def test_matches_pandas_merge_asof(self, spark, small, mode):
        turns, state, tp, sp = small
        got = _collect_sorted(
            asof_join(turns, state, state_cols=["state_score", "state_tag"],
                      mode=mode))
        exp = _oracle(tp, sp, ["state_score", "state_tag"])
        _assert_frames_match(got, exp, ["state_score", "state_tag"])

    @pytest.mark.parametrize("mode,direction", [
        ("window", "forward"), ("merge", "forward"),
        ("window", "nearest")])
    def test_directions_match_pandas(self, spark, small, mode, direction):
        turns, state, tp, sp = small
        # the fixture has duplicate state rows at the same (conv_id,
        # ts); which wins is tiebreaker territory (covered separately),
        # not direction semantics — dedup keeps the parity check about
        # the direction rules alone
        sp2 = (sp.sort_values("state_score")
                 .drop_duplicates(["conv_id", "ts"], keep="last")
                 .reset_index(drop=True))
        state2 = spark.createDataFrame(sp2)
        for allow in (True, False):
            got = _collect_sorted(asof_join(
                turns, state2, state_cols=["state_score", "state_tag"],
                mode=mode, direction=direction, allow_exact=allow))
            exp = _oracle(tp, sp2, ["state_score", "state_tag"],
                          allow_exact=allow, direction=direction)
            _assert_frames_match(got, exp, ["state_score", "state_tag"])

    @pytest.mark.parametrize("mode", ["window", "merge"])
    def test_forward_tiebreaker_greatest_wins(self, spark, mode):
        turns = spark.createDataFrame(
            [("a", 0, 100.0)], "conv_id string, turn_idx int, ts double")
        state = spark.createDataFrame(
            [("a", 150.0, 1.0, "lo"), ("a", 150.0, 9.0, "hi")],
            "conv_id string, ts double, pri double, tag string")
        got = asof_join(turns, state, state_cols=["pri", "tag"],
                        mode=mode, direction="forward",
                        tiebreaker="pri").collect()
        assert (got[0].pri, got[0].tag) == (9.0, "hi")

    def test_nearest_tie_goes_backward(self, spark):
        # state at ts 90 and 110, turn at 100: equidistant -> backward
        turns = spark.createDataFrame(
            [("a", 0, 100.0)], "conv_id string, turn_idx int, ts double")
        state = spark.createDataFrame(
            [("a", 90.0, "B"), ("a", 110.0, "F")],
            "conv_id string, ts double, tag string")
        got = asof_join(turns, state, state_cols=["tag"],
                        direction="nearest").collect()
        assert got[0].tag == "B"
        # pandas agrees
        exp = pd.merge_asof(
            pd.DataFrame({"conv_id": ["a"], "turn_idx": [0], "ts": [100.0]}),
            pd.DataFrame({"conv_id": ["a", "a"], "ts": [90.0, 110.0],
                          "tag": ["B", "F"]}),
            on="ts", by="conv_id", direction="nearest")
        assert exp["tag"].iloc[0] == "B"

    def test_nearest_merge_mode_raises(self, spark, small):
        turns, state, _, _ = small
        with pytest.raises(ValueError, match="nearest"):
            asof_join(turns, state, state_cols=["state_score"],
                      mode="merge", direction="nearest")

    def test_forward_salted_equals_unsalted(self, spark, small):
        turns, state, tp, sp = small
        sp2 = (sp.sort_values("state_score")
                 .drop_duplicates(["conv_id", "ts"], keep="last")
                 .reset_index(drop=True))
        state2 = spark.createDataFrame(sp2)
        hot = [tp["conv_id"].iloc[0]]
        got = _collect_sorted(asof_join(
            turns, state2, state_cols=["state_score", "state_tag"],
            direction="forward", hot_keys=hot, salt_buckets=4))
        exp = _oracle(tp, sp2, ["state_score", "state_tag"],
                      direction="forward")
        _assert_frames_match(got, exp, ["state_score", "state_tag"])

    def test_strict_mode_excludes_equal_ts(self, spark, small):
        turns, state, tp, sp = small
        # craft exact-tie rows: state exactly at a turn's ts
        tie_state = turns.limit(5).selectExpr(
            "conv_id", "ts", "cast(123.5 as double) as state_score",
            "'TIE' as state_tag")
        state2 = state.unionByName(tie_state)
        sp2 = state2.toPandas()

        for allow in (True, False):
            for mode in ("window", "merge"):
                got = _collect_sorted(asof_join(
                    turns, state2, state_cols=["state_score", "state_tag"],
                    allow_exact=allow, mode=mode))
                exp = _oracle(tp, sp2, ["state_score", "state_tag"],
                              allow_exact=allow)
                _assert_frames_match(got, exp, ["state_score", "state_tag"])

    def test_zero_leakage(self, spark, small):
        turns, state, _, _ = small
        out = asof_join(turns, state, state_cols=["state_score", "state_tag"])
        assert out.where("state_tag = 'LEAKED_FROM_FUTURE'").count() == 0
        assert out.where("state_score = -1e9").count() == 0
        # also: joined state ts must be <= turn ts — verify via self-check
        # by joining back the state table on the attached values
        j = (out.alias("o")
             .join(state.alias("s"),
                   (out.conv_id == state.conv_id)
                   & (out.state_score == state.state_score)
                   & (out.state_tag == state.state_tag), "inner")
             .where("s.ts > o.ts"))
        assert j.count() == 0

    def test_state_row_atomicity(self, spark):
        # state row 2 has NULL tag: the turn after it must see NULL tag,
        # not row 1's tag
        turns = spark.createDataFrame(
            [("c1", 0, "2025-01-01 00:00:10"),
             ("c1", 1, "2025-01-01 00:00:20"),
             ("c1", 2, "2025-01-01 00:00:30")],
            "conv_id string, turn_idx int, ts_s string"
        ).selectExpr("conv_id", "turn_idx", "cast(ts_s as timestamp) as ts")
        state = spark.createDataFrame(
            [("c1", "2025-01-01 00:00:05", 1.0, "tagA"),
             ("c1", "2025-01-01 00:00:25", 2.0, None)],
            "conv_id string, ts_s string, state_score double, state_tag string"
        ).selectExpr("conv_id", "cast(ts_s as timestamp) as ts",
                     "state_score", "state_tag")
        for mode in ("window", "merge"):
            got = _collect_sorted(asof_join(
                turns, state, state_cols=["state_score", "state_tag"],
                mode=mode))
            assert got["state_tag"].tolist() == ["tagA", "tagA", None], mode
            assert got["state_score"].tolist() == [1.0, 1.0, 2.0], mode

    def test_no_state_for_conv(self, spark):
        turns = spark.createDataFrame(
            [("a", 0, "2025-01-01 00:00:10"), ("b", 0, "2025-01-01 00:00:10")],
            "conv_id string, turn_idx int, ts_s string"
        ).selectExpr("conv_id", "turn_idx", "cast(ts_s as timestamp) as ts")
        state = spark.createDataFrame(
            [("a", "2025-01-01 00:00:05", 9.0)],
            "conv_id string, ts_s string, state_score double"
        ).selectExpr("conv_id", "cast(ts_s as timestamp) as ts", "state_score")
        got = _collect_sorted(asof_join(turns, state, state_cols=["state_score"]))
        by_conv = dict(zip(got["conv_id"], got["state_score"]))
        assert by_conv["a"] == 9.0
        assert pd.isna(by_conv["b"])

    def test_salted_equals_unsalted(self, spark):
        turns = make_transcripts(spark, n_convs=10, turns_per_conv=8,
                                 mega_turns=400).cache()
        state = make_state(spark, turns).cache()
        cols = ["state_score", "state_tag"]
        plain = _collect_sorted(asof_join(turns, state, state_cols=cols))
        for mode in ("window", "merge"):
            salted = _collect_sorted(asof_join(
                turns, state, state_cols=cols, hot_keys=["mega"],
                salt_buckets=4, mode=mode))
            _assert_frames_match(salted, plain, cols)
        # auto-detection path
        detected = _collect_sorted(asof_join(
            turns, state, state_cols=cols, hot_key_threshold=100,
            salt_buckets=4))
        _assert_frames_match(detected, plain, cols)

    def test_tiny_batches_carry(self, spark, small):
        """Force 1-row Arrow batches so every carry path executes."""
        turns, state, tp, sp = small
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        try:
            got = _collect_sorted(asof_join(
                turns, state, state_cols=["state_score", "state_tag"],
                num_partitions=2, mode="merge"))
            exp = _oracle(tp, sp, ["state_score", "state_tag"])
            _assert_frames_match(got, exp, ["state_score", "state_tag"])
        finally:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    def test_stable_output_order(self, spark, small):
        turns, state, _, _ = small
        out = stable_output_order(
            asof_join(turns, state, state_cols=["state_score"]))
        pdf = out.toPandas()
        key = list(zip(pdf["conv_id"], pdf["turn_idx"]))
        assert key == sorted(key)


# ---------------------------------------------------------------------------
# hypothesis fuzz: the streaming merge kernel vs a brute-force oracle

class TestMergeKernelFuzz:
    """Property-fuzz `_make_merge_fn` — the partition-local streaming
    merge behind mode="merge" — against a brute-force backward-as-of
    oracle.  The kernel's one hard invariant is the O(1) carry between
    Arrow batches (only the last key's latest state may span a batch
    boundary), so the fuzz slices the sorted union frame at ARBITRARY
    batch boundaries: every cut point is a chance for the carry splice
    (operators/asof.py:104-147) to leak, drop, or mis-key state.

    Pure pandas (no Spark jobs), so 300 examples run in seconds; the
    Spark-side integration of the same kernel is covered by
    test_tiny_batches_carry / test_matches_pandas_merge_asof above.
    """

    @staticmethod
    def _run_kernel(turns, states, allow_exact, cuts):
        from aloha_spark.operators.asof import _SALT, _SIDE, _make_merge_fn

        turn_cols = ["conv_id", "turn_idx", "ts"]
        state_cols = ["state_score", "state_tag"]
        state_side, turn_side = (0, 1) if allow_exact else (2, 1)
        rows = []
        for i, (k, ts) in enumerate(turns):
            rows.append({"conv_id": k, "turn_idx": i, "ts": ts,
                         "state_score": None, "state_tag": None,
                         _SIDE: turn_side, _SALT: 0})
        for k, ts, score, tag in states:
            rows.append({"conv_id": k, "turn_idx": None, "ts": ts,
                         "state_score": score, "state_tag": tag,
                         _SIDE: state_side, _SALT: 0})
        pdf = pd.DataFrame(rows, columns=turn_cols + state_cols
                           + [_SIDE, _SALT])
        if pdf.empty:
            return pd.DataFrame(columns=turn_cols + state_cols)
        # the production sort: (key, salt, ts, side), stable
        pdf = pdf.sort_values(["conv_id", _SALT, "ts", _SIDE],
                              na_position="first",
                              kind="mergesort").reset_index(drop=True)
        bounds = sorted({c for c in cuts if 0 < c < len(pdf)})
        edges = [0] + bounds + [len(pdf)]
        pieces = [pdf.iloc[a:b] for a, b in zip(edges, edges[1:])]
        merge = _make_merge_fn(turn_cols, state_cols,
                               by_cols=["conv_id", _SALT], on="ts")
        outs = list(merge(iter([p.reset_index(drop=True)
                                for p in pieces if len(p)])))
        if not outs:
            return pd.DataFrame(columns=turn_cols + state_cols)
        return pd.concat(outs, ignore_index=True)

    @staticmethod
    def _brute(turns, states, allow_exact):
        want = {}
        for i, (k, ts) in enumerate(turns):
            best = None
            for k2, ts2, score, tag in states:
                if k is None or k2 != k:
                    continue
                if ts2 < ts or (allow_exact and ts2 == ts):
                    if best is None or ts2 > best[0]:
                        best = (ts2, score, tag)
            want[i] = (None, None) if best is None else (best[1], best[2])
        return want

    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.sampled_from(["a", "b", "c"])

    @settings(max_examples=300, deadline=None)
    @given(
        turns=st.lists(st.tuples(st.one_of(st.none(), keys),
                                 st.integers(0, 8)), max_size=16),
        # unique (key, ts) per state row: with duplicates the winner
        # among equal-ts states is an explicit tiebreaker's job (covered
        # by test_strict_mode_excludes_equal_ts), not the kernel's
        states=st.lists(
            st.tuples(keys, st.integers(0, 8),
                      st.one_of(st.none(), st.floats(-5, 5, width=32)),
                      st.one_of(st.none(), st.text("xy", max_size=2))),
            max_size=12, unique_by=lambda s: (s[0], s[1])),
        allow_exact=st.booleans(),
        cuts=st.sets(st.integers(0, 27), max_size=12),
    )
    def test_kernel_matches_brute_force(self, turns, states, allow_exact,
                                        cuts):
        got = self._run_kernel(turns, states, allow_exact, cuts)
        want = self._brute(turns, states, allow_exact)
        assert len(got) == len(turns)
        got_map = {}
        for _, r in got.iterrows():
            score = r["state_score"]
            tag = r["state_tag"]
            got_map[int(r["turn_idx"])] = (
                None if pd.isna(score) else float(score),
                None if tag is None or (isinstance(tag, float)
                                        and pd.isna(tag)) else tag)
        want_norm = {i: (None if s is None else float(s), t)
                     for i, (s, t) in want.items()}
        assert got_map == want_norm


class TestAsofTolerance:
    """pd.merge_asof(tolerance=...) parity: the staleness bound."""

    @pytest.mark.parametrize("direction", ["backward", "forward",
                                           "nearest"])
    @pytest.mark.parametrize("tol_s", [1.0, 90.0, 3600.0])
    def test_matches_pandas_tolerance(self, spark, small, direction,
                                      tol_s):
        turns, state, turns_pd, state_pd = small
        # equal-(conv_id, ts) duplicate state rows are tiebreaker
        # territory (covered separately) — dedup keeps this about the
        # tolerance rule, same convention as the direction parity test
        sp2 = (state_pd.sort_values("state_score")
               .drop_duplicates(["conv_id", "ts"], keep="last")
               .reset_index(drop=True))
        got = _collect_sorted(asof_join(
            spark.createDataFrame(turns_pd),
            spark.createDataFrame(sp2), state_cols=["state_score"],
            direction=direction, tolerance=tol_s))
        t = turns_pd.sort_values(["ts", "conv_id"]).reset_index(drop=True)
        s = sp2.sort_values(["ts", "conv_id"]).reset_index(drop=True)
        exp = pd.merge_asof(
            t, s[["conv_id", "ts", "state_score"]], on="ts",
            by="conv_id", direction=direction,
            tolerance=pd.Timedelta(seconds=tol_s)) \
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        _assert_frames_match(got, exp, ["state_score"])

    def test_tolerance_inclusive_boundary(self, spark):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        turns = spark.createDataFrame(
            [("c", 0, t0 + dt.timedelta(seconds=10))],
            "conv_id string, turn_idx long, ts timestamp")
        state = spark.createDataFrame(
            [("c", t0, 1.0)],
            "conv_id string, ts timestamp, state_score double")
        # state is exactly 10s old: tolerance 10 keeps it, 9.999 drops
        keep = asof_join(turns, state, state_cols=["state_score"],
                         tolerance=10.0).collect()[0]
        assert keep.state_score == 1.0
        drop = asof_join(turns, state, state_cols=["state_score"],
                         tolerance=9.999).collect()[0]
        assert drop.state_score is None

    def test_tolerance_contract_errors(self, spark, small):
        turns, state, _, _ = small
        with pytest.raises(ValueError, match="mode='window'"):
            asof_join(turns, state, state_cols=["state_score"],
                      mode="merge", tolerance=5.0)
        with pytest.raises(ValueError, match=">= 0"):
            asof_join(turns, state, state_cols=["state_score"],
                      tolerance=-1.0)

    def test_salted_tolerance_equals_unsalted(self, spark, small):
        turns, state, _, _ = small
        a = _collect_sorted(asof_join(
            turns, state, state_cols=["state_score"], tolerance=60.0))
        b = _collect_sorted(asof_join(
            turns, state, state_cols=["state_score"], tolerance=60.0,
            hot_keys=["mega"], salt_buckets=4))
        _assert_frames_match(a, b, ["state_score"])
