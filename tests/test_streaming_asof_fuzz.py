"""Property-fuzz the streaming as-of update function
(streaming/asof.py::_make_update_fn) against a brute-force oracle.

The operator's hard invariants:
* ZERO temporal leakage — a state row dated after a turn is never
  chosen, no matter which micro-batch either arrives in;
* visibility — a turn binds the latest state with ts <= (or < when
  strict) its own ts among the states that ARRIVED in the same or an
  earlier micro-batch (the Flink temporal-join arrival contract);
* the strict/exact tie rule holds both within a batch (processing
  order) and across batches (buffer bisect side).

Events are randomly assigned to micro-batches and the per-batch group
frame is randomly split into Arrow-style chunks, so every batch
boundary and chunk boundary is a chance for the buffer carry to leak,
drop, or mis-order state.  Pure pandas (a fake GroupState), so 300
examples run in seconds; the Spark integration of the same function is
pinned in tests/test_streaming_asof.py.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from aloha_spark.streaming.asof import _make_update_fn


class FakeGroupState:
    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self._val = None

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ts):
        pass


TURN_COLS = ["turn_idx"]
STATE_COLS = ["score"]


def _run(events, allow_exact, chunk_cuts, buffer_size=64):
    """events: list of (batch, key, ts_sec, kind, payload) where kind is
    'turn' (payload=turn_idx) or 'state' (payload=score)."""
    fn = _make_update_fn("conv_id", "ts", TURN_COLS, STATE_COLS,
                         allow_exact, buffer_size, None)
    states: dict = {}
    got = {}
    n_batches = max((e[0] for e in events), default=-1) + 1
    for b in range(n_batches):
        by_key: dict = {}
        for (eb, k, ts, kind, payload) in events:
            if eb != b:
                continue
            by_key.setdefault(k, []).append(
                {"conv_id": k, "ts": pd.Timestamp(ts, unit="s"),
                 "_side": 1 if kind == "turn" else 0,
                 "turn_idx": payload if kind == "turn" else None,
                 "score": float(payload) if kind == "state" else None})
        for k, rows in by_key.items():
            pdf = pd.DataFrame(rows)
            # split into arbitrary chunks — groups arrive as several
            # Arrow chunks in arbitrary order; the fn must reassemble
            cuts = sorted({c for c in chunk_cuts if 0 < c < len(pdf)})
            edges = [0] + cuts + [len(pdf)]
            chunks = [pdf.iloc[a:b2].reset_index(drop=True)
                      for a, b2 in zip(edges, edges[1:])]
            st_obj = states.setdefault(k, FakeGroupState())
            for out in fn((k,), iter(chunks), st_obj):
                for _, r in out.iterrows():
                    got[int(r["turn_idx"])] = (
                        None if pd.isna(r["score"]) else float(r["score"]))
    return got


def _oracle(events, allow_exact):
    """Latest arrived-in-time state at-or-before (strictly-before when
    strict) each turn's ts.  State ts are unique per key, so no
    same-ts-state tiebreak is needed."""
    want = {}
    for (tb, tk, tts, kind, tpay) in events:
        if kind != "turn":
            continue
        best = None
        for (sb, sk, sts, kind2, spay) in events:
            if kind2 != "state" or sk != tk or sb > tb:
                continue
            if sts < tts or (allow_exact and sts == tts):
                if best is None or sts > best[0]:
                    best = (sts, float(spay))
        want[tpay] = None if best is None else best[1]
    return want


class TestStreamingAsofFuzz:
    events = st.lists(
        st.tuples(st.integers(0, 3),              # micro-batch
                  st.sampled_from(["a", "b"]),    # conv key
                  st.integers(0, 9),              # ts (seconds)
                  st.sampled_from(["turn", "state"]),
                  st.integers(0, 99)),            # payload
        max_size=18)

    @settings(max_examples=300, deadline=None)
    @given(events=events, allow_exact=st.booleans(),
           chunk_cuts=st.sets(st.integers(0, 17), max_size=6))
    def test_matches_arrival_oracle(self, events, allow_exact,
                                    chunk_cuts):
        # make turn payloads unique (they key the result map) and state
        # (key, ts) unique (equal-ts state winners are an arrival-order
        # concern covered separately)
        uniq, seen_t, seen_s = [], set(), set()
        for i, (b, k, ts, kind, pay) in enumerate(events):
            if kind == "turn":
                uniq.append((b, k, ts, kind, i))
                seen_t.add(i)
            elif (k, ts) not in seen_s:
                uniq.append((b, k, ts, kind, pay))
                seen_s.add((k, ts))
        got = _run(uniq, allow_exact, chunk_cuts)
        want = _oracle(uniq, allow_exact)
        assert got == want

    @settings(max_examples=60, deadline=None)
    @given(events=events, chunk_cuts=st.sets(st.integers(0, 17),
                                             max_size=6))
    def test_never_binds_future_state(self, events, chunk_cuts):
        """Leakage probe independent of the oracle: inject a poison
        state far in the future of every turn; it must never bind.
        The sentinel payload sits OUTSIDE the generated payload domain
        (0-99) so a legitimate state can never collide with it."""
        POISON = 10_000.0
        poisoned = [(b, k, ts, kind, pay)
                    for (b, k, ts, kind, pay) in events] + \
                   [(0, "a", 10_000, "state", POISON),
                    (0, "b", 10_000, "state", POISON)]
        uniq, seen_s = [], set()
        for i, (b, k, ts, kind, pay) in enumerate(poisoned):
            if kind == "turn":
                uniq.append((b, k, ts, kind, i))
            elif (k, ts) not in seen_s:
                uniq.append((b, k, ts, kind, pay))
                seen_s.add((k, ts))
        got = _run(uniq, True, chunk_cuts)
        assert POISON not in got.values()
