"""Hypothesis fuzz for the interval join: generated points are biased
onto the exact places the binned rewrite could get wrong — interval
endpoints (inclusive boundary) and bin-edge timestamps — and every
example is checked against the naive non-equi join."""

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from aloha_spark.operators.intervals import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=int(sec))


@st.composite
def scenario(draw):
    width = draw(st.sampled_from([7, 30, 60, 300]))
    n_iv = draw(st.integers(1, 12))
    ivrows = []
    for i in range(n_iv):
        s = draw(st.integers(0, 1200))
        length = draw(st.sampled_from([0, 1, width - 1, width,
                                       width + 1, 3 * width, 500]))
        ivrows.append((i, draw(st.integers(0, 2)), s, s + length))
    n_pts = draw(st.integers(1, 40))
    prows = []
    for i in range(n_pts):
        kind = draw(st.integers(0, 3))
        if kind == 0 and ivrows:          # exactly on an endpoint
            iv = draw(st.sampled_from(ivrows))
            t = draw(st.sampled_from([iv[2], iv[3]]))
        elif kind == 1:                   # exactly on a bin edge
            t = width * draw(st.integers(0, 1700 // width))
        elif kind == 2 and ivrows:        # one off an endpoint
            iv = draw(st.sampled_from(ivrows))
            t = max(0, iv[2] + draw(st.sampled_from([-1, 1])))
        else:
            t = draw(st.integers(0, 1700))
        prows.append((i, draw(st.integers(0, 2)), t))
    return width, prows, ivrows


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(scenario())
def test_interval_join_matches_naive_fuzz(spark, case):
    width, prows, ivrows = case
    pts = spark.createDataFrame(
        pd.DataFrame([(i, u, _ts(t)) for i, u, t in prows],
                     columns=["pid", "user_id", "ts"]))
    ivs = spark.createDataFrame(
        pd.DataFrame([(i, u, _ts(s), _ts(e)) for i, u, s, e in ivrows],
                     columns=["iv_id", "user_id", "start_ts", "end_ts"]))
    got = {(r.pid, r.iv_id) for r in interval_join(
        pts, ivs, on=["user_id"], bin_width_seconds=width).collect()}
    want = {(pid, ivid)
            for pid, pu, pt in prows
            for ivid, iu, s, e in ivrows
            if pu == iu and s <= pt <= e}
    assert got == want, (width, sorted(got ^ want))
