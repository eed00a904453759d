"""Interval (range) join: parity with a naive non-equi join, boundary
semantics, exactly-once pairing, guards, and session-interval
composition."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aloha_spark.operators.intervals import (interval_join,
                                             sessionize_intervals)

T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _points(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "user_id", "ts"]))


def _ivs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["iv_id", "user_id", "start_ts",
                                    "end_ts"]))


def _naive(prows, ivrows, keyed=True):
    out = set()
    for pid, pu, pt in prows:
        for ivid, iu, s, e in ivrows:
            if keyed and pu != iu:
                continue
            if s <= pt <= e:
                out.add((pid, ivid))
    return out


@pytest.mark.parametrize("seed,width", [(1, 10), (2, 60), (3, 7)])
def test_matches_naive_join(spark, seed, width):
    rng = random.Random(seed)
    prows = [(i, rng.randrange(4), _ts(rng.randrange(0, 2000)))
             for i in range(120)]
    ivrows = []
    for i in range(40):
        s = rng.randrange(0, 2000)
        ivrows.append((i, rng.randrange(4), _ts(s),
                       _ts(s + rng.randrange(0, 300))))
    got = interval_join(_points(spark, prows), _ivs(spark, ivrows),
                        on=["user_id"], bin_width_seconds=width) \
        .select("pid", "iv_id").collect()
    pairs = {(r.pid, r.iv_id) for r in got}
    assert len(got) == len(pairs)          # exactly-once, no dup pairs
    assert pairs == _naive(prows, ivrows)


def test_inclusive_boundaries_and_bin_edges(spark):
    # points exactly on interval endpoints AND on bin boundaries
    prows = [(0, 1, _ts(300)), (1, 1, _ts(600)), (2, 1, _ts(599)),
             (3, 1, _ts(601)), (4, 1, _ts(0))]
    ivrows = [(0, 1, _ts(300), _ts(600))]
    got = {r.pid for r in interval_join(
        _points(spark, prows), _ivs(spark, ivrows), on=["user_id"],
        bin_width_seconds=300).collect()}
    assert got == {0, 1, 2}


def test_empty_interval_and_null_ts(spark):
    prows = [(0, 1, _ts(50)), (1, 1, None)]
    ivrows = [(0, 1, _ts(100), _ts(40)),      # end < start: matches none
              (1, 1, None, _ts(200)),         # NULL start: matches none
              (2, 1, _ts(0), _ts(100))]
    got = [(r.pid, r.iv_id) for r in interval_join(
        _points(spark, prows), _ivs(spark, ivrows),
        on=["user_id"]).collect()]
    assert got == [(0, 2)]


def test_left_join_keeps_unmatched(spark):
    prows = [(0, 1, _ts(50)), (1, 2, _ts(50))]
    ivrows = [(0, 1, _ts(0), _ts(100))]
    got = {r.pid: r.iv_id for r in interval_join(
        _points(spark, prows), _ivs(spark, ivrows), on=["user_id"],
        how="left").collect()}
    assert got == {0: 0, 1: None}


def test_no_keys_pure_time_join(spark):
    prows = [(0, 1, _ts(50)), (1, 2, _ts(500))]
    ivrows = [(0, 9, _ts(0), _ts(100))]
    got = {(r.pid, r.iv_id) for r in interval_join(
        _points(spark, prows),
        _ivs(spark, ivrows).drop("user_id")).collect()}
    assert got == {(0, 0)}


def test_overlong_interval_raises(spark):
    from py4j.protocol import Py4JJavaError
    prows = [(0, 1, _ts(50))]
    ivrows = [(0, 1, _ts(0), _ts(10 ** 6))]
    with pytest.raises(Exception, match="spans too many bins") as ei:
        interval_join(_points(spark, prows), _ivs(spark, ivrows),
                      on=["user_id"], bin_width_seconds=10,
                      max_bins_per_interval=100).collect()
    assert not isinstance(ei.value, Py4JJavaError) or \
        "spans too many bins" in str(ei.value)


def test_column_collision_raises(spark):
    prows = [(0, 1, _ts(50))]
    df = _points(spark, prows)
    iv = df.withColumnRenamed("ts", "start_ts") \
           .withColumn("end_ts", F.col("start_ts"))
    with pytest.raises(ValueError, match="collision"):
        interval_join(df, iv, on=["user_id"])


def test_plan_is_hash_join_not_nested_loop(spark):
    """The whole point: a range predicate alone would compile to
    BroadcastNestedLoopJoin/CartesianProduct; the binned rewrite must
    produce a plain equi hash join."""
    prows = [(i, i % 3, _ts(i)) for i in range(50)]
    ivrows = [(i, i % 3, _ts(10 * i), _ts(10 * i + 30))
              for i in range(10)]
    j = interval_join(_points(spark, prows), _ivs(spark, ivrows),
                      on=["user_id"])
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan


def test_sessionize_intervals_roundtrip(spark):
    rows = [("c1", _ts(0)), ("c1", _ts(100)), ("c1", _ts(5000)),
            ("c2", _ts(10))]
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["conv_id", "ts"]))
    ivs = sessionize_intervals(df, gap_seconds=1800).collect()
    by = {(r.conv_id, r.session_id): r for r in ivs}
    assert len(by) == 3
    s0 = by[("c1", 0)]
    assert (s0.session_start, s0.session_end, s0.n_rows) == \
        (_ts(0), _ts(100), 2)
    assert by[("c1", 1)].n_rows == 1
    # the sessions are a valid intervals side: each original row joins
    # back into exactly its own session
    back = interval_join(
        df.withColumn("pid", F.monotonically_increasing_id()),
        ivs and sessionize_intervals(df, gap_seconds=1800)
        .withColumnRenamed("conv_id", "cid"),
        on=None, point_ts="ts", start_ts="session_start",
        end_ts="session_end", bin_width_seconds=600) \
        .where(F.col("conv_id") == F.col("cid"))
    assert back.count() == 4


def test_stream_static_interval_join(spark, tmp_path):
    """points as a stream, intervals static: same pairs as batch."""
    prows = [(i, i % 3, _ts(i * 7)) for i in range(60)]
    ivrows = [(i, i % 3, _ts(40 * i), _ts(40 * i + 25))
              for i in range(10)]
    src = str(tmp_path / "pts")
    pdf = _points(spark, prows)
    pdf.write.mode("overwrite").parquet(src)

    stream_pts = (spark.readStream.schema(pdf.schema).parquet(src))
    out = interval_join(stream_pts, _ivs(spark, ivrows),
                        on=["user_id"], bin_width_seconds=30)
    q = (out.writeStream.format("memory").queryName("sij")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.pid, r.iv_id)
           for r in spark.sql("select pid, iv_id from sij").collect()}
    want = {(r.pid, r.iv_id) for r in interval_join(
        pdf, _ivs(spark, ivrows), on=["user_id"],
        bin_width_seconds=30).collect()}
    assert got == want and len(want) > 0


def test_left_join_null_payload_no_duplicates(spark):
    """A matched point carrying a NULL payload column must not be
    re-emitted as unmatched (the anti-join is null-safe)."""
    prows = pd.DataFrame(
        [(0, 1, _ts(50), None), (1, 1, _ts(50), "m"),
         (2, 1, _ts(5000), None)],
        columns=["pid", "user_id", "ts", "meta"])
    ivs = _ivs(spark, [(0, 1, _ts(0), _ts(100))])
    got = interval_join(spark.createDataFrame(prows), ivs,
                        on=["user_id"], how="left").toPandas()
    assert len(got) == 3
    by_pid = got.set_index("pid").iv_id
    assert by_pid[0] == 0 and by_pid[1] == 0
    assert pd.isna(by_pid[2])


def test_semi_and_anti_window_filtering(spark):
    """left_semi keeps each in-window point exactly once (even inside
    overlapping intervals); left_anti is the exact complement and keeps
    NULL-ts points."""
    prows = [(0, 1, _ts(50)), (1, 1, _ts(55)), (2, 1, _ts(500)),
             (3, 2, _ts(50)), (4, 1, None)]
    ivrows = [(0, 1, _ts(0), _ts(100)), (1, 1, _ts(40), _ts(60))]
    pts, ivs = _points(spark, prows), _ivs(spark, ivrows)
    semi = interval_join(pts, ivs, on=["user_id"], how="left_semi")
    anti = interval_join(pts, ivs, on=["user_id"], how="left_anti")
    assert sorted(r.pid for r in semi.collect()) == [0, 1]
    assert set(semi.columns) == {"pid", "user_id", "ts"}
    assert sorted(r.pid for r in anti.collect()) == [2, 3, 4]
    # plan stays a hash join (the residual rides the join condition)
    plan = semi._sc._jvm.PythonSQLUtils.explainString(
        semi._jdf.queryExecution(), "simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
