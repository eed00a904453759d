"""Bucketed transcript tables: the conv_id exchange is paid once at
write time, then window features and per-conversation joins plan with
ZERO Exchange.  Plan-gated (the whole point is the plan shape) plus a
value-equality check against the unbucketed path."""

import pytest
from pyspark.sql import functions as F

from aloha_spark.data.transcripts import make_state, make_transcripts
from aloha_spark.operators.windows import (
    with_backfill, with_lag_lead, with_session_id)
from aloha_spark.sources.bucketed import read_bucketed, write_bucketed


def _plan(df, mode="simple"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


@pytest.fixture()
def bucketed_turns(spark, tmp_path):
    turns = make_transcripts(spark, n_convs=40, turns_per_conv=10)
    write_bucketed(turns, "t_turns_bkt", num_buckets=4,
                   path=str(tmp_path / "turns_bkt"))
    yield read_bucketed(spark, "t_turns_bkt"), turns
    spark.sql("DROP TABLE IF EXISTS t_turns_bkt")


def _feats(df):
    one = with_lag_lead(df, ["text"], order=("turn_idx",))
    two = with_backfill(one, ["tool"], order=("turn_idx",))
    return with_session_id(two)


def test_bucketed_windows_plan_with_zero_exchange(bucketed_turns):
    scan, _ = bucketed_turns
    plan = _plan(_feats(scan))
    assert "Exchange" not in plan, plan
    assert plan.count("Window") >= 1


def test_unbucketed_same_files_do_exchange(spark, bucketed_turns, tmp_path):
    # reading the SAME parquet files without the catalog's bucket spec
    # reintroduces the shuffle — i.e. the gate above is load-bearing
    _ = bucketed_turns
    raw = spark.read.parquet(str(tmp_path / "turns_bkt"))
    assert "Exchange" in _plan(_feats(raw))


def test_bucketed_equals_unbucketed_values(spark, bucketed_turns):
    scan, turns = bucketed_turns
    a = {tuple(r) for r in _feats(scan).collect()}
    b = {tuple(r) for r in _feats(turns).collect()}
    assert a == b


def test_cobucketed_join_is_exchange_free(spark, tmp_path):
    turns = make_transcripts(spark, n_convs=40, turns_per_conv=10)
    state = make_state(spark, turns).withColumnRenamed("ts", "state_ts")
    write_bucketed(turns, "t_j_turns", num_buckets=4,
                   path=str(tmp_path / "jt"))
    write_bucketed(state, "t_j_state", num_buckets=4,
                   sort_by=("conv_id", "state_ts"),
                   path=str(tmp_path / "js"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the gate pins the co-bucketed SMJ shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, "t_j_turns").join(
            read_bucketed(spark, "t_j_state"), "conv_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the join is not vacuous
        assert joined.limit(1).count() == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_j_turns")
        spark.sql("DROP TABLE IF EXISTS t_j_state")


def test_write_produces_one_file_per_bucket(spark, tmp_path):
    turns = make_transcripts(spark, n_convs=40, turns_per_conv=10)
    write_bucketed(turns, "t_files_bkt", num_buckets=4,
                   path=str(tmp_path / "fb"))
    try:
        files = [p for p in (tmp_path / "fb").iterdir()
                 if p.name.endswith(".parquet")]
        # one file per bucket keeps the sortBy order trusted on read
        assert len(files) == 4, sorted(p.name for p in files)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_files_bkt")


def test_bucketize_job_end_to_end(spark, tmp_path):
    from jobs.bucketize import main as bucketize_main

    turns = make_transcripts(spark, n_convs=20, turns_per_conv=5)
    src = str(tmp_path / "turns_src")
    turns.write.parquet(src)
    bucketize_main(["--in", src, "--table", "t_job_bkt",
                    "--path", str(tmp_path / "turns_bkt_job"),
                    "--buckets", "4"])
    try:
        from aloha_spark.sources.tables import read_table
        scan = read_table(spark, "t_job_bkt", "bucketed")
        assert scan.count() == 100
        assert "Exchange" not in _plan(_feats(scan))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_job_bkt")
