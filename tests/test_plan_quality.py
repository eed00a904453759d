"""Physical-plan quality gates: the 100 TB story in assertions.

These verify the *shape* of the plans, not just results:
* parquet scans prune columns and push filters down
* small dimensions broadcast (no shuffle join for orders x nation)
* the as-of window mode contains NO Python stage and exactly one
  exchange for the union; downstream same-key windows reuse it
* decision trees compile to CASE WHEN (no UDF)
"""

import re

import pytest
from pyspark.sql import functions as F


def _plan(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def test_scan_prunes_and_pushes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") <= "1998-09-01") \
          .select("l_returnflag", "l_quantity")
    plan = _plan(q)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"l_returnflag", "l_quantity", "l_shipdate"}
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan


def test_broadcast_join_is_broadcast(spark, sf_dir):
    import __spark_entry__ as em
    plan = _plan(em.q_broadcast_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_window_mode_is_jvm_only(spark):
    from aloha_spark.data.transcripts import make_state, make_transcripts
    from aloha_spark.operators.asof import asof_join
    turns = make_transcripts(spark, n_convs=5, turns_per_conv=5)
    state = make_state(spark, turns)
    out = asof_join(turns, state, state_cols=["state_score"])
    plan = _plan(out, "simple")
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Window") >= 1


def test_asof_plus_windows_reuse_exchange(spark):
    """The as-of union window and the turn-feature windows partition by
    the same key: the plan must not add an exchange per window."""
    from aloha_spark.data.transcripts import make_state, make_transcripts
    from aloha_spark.operators.asof import asof_join
    from aloha_spark.operators.windows import with_backfill, with_lag_lead
    turns = make_transcripts(spark, n_convs=5, turns_per_conv=5)
    state = make_state(spark, turns)
    base = asof_join(turns, state, state_cols=["state_score"])
    one = with_lag_lead(base, ["text"], order=("turn_idx",), lead=False)
    two = with_backfill(one, ["tool"], order=("turn_idx",))
    n_base = _plan(base, "simple").count("Exchange hashpartitioning")
    n_one = _plan(one, "simple").count("Exchange hashpartitioning")
    n_two = _plan(two, "simple").count("Exchange hashpartitioning")
    # the turn windows partition by the same key as the as-of union
    # window: no additional shuffle may appear per window
    assert n_one == n_base, (n_base, n_one)
    assert n_two == n_one, (n_one, n_two)


def test_tree_is_case_when_not_udf(spark):
    from aloha_spark.plans.models import apply_model
    df = spark.createDataFrame([(1.0,)], "a double")
    m = {"modelType": "DecisionTree", "returnBest": True,
         "nodes": [{"id": 0, "value": 0.0,
                    "selector": {"predicates": ["${a} > 0"]},
                    "children": [1]},
                   {"id": 1, "value": 1.0}]}
    plan = _plan(apply_model(df, m, "leaf"), "simple")
    assert "CASE WHEN" in plan
    assert "Python" not in plan


def test_column_tier_features_stay_jvm(spark):
    """Scalar specs must precompute JVM-side (visible as Project
    expressions), only bag features go through Python."""
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    df = spark.createDataFrame([(1.0,)], "v double")
    spec = PipelineSpec.from_json({
        "features": [{"name": "x", "spec": "clamp(${v}, 0, 10) * 2"}],
        "namespaces": {}})
    pipe = FeaturePipeline(spec)
    pre = pipe._with_precomputed(df)
    plan = _plan(pre, "simple")
    assert "least" in plan and "greatest" in plan
