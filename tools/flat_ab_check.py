"""A/B parity check: flat (dict-free) featurize tier vs the dict tier
over the full flagship spec at sf0.01 — run after touching any kernel
in functions/batch.py or the sink assembly in plans/pipeline.py.

Usage: python tools/flat_ab_check.py   (prints 'mismatches: 0' on pass)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_spark

def main():
    spark = build_spark(8)
    import __spark_entry__ as em
    from aloha_spark.plans.flagship import point_in_time_features, FLAGSHIP_SPEC
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    import numpy as np

    t = em.transcripts_from_events(spark, "/root/testdata/sf0.01")
    s = em.state_from_events(spark, "/root/testdata/sf0.01")
    x = point_in_time_features(t, s, state_cols=["state_score"]).cache()
    pipe_flat = FeaturePipeline(PipelineSpec.from_json(FLAGSHIP_SPEC))
    pipe_dict = FeaturePipeline(PipelineSpec.from_json(FLAGSHIP_SPEC))
    for fp in pipe_dict.plan.features:
        fp.flat_fn = None
    nflat = sum(1 for fp in pipe_flat.plan.features if fp.flat_fn is not None)
    print("flat-compiled features:", nflat)
    a = pipe_flat.to_sparse_vectors(x, keep_cols=["conv_id", "turn_idx"]) \
        .orderBy("conv_id", "turn_idx").toPandas()
    b = pipe_dict.to_sparse_vectors(x, keep_cols=["conv_id", "turn_idx"]) \
        .orderBy("conv_id", "turn_idx").toPandas()
    assert len(a) == len(b)
    mismatch = 0
    for i in range(len(a)):
        if not (np.array_equal(a["indices"][i], b["indices"][i])
                and np.allclose(a["values"][i], b["values"][i])
                and list(a["missing_features"][i])
                == list(b["missing_features"][i])):
            mismatch += 1
    print(f"rows: {len(a)} mismatches: {mismatch}")
    spark.stop()
    sys.exit(1 if mismatch else 0)

if __name__ == "__main__":
    main()
