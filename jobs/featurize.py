"""spark-submit entry point: point-in-time featurization job.

Usage:
    spark-submit --py-files aloha_spark.zip jobs/featurize.py \
        --turns <path> --state <path> --out <path> --lineage <path> \
        --spec <spec.json> [--format parquet|iceberg] \
        [--hot-key-threshold 1000000] [--salt-buckets 16] \
        [--num-buckets 256]

Resume is implicit: buckets already recorded in the lineage table are
skipped on re-run (delete the lineage path to force a full rewrite).

Config is the spec JSON — the pipeline keeps the reference's "models
are messages" property (reference README.md:25): the same job binary
serves any feature set by swapping the external spec document.

Build the zip:  cd <repo> && zip -r aloha_spark.zip aloha_spark
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--turns", required=True)
    p.add_argument("--state", required=False)
    p.add_argument("--out", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--spec", required=True, help="feature-spec JSON path")
    p.add_argument("--format", default="parquet")
    p.add_argument("--state-cols", default=None,
                   help="comma list; default = all non-key state columns")
    p.add_argument("--by", default="conv_id")
    p.add_argument("--on", default="ts")
    p.add_argument("--order", default="turn_idx")
    p.add_argument("--gap-seconds", type=float, default=1800.0)
    p.add_argument("--hot-key-threshold", type=int, default=None)
    p.add_argument("--salt-buckets", type=int, default=16)
    p.add_argument("--asof-tolerance", type=float, default=None,
                   help="staleness bound in seconds: state older than "
                        "this yields NULL state columns instead of "
                        "decorating the turn (pd.merge_asof tolerance "
                        "semantics, inclusive)")
    p.add_argument("--num-buckets", type=int, default=256)
    p.add_argument("--group-size", type=int, default=32)
    p.add_argument("--repair", action="store_true",
                   help="with --verify: evict mismatching buckets from "
                        "the lineage table and rewrite them, then "
                        "re-verify")
    p.add_argument("--verify", action="store_true",
                   help="after writing, recompute per-bucket stats from "
                        "the data and diff against the lineage table "
                        "(verify_lineage); non-zero exit on mismatch")
    p.add_argument("--output", choices=["sparse", "vw", "libsvm", "multi"],
                   default="sparse",
                   help="'multi' = S14 fan-out: one cached featurized "
                        "upstream written through all three sinks")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv or sys.argv[1:])

    from pyspark.sql import SparkSession

    from aloha_spark.operators.asof import asof_join
    from aloha_spark.operators.windows import (
        with_backfill, with_lag_lead, with_session_id, with_ts_delta)
    from aloha_spark.plans.lineage import write_with_lineage
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    from aloha_spark.sources.tables import read_table
    from aloha_spark.tuning import arrow_batch_rows, worker_channel_confs

    spark = (SparkSession.builder.appName("aloha-spark-featurize")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             # straggler mitigation on real clusters: every stage here
             # is idempotent (deterministic transforms + noop/overwrite
             # bucket writes gated by the lineage table), so a
             # speculative duplicate of a stuck task is always safe.
             # Quantile 0.9 + multiplier 3 only relaunches the long
             # tail (e.g. a host with the kernel-preemption episodes
             # documented in BENCH/BASELINE.md); no-op under local[N].
             .config("spark.speculation", "true")
             .config("spark.speculation.quantile", "0.9")
             .config("spark.speculation.multiplier", "3")
             .config(map=worker_channel_confs())
             .getOrCreate())
    # width known only now (spark-submit --master decides): Arrow batch
    # size is a runtime conf, sized per aloha_spark/tuning.py
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        str(arrow_batch_rows(spark.sparkContext.defaultParallelism)))

    t0 = time.time()
    with open(args.spec) as f:
        spec = PipelineSpec.from_json(f.read())
    pipe = FeaturePipeline(spec)

    turns = read_table(spark, args.turns, args.format)
    # turn-side windows FIRST (narrow frame, one exchange serves all
    # four specs), then the as-of join — see aloha_spark/plans/flagship.py
    x = with_lag_lead(turns, ["text"], by=args.by, order=(args.order,),
                      lead=False)
    x = with_backfill(x, ["tool"], by=args.by, order=(args.order,))
    x = with_ts_delta(x, ts=args.on, by=args.by, order=(args.order,))
    x = with_session_id(x, ts=args.on, by=args.by, order=[args.order],
                        gap_seconds=args.gap_seconds)
    if args.state:
        state = read_table(spark, args.state, args.format)
        state_cols = (args.state_cols.split(",") if args.state_cols else None)
        x = asof_join(x, state, on=args.on, by=args.by,
                      state_cols=state_cols,
                      hot_key_threshold=args.hot_key_threshold,
                      salt_buckets=args.salt_buckets,
                      tolerance=args.asof_tolerance)

    keep = [args.by, args.order, args.on]
    # featurization is row-local; rebalance away from conv-hash
    # partitioning so skewed conversations don't serialize one task
    x = x.repartition(int(spark.sparkContext.defaultParallelism) * 2)
    if args.output == "multi":
        # S14 fan-out (datasetCli.scala:84-124 analog): compute the
        # windowed+joined upstream ONCE (persist), then run each sink's
        # featurize+format over it — one pass over the expensive stages,
        # three output datasets with independent lineage tables
        x = x.persist()
        reports = {}
        for sink_name, fn in (("sparse", pipe.to_sparse_vectors),
                              ("vw", pipe.to_vw_lines),
                              ("libsvm", pipe.to_libsvm_lines)):
            out = fn(x, keep_cols=keep)
            reports[sink_name] = write_with_lineage(
                out, f"{args.out}/{sink_name}",
                f"{args.lineage}/{sink_name}", key=args.by, ts_col=args.on,
                num_buckets=args.num_buckets, group_size=args.group_size)
        x.unpersist()
        result = {
            "sinks": {k: {"written_buckets": len(r.written_buckets),
                          "skipped_buckets": len(r.skipped_buckets),
                          "groups": r.groups} for k, r in reports.items()},
            "wall_sec": round(time.time() - t0, 1),
        }
        if args.verify:
            from aloha_spark.plans.lineage import repair, verify_lineage
            total_bad = 0
            for sink_name in reports:
                o, ln = f"{args.out}/{sink_name}", f"{args.lineage}/{sink_name}"
                bad_rows = verify_lineage(spark, o, ln,
                                          ts_col=args.on).collect()
                result["sinks"][sink_name]["lineage_mismatches"] =                     len(bad_rows)
                if bad_rows and args.repair:
                    repair(spark, ln, [r[0] for r in bad_rows])
                    # note: repairing a sink re-featurizes its buckets
                    fn = {"sparse": pipe.to_sparse_vectors,
                          "vw": pipe.to_vw_lines,
                          "libsvm": pipe.to_libsvm_lines}[sink_name]
                    write_with_lineage(
                        fn(x, keep_cols=keep), o, ln, key=args.by,
                        ts_col=args.on, num_buckets=args.num_buckets,
                        group_size=args.group_size)
                    bad_rows = verify_lineage(spark, o, ln,
                                              ts_col=args.on).collect()
                    result["sinks"][sink_name][
                        "lineage_mismatches_after_repair"] = len(bad_rows)
                total_bad += len(bad_rows)
            print(json.dumps(result))
            spark.stop()
            sys.exit(1 if total_bad else 0)
        print(json.dumps(result))
        spark.stop()
        return
    if args.output == "sparse":
        out = pipe.to_sparse_vectors(x, keep_cols=keep)
    elif args.output == "vw":
        out = pipe.to_vw_lines(x, keep_cols=keep)
    else:
        out = pipe.to_libsvm_lines(x, keep_cols=keep)

    report = write_with_lineage(
        out, args.out, args.lineage, key=args.by, ts_col=args.on,
        num_buckets=args.num_buckets, group_size=args.group_size)
    result = {
        "written_buckets": len(report.written_buckets),
        "skipped_buckets": len(report.skipped_buckets),
        "groups": report.groups,
        "wall_sec": round(time.time() - t0, 1),
    }
    if args.verify:
        from aloha_spark.plans.lineage import repair, verify_lineage
        bad_rows = verify_lineage(spark, args.out, args.lineage,
                                  ts_col=args.on).collect()
        result["lineage_mismatches"] = len(bad_rows)
        if bad_rows and args.repair:
            bad_ids = [r[0] for r in bad_rows]
            repair(spark, args.lineage, bad_ids)
            rep = write_with_lineage(
                out, args.out, args.lineage, key=args.by, ts_col=args.on,
                num_buckets=args.num_buckets, group_size=args.group_size)
            result["repaired_buckets"] = len(rep.written_buckets)
            bad_rows = verify_lineage(spark, args.out, args.lineage,
                                      ts_col=args.on).collect()
            result["lineage_mismatches_after_repair"] = len(bad_rows)
        print(json.dumps(result))
        spark.stop()
        sys.exit(1 if bad_rows else 0)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
