"""No-Spark width-scaling probe for the Arrow featurize kernel.

The flagship pipeline's 8->32 scaling gap is attributed (BENCH/
BASELINE.md, BENCH/stage_probe.py) to a width-FLAT Arrow featurize
stage: ~13s of incremental wall at local[8] and at local[32] alike.
Two hypotheses fit that observation:

  (a) engine overhead — the Spark<->Python worker channel, task
      scheduling, or Arrow (de)serialization stops scaling; or
  (b) host ceiling — 32 memory-bound numpy workers on ONE shared DRAM
      bus simply move no more rows/sec than 8.

This probe separates them by removing Spark entirely: it materializes
the featurize stage's exact input once (a single Spark run, then the
JVM exits), slices it into the same-size Arrow record batches the real
stage sees, and drives the IDENTICAL kernel closure
(``FeaturePipeline.make_arrow_kernel`` — the same function object
``mapInArrow`` executes) under plain ``multiprocessing`` fork workers.
No JVM, no channel, no scheduler: if N=32 processes still move no more
rows/sec than N=8, the flat stage is the machine, and hypothesis (a)
is dead.

Batches are COW-shared through fork (loaded before forking), workers
take strided slices (worker i gets batches[i::N]) so each width
processes the same total rows, and widths are interleaved across reps
(8, 32, 8, 32, ...) so both levels sample the same machine state —
this host has documented multi-minute lock-holder-preemption episodes
that would otherwise gate a whole width.

Usage: python BENCH/kernel_probe.py [--rows 2000000] [--cpus 2,8,32]
       [--reps 3] [--batch-rows 0 (= the stage's tuned size)]
Writes BENCH/last_kernel_probe.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def materialize(rows: int, batch_rows: int):
    """One Spark run: build the flagship featurize input and collect it
    as Arrow batches of the production size.  Returns (batches, run)
    where ``run`` is the exact mapInArrow kernel closure."""
    from pyspark.sql import SparkSession

    from aloha_spark.data.transcripts import make_state, make_transcripts
    from aloha_spark.plans.flagship import (
        FLAGSHIP_SPEC, point_in_time_features)
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    from aloha_spark.tuning import arrow_batch_rows, worker_channel_confs

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config(map=worker_channel_confs())
             .getOrCreate())
    n_convs = max(100, rows // 100)
    mega = rows // 100
    per_conv = (rows - mega) // n_convs
    t = make_transcripts(spark, n_convs=n_convs, turns_per_conv=per_conv,
                         mega_turns=mega, partitions=64)
    s = make_state(spark, t, future_rows=True)
    x = point_in_time_features(t, s, state_cols=["state_score"],
                               hot_keys=["mega"], salt_buckets=8)
    pipe = FeaturePipeline(PipelineSpec.from_json(FLAGSHIP_SPEC))
    pre = pipe._with_precomputed(x)
    keep = ["conv_id", "turn_idx", "session_id"]
    run, _schema = pipe.make_arrow_kernel(pre, keep)
    tbl = pre.toArrow()
    spark.stop()
    size = batch_rows or arrow_batch_rows(32)
    batches = tbl.to_batches(max_chunksize=size)
    return batches, run, tbl.num_rows


def _drain(run, batches):
    for _ in run(iter(batches)):
        pass


def run_pass(run, batches, width: int) -> float:
    ctx = multiprocessing.get_context("fork")
    procs = [ctx.Process(target=_drain, args=(run, batches[i::width]))
             for i in range(width)]
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    if any(p.exitcode != 0 for p in procs):
        raise SystemExit("kernel worker crashed")
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--cpus", default="2,8,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch-rows", type=int, default=0)
    args = ap.parse_args()
    widths = [int(c) for c in args.cpus.split(",")]

    batches, run, n_rows = materialize(args.rows, args.batch_rows)
    # warm the page cache / allocator once before timing anything
    _drain(run, batches[:2])

    walls = {w: [] for w in widths}
    for rep in range(args.reps):
        for w in widths:              # interleaved: same machine state
            wall = run_pass(run, batches, w)
            walls[w].append(round(wall, 2))
            print(f"rep{rep} width{w}: {wall:.2f}s "
                  f"({n_rows / wall:,.0f} rows/s)", file=sys.stderr)
    levels = {
        str(w): {
            "procs": w,
            "rows": n_rows,
            "wall_sec": min(ws),
            "rows_per_sec": round(n_rows / min(ws), 1),
            "all_walls": ws,
        } for w, ws in walls.items()
    }
    effs = {}
    for lo, hi in zip(widths, widths[1:]):
        if hi == 4 * lo:
            effs[f"{lo}->{hi}"] = round(
                levels[str(hi)]["rows_per_sec"]
                / (4 * levels[str(lo)]["rows_per_sec"]), 3)
    out = {"metric": "standalone_arrow_kernel_scaling",
           "batch_rows": args.batch_rows or "tuned",
           "levels": levels, "efficiencies": effs}
    with open(os.path.join(REPO, "BENCH", "last_kernel_probe.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
