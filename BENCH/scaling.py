"""Throughput-scaling evidence: same job, same input, N vs 4N cores.

The north rule requires >=0.8 throughput scaling efficiency between N
and 4N executors; in this sandbox (single machine, no real cluster) the
sanctioned stand-in is local[8] vs local[32] — each run is a fresh JVM
subprocess so nothing is shared or cached between parallelism levels.

Workload: the flagship point-in-time pipeline (as-of join + lag +
backfill + sessionization + Aloha-style hashed sparse feature vectors)
over a deterministic synthetic transcript table (~TURNS turns incl. one
mega-conversation) pre-materialized to parquet, with state attached via
the salted as-of path for the mega key.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python BENCH/scaling.py [--turns 2000000] [--levels 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = textwrap.dedent("""
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession, functions as F

    cpus = int(sys.argv[1])
    data_dir = sys.argv[2]
    spark = (SparkSession.builder.master(f"local[{{cpus}}]")
             .appName(f"scaling-{{cpus}}")
             .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
             .config("spark.default.parallelism", str(max(2 * cpus, 8)))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    from aloha_spark.operators.asof import asof_join
    from aloha_spark.operators.windows import (
        with_backfill, with_lag_lead, with_session_id, with_ts_delta)
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec

    turns = spark.read.parquet(f"{{data_dir}}/turns")
    state = spark.read.parquet(f"{{data_dir}}/state")
    n = turns.count()

    def pipeline():
        x = asof_join(turns, state, on="ts", by="conv_id",
                      state_cols=["state_score", "state_tag"],
                      hot_keys=["mega"], salt_buckets=8,
                      num_partitions=max(2 * cpus, 8))
        x = with_lag_lead(x, ["text"], order=("turn_idx",), lead=False)
        x = with_backfill(x, ["tool"], order=("turn_idx",))
        x = with_ts_delta(x, order=("turn_idx",))
        x = with_session_id(x, gap_seconds=1800.0, order=("turn_idx",))
        spec = PipelineSpec.from_json({{
            "features": [
                {{"name": "role", "spec": "ind(${{role}})"}},
                {{"name": "tool", "spec": "ind(${{last_tool}})"}},
                {{"name": "bow", "spec": "bag(${{text}})"}},
                {{"name": "dt", "spec": "clamp(${{dt_prev_sec:-0}}, 0, 86400)"}},
                {{"name": "dt_bin", "spec": "sos2U(${{dt_prev_sec}}, 0, 7200, 600)"}},
                {{"name": "state", "spec": "${{state_score:-0}}"}},
            ], "namespaces": {{}}, "numBits": 18}})
        pipe = FeaturePipeline(spec)
        return pipe.to_sparse_vectors(
            x, keep_cols=["conv_id", "turn_idx", "session_id"])

    # warm-up (JIT, python workers) on a slice
    pipeline().limit(50000).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    pipeline().write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(json.dumps({{"cpus": cpus, "rows": n, "wall_sec": round(wall, 2),
                       "rows_per_sec": round(n / wall, 1)}}))
    spark.stop()
""")

GENERATOR = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from aloha_spark.data.transcripts import make_state, make_transcripts

    turns_n = int(sys.argv[1]); out = sys.argv[2]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    n_convs = max(100, turns_n // 100)
    mega = turns_n // 20          # 5% of rows in one conversation
    per_conv = (turns_n - mega) // n_convs
    t = make_transcripts(spark, n_convs=n_convs, turns_per_conv=per_conv,
                         mega_turns=mega, partitions=64)
    t.write.mode("overwrite").parquet(f"{{out}}/turns")
    make_state(spark, spark.read.parquet(f"{{out}}/turns"),
               future_rows=True).write.mode("overwrite").parquet(f"{{out}}/state")
    spark.stop()
""")


def run(cmd):
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"subprocess failed: {cmd}")
    return [line for line in out.stdout.strip().splitlines()
            if line.startswith("{")][-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    assert len(levels) == 2 and levels[1] == 4 * levels[0], \
        "levels must be N,4N"

    data_dir = args.data_dir or os.path.join(
        tempfile.gettempdir(), f"aloha_scaling_{args.turns}")
    if not os.path.exists(os.path.join(data_dir, "state")):
        print(f"generating {args.turns} synthetic turns -> {data_dir} ...",
              file=sys.stderr)
        gen = GENERATOR.format(repo=REPO)
        subprocess.run([sys.executable, "-c", gen, str(args.turns), data_dir],
                       check=True)

    runner = RUNNER.format(repo=REPO)
    results = []
    for cpus in levels:
        print(f"running local[{cpus}] ...", file=sys.stderr)
        line = run([sys.executable, "-c", runner, str(cpus), data_dir])
        results.append(json.loads(line))
        print(line, file=sys.stderr)

    n_res, n4_res = results
    eff = (n4_res["rows_per_sec"] / n_res["rows_per_sec"]) / (
        levels[1] // levels[0])
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "N": {"cpus": levels[0], **n_res},
        "4N": {"cpus": levels[1], **n4_res},
        "rows": n_res["rows"],
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE — throughput + N->4N scaling evidence

Workload: flagship point-in-time pipeline — salted as-of join (hot key
`mega`, 8 salt buckets) + lag/backfill/Δt/sessionization windows +
Aloha-style hashed sparse feature vectors (murmur stringHash, 18-bit) —
over {n_res['rows']:,} deterministic synthetic transcript turns
(5% in one mega-conversation; state table with future rows excluded by
the zero-leakage merge).  Each level is a fresh JVM (`local[N]`), timed
after a warm-up pass, materialized via the noop sink.

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[{levels[0]}] (N) | {n_res['wall_sec']} | {n_res['rows_per_sec']:,} |
| local[{levels[1]}] (4N) | {n4_res['wall_sec']} | {n4_res['rows_per_sec']:,} |

**Scaling efficiency (throughput_4N / (4 x throughput_N)) =
{eff:.3f}** (target >= 0.8, north rule).

Reference sanity bar (BASELINE.md): warmed single-JVM Scala library ~
1.2e5 rows/sec on 5 threads; this pipeline does
{n4_res['rows_per_sec']:,.0f} rows/sec end-to-end (including the as-of
join and all window shuffles, not just featurization).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
