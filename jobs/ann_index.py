"""spark-submit entry point: build a persistable ANN index artifact
(operators/ann_index.py) over an embedding table — the offline half of
the build-once/query-many contract.

    spark-submit --master ... --py-files aloha_spark.zip \
        jobs/ann_index.py \
        --corpus /data/embeddings.parquet --out /data/ann_idx \
        --n-centroids 4096 --m-sub 16 --ksub 256 \
        [--id-col vec_id --vec-col embedding --train-sample 262144]

Prints ONE JSON line: the published meta plus a cell-occupancy summary
(min/median/max rows per cell) — skewed occupancy is the thing to watch
before pointing query traffic at an index (a hot cell turns every probe
that hits it into a big scan).

Sizing at 10^11 vectors: n_centroids ~ sqrt(N) keeps cells ~sqrt(N)
rows; m_sub * ksub bounds the ADC table; train_sample stays
driver-sized (the k-means fit is a driver-side numpy pass over the
deterministic xxhash64 sample, not a distributed job).
"""

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--n-centroids", type=int, default=16)
    p.add_argument("--m-sub", type=int, default=0,
                   help="PQ subspaces (0 = IVF only, no codes)")
    p.add_argument("--ksub", type=int, default=16)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--train-sample", type=int, default=4096)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession, functions as F

    from aloha_spark.operators.ann_index import build_ann_index
    from aloha_spark.sources.tables import read_table
    from aloha_spark.tuning import worker_channel_confs

    embedded = SparkSession.getActiveSession() is not None
    spark = (SparkSession.builder.appName("aloha-spark-ann-index")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.adaptive.enabled", "true")
             .config(map=worker_channel_confs())
             .getOrCreate())

    t0 = time.time()
    corpus = read_table(spark, args.corpus, args.format)
    idx = build_ann_index(
        corpus, args.out, c_id=args.id_col, c_vec=args.vec_col,
        n_centroids=args.n_centroids, m_sub=args.m_sub, ksub=args.ksub,
        seed=args.seed, train_sample=args.train_sample)
    occ = (idx.corpus().groupBy("cell").count()
           .agg(F.count("*").alias("cells"),
                F.sum("count").alias("rows"),
                F.min("count").alias("min_cell"),
                F.expr("percentile_approx(count, 0.5)").alias("med_cell"),
                F.max("count").alias("max_cell"))
           .first())
    print(json.dumps({
        **idx.meta,
        "path": args.out,
        "cells_used": occ["cells"],
        "rows": occ["rows"],
        "min_cell": occ["min_cell"],
        "median_cell": occ["med_cell"],
        "max_cell": occ["max_cell"],
        "wall_sec": round(time.time() - t0, 1),
    }))
    if not embedded:      # don't tear down a caller's shared session
        spark.stop()


if __name__ == "__main__":
    main()
