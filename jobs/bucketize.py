"""One-time layout job: convert a transcript/state parquet dataset into
a bucketed+sorted catalog table so every downstream featurize run skips
the conv_id exchange (see aloha_spark/sources/bucketed.py).

    spark-submit --py-files aloha_spark.zip jobs/bucketize.py \
        --in /data/turns.parquet --table turns_bkt \
        --path /data/turns_bkt --buckets 4096 \
        --bucket-by conv_id --sort-by conv_id,ts

Pick ``--buckets`` for 128-512 MB bucket files at FULL scale (a layout
constant, not a parallelism knob); downstream jobs read it with
``--format bucketed --turns turns_bkt``.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--in", dest="inp", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--path", required=True)
    p.add_argument("--buckets", type=int, default=4096)
    p.add_argument("--bucket-by", default="conv_id")
    p.add_argument("--sort-by", default="conv_id,ts")
    p.add_argument("--format", default="parquet")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from aloha_spark.sources.bucketed import write_bucketed
    from aloha_spark.sources.tables import read_table
    from aloha_spark.tuning import worker_channel_confs

    b = SparkSession.builder.appName("aloha-bucketize")
    for k, v in worker_channel_confs().items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    df = read_table(spark, args.inp, args.format)
    write_bucketed(df, args.table,
                   bucket_by=args.bucket_by.split(","),
                   sort_by=args.sort_by.split(",") if args.sort_by else (),
                   num_buckets=args.buckets, path=args.path)
    n = spark.table(args.table).count()
    print(f"bucketized {n} rows -> table {args.table} "
          f"({args.buckets} buckets) at {args.path}")


if __name__ == "__main__":
    main()
