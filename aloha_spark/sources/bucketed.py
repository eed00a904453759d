"""Bucketed transcript tables: pay the conv_id shuffle ONCE at write
time, then run every downstream per-conversation stage exchange-free.

At 100 TB the dominant cost of the point-in-time pipeline is the
hash exchange on ``conv_id`` that every window spec, sessionization,
and as-of join needs.  Spark's table bucketing amortizes it: a table
written with ``bucketBy(n, conv_id)`` + ``sortBy(conv_id, ts)`` records
its hash-partitioning in the catalog, and any scan of it reports
``HashPartitioning(conv_id, n)`` — so

* ``Window.partitionBy("conv_id")`` specs plan with NO Exchange (the
  scan already satisfies the window's ClusteredDistribution), and
* an equi-join of two tables bucketed the same way (turns ⋈ state on
  conv_id) plans as a sort-merge join with NO Exchange on either side.

This is the storage-layout analog of the reference's
"separate starting state for each unit of parallelism"
(aloha-core/.../dataset/StatefulRowCreator.scala:36-75): the unit of
parallelism is pinned at write time instead of re-derived per query.

Operational notes for the 1000-executor case:

* ``num_buckets`` is a LAYOUT constant, not a parallelism knob — pick
  it for target bucket-file size (~128-512 MB after compression) at
  full scale; tasks per bucket stay 1 on read, so more buckets = more
  read parallelism.
* one write task per bucket produces one file per bucket; Spark then
  also trusts the ``sortBy`` order (multi-file buckets lose the sorted
  property and re-sort, but still skip the exchange — the expensive
  part).
* bucketed tables require the session catalog (``saveAsTable``); plain
  ``parquet(path)`` writes cannot record bucket metadata.  The tables
  here are EXTERNAL (caller-owned path) so dropping the catalog entry
  never deletes data.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, *,
                   bucket_by: Sequence[str] = ("conv_id",),
                   sort_by: Sequence[str] = ("conv_id", "ts"),
                   num_buckets: int = 8,
                   path: Optional[str] = None,
                   mode: str = "overwrite",
                   fmt: str = "parquet") -> None:
    """Write ``df`` as a bucketed+sorted external table.

    One upfront shuffle on ``bucket_by`` (repartition to exactly the
    bucket count so each bucket lands in ONE file and the ``sort_by``
    order survives the read — Spark only trusts per-bucket sort order
    for single-file buckets).
    """
    bucket_cols = list(bucket_by)
    w = (df.repartition(num_buckets, *bucket_cols)
           .write.format(fmt).mode(mode)
           .bucketBy(num_buckets, *bucket_cols))
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table.  Must go through the catalog —
    ``spark.read.parquet(path)`` on the same files would forget the
    bucket layout and reintroduce the exchange."""
    return spark.table(table)
