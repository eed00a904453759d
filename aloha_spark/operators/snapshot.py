"""Incremental dedup against a persisted corpus snapshot — the
continuous-crawl shape: yesterday's 10^12-document corpus is already
deduped; today's batch must drop (a) anything content-identical to the
existing corpus, (b) anything near-duplicate of it, and (c) its own
internal duplicates — WITHOUT rescanning the old corpus.

The snapshot is the persisted fingerprint state of the corpus, written
once and appended per increment (same plain-parquet + meta.json-last
publish discipline as ``operators/ann_index.py``):

* ``digests.parquet``     — ``(content_hash)`` distinct 16-byte md5
  digests (the :func:`~aloha_spark.operators.dedup.content_digest`
  contract shared with batch AND streaming dedup — three engines, one
  definition of "duplicate")
* ``signatures.parquet``  — ``(id, minhash array<bigint>)`` (minhash
  snapshots only)
* ``bands.parquet``       — ``(band, sig, id)`` banded LSH keys
  (minhash snapshots only)
* ``meta.json``           — digest cols + minhash params, written last
  as the commit marker; increments validate against it so a snapshot
  built with 3-shingles can't silently be probed with 5-shingles.

Scale shape: the exact increment is ONE left-anti equi-join of the new
batch's digests against the digest table (AQE picks broadcast vs
shuffle by measured size) plus the standard one-window within-batch
keep.  The near-dup increment is the banding equi-join of new band keys
against the stored band table — the new batch never pairs with the old
corpus beyond shared buckets, and the old corpus is never re-shingled:
similarity against old documents is ESTIMATED from the stored minhash
signatures (component agreement — the standard MinHash estimator),
which is exactly what the signatures are for.  Reference analog: none —
the reference has no dedup at all; this extends SURVEY §2.11 X1/X2.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .dedup import _track_intermediates, content_digest, with_minhash

_META = "meta.json"
_DIGESTS = "digests.parquet"
_SIGNATURES = "signatures.parquet"
_BANDS = "bands.parquet"
_FORMAT_VERSION = 1


def _band_keys(df: DataFrame, id_col: str, minhash_col: str,
               bands: int, rows_per_band: int) -> DataFrame:
    """(band, sig, id) keys — the same xxhash64-over-band-slice keying
    as ``lsh_candidate_pairs`` so snapshot and in-batch banding agree."""
    band_exprs = []
    for bi in range(bands):
        elems = [F.element_at(F.col(minhash_col), bi * rows_per_band + j + 1)
                 for j in range(rows_per_band)]
        band_exprs.append(F.struct(F.lit(bi).alias("band"),
                                   F.xxhash64(*elems, F.lit(bi)).alias("sig")))
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(F.array(*band_exprs)).alias("b"))
              .select("id", F.col("b.band").alias("band"),
                      F.col("b.sig").alias("sig")))


def _require_local(path: str, op: str) -> None:
    """The meta.json commit marker goes through local open()/os.replace;
    data artifacts go through Spark.  On a remote filesystem the build
    would succeed for hours and then fail at publish — refuse UP FRONT
    instead (the same stance as plans/lineage.py's scheme guard)."""
    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            f"{op}: snapshot paths must be on a locally-mounted "
            f"filesystem (got {path!r}) — the meta.json commit marker "
            f"is written with local file APIs; mount the store or use "
            f"a file:// path")


def write_dedup_snapshot(df: DataFrame, path: str, *,
                         cols: Sequence[str] = ("text",),
                         id_col: str = "doc_id",
                         minhash: bool = False, text: str = "text",
                         num_hashes: int = 64, shingle_n: int = 3,
                         seed: int = 1, bands: int = 16,
                         rows_per_band: int = 4) -> dict:
    """Publish the fingerprint snapshot of an (already deduped) corpus."""
    _require_local(path, "write_dedup_snapshot")
    # validate EVERYTHING before the first corpus scan — a parameter
    # error after the digest write wastes a full pass over the corpus
    if minhash and num_hashes != bands * rows_per_band:
        raise ValueError(
            f"write_dedup_snapshot: num_hashes={num_hashes} != "
            f"bands*rows_per_band={bands * rows_per_band}")
    digests = (df.select(content_digest(cols).alias("content_hash"))
                 .distinct())
    digests.write.mode("overwrite").parquet(os.path.join(path, _DIGESTS))
    if minhash:
        sigs = (with_minhash(df, text=text, num_hashes=num_hashes,
                             shingle_n=shingle_n, seed=seed)
                .select(F.col(id_col).alias("id"), "minhash"))
        sigs.write.mode("overwrite") \
            .parquet(os.path.join(path, _SIGNATURES))
        sigs_back = df.sparkSession.read.parquet(
            os.path.join(path, _SIGNATURES))
        _band_keys(sigs_back, "id", "minhash", bands, rows_per_band) \
            .write.mode("overwrite").parquet(os.path.join(path, _BANDS))
    meta = {
        "format_version": _FORMAT_VERSION,
        "cols": list(cols), "id_col": id_col,
        "minhash": bool(minhash),
        "text": text, "num_hashes": num_hashes, "shingle_n": shingle_n,
        "seed": seed, "bands": bands, "rows_per_band": rows_per_band,
    }
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, _META))   # atomic publish
    return meta


def load_snapshot_meta(path: str) -> dict:
    _require_local(path, "load_snapshot_meta")
    meta_path = os.path.join(path, _META)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"load_snapshot_meta: no {_META} under {path} — wrong path, "
            f"or a build died before publishing (meta.json is the commit "
            f"marker); rebuild with write_dedup_snapshot")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"snapshot format_version {meta.get('format_version')} != "
            f"supported {_FORMAT_VERSION}")
    return meta


def incremental_exact_dedup(new_docs: DataFrame, path: str, *,
                            cols: Optional[Sequence[str]] = None,
                            id_col: Optional[str] = None) -> DataFrame:
    """Rows of ``new_docs`` that are content-new: not in the snapshot
    AND first (min-id) of their content within the batch.  One anti-join
    on the digest + one window; the old corpus is never read beyond its
    digest table."""
    spark = new_docs.sparkSession
    meta = load_snapshot_meta(path)
    cols = list(cols or meta["cols"])
    if cols != meta["cols"]:
        raise ValueError(
            f"incremental_exact_dedup: digest cols {cols} != snapshot's "
            f"{meta['cols']} — the digests would be incomparable")
    id_col = id_col or meta["id_col"]
    old = spark.read.parquet(os.path.join(path, _DIGESTS))
    hashed = new_docs.withColumn("content_hash", content_digest(cols))
    fresh = hashed.join(old, "content_hash", "left_anti")
    w = Window.partitionBy("content_hash")
    return (fresh.withColumn("__keep", F.min(id_col).over(w))
                 .where(F.col(id_col) == F.col("__keep"))
                 .drop("content_hash", "__keep"))


def _neardup_old_pairs(new_docs: DataFrame, path: str, *,
                       id_col: Optional[str], text: Optional[str],
                       threshold: float, max_bucket_size: int):
    """Internal: returns (pairs, persisted_new_sigs) with NO lifetime
    tracking — each public wrapper attaches the cache to the frame it
    actually returns (tracking an intermediate would let its finalizer
    unpersist the cache as soon as the intermediate is GC'd)."""
    spark = new_docs.sparkSession
    meta = load_snapshot_meta(path)
    if not meta["minhash"]:
        raise ValueError(
            "incremental_neardup_old_pairs: snapshot was written without "
            "minhash=True — rebuild it with signatures/bands")
    id_col = id_col or meta["id_col"]
    text = text or meta["text"]
    # persisted: the signature frame feeds BOTH the banding branch and
    # the estimate join — without the cache the minhash UDF shingles
    # the whole new batch twice.  Auto-released when the result frame
    # is garbage-collected (or eagerly via
    # dedup.release_intermediates(result)).
    new_sigs = (with_minhash(new_docs, text=text,
                             num_hashes=meta["num_hashes"],
                             shingle_n=meta["shingle_n"],
                             seed=meta["seed"])
                .select(F.col(id_col).alias("new_id"),
                        F.col("minhash").alias("new_mh"))
                .persist())
    new_bands = _band_keys(new_sigs, "new_id", "new_mh",
                           meta["bands"], meta["rows_per_band"]) \
        .withColumnRenamed("id", "new_id")
    old_bands = spark.read.parquet(os.path.join(path, _BANDS)) \
        .withColumnRenamed("id", "old_id")
    # bound pathological buckets on the OLD side the same way
    # lsh_candidate_pairs bounds in-batch buckets: a band key shared by
    # more than max_bucket_size old docs is boilerplate, not signal
    bucket_sizes = old_bands.groupBy("band", "sig") \
        .agg(F.count("*").alias("__n"))
    old_bands = (old_bands.join(bucket_sizes, ["band", "sig"])
                 .where(F.col("__n") <= max_bucket_size).drop("__n"))
    cand = (new_bands.join(old_bands, ["band", "sig"])
            .select("new_id", "old_id").distinct())
    old_sigs = spark.read.parquet(os.path.join(path, _SIGNATURES)) \
        .select(F.col("id").alias("old_id"), F.col("minhash").alias("old_mh"))
    est = (cand.join(new_sigs, "new_id").join(old_sigs, "old_id")
           .withColumn(
               "est_jaccard",
               F.aggregate(
                   F.zip_with("new_mh", "old_mh",
                              lambda a, b: (a == b).cast("int")),
                   F.lit(0), lambda acc, x: acc + x)
               / F.size("new_mh"))
           .where(F.col("est_jaccard") >= threshold)
           .select("new_id", "old_id", "est_jaccard"))
    return est, new_sigs


def incremental_neardup_old_pairs(new_docs: DataFrame, path: str, *,
                                  id_col: Optional[str] = None,
                                  text: Optional[str] = None,
                                  threshold: float = 0.8,
                                  max_bucket_size: int = 1000) -> DataFrame:
    """(new_id, old_id, est_jaccard) for new documents near-duplicating
    SNAPSHOT documents: band the new batch with the snapshot's minhash
    params, equi-join its band keys against the stored band table, and
    estimate Jaccard as minhash component agreement (the old corpus is
    never re-read or re-shingled).  Pairs at or above ``threshold``
    only.  The increment's signature cache auto-releases when the
    returned frame is garbage-collected (or eagerly via
    ``dedup.release_intermediates``)."""
    est, new_sigs = _neardup_old_pairs(
        new_docs, path, id_col=id_col, text=text, threshold=threshold,
        max_bucket_size=max_bucket_size)
    return _track_intermediates(est, new_sigs)


def incremental_neardup_dedup(new_docs: DataFrame, path: str, *,
                              id_col: Optional[str] = None,
                              text: Optional[str] = None,
                              threshold: float = 0.8,
                              max_bucket_size: int = 1000) -> DataFrame:
    """Rows of ``new_docs`` that near-duplicate NO snapshot document
    (in-batch near-dup is a separate concern — compose with
    ``minhash_dedup_pairs`` + ``dedup_keep_canonical`` for that)."""
    meta = load_snapshot_meta(path)
    id_col = id_col or meta["id_col"]
    pairs, new_sigs = _neardup_old_pairs(
        new_docs, path, id_col=id_col, text=text, threshold=threshold,
        max_bucket_size=max_bucket_size)
    hits = pairs.select(F.col("new_id").alias(id_col)).distinct()
    result = new_docs.join(hits, id_col, "left_anti")
    # the signature cache rides the RETURNED frame's lifetime — the
    # intermediate pairs frame is free to be GC'd immediately
    return _track_intermediates(result, new_sigs)


def append_to_snapshot(kept_docs: DataFrame, path: str, *,
                       id_col: Optional[str] = None) -> None:
    """Fold an increment's SURVIVING rows into the snapshot so the next
    increment dedups against them too.  Parquet append — no rewrite of
    the existing fingerprint tables.

    Crash-safety ordering: signatures and bands append FIRST, digests
    LAST.  The digest table is what ``incremental_exact_dedup`` keys on,
    so an increment only becomes "absorbed" once its digests land; a
    crash before that means the rerun simply re-appends — duplicate
    signature/band rows from the aborted attempt are harmless (banding
    candidates are ``distinct``-ed and duplicate estimate rows carry
    identical values).  ``id_col`` overrides the snapshot's recorded id
    column for frames keyed differently (the same override the
    incremental_* functions accept)."""
    meta = load_snapshot_meta(path)
    id_col = id_col or meta["id_col"]
    if meta["minhash"]:
        sigs = (with_minhash(kept_docs, text=meta["text"],
                             num_hashes=meta["num_hashes"],
                             shingle_n=meta["shingle_n"],
                             seed=meta["seed"])
                .select(F.col(id_col).alias("id"), "minhash"))
        sigs.persist()
        try:
            sigs.write.mode("append") \
                .parquet(os.path.join(path, _SIGNATURES))
            _band_keys(sigs, "id", "minhash",
                       meta["bands"], meta["rows_per_band"]) \
                .write.mode("append").parquet(os.path.join(path, _BANDS))
        finally:
            sigs.unpersist()
    digests = (kept_docs
               .select(content_digest(meta["cols"]).alias("content_hash"))
               .distinct())
    digests.write.mode("append").parquet(os.path.join(path, _DIGESTS))
