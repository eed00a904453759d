"""Persistable ANN index — build once over the corpus, query many times.

:func:`~aloha_spark.operators.similarity.ivf_topk` /
:func:`~aloha_spark.operators.similarity.pq_topk` refit their coarse
quantizers on every call, which is right for one-shot dedup passes but
wrong for the serving shape at 10^11 vectors: there the expensive part —
the full-corpus scan that assigns cells and encodes PQ codes — should
run ONCE, and each later query batch should read only its probed slice.

Artifact layout under ``path`` (plain parquet + JSON — readable by any
engine, no pickles):

* ``centroids.parquet``  — IVF coarse cells ``(cell:int, centroid:array<double>)``
* ``codebooks.parquet``  — PQ codebooks ``(m:int, j:int, centroid:array<double>)``
  (present iff the index was built with ``m_sub > 0``)
* ``corpus.parquet``     — the inverted file: ``(id, codes?, vector)``
  written ``partitionBy("cell")``
* ``meta.json``          — params/dim/schema, written LAST: it is the
  commit marker, so a partially-built index is invisible to
  :func:`load_ann_index` (the same write-then-publish discipline as
  ``plans/lineage.py``).

The 100 TB story is that the inverted file IS a cell-partitioned
parquet table: probing ``nprobe`` cells is *static partition pruning* —
the scan literally never opens unprobed cells' files (gated in
``tests/test_ann_index.py`` by counting distinct ``input_file_name()``).
PQ codes ride next to the ids (m_sub small ints per vector instead of a
3 KB float array), and the raw vectors are only read by the
exact-rerank tail over the Q x rerank candidate set.

Reference parity note: the reference engine has no vector index; this
extends the beyond-reference similarity family (SURVEY §2.11 X7/X28)
with the build/serve split every production ANN deployment uses
(FAISS's index.add / index.search contract, re-expressed as tables).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .similarity import _cosine_expr, _kmeans_fit, _pq_fit

_META = "meta.json"
_CENTROIDS = "centroids.parquet"
_CODEBOOKS = "codebooks.parquet"
_CORPUS = "corpus.parquet"
_FORMAT_VERSION = 1


class AnnIndex:
    """Handle over a built index: broadcast-sized arrays on the driver
    (centroids, codebooks) + the lazily-read cell-partitioned corpus."""

    def __init__(self, spark: SparkSession, path: str, meta: dict,
                 centroids: np.ndarray,
                 codebooks: Optional[np.ndarray]) -> None:
        self.spark = spark
        self.path = path
        self.meta = meta
        self.centroids = centroids   # (n_centroids, dim), unit-norm
        self.codebooks = codebooks   # (m_sub, ksub, dim/m_sub) or None

    def corpus(self) -> DataFrame:
        """The inverted file; filter on ``cell`` before anything else so
        Catalyst turns it into partition pruning."""
        return self.spark.read.parquet(os.path.join(self.path, _CORPUS))


def build_ann_index(corpus: DataFrame, path: str, *,
                    c_id: str = "vec_id", c_vec: str = "embedding",
                    n_centroids: int = 16, m_sub: int = 0, ksub: int = 16,
                    seed: int = 7, train_sample: int = 4096) -> AnnIndex:
    """One corpus scan: train coarse centroids (and PQ codebooks when
    ``m_sub > 0``) on a deterministic unbiased sample, assign every
    vector to its nearest cell, encode codes, and publish the artifacts.

    The sample is the same xxhash64-TakeOrdered draw as ``ivf_topk`` —
    uniform, reproducible, O(n log sample), no full-sort shuffle."""
    _require_local(path, "build_ann_index")
    spark = corpus.sparkSession
    samp = (corpus.select(c_id, c_vec)
            .orderBy(F.xxhash64(F.col(c_id).cast("string"), F.lit(seed)),
                     F.col(c_id))
            .limit(train_sample).collect())
    if not samp:
        raise ValueError("build_ann_index: corpus is empty")
    m = np.asarray([np.asarray(r[1], dtype=np.float64) for r in samp])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    dim = m.shape[1]
    cent = _kmeans_fit(m, n_centroids, seed)
    books = _pq_fit(m, m_sub, ksub, seed) if m_sub else None

    bc = spark.sparkContext.broadcast((cent, books))
    id_t = corpus.schema[c_id].dataType.simpleString()
    out_schema = f"id {id_t}, cell int, vector array<double>"
    if books is not None:
        out_schema += ", codes array<int>"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent_, books_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mm = np.asarray([np.asarray(v, dtype=np.float64)
                             for v in pdf["vector"]])
            nn = mm / np.maximum(
                np.linalg.norm(mm, axis=1, keepdims=True), 1e-30)
            out = pd.DataFrame({
                "id": pdf["id"],
                "cell": np.argmax(nn @ cent_.T, axis=1).astype(np.int32),
                "vector": list(mm),
            })
            if books_ is not None:
                dsub = books_.shape[2]
                codes = np.empty((len(nn), len(books_)), dtype=np.int32)
                for mi, cb in enumerate(books_):
                    sub = nn[:, mi * dsub:(mi + 1) * dsub]
                    d2 = -2.0 * (sub @ cb.T) + (cb ** 2).sum(axis=1)[None, :]
                    codes[:, mi] = np.argmin(d2, axis=1)
                out["codes"] = list(codes)
            yield out

    inv = (corpus.select(F.col(c_id).alias("id"),
                         F.col(c_vec).cast("array<double>").alias("vector"))
                 .mapInPandas(assign, schema=out_schema))
    # partitionBy("cell") is the point of the whole artifact: a probe of
    # nprobe cells becomes static partition pruning on the read side
    inv.write.mode("overwrite").partitionBy("cell") \
       .parquet(os.path.join(path, _CORPUS))

    cent_df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(cent)],
        "cell int, centroid array<double>")
    cent_df.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, _CENTROIDS))
    if books is not None:
        rows = [(mi, j, books[mi, j].tolist())
                for mi in range(books.shape[0])
                for j in range(books.shape[1])]
        spark.createDataFrame(rows, "m int, j int, centroid array<double>") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(path, _CODEBOOKS))

    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": "ivfpq" if books is not None else "ivf",
        "dim": int(dim),
        "n_centroids": int(len(cent)),
        "m_sub": int(m_sub),
        "ksub": int(books.shape[1]) if books is not None else 0,
        "seed": int(seed),
        "train_sample": int(train_sample),
        "id_col": c_id, "vec_col": c_vec, "id_type": id_t,
    }
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:          # write-then-rename: the commit
        json.dump(meta, f, indent=1)   # marker appears atomically
    os.replace(tmp, os.path.join(path, _META))
    return AnnIndex(spark, path, meta, cent, books)


def _require_local(path: str, op: str) -> None:
    """meta.json goes through local open()/os.replace while the data
    artifacts go through Spark — on a remote filesystem the full corpus
    scan would succeed and THEN the publish would crash.  Refuse up
    front (same stance as plans/lineage.py's scheme guard)."""
    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            f"{op}: index paths must be on a locally-mounted filesystem "
            f"(got {path!r}) — the meta.json commit marker is written "
            f"with local file APIs; mount the store or use file://")


def load_ann_index(spark: SparkSession, path: str) -> AnnIndex:
    _require_local(path, "load_ann_index")
    meta_path = os.path.join(path, _META)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"load_ann_index: no {_META} under {path} — either the path "
            f"is wrong or a build died before publishing (meta.json is "
            f"written last as the commit marker); rebuild with "
            f"build_ann_index")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"load_ann_index: format_version {meta.get('format_version')} "
            f"!= supported {_FORMAT_VERSION}")
    crows = spark.read.parquet(os.path.join(path, _CENTROIDS)) \
        .orderBy("cell").collect()
    cent = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    books = None
    if meta["m_sub"]:
        brows = spark.read.parquet(os.path.join(path, _CODEBOOKS)) \
            .orderBy("m", "j").collect()
        books = np.asarray([r["centroid"] for r in brows],
                           dtype=np.float64).reshape(
            meta["m_sub"], meta["ksub"], meta["dim"] // meta["m_sub"])
    return AnnIndex(spark, path, meta, cent, books)


def _collect_queries(queries: DataFrame, q_id: str, q_vec: str,
                     max_queries: int):
    qrows = queries.select(q_id, q_vec).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"indexed ANN collects the query side on the driver; got > "
            f"{max_queries} query rows — batch the query set or raise "
            f"max_queries explicitly")
    q_ids = [r[0] for r in qrows]
    qm = np.asarray([np.asarray(r[1], dtype=np.float64) for r in qrows])
    if len(qrows):
        qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True),
                             1e-30)
    return q_ids, qm


def _assign_probes(queries: DataFrame, q_id: str, q_vec: str,
                   centroids: np.ndarray, nprobe: int) -> DataFrame:
    """Distributed probe assignment: broadcast the (tiny) centroid
    matrix and sweep the query frame with one Arrow pass — each query
    row emits its ``nprobe`` nearest cells as ``(query_id, cell, qv)``
    with ``qv`` unit-normalized.  This is the same broadcast-centroid
    assignment shape as ``similarity.semantic_dedup``'s cluster pass:
    the query side NEVER touches the driver, so a multi-million-row
    daily increment is just another distributed scan."""
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    npb = min(nprobe, len(centroids))
    id_t = queries.schema[q_id].dataType.simpleString()
    out_schema = f"query_id {id_t}, cell int, qv array<double>"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            qm = np.asarray([np.asarray(v, dtype=np.float64)
                             for v in pdf["qv"]])
            qn = qm / np.maximum(
                np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
            sims = qn @ cent.T
            probes = np.argsort(-sims, axis=1)[:, :npb]    # (q, npb)
            yield pd.DataFrame({
                "query_id": pdf["query_id"].to_numpy().repeat(npb),
                "cell": probes.reshape(-1).astype(np.int32),
                "qv": [qn[i].tolist()
                       for i in range(len(qn)) for _ in range(npb)],
            })

    return (queries.select(F.col(q_id).alias("query_id"),
                           F.col(q_vec).cast("array<double>").alias("qv"))
                   .mapInPandas(assign, schema=out_schema))


def _empty_result(spark: SparkSession, q_id_type: str,
                  n_id_type: str) -> DataFrame:
    """Schema-matched empty frame: query_id carries the QUERY frame's
    id type and neighbor_id the INDEX's, exactly like the non-empty
    branch — so a zero-probe day unions cleanly with a normal day."""
    return spark.createDataFrame(
        [], f"query_id {q_id_type}, neighbor_id {n_id_type}, "
            f"cosine double, rank int")


def ivf_topk_indexed(queries: DataFrame, index: AnnIndex, k: int = 5, *,
                     q_id: str = "vec_id", q_vec: str = "embedding",
                     nprobe: int = 2, round_to: Optional[int] = 6,
                     broadcast_queries: Optional[bool] = None) -> DataFrame:
    """IVF search against a prebuilt index, fully distributed on the
    query side: probe cells come from one broadcast-centroid Arrow
    assignment pass over the query frame (``_assign_probes`` — no
    driver collect, so the query side can be a multi-million-row daily
    increment), the corpus read filters to exactly the probed cells
    (static partition pruning — the only thing ever collected is the
    DISTINCT cell list, bounded by ``n_centroids``), and the probed
    slice verifies with exact JVM cosine + one top-k window.

    ``broadcast_queries=True`` hints the cell join for the serving
    shape (a handful of queries); the default leaves the choice to
    Catalyst/AQE, which converts to broadcast at runtime when the
    probe table turns out small.

    ``nprobe == n_centroids`` probes everything = exact brute force,
    which is the oracle gate."""
    from .dedup import _track_intermediates

    spark = index.spark
    # persist the probe table: the distinct-cells collect AND the cell
    # join both read it — without the cache the query-side assignment
    # pass runs twice, and a nondeterministic query source could even
    # probe cells the pruned read no longer covers.  Released with the
    # result via the intermediate tracker.
    qdf = _assign_probes(queries, q_id, q_vec, index.centroids, nprobe) \
        .persist()
    # the distinct probed-cell list is <= n_centroids rows — the one
    # bounded collect that buys static partition pruning on the read
    cells = sorted(r[0] for r in qdf.select("cell").distinct().collect())
    if not cells:
        qdf.unpersist()
        return _empty_result(spark,
                             queries.schema[q_id].dataType.simpleString(),
                             index.meta["id_type"])
    # isin on the partition column -> Catalyst prunes unprobed cells'
    # files before any IO happens
    pruned = index.corpus().where(F.col("cell").isin(cells))
    jq = F.broadcast(qdf) if broadcast_queries else qdf
    cands = (pruned.join(jq, "cell")
                   .where(F.col("query_id") != F.col("id"))
                   .withColumn("cosine", _cosine_expr("qv", "vector"))
                   .withColumnRenamed("id", "neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (cands.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id",
                        (F.round("cosine", round_to) if round_to is not None
                         else F.col("cosine")).alias("cosine"), "rank"))
    return _track_intermediates(out, qdf)


def pq_topk_indexed(queries: DataFrame, index: AnnIndex, k: int = 5, *,
                    q_id: str = "vec_id", q_vec: str = "embedding",
                    rerank: int = 32, nprobe: Optional[int] = None,
                    round_to: Optional[int] = 6,
                    max_queries: int = 100_000,
                    distributed: bool = False) -> DataFrame:
    """PQ/ADC search against prebuilt codes, optionally IVF-PQ: with
    ``nprobe`` set, the ADC scan first prunes to the probed cells
    (partition pruning), then scores codes via per-query lookup tables;
    the exact-cosine rerank re-reads only the Q x rerank candidate ids.

    ``nprobe=None`` scans all cells' codes (classic PQ); ``rerank >=
    |corpus|`` with full probing is exhaustive — the oracle gate.

    Two query-side shapes, identical results (parity-gated in
    tests/test_ann_index.py):

    * default — the SERVING path: per-query ADC lookup tables are
      built driver-side and broadcast, the fastest shape for a small
      query batch (``max_queries`` raises loudly past the cap);
    * ``distributed=True`` — the INCREMENT path: probe cells come from
      the same broadcast-centroid Arrow assignment pass as
      :func:`ivf_topk_indexed`, the cell equi-join routes each coded
      batch to exactly the queries that probed its cell, and lookup
      tables are rebuilt executor-side per (query, batch) from the
      broadcast codebooks (a dim x ksub einsum — trivial next to the
      code scan).  No driver collect anywhere; the rerank tail joins
      without forced broadcasts so AQE sizes them."""
    if index.codebooks is None:
        raise ValueError(
            "pq_topk_indexed: index was built without PQ codes "
            "(m_sub=0) — rebuild with m_sub > 0 or use ivf_topk_indexed")
    spark = index.spark
    if distributed:
        return _pq_topk_distributed(queries, index, k, q_id, q_vec,
                                    rerank, nprobe, round_to)
    q_ids, qn = _collect_queries(queries, q_id, q_vec, max_queries)
    if not q_ids:
        # the driver path COERCES query ids into the index id type (the
        # qdf literal below is built with it), so both of ITS branches
        # speak index id_type; the distributed path keeps the query
        # frame's own type in both of its branches
        return _empty_result(spark, index.meta["id_type"],
                             index.meta["id_type"])
    books = index.codebooks
    m_sub, _, dsub = books.shape
    lut = np.einsum("qmd,mjd->qmj",
                    qn.reshape(len(q_ids), m_sub, dsub), books)
    id_t = index.meta["id_type"]

    coded = index.corpus()
    cells = None
    cell_queries = None
    if nprobe is not None:
        sims = qn @ index.centroids.T
        npb = min(nprobe, sims.shape[1])
        probes = np.argsort(-sims, axis=1)[:, :npb]
        cells = sorted({int(c) for row in probes for c in row})
        coded = coded.where(F.col("cell").isin(cells))
        # per-cell query lists: a batch's rows from cell c are scored
        # ONLY against the queries that probed c — without this, file
        # pruning bounds the IO but every query's lookup table still
        # runs over the probed UNION (Q x N work for divergent probes)
        cell_queries = {}
        for qi, row in enumerate(probes):
            for c in row:
                cell_queries.setdefault(int(c), []).append(qi)
        cell_queries = {c: np.asarray(v, dtype=np.int64)
                        for c, v in cell_queries.items()}
    bc = spark.sparkContext.broadcast((q_ids, lut, cell_queries))
    keep = ["codes"] + (["cell"] if cells is not None else [])
    coded = coded.select(F.col("id").alias("neighbor_id"), *keep)

    def _emit(ids, tables, qidx, codes, cid):
        n = codes.shape[0]
        sims_ = np.zeros((len(qidx), n))
        sub = tables[qidx]                        # (q', M, K)
        for mi in range(codes.shape[1]):
            sims_ += sub[:, mi, codes[:, mi]]
        kk = min(rerank + 1, n)
        top = np.argpartition(-sims_, kk - 1, axis=1)[:, :kk] \
            if kk < n else np.broadcast_to(
                np.arange(n), (len(qidx), n))
        out_q, out_c, out_s = [], [], []
        for row_i, qi in enumerate(qidx):
            rows = top[row_i]
            out_q.extend([ids[qi]] * len(rows))
            out_c.extend(cid[rows].tolist())
            out_s.extend(sims_[row_i, rows].tolist())
        return out_q, out_c, out_s

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tables, per_cell = bc.value          # tables: (Q, M, K)
        all_q = np.arange(len(ids), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            out_q: list = []
            out_c: list = []
            out_s: list = []
            if per_cell is None:
                groups = [(None, pdf)]
            else:
                groups = pdf.groupby("cell", sort=False)
            for cell, grp in groups:
                qidx = all_q if per_cell is None \
                    else per_cell.get(cell)
                if qidx is None or not len(qidx):
                    continue
                codes = np.asarray([np.asarray(c, dtype=np.int64)
                                    for c in grp["codes"]])
                q_, c_, s_ = _emit(ids, tables, qidx, codes,
                                   grp["neighbor_id"].to_numpy())
                out_q.extend(q_)
                out_c.extend(c_)
                out_s.extend(s_)
            if out_q:
                yield pd.DataFrame({"query_id": out_q,
                                    "neighbor_id": out_c,
                                    "approx": out_s})

    cands = coded.mapInPandas(
        score, schema=f"query_id {id_t}, neighbor_id {id_t}, approx double")
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc())
    shortlist = (cands.where(F.col("query_id") != F.col("neighbor_id"))
                      .withColumn("_r", F.row_number().over(wa))
                      .where(F.col("_r") <= rerank)
                      .select("query_id", "neighbor_id"))
    qdf = spark.createDataFrame(
        [(i, v.tolist()) for i, v in zip(q_ids, qn)],
        f"query_id {id_t}, qv array<double>")
    # the rerank corpus read prunes to the probed cells too — every
    # shortlist id comes from them, and without the filter the join
    # would open every cell's files to read the wide vector column
    cv = index.corpus()
    if cells is not None:
        cv = cv.where(F.col("cell").isin(cells))
    cv = cv.select(F.col("id").alias("neighbor_id"),
                   F.col("vector").alias("cv"))
    exact = (cv.join(F.broadcast(shortlist), "neighbor_id")
               .join(F.broadcast(qdf), "query_id")
               .withColumn("cosine", _cosine_expr("qv", "cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= k)
                 .select("query_id", "neighbor_id",
                         (F.round("cosine", round_to) if round_to is not None
                          else F.col("cosine")).alias("cosine"), "rank"))


def _pq_topk_distributed(queries: DataFrame, index: AnnIndex, k: int,
                         q_id: str, q_vec: str, rerank: int,
                         nprobe: Optional[int],
                         round_to: Optional[int]) -> DataFrame:
    """Distributed query side for :func:`pq_topk_indexed` (see its
    docstring).  ``nprobe=None`` assigns every query to every cell —
    classic all-cells PQ, where the qv fan-out (n_centroids rows per
    query) is negligible next to the Q x |corpus| code scan it feeds."""
    from .dedup import _track_intermediates

    spark = index.spark
    books = index.codebooks
    m_sub, _, dsub = books.shape
    n_id_t = index.meta["id_type"]               # corpus/neighbor ids
    q_id_t = queries.schema[q_id].dataType.simpleString()
    npb = nprobe if nprobe is not None else len(index.centroids)
    # persisted: the cells collect, the ADC join, and the rerank's
    # qv_df all read the probe table — one assignment pass, not three
    qdf = _assign_probes(queries, q_id, q_vec, index.centroids, npb) \
        .persist()

    cells = None
    coded = index.corpus()
    if nprobe is not None:
        cells = sorted(r[0] for r in
                       qdf.select("cell").distinct().collect())
        if not cells:
            qdf.unpersist()
            return _empty_result(spark, q_id_t, n_id_t)
        coded = coded.where(F.col("cell").isin(cells))
    joined = (coded.select(F.col("id").alias("neighbor_id"),
                           "codes", "cell")
                   .join(qdf, "cell"))

    bcb = spark.sparkContext.broadcast(books)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books_ = bcb.value
        for pdf in batches:
            if pdf.empty:
                continue
            # one LUT per DISTINCT query in the batch (factorize keeps
            # first-appearance order, so `firsts` rows line up with the
            # unique codes), then a fully vectorized gather per row
            q_codes, uniq = pd.factorize(pdf["query_id"], sort=False)
            firsts = ~pd.Series(q_codes).duplicated().to_numpy()
            qmat = np.asarray([np.asarray(v, dtype=np.float64)
                               for v in pdf["qv"].to_numpy()[firsts]])
            luts = np.einsum("qmd,mjd->qmj",
                             qmat.reshape(len(uniq), m_sub, dsub), books_)
            codes = np.asarray([np.asarray(c, dtype=np.int64)
                                for c in pdf["codes"]])
            s = np.zeros(len(pdf))
            for mi in range(m_sub):
                s += luts[q_codes, mi, codes[:, mi]]
            yield pd.DataFrame({
                "query_id": pdf["query_id"].to_numpy(),
                "neighbor_id": pdf["neighbor_id"].to_numpy(),
                "approx": s})

    cands = joined.mapInPandas(
        score,
        schema=f"query_id {q_id_t}, neighbor_id {n_id_t}, approx double")
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc())
    shortlist = (cands.where(F.col("query_id") != F.col("neighbor_id"))
                      .withColumn("_r", F.row_number().over(wa))
                      .where(F.col("_r") <= rerank)
                      .select("query_id", "neighbor_id"))
    qv_df = qdf.select("query_id", "qv").dropDuplicates(["query_id"])
    cv = index.corpus()
    if cells is not None:
        cv = cv.where(F.col("cell").isin(cells))
    cv = cv.select(F.col("id").alias("neighbor_id"),
                   F.col("vector").alias("cv"))
    # no forced broadcasts: shortlist is Q x rerank and qv_df is Q rows
    # — AQE converts to broadcast when they turn out small
    exact = (cv.join(shortlist, "neighbor_id")
               .join(qv_df, "query_id")
               .withColumn("cosine", _cosine_expr("qv", "cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (exact.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id",
                        (F.round("cosine", round_to) if round_to is not None
                         else F.col("cosine")).alias("cosine"), "rank"))
    return _track_intermediates(out, qdf)


def incremental_embedding_dedup(new_docs: DataFrame, index: AnnIndex,
                                *, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.95,
                                nprobe: int = 2,
                                round_to: Optional[int] = None) -> DataFrame:
    """Embedding-space counterpart of
    ``operators/snapshot.py::incremental_exact_dedup``: rows of
    ``new_docs`` whose nearest INDEXED vector stays below the cosine
    ``threshold`` — today's embeddings dedup against yesterday's corpus
    without rescanning it (the index IS the persisted state; fold an
    increment in by rebuilding or maintaining the index offline).

    The increment side is fully distributed (``ivf_topk_indexed``'s
    broadcast-centroid assignment pass) — a multi-million-row daily
    crawl never touches the driver; the only collect anywhere in the
    path is the distinct probed-cell list (<= n_centroids values),
    machine-gated in ``tests/test_ann_index.py``.

    Recall follows ``nprobe`` exactly as in :func:`ivf_topk_indexed`
    (a near-dup whose indexed twin lives in an unprobed cell is missed
    — raise nprobe for recall, ``nprobe=n_centroids`` is exact); the
    exact-cosine verify means NO false drops at any nprobe.  Id spaces
    must be disjoint between the index and the increment (the underlying
    query skips identical-id pairs as self-matches)."""
    hits = (ivf_topk_indexed(new_docs, index, k=1, q_id=id_col,
                             q_vec=vec_col, nprobe=nprobe,
                             round_to=round_to)
            .where(F.col("cosine") >= threshold)
            .select(F.col("query_id").alias(id_col)).distinct())
    return new_docs.join(hits, id_col, "left_anti")
