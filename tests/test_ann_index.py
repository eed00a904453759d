"""Persistable ANN index (operators/ann_index.py): build/load round-trip,
exactness gates vs brute force, parity with the inline operators, and the
partition-pruning contract that is the point of the artifact."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from aloha_spark.operators.ann_index import (
    AnnIndex, build_ann_index, ivf_topk_indexed, load_ann_index,
    pq_topk_indexed)
from aloha_spark.operators.similarity import brute_force_topk_sql


N, DIM = 200, 16


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(11)
    # a few clear clusters so IVF cells are meaningful
    centers = rng.normal(size=(4, DIM))
    rows = []
    for i in range(N):
        v = centers[i % 4] + 0.15 * rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>").repartition(4)


@pytest.fixture(scope="module")
def index_path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("annidx") / "idx")


@pytest.fixture(scope="module")
def index(spark, embs, index_path):
    return build_ann_index(embs, index_path, n_centroids=8, m_sub=4,
                           ksub=16, seed=7, train_sample=N)


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


class TestBuildLoad:
    def test_artifacts_exist(self, index, index_path):
        for name in ("meta.json", "centroids.parquet", "corpus.parquet",
                     "codebooks.parquet"):
            assert os.path.exists(os.path.join(index_path, name)), name

    def test_roundtrip(self, spark, index, index_path):
        loaded = load_ann_index(spark, index_path)
        assert loaded.meta == index.meta
        np.testing.assert_allclose(loaded.centroids, index.centroids)
        np.testing.assert_allclose(loaded.codebooks, index.codebooks)

    def test_corpus_is_cell_partitioned(self, index, index_path):
        parts = [d for d in os.listdir(
            os.path.join(index_path, "corpus.parquet"))
            if d.startswith("cell=")]
        assert len(parts) > 1
        assert index.corpus().count() == N

    def test_missing_meta_is_loud(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError, match="commit marker"):
            load_ann_index(spark, str(tmp_path / "nope"))

    def test_empty_corpus_is_loud(self, spark, tmp_path):
        empty = spark.createDataFrame(
            [], "vec_id bigint, embedding array<double>")
        with pytest.raises(ValueError, match="empty"):
            build_ann_index(empty, str(tmp_path / "e"))


class TestExactness:
    """Full probing / exhaustive rerank degenerate to exact brute force."""

    def test_ivf_full_probe_equals_brute(self, spark, embs, index):
        q = embs.where("vec_id < 6")
        got = ivf_topk_indexed(q, index, k=3, nprobe=8)
        want = brute_force_topk_sql(q, embs, k=3)
        assert _pairs(got) == _pairs(want)

    def test_pq_exhaustive_equals_brute(self, spark, embs, index):
        q = embs.where("vec_id < 6")
        got = pq_topk_indexed(q, index, k=3, rerank=N, nprobe=8)
        want = brute_force_topk_sql(q, embs, k=3)
        assert _pairs(got) == _pairs(want)

    def test_inline_parity(self, spark, embs, index):
        """Indexed IVF == the refit-per-call operator with identical
        params (same sample rule, same seed => same centroids)."""
        from aloha_spark.operators.similarity import ivf_topk
        q = embs.where("vec_id < 6")
        got = ivf_topk_indexed(q, index, k=3, nprobe=8)
        want = ivf_topk(q, embs, k=3, n_centroids=8, nprobe=8, seed=7,
                        train_sample=N)
        assert _pairs(got) == _pairs(want)


class TestApprox:
    def test_narrow_probe_recall(self, spark, embs, index):
        """nprobe=2 on well-separated clusters keeps high top-3 recall."""
        q = embs.where("vec_id < 20")
        got = set(map(tuple, ivf_topk_indexed(q, index, k=3, nprobe=2)
                      .select("query_id", "neighbor_id").collect()))
        want = set(map(tuple, brute_force_topk_sql(q, embs, k=3)
                       .select("query_id", "neighbor_id").collect()))
        recall = len(got & want) / len(want)
        assert recall >= 0.8, recall

    def test_pq_without_codes_is_loud(self, spark, embs, tmp_path):
        ivf_only = build_ann_index(embs, str(tmp_path / "ivf"),
                                   n_centroids=4, m_sub=0, train_sample=N)
        with pytest.raises(ValueError, match="m_sub"):
            pq_topk_indexed(embs.limit(1), ivf_only, k=1)

    def test_empty_queries(self, spark, embs, index):
        q = embs.where("vec_id < 0")
        assert ivf_topk_indexed(q, index, k=3).count() == 0
        assert pq_topk_indexed(q, index, k=3).count() == 0


class TestPruning:
    def test_probe_reads_only_probed_cells(self, spark, embs, index):
        """The scale contract: an nprobe=1 query's corpus scan opens
        files from at most nprobe x |queries| distinct cell directories
        — partition pruning, not a full scan plus filter."""
        q = embs.where("vec_id = 0")
        out = ivf_topk_indexed(q, index, k=3, nprobe=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        read = (index.corpus()
                .where(F.col("cell").isin([0]))
                .select(F.input_file_name()).distinct().count())
        total = (index.corpus()
                 .select(F.input_file_name()).distinct().count())
        assert read < total
        # and the physical plan carries the partition filter
        assert "cell" in plan


class TestBuildJob:
    def test_job_main_builds_and_reports(self, spark, embs, tmp_path,
                                         capsys):
        """jobs/ann_index.py end-to-end embedded: artifact published,
        occupancy summary printed, shared session left running."""
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ann_index_job", os.path.join(
                os.path.dirname(__file__), "..", "jobs", "ann_index.py"))
        job = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(job)

        src = str(tmp_path / "embs")
        embs.write.mode("overwrite").parquet(src)
        out = str(tmp_path / "idx")
        job.main(["--corpus", src, "--out", out,
                  "--n-centroids", "8", "--m-sub", "4",
                  "--train-sample", str(N)])
        import json
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["rows"] == N
        assert 1 <= report["cells_used"] <= 8
        assert report["max_cell"] >= report["median_cell"] \
            >= report["min_cell"] >= 1
        # the artifact is loadable and serves queries
        idx = load_ann_index(spark, out)
        q = embs.where("vec_id < 3")
        got = ivf_topk_indexed(q, idx, k=2, nprobe=8)
        want = brute_force_topk_sql(q, embs, k=2)
        assert _pairs(got) == _pairs(want)
        assert spark.sparkContext._jsc is not None   # session survived


class TestPqPerCellMasking:
    def test_narrow_probe_pq_recall_and_probe_scope(self, spark, embs,
                                                    index):
        """nprobe=2 PQ: per-cell masking must score each query only
        against its own probed cells, and recall stays high on the
        clustered fixture."""
        import numpy as np
        q = embs.where("vec_id < 20")
        got = pq_topk_indexed(q, index, k=3, rerank=50, nprobe=2)
        got_pairs = got.select("query_id", "neighbor_id").collect()
        want = set(map(tuple, brute_force_topk_sql(q, embs, k=3)
                       .select("query_id", "neighbor_id").collect()))
        recall = len(set(map(tuple, got_pairs)) & want) / len(want)
        assert recall >= 0.8, recall

        # scope invariant: every returned neighbor lives in a cell the
        # query actually probed
        inv = index.corpus().toPandas().set_index("id")["cell"]
        qrows = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
                 for r in q.collect()}
        for r in got_pairs:
            qv = qrows[r.query_id]
            qv = qv / np.linalg.norm(qv)
            probed = set(np.argsort(-(qv @ index.centroids.T))[:2]
                         .tolist())
            assert int(inv[r.neighbor_id]) in probed, r


class TestIncrementalEmbeddingDedup:
    def test_near_copies_dropped_fresh_kept(self, spark, embs, index):
        from aloha_spark.operators.ann_index import (
            incremental_embedding_dedup)
        import numpy as np
        base = np.asarray(embs.where("vec_id = 0").first().embedding)
        rng = np.random.default_rng(99)
        rows = [
            (1000, [float(x) for x in base * 1.01]),       # near-copy
            (1001, [float(x) for x in rng.normal(size=DIM)]),  # fresh
        ]
        new = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>")
        kept = incremental_embedding_dedup(
            new, index, threshold=0.95, nprobe=8)
        assert sorted(r.vec_id for r in kept.collect()) == [1001]

    def test_low_nprobe_never_false_drops(self, spark, embs, index):
        """Whatever nprobe misses, the exact verify guarantees anything
        DROPPED really had an indexed twin at >= threshold."""
        from aloha_spark.operators.ann_index import (
            incremental_embedding_dedup)
        from aloha_spark.operators.similarity import brute_force_topk_sql
        import numpy as np
        rng = np.random.default_rng(7)
        rows = [(2000 + i, [float(x) for x in rng.normal(size=DIM)])
                for i in range(8)]
        new = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>")
        kept = {r.vec_id for r in incremental_embedding_dedup(
            new, index, threshold=0.8, nprobe=1).collect()}
        dropped = {v for v, _ in rows} - kept
        if dropped:
            # each dropped id must have a true neighbor >= threshold
            best = {r.query_id: r.cosine
                    for r in brute_force_topk_sql(new, embs, k=1)
                    .collect()}
            for d in dropped:
                assert best[d] >= 0.8

    def test_large_increment_never_touches_driver(self, spark, embs,
                                                  index, monkeypatch):
        """The r4 weak spot, closed: an increment LARGER than the old
        100k driver cap runs end-to-end, and a collect gate proves no
        driver-side query materialization — the only collect in the
        whole path is the distinct probed-cell list (<= n_centroids
        rows).  The increment is synthesized JVM-side (spark.range +
        array exprs), so the test itself never materializes it either."""
        from pyspark.sql.classic.dataframe import DataFrame
        from aloha_spark.operators.ann_index import (
            incremental_embedding_dedup)
        n_inc = 110_000                      # > the old max_queries cap
        big = spark.range(n_inc).select(
            (F.col("id") + 10_000).alias("vec_id"),
            F.array(*[((F.col("id") * (3 + j) % 97) / 97.0 - 0.5)
                      .cast("double") for j in range(DIM)])
            .alias("embedding"))
        sizes = []
        orig = DataFrame.collect

        def gated(df):
            rows = orig(df)
            sizes.append(len(rows))
            return rows

        monkeypatch.setattr(DataFrame, "collect", gated)
        kept_n = incremental_embedding_dedup(
            big, index, threshold=0.999, nprobe=2).count()
        monkeypatch.setattr(DataFrame, "collect", orig)
        assert sizes, "expected the bounded probed-cell collect"
        assert max(sizes) <= index.meta["n_centroids"], sizes
        # near-orthogonal synthetic vectors: almost everything survives
        assert kept_n >= n_inc * 0.9


class TestPqDistributed:
    """distributed=True must be result-identical to the driver-LUT
    serving path, stay exact when exhaustive, and never materialize
    the query side on the driver."""

    def test_parity_with_driver_path(self, spark, embs, index):
        """Same results as the driver-LUT path wherever the rerank
        shortlist isn't boundary-tight: a TIGHT rerank can admit a
        different boundary candidate because the two paths compute ADC
        scores with differently-shaped einsums (BLAS rounding differs
        in the last ulp) — the k results are then still exact-cosine
        verified, just from a slightly different shortlist."""
        q = embs.where("vec_id < 20")
        for kw in ({"nprobe": 2, "rerank": 50},
                   {"nprobe": 8, "rerank": 50},
                   {"nprobe": None, "rerank": N}):
            a = pq_topk_indexed(q, index, k=3, **kw)
            b = pq_topk_indexed(q, index, k=3, distributed=True, **kw)
            assert _pairs(a) == _pairs(b), kw

    def test_exhaustive_equals_brute(self, spark, embs, index):
        q = embs.where("vec_id < 6")
        got = pq_topk_indexed(q, index, k=3, rerank=N, nprobe=8,
                              distributed=True)
        want = brute_force_topk_sql(q, embs, k=3)
        assert _pairs(got) == _pairs(want)

    def test_no_driver_query_collect(self, spark, embs, index,
                                     monkeypatch):
        from pyspark.sql.classic.dataframe import DataFrame
        q = embs.where("vec_id < 20")
        sizes = []
        orig = DataFrame.collect

        def gated(df):
            rows = orig(df)
            sizes.append(len(rows))
            return rows

        monkeypatch.setattr(DataFrame, "collect", gated)
        n = pq_topk_indexed(q, index, k=3, rerank=20, nprobe=2,
                            distributed=True).count()
        # nprobe=None skips even the probed-cell collect
        n2 = pq_topk_indexed(q, index, k=3, rerank=20, nprobe=None,
                             distributed=True).count()
        monkeypatch.setattr(DataFrame, "collect", orig)
        assert n > 0 and n2 > 0
        assert max(sizes, default=0) <= index.meta["n_centroids"], sizes
