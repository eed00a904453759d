"""Dedup family + ANN vs brute-force/naive oracles on the driver-provided
documents/embeddings tables (sf0.001)."""

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aloha_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    simhash_near_pairs,
    with_minhash,
    with_simhash,
)
from aloha_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_sql,
    lsh_topk,
)
from aloha_spark.operators.textstats import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _jaccard(a: str, b: str, n=3):
    def sh(t):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


class TestExactDedup:
    def test_counts(self, spark, docs):
        out = exact_dedup(docs, ["text"]).toPandas()
        pdf = docs.toPandas()
        assert out["dup_count"].sum() == len(pdf)
        assert len(out) == pdf["text"].nunique()
        # canonical ids are the min doc_id per text
        exp = pdf.groupby("text")["doc_id"].min().sort_values().tolist()
        assert sorted(out["keep_id"].tolist()) == exp

    def test_keep_matches_semi_join_formulation(self, spark, docs):
        """exact_dedup_keep == join(exact_dedup, left_semi) row-for-row,
        with all input columns preserved and one shuffle in the plan."""
        from aloha_spark.operators.dedup import exact_dedup_keep

        kept = exact_dedup_keep(docs, ["text"])
        assert kept.columns == docs.columns
        keeps = (exact_dedup(docs, ["text"])
                 .select(F.col("keep_id").alias("doc_id")))
        ref = docs.join(keeps, "doc_id", "left_semi")
        a = kept.orderBy("doc_id").toPandas()
        b = ref.orderBy("doc_id").toPandas()
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True))
        # plan: single hash exchange (the digest window), no join
        plan = kept._sc._jvm.PythonSQLUtils.explainString(
            kept._jdf.queryExecution(), "simple")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Join" not in plan, plan


class TestMinhashLsh:
    def test_recall_and_precision_vs_bruteforce(self, spark, docs):
        small = docs.limit(120).cache()
        got = minhash_dedup_pairs(small, threshold=0.5, num_hashes=64,
                                  bands=32, shingle_n=3).toPandas()
        pdf = small.toPandas()
        texts = dict(zip(pdf["doc_id"], pdf["text"]))
        exact = {}
        for a, b in itertools.combinations(sorted(texts), 2):
            j = _jaccard(texts[a], texts[b])
            if j >= 0.5:
                exact[(a, b)] = j
        got_pairs = {(r.id_a, r.id_b): r.jaccard for r in got.itertuples()}
        # precision is exact (verified); jaccard values must match
        for pair, j in got_pairs.items():
            assert pair in exact
            assert j == pytest.approx(exact[pair])
        # recall with 32 bands of 2 rows at j>=0.5: P(miss) <= (1-j^2)^32 < 4e-5
        assert len(got_pairs) >= len(exact) * 0.99 if exact else True

    def test_signature_deterministic(self, spark, docs):
        a = with_minhash(docs.limit(10), seed=1).toPandas()
        b = with_minhash(docs.limit(10), seed=1).toPandas()
        assert a["minhash"].apply(list).tolist() == b["minhash"].apply(list).tolist()


class TestSimhash:
    def test_identical_texts_same_hash(self, spark, docs):
        dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
        both = docs.limit(5).unionByName(dup)
        hashed = with_simhash(both).toPandas()
        by_text = hashed.groupby("text")["simhash"].nunique()
        assert (by_text == 1).all()
        pairs = simhash_near_pairs(with_simhash(both), max_hamming=3).toPandas()
        # the 5 exact dup pairs must appear at hamming 0
        exact_pairs = {(i, i + 100000) for i in docs.limit(5).toPandas()["doc_id"]}
        found = {(r.id_a, r.id_b) for r in pairs.itertuples() if r.hamming == 0}
        assert exact_pairs <= found


class TestEmbeddingOps:
    def test_brute_force_matches_numpy(self, spark, embs):
        queries = embs.where("vec_id < 5")
        got = brute_force_topk(queries, embs, k=3).toPandas()
        pdf = embs.toPandas()
        ids = pdf["vec_id"].to_numpy()
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        for qid in range(5):
            qv = mn[ids == qid][0]
            sims = mn @ qv
            order = sorted(zip(-sims, ids), key=lambda t: (t[0], t[1]))
            exp = [i for s, i in order if i != qid][:3]
            g = got[got["query_id"] == qid].sort_values("rank")
            assert g["neighbor_id"].tolist() == exp

    def test_sql_variant_agrees(self, spark, embs):
        queries = embs.where("vec_id < 3")
        a = brute_force_topk(queries, embs, k=3).toPandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = brute_force_topk_sql(queries, embs, k=3).toPandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()
        assert np.allclose(a["cosine"], b["cosine"], atol=1e-6)

    def test_lsh_topk_reasonable_recall(self, spark, embs):
        queries = embs.where("vec_id < 10")
        exact = brute_force_topk(queries, embs, k=5).toPandas()
        approx = lsh_topk(queries, embs, k=5, planes=6,
                          probe_hamming=1).toPandas()
        # recall@5 of the bucketed path should be well above chance
        hits = 0
        for qid in range(10):
            e = set(exact[exact["query_id"] == qid]["neighbor_id"])
            a = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(e & a)
        assert hits >= 10  # >=20% recall on random data with 6 planes

    def test_neardup_pairs_verified(self, spark, embs):
        # construct exact duplicates to guarantee pairs exist
        dup = embs.limit(5).withColumn("vec_id", F.col("vec_id") + 100000)
        both = embs.limit(5).unionByName(dup)
        pairs = embedding_neardup_pairs(both, threshold=0.999).toPandas()
        expect = {(i, i + 100000) for i in embs.limit(5).toPandas()["vec_id"]}
        got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
        assert expect <= got
        assert (pairs["cosine"] >= 0.999).all()


class TestTextStats:
    def test_token_stats_match_pandas(self, spark, docs):
        got = with_token_stats(docs.limit(50)).toPandas()
        for r in got.itertuples():
            toks = r.text.split()
            assert r.token_count == len(toks)
            assert r.char_count == len(r.text)
            assert r.avg_token_len == pytest.approx(
                sum(map(len, toks)) / len(toks))
            assert r.distinct_ratio == pytest.approx(len(set(toks)) / len(toks))

    def test_quality_and_lang(self, spark, docs):
        out = with_lang_id(with_quality_score(docs.limit(50))).toPandas()
        assert out["quality_score"].between(0, 1).all()
        assert set(out["lang_guess"]) <= {"en", "de", "es", "und"}

    def test_hamming_ball_masks(self):
        from aloha_spark.operators.dedup import _hamming_ball_masks
        m1 = _hamming_ball_masks(8, 1)
        assert sorted(m1) == [1 << b for b in range(8)]
        m2 = _hamming_ball_masks(8, 2)
        assert len(m2) == 8 + 28 and len(set(m2)) == len(m2)
        assert all(bin(m).count("1") <= 2 for m in m2)

    def test_probe_hamming_2_recall_not_below_1(self, spark):
        """radius-2 probes must be a superset of radius-1's candidates
        (the old code silently generated only 1-bit flips for any
        radius)."""
        import numpy as np
        from aloha_spark.operators.dedup import embedding_neardup_pairs
        rng = np.random.default_rng(11)
        base = rng.standard_normal((12, 16))
        rows = []
        for i in range(12):
            rows.append((2 * i, base[i].tolist()))
            rows.append((2 * i + 1,
                         (base[i] + rng.standard_normal(16) * 0.05).tolist()))
        d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        kw = dict(threshold=0.9, planes=8, n_tables=2, seed=7)
        p1 = {(r.id_a, r.id_b) for r in
              embedding_neardup_pairs(d, probe_hamming=1, **kw).collect()}
        p2 = {(r.id_a, r.id_b) for r in
              embedding_neardup_pairs(d, probe_hamming=2, **kw).collect()}
        assert p1 <= p2

    def test_quality_null_text_is_null(self, spark):
        """NULL text -> NULL score (a non-NULL score would let empty
        documents pass a >= threshold curation gate)."""
        d = spark.createDataFrame(
            [(1, None), (2, "the cat sat on the mat of the house")],
            "doc_id long, text string")
        out = (with_quality_score(d).orderBy("doc_id")
               .toPandas()["quality_score"])
        assert pd.isna(out.iloc[0])
        assert 0 <= out.iloc[1] <= 1

    def test_fingerprint_stable_and_content_sensitive(self, spark, docs):
        a = with_fingerprint(docs.limit(30)).toPandas()
        b = with_fingerprint(docs.limit(30)).toPandas()
        assert a["fingerprint"].tolist() == b["fingerprint"].tolist()
        assert a.groupby("text")["fingerprint"].nunique().eq(1).all()


class TestIvfTopk:
    def _clustered(self, spark, n=300, dim=16, n_clusters=6, seed=3):
        import numpy as np
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((n_clusters, dim)) * 4
        rows = []
        for i in range(n):
            c = i % n_clusters
            v = centers[c] + rng.standard_normal(dim) * 0.3
            rows.append((i, v.tolist()))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_exhaustive_probe_equals_brute_force(self, spark):
        from aloha_spark.operators.similarity import brute_force_topk, ivf_topk
        embs = self._clustered(spark)
        q = embs.where("vec_id < 8")
        exact = brute_force_topk(q, embs, k=5).orderBy("query_id", "rank") \
            .collect()
        ivf = ivf_topk(q, embs, k=5, n_centroids=6, nprobe=6) \
            .orderBy("query_id", "rank").collect()
        assert [(r.query_id, r.neighbor_id, r.cosine) for r in exact] == \
               [(r.query_id, r.neighbor_id, r.cosine) for r in ivf]

    def test_narrow_probe_recall(self, spark):
        from aloha_spark.operators.similarity import brute_force_topk, ivf_topk
        embs = self._clustered(spark)
        q = embs.where("vec_id < 8")
        exact = brute_force_topk(q, embs, k=5).collect()
        approx = ivf_topk(q, embs, k=5, n_centroids=6, nprobe=1).collect()
        truth = {(r.query_id, r.neighbor_id) for r in exact}
        got = {(r.query_id, r.neighbor_id) for r in approx}
        recall = len(truth & got) / len(truth)
        # well-separated clusters: probing the single nearest cell must
        # recover nearly all true neighbors
        assert recall >= 0.9, recall


class TestPqTopk:
    def _clustered(self, spark, n=300, dim=16, n_clusters=6, seed=3):
        import numpy as np
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((n_clusters, dim)) * 4
        rows = []
        for i in range(n):
            c = i % n_clusters
            v = centers[c] + rng.standard_normal(dim) * 0.3
            rows.append((i, v.tolist()))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_exhaustive_rerank_equals_brute_force(self, spark):
        # rerank >= |corpus|: every vector gets the exact-cosine pass,
        # so the PQ machinery (codebooks, encode, ADC shortlist) is
        # gated end-to-end against the exact answer
        from aloha_spark.operators.similarity import brute_force_topk, pq_topk
        embs = self._clustered(spark)
        q = embs.where("vec_id < 8")
        exact = brute_force_topk(q, embs, k=5).orderBy("query_id", "rank") \
            .collect()
        pq = pq_topk(q, embs, k=5, m_sub=4, ksub=8, rerank=300) \
            .orderBy("query_id", "rank").collect()
        assert [(r.query_id, r.neighbor_id, r.cosine) for r in exact] == \
               [(r.query_id, r.neighbor_id, r.cosine) for r in pq]

    def test_narrow_rerank_recall(self, spark):
        # ADC approx scores must put the true neighbors inside the
        # shortlist.  Same-cluster members quantize to near-identical
        # codes (identical ADC scores), so the shortlist must exceed
        # the cluster population (300/6 = 50) for the tie-broken
        # truncation to be safe — the PQ sizing rule rerank > expected
        # quantization-cell collision count, exercised here with 64.
        from aloha_spark.operators.similarity import brute_force_topk, pq_topk
        embs = self._clustered(spark)
        q = embs.where("vec_id < 8")
        exact = brute_force_topk(q, embs, k=5).collect()
        approx = pq_topk(q, embs, k=5, m_sub=4, ksub=16, rerank=64).collect()
        truth = {(r.query_id, r.neighbor_id) for r in exact}
        got = {(r.query_id, r.neighbor_id) for r in approx}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.9, recall
        # reranked cosines are EXACT — every returned cosine matches the
        # brute-force value for that pair
        exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
        for r in approx:
            key = (r.query_id, r.neighbor_id)
            if key in exact_cos:
                assert abs(r.cosine - exact_cos[key]) < 1e-9

    def test_dim_not_divisible_raises(self, spark):
        from aloha_spark.operators.similarity import pq_topk
        embs = self._clustered(spark, dim=15)
        with pytest.raises(Exception, match="not divisible"):
            pq_topk(embs.where("vec_id < 2"), embs, m_sub=4).collect()

    def test_empty_query_side(self, spark):
        from aloha_spark.operators.similarity import pq_topk
        embs = self._clustered(spark)
        out = pq_topk(embs.where("vec_id < 0"), embs, k=3)
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


class TestMultiTableLsh:
    def test_recall_grows_with_tables_and_stays_subset(self, spark, embs):
        from aloha_spark.operators.dedup import embedding_neardup_pairs
        from aloha_spark.operators.similarity import brute_force_topk_sql

        e = embs
        # exact pair set at the threshold (small corpus: cross join ok)
        a, b = e.alias("a"), e.alias("b")
        from pyspark.sql import functions as F
        from aloha_spark.operators.similarity import _cosine_expr
        exact = {(r.id_a, r.id_b) for r in
                 (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
                  .select(F.col("a.vec_id").alias("id_a"),
                          F.col("b.vec_id").alias("id_b"),
                          _cosine_expr("a.embedding", "b.embedding")
                          .alias("c"))
                  .where("c >= 0.35")).collect()}
        assert exact, "fixture must contain near pairs at the threshold"
        rec = {}
        for nt in (1, 6):
            got = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(
                e, threshold=0.35, planes=8, probe_hamming=1,
                n_tables=nt).collect()}
            assert got <= exact
            rec[nt] = len(got & exact) / max(1, len(exact))
        assert rec[6] >= rec[1]
        assert rec[6] >= 0.4


class TestDegenerateInputs:
    """Hostile-corpus hardening for the LSH verify paths: empty/NULL
    text through minhash, zero vectors through the unit-dot verify."""

    def test_minhash_all_empty_and_null_docs(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   "), (4, "one"), (5, "one")],
            "doc_id int, text string")
        pairs = minhash_dedup_pairs(df, threshold=0.5,
                                    num_hashes=16, bands=8).toPandas()
        # empty/whitespace/NULL docs share the all-zero signature and
        # thus band together, but exact-Jaccard verification gives
        # them jaccard 0.0 (empty shingle sets) — they must NOT be
        # reported; the identical non-empty docs must be.
        assert set(map(tuple, pairs[["id_a", "id_b"]].values)) == {(4, 5)}

    def test_minhash_single_doc_corpus(self, spark):
        df = spark.createDataFrame([(1, "a b c d")],
                                   "doc_id int, text string")
        assert minhash_dedup_pairs(df, num_hashes=16, bands=8).count() == 0

    def test_embedding_zero_vectors_never_match(self, spark):
        rows = [(1, [0.0] * 8), (2, [0.0] * 8),
                (3, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
                (4, [1.0, 1e-9, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])]
        df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        out = embedding_neardup_pairs(df, threshold=0.9, planes=4,
                                      probe_hamming=4, n_tables=4,
                                      vec_col="embedding").toPandas()
        got = set(map(tuple, out[["id_a", "id_b"]].values))
        # zero vectors have no direction: cosine with anything is
        # undefined and must never clear the threshold (the unit-dot
        # path maps them to the zero vector -> dot 0.0)
        assert all(1 not in p and 2 not in p for p in got)
        assert (3, 4) in got

    def test_embedding_unit_dot_matches_exact_cosine(self, spark, embs):
        out = embedding_neardup_pairs(embs, threshold=0.8, planes=4,
                                      probe_hamming=4, n_tables=6).toPandas()
        pdf = embs.toPandas()
        vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
                for r in pdf.itertuples()}
        for r in out.itertuples():
            a, b = vecs[r.id_a], vecs[r.id_b]
            exact = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert abs(r.cosine - round(exact, 6)) < 1e-9


class TestRepetitionStats:
    def test_matches_hand_computed(self, spark):
        from pyspark.sql import Row
        from aloha_spark.operators.textstats import with_repetition_stats
        df = spark.createDataFrame([
            # "a a a b": top token a=3/4; bigrams [a a, a a, a b]:
            # 3 grams, 2 distinct -> dup 1/3; trigrams [a a a, a a b]:
            # 2 grams, 2 distinct -> dup 0
            Row(doc_id=1, text="a a a b"),
            # all distinct
            Row(doc_id=2, text="x y z w"),
            # single token: no bigrams/trigrams -> NULL fracs
            Row(doc_id=3, text="solo"),
            Row(doc_id=4, text=None),
        ])
        out = with_repetition_stats(df).toPandas().set_index("doc_id")
        assert out.loc[1, "n_tokens"] == 4
        assert out.loc[1, "top_token_frac"] == 0.75
        assert abs(out.loc[1, "dup_bigram_frac"] - 1 / 3) < 1e-12
        assert out.loc[1, "dup_trigram_frac"] == 0.0
        assert out.loc[2, "top_token_frac"] == 0.25
        assert out.loc[2, "dup_bigram_frac"] == 0.0
        assert out.loc[3, "n_tokens"] == 1
        assert out.loc[3, "top_token_frac"] == 1.0
        assert pd.isna(out.loc[3, "dup_bigram_frac"])
        assert pd.isna(out.loc[3, "dup_trigram_frac"])
        assert pd.isna(out.loc[4, "top_token_frac"])

    def test_matches_pandas_reference(self, spark, docs):
        from collections import Counter
        from aloha_spark.operators.textstats import with_repetition_stats
        got = (with_repetition_stats(docs.limit(60))
               .select("doc_id", "text", "n_tokens", "top_token_frac",
                       "dup_bigram_frac", "dup_trigram_frac").toPandas())
        for _, r in got.iterrows():
            ts = (r["text"] or "").split()
            if not ts:
                continue
            assert r["n_tokens"] == len(ts)
            assert abs(r["top_token_frac"]
                       - max(Counter(ts).values()) / len(ts)) < 1e-12
            for n, col in ((2, "dup_bigram_frac"), (3, "dup_trigram_frac")):
                grams = [" ".join(ts[i:i + n])
                         for i in range(len(ts) - n + 1)]
                if not grams:
                    assert pd.isna(r[col])
                else:
                    want = (len(grams) - len(set(grams))) / len(grams)
                    assert abs(r[col] - want) < 1e-12

    def test_plan_is_pure_jvm_map(self, spark, docs):
        from aloha_spark.operators.textstats import with_repetition_stats
        plan = with_repetition_stats(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "PythonUDF" not in plan and "ArrowEval" not in plan
