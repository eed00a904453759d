"""Tests for corpus mixing / training-order operators
(aloha_spark/operators/mixture.py): token-budget sampling, fractional
epoch mixing, deterministic shuffle shards, corpus report.

Every operator is checked against an independent pure-Python replica of
its engine-portable contract (hashlib md5, naive cumulative sums) — the
same replica style the samplers in test_corpus.py use."""

import hashlib
import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aloha_spark.operators.mixture import (
    N_BUCKETS, corpus_report, epoch_mix, shuffle_shards,
    token_budget_sample, with_shuffle_order)


def _bucket(v, salt, n=N_BUCKETS):
    h = hashlib.md5((salt + str(v)).encode()).hexdigest()
    return int(h[:15], 16) % n


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


def _rand_corpus(seed, n=160, sources=("a", "b", "c", None)):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ntok = rng.choice([0, 1, 2, 3, 5, 8, 20, 40])
        rows.append((i, rng.choice(sources),
                     " ".join(f"w{rng.randrange(50)}" for _ in range(ntok))))
    return rows


def _naive_budget_keep(rows, budgets, default_budget, salt="budget"):
    """Independent replica of the keep contract: per stratum, order by
    (md5 bucket, id), keep while cumulative tokens-before < budget."""
    kept = set()
    by_src = {}
    for doc_id, src, text in rows:
        by_src.setdefault(src, []).append((doc_id, len(text.split())))
    for src, docs in by_src.items():
        b = budgets.get(src, default_budget) if src is not None \
            else default_budget
        docs.sort(key=lambda d: (_bucket(d[0], salt), d[0]))
        cum = 0
        for doc_id, ntok in docs:
            if cum < b:
                kept.add(doc_id)
            cum += ntok
    return kept


class TestTokenBudget:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_naive_replica(self, spark, seed):
        rows = _rand_corpus(seed)
        budgets = {"a": 100, "b": 17, "c": 0}
        got = token_budget_sample(
            _mkdocs(spark, rows), budgets, default_budget=5)
        got_ids = {r.doc_id for r in got.select("doc_id").collect()}
        assert got_ids == _naive_budget_keep(rows, budgets, 5)

    def test_budget_reached_or_stratum_exhausted(self, spark):
        rows = _rand_corpus(7, sources=("a", "b"))
        budgets = {"a": 60, "b": 10 ** 9}
        got = (token_budget_sample(_mkdocs(spark, rows), budgets)
               .withColumn("_n", F.size(F.split(F.trim("text"), r"\s+")))
               .groupBy("source").agg(F.sum(
                   F.when(F.trim("text") == "", 0)
                    .otherwise(F.col("_n"))).alias("tot"),
                   F.count("*").alias("n"))
               .collect())
        by = {r.source: r for r in got}
        assert by["a"].tot >= 60            # reached (overshoot <= 1 doc)
        n_b = sum(1 for _, s, _ in rows if s == "b")
        assert by["b"].n == n_b             # whole stratum kept

    def test_minimal_prefix(self, spark):
        """Dropping the kept doc with the highest priority position
        must take the stratum below budget — no over-selection."""
        rows = [(i, "a", " ".join(["t"] * (3 + i % 4)))
                for i in range(40)]
        df = _mkdocs(spark, rows)
        kept = token_budget_sample(df, {"a": 50}).collect()
        toks = {r.doc_id: len(r.text.split()) for r in kept}
        order = sorted(toks, key=lambda d: (_bucket(d, "budget"), d))
        assert sum(toks.values()) >= 50
        assert sum(toks[d] for d in order[:-1]) < 50

    def test_zero_token_docs_at_exact_boundary(self, spark):
        # doc ids picked so empty docs sort AFTER the budget boundary
        # within a bucket: cum == budget exactly -> they must drop
        rows = [(1, "a", "x y"), (2, "a", ""), (3, "a", "x y z"),
                (4, "a", ""), (5, "a", "q")]
        for budget in (1, 2, 3, 5, 6, 100):
            got = {r.doc_id for r in token_budget_sample(
                _mkdocs(spark, rows), {"a": budget}).collect()}
            assert got == _naive_budget_keep(rows, {"a": budget}, 0), budget

    def test_precomputed_tokens_col(self, spark):
        df = _mkdocs(spark, [(1, "a", "ignored"), (2, "a", "ignored")]) \
            .withColumn("bpe_n", F.col("doc_id") * 10)
        got = token_budget_sample(df, {"a": 5}, tokens_col_name="bpe_n")
        # priority order by bucket: whichever is first is kept, its 10
        # or 20 tokens exceed 5, so exactly one survives
        assert got.count() == 1

    def test_negative_budget_raises(self, spark):
        df = _mkdocs(spark, [(1, "a", "x")])
        with pytest.raises(ValueError, match="must be >= 0"):
            token_budget_sample(df, {"a": -1})

    def test_null_id_dropped(self, spark):
        df = spark.createDataFrame(
            [(None, "a", "x y z"), (1, "a", "x y z")],
            "doc_id long, source string, text string")
        got = token_budget_sample(df, {"a": 100}).collect()
        assert [r.doc_id for r in got] == [1]


class TestEpochMix:
    def test_copy_counts_match_replica(self, spark):
        rows = _rand_corpus(11)
        e = {"a": 2.4, "b": 0.7, "c": 1.0}
        got = epoch_mix(_mkdocs(spark, rows), e, default_epochs=0.25)
        counts = {r.doc_id: r.n for r in
                  got.groupBy("doc_id").agg(F.count("*").alias("n"))
                     .collect()}
        for doc_id, src, _ in rows:
            ep = e.get(src, 0.25) if src is not None else 0.25
            full = int(math.floor(ep))
            frac_thr = int(math.floor((ep - full) * N_BUCKETS + 1e-9))
            want = full + (1 if _bucket(doc_id, "epoch") < frac_thr else 0)
            assert counts.get(doc_id, 0) == want, (doc_id, src, ep)

    def test_copy_idx_dense_range(self, spark):
        rows = [(i, "a", "t") for i in range(30)]
        got = epoch_mix(_mkdocs(spark, rows), {"a": 3.5}).toPandas()
        for _, g in got.groupby("doc_id"):
            assert sorted(g.copy_idx) == list(range(len(g)))

    def test_zero_and_identity(self, spark):
        rows = [(i, "a", "t") for i in range(10)]
        df = _mkdocs(spark, rows)
        assert epoch_mix(df, {"a": 0.0}).count() == 0
        one = epoch_mix(df, {"a": 1.0}).toPandas()
        assert len(one) == 10 and set(one.copy_idx) == {0}

    def test_invalid_epochs_raise(self, spark):
        df = _mkdocs(spark, [(1, "a", "x")])
        with pytest.raises(ValueError):
            epoch_mix(df, {"a": -0.5})
        with pytest.raises(ValueError):
            epoch_mix(df, {"a": float("nan")})


class TestShuffleShards:
    def test_key_and_shard_match_replica(self, spark):
        rows = [(i, "a", "t") for i in range(100)]
        got = with_shuffle_order(
            _mkdocs(spark, rows), n_shards=7, seed=3).collect()
        assert len(got) == 100
        for r in got:
            want_key = hashlib.md5(
                f"shuffle3:{r.doc_id}".encode()).hexdigest()
            assert r.shuffle_key == want_key
            assert r.shard == int(want_key[:15], 16) % 7

    def test_seed_changes_order_not_rows(self, spark):
        rows = [(i, "a", "t") for i in range(50)]
        df = _mkdocs(spark, rows)
        a = with_shuffle_order(df, n_shards=4, seed=0).toPandas()
        b = with_shuffle_order(df, n_shards=4, seed=1).toPandas()
        assert set(a.doc_id) == set(b.doc_id)
        assert not a.sort_values("doc_id").shuffle_key.equals(
            b.sort_values("doc_id").shuffle_key)

    def test_shards_contiguous_and_sorted(self, spark):
        rows = [(i, "a", "t") for i in range(200)]
        out = (shuffle_shards(_mkdocs(spark, rows), n_shards=5, seed=1)
               .withColumn("pid", F.spark_partition_id()).toPandas())
        # a shard never splits across partitions
        assert (out.groupby("shard").pid.nunique() == 1).all()
        # rows arrive sorted by (shard, key, id) within each partition
        for _, g in out.groupby("pid"):
            k = list(zip(g.shard, g.shuffle_key, g.doc_id))
            assert k == sorted(k)


class TestCorpusReport:
    def test_hand_computed(self, spark):
        rows = [(1, "a", "x y", "en"), (2, "a", "x y", "en"),
                (3, "a", "p q r", "fr"), (4, "b", "", "en"),
                (5, "b", "solo", None)]
        df = spark.createDataFrame(
            pd.DataFrame(rows,
                         columns=["doc_id", "source", "text", "lang"]))
        got = {r.source: r for r in
               corpus_report(df, lang_col="lang").collect()}
        a = got["a"]
        assert (a.n_docs, a.total_tokens, a.n_unique_texts) == (3, 7, 2)
        assert a.mean_tokens == pytest.approx(7 / 3)
        assert a.dup_frac == pytest.approx(1 / 3)
        assert a.top_lang == "en" and a.top_lang_frac == pytest.approx(2 / 3)
        b = got["b"]
        assert (b.n_docs, b.total_tokens, b.n_unique_texts) == (2, 1, 2)
        assert b.dup_frac == 0.0
        # tie 1-1 between 'en' and NULL: non-null langs win ties
        assert b.top_lang == "en"

    def test_without_lang(self, spark):
        df = _mkdocs(spark, [(1, "a", "x"), (2, "a", "x")])
        r = corpus_report(df).collect()[0]
        assert r.n_docs == 2 and r.n_unique_texts == 1
        assert "top_lang" not in corpus_report(df).columns


class TestExactQuantiles:
    def test_matches_numpy_sorted_rank(self, spark):
        import math as _math

        rng = random.Random(5)
        rows = [(i, rng.choice(["a", "b"]), None,
                 rng.choice([1, 2, 2, 3, 7, 7, 7, 50]))
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string, v long")
        from aloha_spark.operators.mixture import exact_group_quantiles
        got = {r.source: r for r in exact_group_quantiles(
            df, "v", [0.0, 0.5, 0.9, 1.0], by="source").collect()}
        by_src = {}
        for _, s, _, v in rows:
            by_src.setdefault(s, []).append(v)
        for s, vals in by_src.items():
            vals.sort()
            n = len(vals)
            for q, col in [(0.0, "q_0_0"), (0.5, "q_0_5"),
                           (0.9, "q_0_9"), (1.0, "q_1_0")]:
                want = vals[max(1, _math.ceil(q * n)) - 1]
                assert got[s][col] == want, (s, q)

    def test_null_only_group_and_null_values(self, spark):
        from aloha_spark.operators.mixture import exact_group_quantiles
        df = spark.createDataFrame(
            [("a", 1), ("a", None), ("b", None)],
            "source string, v int")
        got = {r.source: r for r in exact_group_quantiles(
            df, "v", [0.5], by="source").collect()}
        assert got["a"].q_0_5 == 1
        assert got["b"].q_0_5 is None

    def test_invalid_q_raises(self, spark):
        from aloha_spark.operators.mixture import exact_group_quantiles
        df = spark.createDataFrame([("a", 1)], "source string, v int")
        with pytest.raises(ValueError):
            exact_group_quantiles(df, "v", [1.5])
        with pytest.raises(ValueError):
            exact_group_quantiles(df, "v", [])

    def test_length_quantiles_in_report(self, spark):
        rows = [(i, "a", " ".join(["w"] * (i + 1))) for i in range(10)]
        r = corpus_report(_mkdocs(spark, rows),
                          length_quantiles=[0.5, 1.0]).collect()[0]
        # lengths 1..10: p50 = 5th smallest = 5, p100 = max = 10
        assert (r.q_0_5, r.q_1_0) == (5, 10)
        assert r.n_docs == 10


def _naive_pps(rows, k, salt="pps"):
    """Independent replica: per stratum, md5 order, exact integer
    floor-grid hits."""
    out = {}
    by_src = {}
    for i, src, w in rows:
        by_src.setdefault(src, []).append((i, max(0, w)))
    for src, docs in by_src.items():
        W = sum(w for _, w in docs)
        if W == 0:
            continue
        docs.sort(key=lambda d: (_bucket(d[0], salt), d[0]))
        cum = 0
        for i, w in docs:
            h = (cum + w) * k // W - cum * k // W
            cum += w
            if h > 0:
                out[i] = h
    return out


class TestPpsSample:
    @pytest.mark.parametrize("seed,k", [(1, 5), (2, 1), (3, 17)])
    def test_matches_integer_replica(self, spark, seed, k):
        from aloha_spark.operators.mixture import pps_sample
        rng = random.Random(seed)
        rows = [(i, rng.choice(["a", "b", None]), rng.randrange(0, 40))
                for i in range(120)]
        df = spark.createDataFrame(
            [(i, s, w) for i, s, w in rows],
            "doc_id long, source string, w long")
        got = {r.doc_id: r.n_hits for r in pps_sample(
            df, k, weight_col="w").collect()}
        assert got == _naive_pps(rows, k)

    def test_exactly_k_hits_and_pps_property(self, spark):
        from aloha_spark.operators.mixture import pps_sample
        rows = [(i, "a", 1 + i % 7) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, source string, "
                                         "w long")
        k = 20
        got = pps_sample(df, k, weight_col="w").collect()
        assert sum(r.n_hits for r in got) == k
        # a doc with weight > W/k is guaranteed at least one hit
        W = sum(w for _, _, w in rows)
        heavy = [(0, "b", W)]  # one doc holding all of stratum b's mass
        df2 = spark.createDataFrame(rows + heavy,
                                    "doc_id long, source string, w long")
        got2 = {(r.source, r.doc_id): r.n_hits
                for r in pps_sample(df2, k, weight_col="w").collect()}
        assert got2[("b", 0)] == k    # sole doc takes all k hits

    def test_zero_weight_stratum_and_defaults(self, spark):
        from aloha_spark.operators.mixture import pps_sample
        df = spark.createDataFrame(
            [(1, "a", "w w w"), (2, "b", "")],
            "doc_id long, source string, text string")
        got = pps_sample(df, 3).collect()   # weights = token counts
        assert [(r.doc_id, r.n_hits) for r in got] == [(1, 3)]
        with pytest.raises(ValueError):
            pps_sample(df, 0)

    def test_weighted_quantiles(self, spark):
        from aloha_spark.operators.mixture import exact_group_quantiles
        rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 7),
                ("z", 9, 0), ("z", 10, None)]
        df = spark.createDataFrame(rows,
                                   "source string, v int, w int")
        got = {r.source: r for r in exact_group_quantiles(
            df, "v", [0.5, 1.0], by="source", weight_col="w").collect()}
        # W=10, rank(0.5)=5: cum 1,2,3,10 -> first >=5 is v=4 (a
        # row-counted p50 would say 2 — the token-weighted story)
        assert (got["a"].q_0_5, got["a"].q_1_0) == (4, 4)
        # all-zero/NULL weights: NULL quantiles but the group survives
        assert got["z"].q_0_5 is None

    def test_null_group_with_values(self, spark):
        """A NULL group name is still a group: the restore join must be
        null-safe, matching the DuckDB GROUP BY semantics."""
        from aloha_spark.operators.mixture import exact_group_quantiles
        df = spark.createDataFrame(
            [(None, 5), (None, 9), ("a", 1)], "source string, v int")
        got = {r.source: r for r in exact_group_quantiles(
            df, "v", [1.0], by="source").collect()}
        assert got[None].q_1_0 == 9
        assert got["a"].q_1_0 == 1

    def test_null_text_counts_as_zero_tokens(self, spark):
        """NULL text contributes 0 tokens and at an exact budget
        boundary must drop exactly like a 0-token row."""
        from aloha_spark.operators.mixture import token_budget_sample
        rows = [(1, "a", "x y"), (2, "a", None), (3, "a", "x y z"),
                (4, "a", ""), (5, "a", "q")]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        naive_rows = [(i, s, t or "") for i, s, t in rows]
        for budget in (1, 2, 3, 5, 6, 100):
            got = {r.doc_id for r in token_budget_sample(
                df, {"a": budget}).collect()}
            assert got == _naive_budget_keep(
                naive_rows, {"a": budget}, 0), budget
