"""Hashed-feature logistic regression (operators/classifier.py):
separation on a synthetic quality task, exact replica parity of the
distributed training loop, partitioning tolerance, and scoring
contracts."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from aloha_spark.operators.classifier import (
    featurize_hashed, score_logreg, train_logreg,
    train_quality_classifier)

N_FEAT = 1 << 10


def _corpora(spark, n=60):
    # two disjoint vocabularies: "good" docs vs "junk" docs
    pos = [Row(doc_id=i, text=f"alpha beta gamma delta w{i % 7}")
           for i in range(n)]
    neg = [Row(doc_id=1000 + i, text=f"zz{i % 9} qq vv kk jj")
           for i in range(n)]
    return spark.createDataFrame(pos), spark.createDataFrame(neg)


def _np_replica(bucket_lists, labels, n_features, iterations, lr, l2):
    """Independent single-machine replica of the training loop (dense
    numpy end to end, no shared code paths beyond the math)."""
    n = len(bucket_lists)
    x = np.zeros((n, n_features))
    for i, b in enumerate(bucket_lists):
        if b:
            idx, cnt = np.unique(np.asarray(b), return_counts=True)
            x[i, idx] = cnt
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = np.divide(x, norms, where=norms > 0)
    y = np.asarray(labels, dtype=float)
    w = np.zeros(n_features + 1)
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(x @ w[:-1] + w[-1])))
        g = np.concatenate([(p - y) @ x, [(p - y).sum()]]) / n
        reg = l2 * w
        reg[-1] = 0.0
        w = w - lr * (g + reg)
    return w


def test_classifier_separates_quality(spark):
    pos, neg = _corpora(spark)
    w = train_quality_classifier(pos, neg, n_features=N_FEAT,
                                 iterations=40, lr=2.0)
    scored_pos = score_logreg(pos, w, n_features=N_FEAT) \
        .agg(F.avg("quality_prob")).collect()[0][0]
    scored_neg = score_logreg(neg, w, n_features=N_FEAT) \
        .agg(F.avg("quality_prob")).collect()[0][0]
    assert scored_pos > 0.85, scored_pos
    assert scored_neg < 0.15, scored_neg


def test_training_matches_numpy_replica(spark):
    pos, neg = _corpora(spark, n=25)
    feats = (featurize_hashed(pos, n_features=N_FEAT)
             .withColumn("label", F.lit(1.0))
             .unionByName(featurize_hashed(neg, n_features=N_FEAT)
                          .withColumn("label", F.lit(0.0))))
    rows = feats.orderBy("doc_id").collect()
    w_ref = _np_replica([list(r["buckets"]) for r in rows],
                        [r["label"] for r in rows],
                        N_FEAT, iterations=15, lr=1.0, l2=1e-4)
    w = train_logreg(feats, n_features=N_FEAT, iterations=15, lr=1.0,
                     l2=1e-4)
    # partial sums run per partition, so addition order differs from
    # the replica's single dense pass: allclose, not bitwise
    assert np.allclose(w, w_ref, atol=1e-9), np.abs(w - w_ref).max()


def test_training_partitioning_tolerance(spark):
    pos, neg = _corpora(spark, n=30)
    feats = (featurize_hashed(pos, n_features=N_FEAT)
             .withColumn("label", F.lit(1.0))
             .unionByName(featurize_hashed(neg, n_features=N_FEAT)
                          .withColumn("label", F.lit(0.0))))
    w1 = train_logreg(feats.repartition(2), n_features=N_FEAT,
                      iterations=10)
    w8 = train_logreg(feats.repartition(8), n_features=N_FEAT,
                      iterations=10)
    assert np.allclose(w1, w8, atol=1e-9)


def test_balanced_training_survives_imbalance(spark):
    # the realistic quality setup: ONE small curated target vs a 20x
    # larger corpus sample (which itself contains target-like docs) —
    # without class balancing the bias soaks up the prior and every
    # probability collapses below any fixed threshold
    pos = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta")])
    neg_rows = [Row(doc_id=100 + i, text=f"zz{i % 9} qq vv kk jj")
                for i in range(14)]
    neg_rows += [Row(doc_id=200 + i, text=f"alpha beta gamma delta w{i}")
                 for i in range(6)]
    neg = spark.createDataFrame(neg_rows)
    w = train_quality_classifier(pos, neg, n_features=N_FEAT,
                                 iterations=30)
    scored = score_logreg(
        spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta gamma delta w3"),
             Row(doc_id=2, text="zz3 qq vv kk jj")]),
        w, n_features=N_FEAT).collect()
    got = {r["doc_id"]: r["quality_prob"] for r in scored}
    assert got[1] >= 0.5 > got[2], got
    # balance_classes with a single class present fails loudly
    from aloha_spark.operators.classifier import featurize_hashed
    with pytest.raises(ValueError, match="both classes"):
        train_logreg(
            featurize_hashed(pos, n_features=N_FEAT)
            .withColumn("label", F.lit(1.0)),
            n_features=N_FEAT, balance_classes=True)


def test_score_contracts(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text=None),
         Row(doc_id=3, text="")])
    w = np.zeros(N_FEAT + 1)
    out = {r["doc_id"]: r["quality_prob"]
           for r in score_logreg(docs, w, n_features=N_FEAT).collect()}
    # zero weights -> sigmoid(0) = 0.5 everywhere, incl. empty/NULL text
    assert all(abs(v - 0.5) < 1e-12 for v in out.values())
    with pytest.raises(ValueError, match="weights length"):
        score_logreg(docs, np.zeros(10), n_features=N_FEAT).collect()
    with pytest.raises(ValueError, match="empty"):
        train_logreg(
            featurize_hashed(docs, n_features=N_FEAT)
            .withColumn("label", F.lit(1.0)).limit(0),
            n_features=N_FEAT)
