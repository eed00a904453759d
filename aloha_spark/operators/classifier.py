"""Learned quality filtering: hashed-feature logistic regression.

Published pretraining pipelines gate web documents with a LEARNED
quality classifier, not just heuristics: GPT-3 trained a classifier on
WebText-vs-CommonCrawl (Brown et al. 2020, arXiv:2005.14165 appendix A)
and LLaMA used a fastText-style linear model (Touvron et al. 2023,
arXiv:2302.13971) — both are linear models over hashed bag-of-words
features, which is exactly what distributes well:

- **Featurize** (map-only): tokens hash to ``n_features`` buckets with
  the repo's engine-portable md5 bucket (operators/corpus.py:
  hash_bucket — replayable in DuckDB/Postgres, so scores can be
  audited off-cluster).  The bucket ids are computed JVM-side; an
  Arrow kernel turns them into per-document sparse counts.
- **Train** (full-batch gradient descent, T deterministic steps): the
  loss gradient of logistic regression is a SUM over documents, so
  each partition emits ONE dense partial-gradient row
  (``n_features+1`` float64s — e.g. 256 KB at 2^15 features) and the
  driver sums and steps.  No per-row driver traffic, no parameter
  server: the model rides task broadcasts.  At 10^11 documents each
  pass is one map-only scan of the persisted feature frame.
- **Score** (map-only): broadcast weights, vectorized
  ``sigmoid(w . x + b)`` per Arrow batch.

Determinism: zero init, fixed learning rate and iteration count, no
RNG anywhere.  Bitwise reproducibility holds for a fixed partitioning
(partials are summed in partition order); across different
partitionings float addition order changes, so parity is allclose at
~1e-9, pinned in tests/test_classifier.py together with an independent
numpy replica of the whole training loop.

Reference analog: the reference engine scores linear models per row
(aloha-core RegressionModel.scala) but trains nothing; the training
loop here is the distributed piece a corpus pipeline needs on top.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .corpus import hash_bucket
from .textstats import tokens_col


def feature_buckets(text: str = "text", n_features: int = 1 << 15,
                    salt: str = "qclf") -> Column:
    """Token-occurrence feature buckets for a text column — an
    ``array<long>`` with one md5 bucket per token occurrence.  The
    md5/conv expression inside the transform lambda runs interpreted
    (HOF lambdas are not codegen'd) — that is the disclosed price of an
    engine-portable feature hash; swap ``hash_bucket`` for xxhash64 in
    the lambda if auditability is not needed."""
    return F.transform(tokens_col(text),
                       lambda t: hash_bucket(t, salt=salt,
                                             n_buckets=n_features))


def featurize_hashed(df: DataFrame, text: str = "text",
                     id_col: str = "doc_id", n_features: int = 1 << 15,
                     salt: str = "qclf") -> DataFrame:
    """``(id, buckets array<long>)`` — the persisted training/scoring
    representation (bucket ids only; counts are rebuilt per batch in
    the kernels, cheaper than shipping parallel arrays)."""
    return df.select(F.col(id_col),
                     feature_buckets(text, n_features, salt).alias("buckets"))


def _counts_matrix(buckets_col: pd.Series, n_features: int,
                   l2_normalize: bool) -> "np.ndarray":
    """Dense (batch, n_features) float64 count matrix from a Series of
    bucket-id arrays.  Dense is fine: batches are ~10k rows and the
    matrix is transient; at very large n_features switch the kernels to
    scipy-free CSR (kept dense here — no scipy in the environment)."""
    n = len(buckets_col)
    x = np.zeros((n, n_features))
    for i, b in enumerate(buckets_col):
        if b is None or len(b) == 0:
            continue
        idx, cnt = np.unique(np.asarray(b, dtype=np.int64),
                             return_counts=True)
        x[i, idx] = cnt
    if l2_normalize:
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        np.divide(x, norms, out=x, where=norms > 0)
    return x


def train_logreg(features: DataFrame, label_col: str = "label", *,
                 buckets_col: str = "buckets", n_features: int = 1 << 15,
                 iterations: int = 30, lr: float = 1.0,
                 l2: float = 1e-4, l2_normalize: bool = True,
                 balance_classes: bool = False) -> "np.ndarray":
    """Full-batch gradient-descent logistic regression over hashed
    features.  ``features`` must carry ``buckets_col`` (from
    :func:`featurize_hashed`) and a 0/1 ``label_col``.

    Returns ``w`` of length ``n_features + 1`` (bias last).  Each
    iteration is one map-only pass: every partition contributes one
    dense partial-gradient row; gradients are averaged over N and the
    step is plain ``w -= lr * (grad + l2 * w)``.  The feature frame
    should be persisted by the caller if the input chain is expensive.

    ``balance_classes``: weight each example by ``n_total / (2 *
    n_class)`` (sklearn's ``class_weight="balanced"``) — the quality
    setup is almost always imbalanced (a small curated target vs a
    large corpus sample), and without balancing the bias term soaks up
    the prior and pushes every probability toward the majority class,
    making a fixed keep threshold meaningless.
    """
    spark = features.sparkSession
    n_total = features.count()
    if n_total == 0:
        raise ValueError("train_logreg: empty training frame")
    wpos = wneg = 1.0
    if balance_classes:
        n_pos = features.where(F.col(label_col) >= 0.5).count()
        if n_pos == 0 or n_pos == n_total:
            raise ValueError("balance_classes needs both classes present")
        wpos = n_total / (2.0 * n_pos)
        wneg = n_total / (2.0 * (n_total - n_pos))
    w = np.zeros(n_features + 1)
    sel = features.select(F.col(buckets_col).alias("b"),
                          F.col(label_col).cast("double").alias("y"))
    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(w.tobytes())

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wv = np.frombuffer(bc.value)
            g = np.zeros(n_features + 1)
            for pdf in batches:
                if pdf.empty:
                    continue
                x = _counts_matrix(pdf["b"], n_features, l2_normalize)
                y = pdf["y"].to_numpy()
                z = x @ wv[:-1] + wv[-1]
                p = 1.0 / (1.0 + np.exp(-z))
                r = (p - y) * np.where(y >= 0.5, wpos, wneg)
                g[:-1] += r @ x
                g[-1] += r.sum()
            yield pd.DataFrame({"g": [g.tobytes()]})

        rows = sel.mapInPandas(partial, schema="g binary").collect()
        grad = np.zeros(n_features + 1)
        for r in rows:
            grad += np.frombuffer(r["g"])
        grad /= n_total
        reg = l2 * w
        reg[-1] = 0.0                      # bias is not regularized
        w = w - lr * (grad + reg)
        bc.destroy()
    return w


def score_logreg(df: DataFrame, weights: "np.ndarray", *,
                 text: str = "text", id_col: str = "doc_id",
                 n_features: Optional[int] = None, salt: str = "qclf",
                 l2_normalize: bool = True,
                 out_col: str = "quality_prob") -> DataFrame:
    """Map-side scoring: broadcast weights, vectorized
    ``sigmoid(w . x + b)`` per Arrow batch.  Appends ``out_col`` to the
    input frame (one id-keyed join-free pass: the kernel sees the
    bucket array column computed inline)."""
    from pyspark.sql.pandas.functions import pandas_udf

    if n_features is None:
        n_features = len(weights) - 1
    if len(weights) != n_features + 1:
        raise ValueError(f"weights length {len(weights)} != "
                         f"n_features+1 ({n_features + 1})")
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(weights, dtype=np.float64).tobytes())

    @pandas_udf("double")
    def prob(buckets: pd.Series) -> pd.Series:
        wv = np.frombuffer(bc.value)
        x = _counts_matrix(buckets, len(wv) - 1, l2_normalize)
        z = x @ wv[:-1] + wv[-1]
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return df.withColumn(
        out_col, prob(feature_buckets(text, n_features, salt)))


def train_quality_classifier(positive: DataFrame, negative: DataFrame, *,
                             text: str = "text",
                             negative_text: Optional[str] = None,
                             n_features: int = 1 << 15,
                             salt: str = "qclf", **train_kw
                             ) -> "np.ndarray":
    """Convenience composition for the standard setup: ``positive`` is
    a curated high-quality reference set (wiki/books/target corpus),
    ``negative`` a random corpus sample; returns weights for
    :func:`score_logreg`.  Ids are irrelevant to training, so only the
    bucket arrays and labels are selected; the featurized union is
    persisted for the duration of training."""
    pos = positive.select(
        feature_buckets(text, n_features, salt).alias("buckets"),
        F.lit(1.0).alias("label"))
    neg = negative.select(
        feature_buckets(negative_text or text, n_features,
                        salt).alias("buckets"),
        F.lit(0.0).alias("label"))
    feats = pos.unionByName(neg).persist()
    try:
        train_kw.setdefault("balance_classes", True)
        return train_logreg(feats, n_features=n_features, **train_kw)
    finally:
        feats.unpersist()
