"""Hypothesis fuzz for the token-budget keep contract: random corpora
(0-token docs, singleton strata, budgets landing exactly on cumulative
boundaries) against the naive pure-Python replica.  Spark evaluates
one generated corpus per example, so examples are capped; the
generator is biased toward exact-boundary budgets — the only place the
coarse-bucket classifier can disagree with the naive definition."""

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from aloha_spark.operators.mixture import token_budget_sample


def _bucket(v, salt="budget"):
    return int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:15],
               16) % 10000


def _naive(rows, budgets, default):
    kept, by_src = set(), {}
    for i, src, ntok in rows:
        by_src.setdefault(src, []).append((i, ntok))
    for src, docs in by_src.items():
        b = budgets.get(src, default)
        docs.sort(key=lambda d: (_bucket(d[0]), d[0]))
        cum = 0
        for i, ntok in docs:
            if cum < b:
                kept.add(i)
            cum += ntok
    return kept


@st.composite
def corpus_and_budgets(draw):
    n = draw(st.integers(1, 60))
    sources = ["a", "b", "c"]
    rows = []
    for i in range(n):
        rows.append((i, draw(st.sampled_from(sources)),
                     draw(st.integers(0, 12))))
    budgets = {}
    for s in sources:
        tot = sum(t for _, src, t in rows if src == s)
        # bias toward exact cumulative boundaries: pick a prefix sum of
        # the stratum's priority order as the budget half the time
        if draw(st.booleans()) and tot > 0:
            docs = sorted(((i, t) for i, src, t in rows if src == s),
                          key=lambda d: (_bucket(d[0]), d[0]))
            k = draw(st.integers(0, len(docs)))
            budgets[s] = sum(t for _, t in docs[:k])
        else:
            budgets[s] = draw(st.integers(0, max(1, tot + 3)))
    default = draw(st.integers(0, 10))
    return rows, budgets, default


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus_and_budgets())
def test_token_budget_contract_fuzz(spark, case):
    rows, budgets, default = case
    pdf = pd.DataFrame(
        [(i, s, " ".join(["w"] * t)) for i, s, t in rows],
        columns=["doc_id", "source", "text"])
    df = spark.createDataFrame(pdf)
    got = {r.doc_id for r in token_budget_sample(
        df, budgets, default_budget=default).select("doc_id").collect()}
    assert got == _naive(rows, budgets, default), (budgets, default)
