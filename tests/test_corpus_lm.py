"""Corpus-LM and sub-document curation ops: paragraph-level exact
dedup, DSIR importance weighting, unigram-LM cross-entropy scoring.

Every expectation here is computed by an INDEPENDENT pure-Python
replica (hashlib md5 buckets, math.log sums, a first-occurrence scan),
not by re-running the operator."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import Row, functions as F

from aloha_spark.operators.corpus import (
    dsir_logweight, with_unigram_logprob)
from aloha_spark.operators.dedup import dedup_paragraphs


# ---------------------------------------------------------- paragraphs

PARA_DOCS = [
    (0, "alpha beta\n\ncookie banner\n\ngamma delta"),
    (1, "cookie banner\n\nepsilon zeta"),          # dup para dropped
    (2, "alpha beta\n\ncookie banner"),            # all paras are dups
    (3, "  \n\n\n\nunique tail"),                  # empties dropped
    (4, None),                                     # NULL text vanishes
]


def _py_para_dedup(docs, delim="\n\n"):
    seen, out = set(), {}
    for did, text in sorted(docs):
        if text is None:
            continue
        kept = []
        for p in text.split(delim):
            p = p.strip()
            if p and p not in seen:
                seen.add(p)
                kept.append(p)
        if kept:
            out[did] = (delim.join(kept), len(kept))
    return out


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_paras_kept"])
           for r in dedup_paragraphs(df).collect()}
    assert got == _py_para_dedup(PARA_DOCS)
    # doc 2 contributed nothing and doc 4 was NULL: both absent
    assert 2 not in got and 4 not in got
    # order within a doc is preserved
    assert got[0][0] == "alpha beta\n\ncookie banner\n\ngamma delta"


def test_paragraph_dedup_literal_delimiter_with_metachars(spark):
    # "||" is a regex alternation bomb if not \Q..\E-quoted
    docs = [(0, "a b||c d"), (1, "c d||e f")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in dedup_paragraphs(df, delim="||").collect()}
    assert got == {0: "a b||c d", 1: "e f"}


def test_paragraph_dedup_idempotent(spark):
    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    once = dedup_paragraphs(df)
    twice = dedup_paragraphs(once.select("doc_id", "text"))
    a = {tuple(r) for r in once.collect()}
    b = {tuple(r) for r in twice.collect()}
    assert a == b


# ---------------------------------------------------------------- DSIR

def _bucket(gram, salt="dsir", n_buckets=64):
    h = hashlib.md5((salt + gram).encode()).hexdigest()
    return int(h[:15], 16) % n_buckets


def _grams(text):
    toks = text.split() if text and text.strip() else []
    return toks + [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]


def _py_dsir(docs, target, n_buckets=64):
    tc, rc = Counter(), Counter()
    for t in target:
        tc.update(_bucket(g, n_buckets=n_buckets) for g in _grams(t))
    for _, t in docs:
        rc.update(_bucket(g, n_buckets=n_buckets) for g in _grams(t))
    tt, tr = sum(tc.values()), sum(rc.values())
    out = {}
    for did, t in docs:
        gs = [_bucket(g, n_buckets=n_buckets) for g in _grams(t)]
        w = sum(math.log((tc[b] + 1.0) / (tt + n_buckets))
                - math.log((rc[b] + 1.0) / (tr + n_buckets)) for b in gs)
        out[did] = (len(gs), w)
    return out


def test_dsir_matches_independent_replica(spark):
    docs = [(i, " ".join(f"w{(i * 3 + j) % 9}" for j in range(6)))
            for i in range(40)] + [(99, ""), (100, None)]
    target = [" ".join(f"w{j % 4}" for j in range(6)) for _ in range(5)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in target], "text string")
    got = {r["doc_id"]: (r["n_grams"], r["dsir_logweight"])
           for r in dsir_logweight(ddf, tdf, n_buckets=64).collect()}
    want = _py_dsir(docs, target, n_buckets=64)
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0], did
        assert got[did][1] == pytest.approx(want[did][1], abs=1e-9), did
    # target-lookalike docs outscore the rest
    assert got[99] == (0, 0.0) and got[100] == (0, 0.0)


def test_dsir_prefers_target_like_documents(spark):
    docs = [(0, "aa bb aa bb aa bb"), (1, "zz yy xx ww vv uu")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame([("aa bb aa bb",)], "text string")
    got = {r["doc_id"]: r["dsir_logweight"]
           for r in dsir_logweight(ddf, tdf, n_buckets=256).collect()}
    assert got[0] > got[1]


def test_dsir_rejects_bad_buckets(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_logweight(df, df, n_buckets=0)


# ------------------------------------------------------- unigram xent

def _py_xent(docs):
    c = Counter()
    for _, t in docs:
        c.update(t.split() if t and t.strip() else [])
    n = sum(c.values())
    out = {}
    for did, t in docs:
        toks = t.split() if t and t.strip() else []
        if not toks:
            out[did] = (0, None)
        else:
            out[did] = (len(toks),
                        -sum(math.log(c[x] / n) for x in toks) / len(toks))
    return out


XDOCS = [(0, "the the the cat"), (1, "the cat sat"),
         (2, "rare tokens here"), (3, ""), (4, None)]


def test_unigram_xent_matches_replica_and_ranks_noise_high(spark):
    df = spark.createDataFrame(XDOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["xent"])
           for r in with_unigram_logprob(df, head_k=2).collect()}
    want = _py_xent(XDOCS)
    assert set(got) == set(want)
    for did, (n, x) in want.items():
        assert got[did][0] == n, did
        if x is None:
            assert got[did][1] is None, did
        else:
            assert got[did][1] == pytest.approx(x, abs=1e-9), did
    # all-common-token doc scores lower than the all-rare one
    assert got[0][1] < got[2][1]


def test_unigram_xent_hybrid_equals_plain_join(spark):
    docs = [(i, " ".join(f"t{(i * 5 + j) % 23}" for j in range(8)))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    hybrid = {tuple(r) for r in
              with_unigram_logprob(df, head_k=3).collect()}
    plain = {tuple(r) for r in
             with_unigram_logprob(df, head_k=0).collect()}
    assert {(d, n, round(x, 9)) for d, n, x in hybrid} == \
           {(d, n, round(x, 9)) for d, n, x in plain}


def test_unigram_xent_rejects_negative_head(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        with_unigram_logprob(df, head_k=-1)


# ------------------------------------------------- randomized parity

def test_paragraph_dedup_fuzz_vs_replica(spark):
    """50 random corpora checked in ONE Spark pass: each corpus's
    tokens carry a unique prefix, so no paragraph can collide across
    corpora and global dedup decomposes into per-corpus dedup — the
    pure-Python replica then verifies each corpus independently."""
    import random

    rng = random.Random(0xC0FFEE)
    docs, per_corpus = [], {}
    did = 0
    for c in range(50):
        n_docs = rng.randint(1, 8)
        vocab = [f"c{c}w{k}" for k in range(rng.randint(1, 6))]
        corpus = []
        for _ in range(n_docs):
            n_paras = rng.randint(0, 5)
            paras = [" ".join(rng.choices(vocab, k=rng.randint(1, 4)))
                     for _ in range(n_paras)]
            # sprinkle whitespace-only and empty paragraphs
            if rng.random() < 0.3:
                paras.insert(rng.randint(0, len(paras)), "  ")
            text = "\n\n".join(paras) if paras else (
                None if rng.random() < 0.5 else "")
            corpus.append((did, text))
            did += 1
        per_corpus[c] = corpus
        docs += corpus
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_paras_kept"])
           for r in dedup_paragraphs(df).collect()}
    want = {}
    for corpus in per_corpus.values():
        want.update(_py_para_dedup(corpus))
    assert got == want


def test_dsir_and_xent_edge_corpora(spark):
    """Degenerate corpora: unicode tokens, single-doc corpus, target
    disjoint from the corpus, all-empty corpus."""
    uni = [(0, "héllo wörld héllo"), (1, "καλό κείμενο"), (2, "héllo")]
    df = spark.createDataFrame(uni, "doc_id long, text string")
    tgt = spark.createDataFrame([("héllo wörld",)], "text string")
    got = {r["doc_id"]: (r["n_grams"], r["dsir_logweight"])
           for r in dsir_logweight(df, tgt, n_buckets=32).collect()}
    want = _py_dsir(uni, ["héllo wörld"], n_buckets=32)
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=1e-9)

    # target disjoint from the corpus: every weight finite and negative
    tgt2 = spark.createDataFrame([("zz yy xx",)], "text string")
    w = [r["dsir_logweight"]
         for r in dsir_logweight(df, tgt2, n_buckets=32).collect()]
    assert all(v < 0 for v in w)

    # single-doc corpus: xent == mean -ln p under its own LM
    one = [(0, "a b a")]
    df1 = spark.createDataFrame(one, "doc_id long, text string")
    got1 = with_unigram_logprob(df1, head_k=1).collect()[0]
    want1 = _py_xent(one)[0]
    assert got1["n_tokens"] == 3
    assert got1["xent"] == pytest.approx(want1[1], abs=1e-12)

    # all-empty corpus: rows survive with n_tokens 0 / NULL xent
    dfe = spark.createDataFrame([(0, ""), (1, None)],
                                "doc_id long, text string")
    rows = {r["doc_id"]: (r["n_tokens"], r["xent"])
            for r in with_unigram_logprob(dfe).collect()}
    assert rows == {0: (0, None), 1: (0, None)}


# ------------------------------------------ duplicated-span removal

def _py_span_dedup(docs, n):
    """Independent replica: first (doc_id, pos) occurrence of each
    n-token window wins; every other occurrence masks its tokens."""
    first = {}
    for did, text in sorted(docs):
        toks = text.split() if text and text.strip() else []
        for p in range(len(toks) - n + 1):
            first.setdefault(" ".join(toks[p:p + n]), (did, p))
    out = {}
    for did, text in docs:
        if text is None:
            out[did] = (None, 0)
            continue
        toks = text.split() if text.strip() else []
        covered = set()
        for p in range(len(toks) - n + 1):
            if first[" ".join(toks[p:p + n])] != (did, p):
                covered.update(range(p, p + n))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[did] = (" ".join(kept), len(covered))
    return out


SPAN_DOCS = [
    (0, "a b c d e f g"),
    (1, "x y a b c d q"),            # "a b c d" span dup vs doc 0
    (2, "x y z x y z"),              # internal repeat keeps one copy
    (3, "short"),                    # shorter than n: untouched
    (4, ""),
    (5, None),
]


def test_span_dedup_matches_replica(spark):
    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    from aloha_spark.operators.dedup import remove_duplicate_spans
    got = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(df, n=3).collect()}
    want = _py_span_dedup(SPAN_DOCS, 3)
    assert got == want
    # the cross-doc span really was removed and the rest kept
    assert got[1][0] == "x y q"
    # internal repeat: exactly one copy survives
    assert got[2][0] == "x y z"
    # untouched families
    assert got[0] == ("a b c d e f g", 0)
    assert got[3] == ("short", 0)
    assert got[4] == ("", 0) and got[5] == (None, 0)


def test_span_dedup_fuzz_vs_replica(spark):
    """40 random corpora, token-namespaced per corpus, one Spark pass."""
    import random
    from aloha_spark.operators.dedup import remove_duplicate_spans

    rng = random.Random(0xBEEF)
    docs, per_corpus = [], {}
    did = 0
    for c in range(40):
        vocab = [f"c{c}t{k}" for k in range(rng.randint(2, 5))]
        corpus = []
        for _ in range(rng.randint(1, 6)):
            k = rng.randint(0, 12)
            text = " ".join(rng.choices(vocab, k=k)) if k else (
                None if rng.random() < 0.5 else "")
            corpus.append((did, text))
            did += 1
        per_corpus[c] = corpus
        docs += corpus
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(df, n=3).collect()}
    want = {}
    for corpus in per_corpus.values():
        want.update(_py_span_dedup(corpus, 3))
    assert got == want


def test_span_dedup_rejects_tiny_n(spark):
    from aloha_spark.operators.dedup import remove_duplicate_spans
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, n=1)


# ------------------------------------------------- frequent-line filter

def _py_line_filter(docs, delim="\n", max_freq=2):
    from collections import Counter
    freq = Counter()
    for _, text in docs:
        if text is None:
            continue
        freq.update(ln.strip() for ln in text.split(delim)
                    if ln.strip())
    out = {}
    for did, text in docs:
        if text is None:
            continue
        lines = [ln.strip() for ln in text.split(delim) if ln.strip()]
        kept = [ln for ln in lines if freq[ln] <= max_freq]
        if kept:
            out[did] = (delim.join(kept), len(kept), len(lines) - len(kept))
    return out


LINE_DOCS = [
    (0, "real content one\ncookie banner\nreal content two"),
    (1, "cookie banner\nunique line a"),
    (2, "cookie banner\nunique line b"),
    (3, "cookie banner"),                   # only boilerplate -> vanishes
    (4, "seen twice\nbody"),
    (5, "seen twice\nother body"),          # freq 2 <= max_freq: kept
    (6, "   \n\n  "),                       # whitespace-only -> vanishes
    (7, None),
]


def test_frequent_line_filter_drops_all_occurrences(spark):
    from aloha_spark.operators.dedup import filter_frequent_lines
    df = spark.createDataFrame(LINE_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
           for r in filter_frequent_lines(df).collect()}
    assert got == _py_line_filter(LINE_DOCS)
    # "cookie banner" appears 4x > 2: removed EVERYWHERE (vs paragraph
    # dedup which would keep the first occurrence)
    assert got[0][0] == "real content one\nreal content two"
    assert 3 not in got and 6 not in got and 7 not in got
    # frequency exactly at the threshold is kept
    assert got[4] == ("seen twice\nbody", 2, 0)


def test_frequent_line_filter_fuzz_vs_replica(spark):
    """30 random corpora, line-namespaced per corpus, one Spark pass."""
    import random
    from aloha_spark.operators.dedup import filter_frequent_lines

    rng = random.Random(0xF00D)
    docs, per_corpus, did = [], {}, 0
    for c in range(30):
        pool = [f"c{c} line {k}" for k in range(rng.randint(1, 4))]
        corpus = []
        for _ in range(rng.randint(1, 5)):
            k = rng.randint(0, 6)
            text = "\n".join(rng.choice(pool + ["", "  "])
                             for _ in range(k)) if k else (
                None if rng.random() < 0.5 else "")
            corpus.append((did, text))
            did += 1
        per_corpus[c] = corpus
        docs += corpus
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
           for r in filter_frequent_lines(df, max_freq=2).collect()}
    want = {}
    for corpus in per_corpus.values():
        want.update(_py_line_filter(corpus, max_freq=2))
    assert got == want


def test_frequent_line_filter_literal_delimiter(spark):
    from aloha_spark.operators.dedup import filter_frequent_lines
    docs = [(0, "a b|.|boiler"), (1, "boiler|.|c d"), (2, "boiler|.|e f")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in filter_frequent_lines(df, delim="|.|",
                                          max_freq=2).collect()}
    assert got == {0: "a b", 1: "c d", 2: "e f"}
