"""BPE tokenizer: golden merges from the Sennrich et al. running
example, fuzz parity against an INDEPENDENT naive replica (recompute
pair counts each round; encode by applying merges in rank order — a
different algorithm that must coincide), and Spark round-trips."""

import random
import re
from collections import Counter

import pandas as pd

from aloha_spark.operators.tokenizer import (
    BpeTokenizer, _fit_merges, train_bpe, with_bpe_ids)


# ------------------------------------------------ independent replica

def _naive_fit(word_counts, num_merges, min_pair_freq=2):
    words = [(list(w), c) for w, c in word_counts]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        nxt = []
        for syms, c in words:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, c))
        words = nxt
    return tuple(merges)


def _naive_encode_word(word, merges):
    syms = list(word)
    for a, b in merges:          # rank order, provably equivalent
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_sennrich_golden_merges():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = _fit_merges(wc, num_merges=4, min_pair_freq=2)
    assert merges == (("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))


def test_fit_fuzz_vs_naive_replica():
    rng = random.Random(0xBEE)
    for _ in range(25):
        vocab = ["ab", "abc", "banana", "bandana", "cabana",
                 "ana", "nab", "ba"]
        wc = sorted(Counter(rng.choices(vocab, k=rng.randint(5, 40)))
                    .items())
        n = rng.randint(1, 12)
        assert _fit_merges(wc, n, 2) == _naive_fit(wc, n, 2)


def test_encode_fuzz_vs_naive_replica():
    wc = [("banana", 4), ("bandana", 3), ("cabana", 2), ("nab", 5)]
    merges = _fit_merges(wc, 6, 1)
    tok = BpeTokenizer(merges=merges,
                       alphabet=tuple(sorted(set("".join(w for w, _ in wc)))))
    rng = random.Random(7)
    for _ in range(50):
        w = "".join(rng.choices("abcdn", k=rng.randint(0, 10)))
        assert tok.encode_word(w) == _naive_encode_word(w, merges)


def test_encode_decode_round_trip_and_unk():
    wc = [("hello", 3), ("help", 2)]
    tok = BpeTokenizer(merges=_fit_merges(wc, 3, 2),
                       alphabet=tuple(sorted(set("helop"))))
    ids = tok.encode("hello help")
    # the space was never in the alphabet: GPT-2 pattern attaches it to
    # the word, and the unseen " h"-leading char maps to -1
    pre = re.findall(tok.pattern, "hello help")
    assert pre == ["hello", " help"]
    assert -1 in ids
    clean = tok.encode("hello")
    assert -1 not in clean
    assert tok.decode(clean) == "hello"
    assert tok.encode(None) == []


def test_train_and_encode_on_spark(spark):
    docs = [(i, " ".join(random.Random(i).choices(
        ["the cat", "a cat sat", "the mat", "cats sat"], k=6)))
        for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tok = train_bpe(df, num_merges=30, min_pair_freq=2)
    # distributed word counts == local word counts
    local_wc = Counter()
    for _, t in docs:
        local_wc.update(re.findall(tok.pattern, t))
    want = _naive_fit(
        sorted(local_wc.items(), key=lambda kv: (-kv[1], kv[0]))[:200_000],
        30, 2)
    assert tok.merges == want
    out = with_bpe_ids(df, tok).toPandas().set_index("doc_id")
    for did, text in docs:
        ids = out.loc[did, "token_ids"]
        assert tok.decode(ids) == "".join(re.findall(tok.pattern, text))
        assert list(ids) == tok.encode(text)


def test_training_is_deterministic(spark):
    docs = [(i, f"token{i % 5} shared body text") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = train_bpe(df, num_merges=15)
    b = train_bpe(df.repartition(7), num_merges=15)
    assert a.merges == b.merges and a.alphabet == b.alphabet
    assert a.vocab == b.vocab
