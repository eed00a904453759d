"""Aloha text-feature kernels: bag-of-words, n-grams, k-skip-n-grams,
min-hash truncation.

Semantics match the reference
(aloha-core/src/main/scala/com/eharmony/aloha/feature/SkipGrams.scala):

* ``bag(str, prefix="=", suffix="", split=r"\\s+", max_elements=None)``
  tokenizes and counts occurrences (SkipGrams.scala:93-109).
* ``n_grams`` = ``skip_grams`` with k=0 (SkipGrams.scala:84-91).
* ``skip_grams(str, n, k)``: for each anchor token i, if
  ``min(len, i+n+k) - i >= n``, emit one gram per in-order combination of
  n-1 indices from ``(i+1, min(len, i+n+k))``; join with ``sep`` and wrap
  with prefix/suffix (SkipGrams.scala:29-62, subsequence enumeration =
  util/SubSeqIterator.scala:12-50 ≡ itertools.combinations).
* min-hash truncation keeps the ``max_elements`` entries with the
  smallest ``(stringHash(key), key, count)`` triple (SkipGrams.scala:113-116).

These kernels are row-local (one short string each); at Spark level they
run over Arrow batches inside pandas UDFs (see
aloha_spark.plans.pipeline), never as per-row Python UDFs.
"""

from __future__ import annotations

import re
from collections import Counter
from itertools import combinations
from typing import Optional

from .hashing import string_hash_array

_DEFAULT_SPLIT = re.compile(r"\s+")
_SPLIT_CACHE: dict[str, re.Pattern] = {}


def _splitter(split: str) -> re.Pattern:
    if split == r"\s+":
        return _DEFAULT_SPLIT
    pat = _SPLIT_CACHE.get(split)
    if pat is None:
        pat = _SPLIT_CACHE[split] = re.compile(split)
    return pat


def _tokenize(s: str, split: str) -> list[str]:
    # java.util.regex Pattern.split: keeps a leading empty token when the
    # string starts with a separator match, strips ALL trailing empty
    # tokens, and returns [""] for empty input (no match).
    #
    # Fast path for the default pattern: str.split() (C whitespace scan,
    # ~4x re.split) matches Java \s+ semantics exactly when the string
    # is ASCII (Java \s is ASCII-only; python str.split also breaks on
    # unicode spaces) and has no leading separator (str.split drops the
    # leading empty token Java keeps).  Everything else takes the regex.
    if split == r"\s+" and s.isascii():
        if not s:
            return [""]
        if not s[0].isspace():
            return s.split()
    toks = _splitter(split).split(s)
    if len(toks) > 1:
        while toks and toks[-1] == "":
            toks.pop()
    return toks


def min_hash_truncate(counts: dict[str, float], max_elements: Optional[int]) -> dict[str, float]:
    """Keep max_elements entries with smallest (hash, key, count) triples."""
    if max_elements is None or len(counts) <= max_elements:
        return counts
    keys = list(counts.keys())
    hashes = string_hash_array(keys)
    ranked = sorted(zip(hashes.tolist(), keys), key=lambda t: (t[0], t[1]))
    return {k: counts[k] for _, k in ranked[:max_elements]}


def bag(s: str, prefix: str = "=", suffix: str = "", split: str = r"\s+",
        max_elements: Optional[int] = None) -> dict[str, float]:
    counts = Counter(f"{prefix}{t}{suffix}" for t in _tokenize(s, split))
    return min_hash_truncate({k: float(v) for k, v in counts.items()}, max_elements)


def skip_grams(s: str, n: int, k: int = 0, sep: str = "_", prefix: str = "=",
               suffix: str = "", split: str = r"\s+",
               max_elements: Optional[int] = None) -> dict[str, float]:
    tokens = _tokenize(s, split)
    length = len(tokens)
    m: Counter[str] = Counter()
    for i in range(length):
        end_excl = min(length, i + n + k)
        if end_excl - i < n:
            continue
        window = range(i + 1, min(length, i + n + k))
        for combo in combinations(window, n - 1):
            gram = prefix + tokens[i]
            for j in combo:
                gram += sep + tokens[j]
            m[gram + suffix] += 1
    return min_hash_truncate({k_: float(v) for k_, v in m.items()}, max_elements)


def n_grams(s: str, n: int, sep: str = "_", prefix: str = "=", suffix: str = "",
            split: str = r"\s+", max_elements: Optional[int] = None) -> dict[str, float]:
    return skip_grams(s, n, 0, sep, prefix, suffix, split, max_elements)
