"""Stateless java.util.Random-compatible reservoir sampling.

Port of the reference's pure-function LCG sampler
(aloha-core/.../util/rand/Rand.scala:20-119): a 48-bit linear
congruential generator (the java.util.Random constants) threads its seed
explicitly through every call, so sampling is deterministic, lock-free,
and trivially parallel — the exact property Spark partitions need.  The
reference's downsampled multilabel creator mandates "a unique seed per
unit of parallelism" (VwDownsampledMultilabelRowCreator.scala:57-67);
here the unit is the Spark partition: seed = f(base_seed, partition_id).
"""

from __future__ import annotations

from typing import Iterator, Optional

_MASK48 = (1 << 48) - 1
_MULT = 0x5DEECE66D
_ADD = 0xB


def init_seed_scramble(seed: int) -> int:
    """Rand.scala:20-21."""
    return (seed ^ _MULT) & _MASK48


def sample_combination(n: int, k: int, seed: int) -> tuple[list[int], int]:
    """Algorithm-R reservoir k-of-n with the java.util.Random LCG
    (Rand.scala:64-119).  Returns (indices, next_seed)."""
    if n <= k:
        return list(range(n)), seed
    next_seed = seed
    reservoir = list(range(k))
    i = k + 1
    while i <= n:
        if (i & -i) == i:  # power of two: unbiased via 31-bit multiply
            next_seed = (next_seed * _MULT + _ADD) & _MASK48
            swap = (i * (next_seed >> 17)) >> 31
        else:
            while True:
                next_seed = (next_seed * _MULT + _ADD) & _MASK48
                bits = next_seed >> 17
                value = bits % i
                # java nextInt(bound) rejection test, 32-bit overflow aware
                if not ((bits - value + (i - 1)) & 0x80000000):
                    break
            swap = value
        if swap < k:
            reservoir[swap] = i - 1
        i += 1
    return reservoir, next_seed


def partition_seed(base_seed: int, partition_id: int) -> int:
    """Deterministic per-partition starting seed (the 'separate starting
    state for each unit of parallelism' contract,
    StatefulRowCreator.scala:62-64)."""
    return init_seed_scramble((base_seed * 0x9E3779B97F4A7C15 + partition_id)
                              & ((1 << 63) - 1))


def downsample_negatives(n_labels: int, positive: set[int],
                         keep_negatives: int, seed: int
                         ) -> tuple[list[int], int]:
    """One row of negative downsampling for the multilabel sink
    (VwDownsampledMultilabelRowCreator.scala:74-130 semantics): keep all
    positives plus a k-combination of the negatives; threads the seed."""
    negatives = [i for i in range(n_labels) if i not in positive]
    idxs, next_seed = sample_combination(len(negatives), keep_negatives, seed)
    kept = sorted(positive | {negatives[i] for i in idxs})
    return kept, next_seed
