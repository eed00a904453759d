"""Vectorized port of ``scala.util.hashing.MurmurHash3.stringHash``.

The reference engine hashes every feature key with Scala's MurmurHash3
``stringHash`` seeded with ``0xf7ca7fd2`` (reference:
aloha-core/src/main/scala/com/eharmony/aloha/util/hashing/package.scala:9-37),
and LibSVM output allows a configurable salt
(aloha-core/.../dataset/libsvm/unlabeled/LibSvmRowCreator.scala:65-68).

Scala's ``stringHash`` is MurmurHash3 (public domain algorithm by Austin
Appleby) applied over the string's UTF-16 code units two-at-a-time:
each 32-bit block is ``(charAt(i) << 16) + charAt(i + 1)``; a trailing
odd char goes through ``mixLast`` only; finalization xors in the string
length then avalanches.  No Spark builtin matches (``F.hash`` is
Murmur3 x86_32 over UTF-8 *bytes* with seed 42), so we re-express the
algorithm in numpy so that whole Arrow batches of feature keys hash in
a few vector ops.

Golden values verified against the reference's own test pins
(aloha-core/src/test/scala/com/eharmony/aloha/feature/SkipGramsTest.scala:34-36).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

STRING_SEED = 0xF7CA7FD2  # scala.util.hashing.MurmurHash3.stringSeed

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_M5 = np.uint32(5)
_MADD = np.uint32(0xE6546B64)
_U32 = np.uint32(0xFFFFFFFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mix_last(h: np.ndarray, k: np.ndarray) -> np.ndarray:
    k = k * _C1
    k = _rotl(k, 15)
    k = k * _C2
    return h ^ k


def _mix(h: np.ndarray, k: np.ndarray) -> np.ndarray:
    h = _mix_last(h, k)
    h = _rotl(h, 13)
    return h * _M5 + _MADD


def _avalanche(h: np.ndarray) -> np.ndarray:
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


def _utf16_matrix(strings: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pack strings into a zero-padded (n, maxlen) uint32 matrix of UTF-16
    code units plus a length vector.  Surrogate pairs expand to two code
    units, matching JVM ``char`` semantics."""
    encoded = [s.encode("utf-16-be") for s in strings]
    lens = np.fromiter((len(e) >> 1 for e in encoded), dtype=np.int64, count=len(encoded))
    max_len = int(lens.max()) if len(lens) else 0
    out = np.zeros((len(encoded), max_len), dtype=np.uint32)
    if max_len:
        flat = np.frombuffer(b"".join(encoded), dtype=">u2").astype(np.uint32)
        mask = np.arange(max_len)[None, :] < lens[:, None]
        out[mask] = flat
    return out, lens


#: cross-batch memo for the default seed: reused Python workers see the
#: same (zipfian) vocabulary batch after batch, so most unique-key
#: tables are warm after the first few batches.  Bounded: cleared when
#: it exceeds the cap (a few hundred MB worst case, typical far less).
_HASH_MEMO: dict = {}
_HASH_MEMO_CAP = 1 << 21


def string_hash_array(strings: Sequence[str], seed: int = STRING_SEED) -> np.ndarray:
    """Hash a batch of strings; returns int32 ndarray.

    Column-wise loop: iteration count is ceil(max_token_len / 2), while
    all rows advance in lockstep under numpy — the per-batch Python
    overhead is O(max string length), not O(rows)."""
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    if seed == STRING_SEED:
        memo = _HASH_MEMO
        get = memo.get
        out = np.empty(n, dtype=np.int32)
        miss_i, miss_s = [], []
        for i, s in enumerate(strings):
            h = get(s)
            if h is None:
                miss_i.append(i)
                miss_s.append(s)
            else:
                out[i] = h
        if miss_s:
            hs = _string_hash_uncached(miss_s, seed)
            if len(memo) + len(miss_s) > _HASH_MEMO_CAP:
                memo.clear()
            for i, s, h in zip(miss_i, miss_s, hs.tolist()):
                out[i] = h
                memo[s] = h
        return out
    return _string_hash_uncached(strings, seed)


#: pad-matrix element budget for one hashing block (uint32 elements;
#: 1<<26 = 256 MB).  The matrix pads every row to the batch's LONGEST
#: string, so one multi-MB unbroken token (base64 blob, minified JS —
#: routine in corpus curation) times a large unique-token table would
#: otherwise allocate n_uniques x max_len x 4 bytes in one shot.
_PAD_BUDGET = 1 << 26


def _string_hash_uncached(strings: Sequence[str], seed: int) -> np.ndarray:
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    # fast path (virtually always): the whole batch fits one pad matrix.
    # (len(s) undercounts surrogate pairs by at most 2x — the budget is
    # an order-of-magnitude guard, not an exact accountant.)
    if n * int(lens.max()) * 2 <= _PAD_BUDGET:
        return _hash_block(strings, seed)
    # length-bucketed: hash in ascending-length blocks, each within
    # budget, so no block pads short strings to a pathological max
    order = np.argsort(lens, kind="stable")
    out = np.empty(n, dtype=np.int32)
    start = 0
    while start < n:
        end = start + 1
        while end < n and \
                (end - start + 1) * int(lens[order[end]]) * 2 <= _PAD_BUDGET:
            end += 1
        idxs = order[start:end]
        out[idxs] = _hash_block([strings[i] for i in idxs], seed)
        start = end
    return out


def _hash_block(strings: Sequence[str], seed: int) -> np.ndarray:
    n = len(strings)
    chars, lens = _utf16_matrix(strings)
    max_len = chars.shape[1]
    h = np.full(n, np.uint32(seed & 0xFFFFFFFF), dtype=np.uint32)
    with np.errstate(over="ignore"):
        i = 0
        while i + 1 < max_len:
            pair_rows = lens > i + 1  # both code units exist -> full mix block
            if pair_rows.any():
                data = (chars[:, i] << np.uint32(16)) + chars[:, i + 1]
                h = np.where(pair_rows, _mix(h, data), h)
            i += 2
        # trailing single code unit (odd-length strings) -> mixLast
        odd = (lens & 1).astype(bool)
        if odd.any():
            tail_idx = np.maximum(lens - 1, 0)
            tail = chars[np.arange(n), tail_idx] if max_len else np.zeros(n, dtype=np.uint32)
            h = np.where(odd, _mix_last(h, tail), h)
        h ^= lens.astype(np.uint32)
        h = _avalanche(h)
    return h.view(np.int32)


def string_hash(s: str, seed: int = STRING_SEED) -> int:
    """Scalar convenience wrapper (matches Scala stringHash exactly)."""
    return int(string_hash_array([s], seed)[0])


def masked_hash_array(strings: Sequence[str], num_bits: int = 18,
                      seed: int = STRING_SEED) -> np.ndarray:
    """``stringHash(k) & ((1 << numBits) - 1)`` — the LibSVM index rule
    (reference LibSvmRowCreator.scala:21-48, default numBits=18)."""
    if not 1 <= num_bits <= 31:
        raise ValueError(f"num_bits must be in [1, 31], got {num_bits}")
    mask = np.int32((1 << num_bits) - 1)
    return string_hash_array(strings, seed) & mask


def ordered_hash_ints(values: Iterable[int], seed: int = 0xE73A8B15) -> int:
    """Port of ``scala.util.hashing.MurmurHash3.orderedHash`` over ints
    (used by the reference's HashedCategoricalDistribution,
    aloha-core/.../util/rand/HashedCategoricalDistribution.scala:12-46).

    Elements are hashed via their ``##`` (identity for Int), mixed in order.
    """
    h = np.uint32(seed & 0xFFFFFFFF)
    n = 0
    with np.errstate(over="ignore"):
        for v in values:
            h = _mix(h, np.uint32(np.int64(v) & 0xFFFFFFFF))
            n += 1
        h ^= np.uint32(n)
        h = _avalanche(h)
    return int(h.view(np.int32) if isinstance(h, np.ndarray) else np.uint32(h).view(np.int32))


def ordered_hash_strings(values: Sequence[str], seed: int = 0xE73A8B15) -> int:
    """orderedHash over strings: each element contributes its own
    ``stringHash`` (Scala ``Any.##`` on String is ``hashCode``; the
    reference hashes feature *values* whose ``##`` is String.hashCode)."""
    h = np.uint32(seed & 0xFFFFFFFF)
    n = 0
    with np.errstate(over="ignore"):
        for v in values:
            h = _mix(h, np.uint32(java_string_hash_code(v) & 0xFFFFFFFF))
            n += 1
        h ^= np.uint32(n)
        h = _avalanche(h)
    return int(np.uint32(h).view(np.int32))


def java_string_hash_code(s: str) -> int:
    """java.lang.String.hashCode (s[0]*31^(n-1) + ...), 32-bit wrapping."""
    h = 0
    units = np.frombuffer(s.encode("utf-16-be"), dtype=">u2").astype(np.int64)
    for u in units:
        h = (h * 31 + int(u)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h
