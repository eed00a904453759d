"""LibSVM line sinks.

Reference semantics (aloha-core/.../dataset/libsvm/unlabeled/
LibSvmRowCreator.scala:21-48 and labeled/LibSvmLabelRowCreator.scala):
every feature key is hashed with MurmurHash3 stringHash (configurable
salt) and masked to ``num_bits`` (default 18); entries are deduped with
**last key wins** (SortedMap insertion order) and emitted sorted by
index as ``idx:value`` where the value prints via Scala string
interpolation (java.lang.Double.toString).  The labeled variant prepends
the label string.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..functions.formatting import java_double_to_string
from ..functions.hashing import STRING_SEED, string_hash_array

Bags = Sequence[dict[str, float]]

DEFAULT_NUM_BITS = 18


def libsvm_indices_values(bags: Bags, num_bits: int = DEFAULT_NUM_BITS,
                          seed: int = STRING_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Hash + mask + sort + dedupe(last wins). Returns (indices, values)."""
    if not 1 <= num_bits <= 31:
        raise ValueError(f"num_bits must be in [1, 31], got {num_bits}")
    keys: list[str] = []
    vals: list[float] = []
    for bag in bags:
        for k, v in bag.items():
            keys.append(k)
            vals.append(float(v))
    if not keys:
        return np.empty(0, dtype=np.int32), np.empty(0, dtype=np.float64)
    mask = np.int32((1 << num_bits) - 1)
    idx = string_hash_array(keys, seed) & mask
    values = np.asarray(vals)
    # dedupe: the LAST occurrence of an index wins (SortedMap '+' insert)
    order = np.arange(len(idx))
    # stable sort by idx keeps insertion order within equal indices;
    # np.unique-style keep-last via reversed stable sort
    sort = np.argsort(idx, kind="stable")
    sorted_idx = idx[sort]
    keep = np.ones(len(sorted_idx), dtype=bool)
    keep[:-1] = sorted_idx[1:] != sorted_idx[:-1]
    # within each run of equal idx, the latest insertion has the largest
    # original position; stable sort preserves insertion order, so the
    # last element of each run is the last inserted -> keep it.
    del order
    return sorted_idx[keep], values[sort][keep]


def libsvm_line(bags: Bags, num_bits: int = DEFAULT_NUM_BITS,
                seed: int = STRING_SEED) -> str:
    idx, vals = libsvm_indices_values(bags, num_bits, seed)
    return " ".join(f"{i}:{java_double_to_string(v)}" for i, v in zip(idx.tolist(), vals.tolist()))


def labeled_libsvm_line(bags: Bags, label: Optional[str],
                        num_bits: int = DEFAULT_NUM_BITS,
                        seed: int = STRING_SEED) -> str:
    body = libsvm_line(bags, num_bits, seed)
    if label is None:
        return body
    return f"{label} {body}" if body else str(label)
