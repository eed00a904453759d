"""Vectorized batch kernels for the common single-call feature specs.

The generic batch tier evaluates a compiled Python expression per row;
for the overwhelmingly common specs — ``ind(${x})``, ``bag(${text})``,
``nGrams(...)``, ``skipGrams(...)``, ``sos2(...)``, ``sos2U(...)``,
``csos2(...)`` — these kernels process a whole Arrow batch at once
(numpy for the arithmetic, one pass for the string work), skipping
eval/argument-marshalling overhead entirely.  Each returns
``list[dict[str,float] | None]`` aligned with the input (None = missing).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd

from .scalars import UNK_BAG, csos2
from .textfeatures import bag, n_grams, skip_grams


def _is_missing(v) -> bool:
    return v is None or (isinstance(v, float) and v != v)


def ind_batch(values: pd.Series) -> list:
    """Vectorized indicator. None -> None (caller applies UNK + missing)."""
    out: list = [None] * len(values)
    vals = values.tolist()
    for i, v in enumerate(vals):
        if _is_missing(v):
            continue
        if isinstance(v, bool):
            v = "true" if v else "false"
        elif isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
            v = f"{v:.1f}"
        out[i] = {f"={v}": 1.0}
    return out


def _text_kernel_batch(kernel, texts: pd.Series, args: tuple,
                       kwargs: dict) -> list:
    out: list = [None] * len(texts)
    vals = texts.tolist()
    for i, t in enumerate(vals):
        if _is_missing(t):
            continue
        out[i] = kernel(t, *args, **kwargs)
    return out


def bag_batch(texts, *args, **kwargs):
    return _text_kernel_batch(bag, texts, args, kwargs)


def ngrams_batch(texts, *args, **kwargs):
    return _text_kernel_batch(n_grams, texts, args, kwargs)


def skipgrams_batch(texts, *args, **kwargs):
    return _text_kernel_batch(skip_grams, texts, args, kwargs)


def sos2_batch(values: pd.Series, vmin: int, vmax: int, delta: int,
               underflow: Optional[str] = None,
               unknown_key: Optional[str] = None) -> list:
    """Vectorized SOS2 (both clamped and underflow-reporting forms).

    ``underflow=None`` -> clamped sos2; otherwise sos2U semantics with
    the given underflow key.  Missing/NaN -> None (caller default) when
    unknown_key is None, else the explicit unknown bag."""
    v = pd.to_numeric(values, errors="coerce").to_numpy(dtype=np.float64)
    n = len(v)
    isnan = np.isnan(v)
    under = v < vmin
    grid = np.clip(v, vmin, vmax)
    x = (grid - vmin) / delta
    b = x.astype(np.int64)          # toInt truncation (x >= 0)
    frac = x - b
    lo_name = vmin + b * delta
    hi_name = vmin + (b + 1) * delta
    out: list = [None] * n
    unk = {f"={unknown_key}": 1.0} if unknown_key else dict(UNK_BAG)
    for i in range(n):
        if isnan[i]:
            out[i] = dict(unk) if unknown_key else None
            continue
        if underflow is not None and under[i]:
            out[i] = {f"={underflow}": 1.0}
            continue
        f = frac[i]
        if f == 0.0:
            out[i] = {f"={int(lo_name[i])}": 1.0}
        else:
            out[i] = {f"={int(lo_name[i])}": 1.0 - f,
                      f"={int(hi_name[i])}": f}
    return out


def sos2u_batch(values, vmin, vmax, delta):
    return sos2_batch(values, vmin, vmax, delta, underflow="UNDERFLOW",
                      unknown_key="UNK")


def csos2_batch(values: pd.Series, *knots) -> list:
    ks = list(knots)
    out: list = [None] * len(values)
    for i, v in enumerate(values.tolist()):
        if _is_missing(v):
            continue
        out[i] = csos2(float(v), ks)
    return out


# registry-function name -> batch kernel; args after the first (the
# variable) must be constants for the dispatch to apply
BATCH_KERNELS = {
    "ind": ind_batch,
    "bag": bag_batch,
    "nGrams": ngrams_batch,
    "skipGrams": skipgrams_batch,
    "sos2": lambda s, mn, mx, d: sos2_batch(s, mn, mx, d),
    "sos2U": sos2u_batch,
    "csos2": csos2_batch,
}
