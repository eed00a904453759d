"""Vowpal Wabbit line sinks: unlabeled, labeled, contextual-bandit,
multilabel (CSOAA-LDF), and the namespace L2 normalizer.

Reference semantics (behavior only; implementation is fresh):
* unlabeled assembly — aloha-core/.../vw/unlabeled/VwRowCreator.scala:102-199:
  namespaces appear in declaration order (default first) and only if they
  emit at least one feature; header is ``|name`` (default name empty);
  a value within 5e-7 of 1 prints the bare key; a value within 5e-7 of 0
  is dropped unless include_zero; other values print as
  ``key:DecimalFormat("0.######")``.
* labeled — vw/labeled/VwLabelRowCreator.scala:28-55: ``label`` with the
  17-digit formatter, importance elided when exactly 1, tag trimmed
  (default "") abutting the feature part; missing label/importance ->
  unlabeled line.
* contextual bandit — vw/cb/VwContextualBanditRowCreator.scala:29-52:
  ``action:cost:probability`` prefix; action filtered to > 0,
  probability filtered to [0, 1]; any missing -> unlabeled line.
* multilabel CSOAA-LDF — vw/multilabel/VwMultilabelRowCreator.scala:62-84,
  94-135, 222-263: block = ``shared <features>``, a negative dummy class
  ``2147483648:1 |<dummyNs> N``, a positive dummy ``2147483649:0 |<dummyNs> P``,
  then per label ``<idx>:<cost> |<classNs> _<idx>`` with cost 0 for
  positive labels and 1 otherwise.
* normalizer — vw/VwFeatureNormalizer.scala:6-31: rewrites single-char
  namespaces ``|n f...`` to ``|n:<1/sqrt(sum w^2) @ 0.00000> f...``.

The row kernels below are pure-Python over one row's feature bags; the
Spark adapters batch them over Arrow via pandas UDFs (no per-row Python
at the DataFrame level).
"""

from __future__ import annotations

import math
import re
from typing import Optional, Sequence

from ..functions.formatting import decimal_format, in_epsilon_interval

Bags = Sequence[dict[str, float]]

NEG_DUMMY_CLASS_ID = str(2 ** 31)      # Int.MaxValue + 1
POS_DUMMY_CLASS_ID = str(2 ** 31 + 1)  # Int.MaxValue + 2
POSITIVE_COST = 0
NEGATIVE_COST = 1
SHARED = "shared "


def _append_namespace(parts: list[str], ns_name: str, indices: Sequence[int],
                      bags: Bags, include_zero: bool) -> None:
    """Append one namespace's features to ``parts`` (flat token list where
    join(' ') reproduces the builder output)."""
    header_done = False
    for fi in indices:
        for key, value in bags[fi].items():
            near_one = in_epsilon_interval(value - 1.0)
            near_zero = in_epsilon_interval(value)
            if near_zero and not include_zero and not near_one:
                continue
            if not header_done:
                parts.append(f"|{ns_name}")
                header_done = True
            if near_one:
                parts.append(key)
            else:
                parts.append(f"{key}:{decimal_format(value)}")


def unlabeled_vw_line(bags: Bags, default_ns: Optional[Sequence[int]] = None,
                      namespaces: Optional[Sequence[tuple[str, Sequence[int]]]] = None,
                      include_zero: bool = False) -> str:
    if default_ns is None and namespaces is None:
        default_ns = range(len(bags))
    parts: list[str] = []
    if default_ns:
        _append_namespace(parts, "", default_ns, bags, include_zero)
    for name, idxs in namespaces or ():
        if idxs:
            _append_namespace(parts, name, idxs, bags, include_zero)
    return " ".join(parts)


def labeled_vw_line(bags: Bags, label: Optional[float],
                    importance: Optional[float] = 1.0,
                    tag: Optional[str] = None,
                    default_ns: Optional[Sequence[int]] = None,
                    namespaces: Optional[Sequence[tuple[str, Sequence[int]]]] = None,
                    include_zero: bool = False) -> str:
    iv = unlabeled_vw_line(bags, default_ns, namespaces, include_zero)
    if label is None or importance is None:
        return iv
    t = ("" if tag is None else tag).strip()
    head = decimal_format(label, 17) + " "
    if importance != 1:
        head += decimal_format(importance, 17) + " "
    return head + t + (iv if iv else "|")


def cb_vw_line(bags: Bags, action: Optional[int], cost: Optional[float],
               probability: Optional[float],
               default_ns: Optional[Sequence[int]] = None,
               namespaces: Optional[Sequence[tuple[str, Sequence[int]]]] = None,
               include_zero: bool = False) -> str:
    iv = unlabeled_vw_line(bags, default_ns, namespaces, include_zero)
    if action is None or action <= 0 or cost is None or probability is None \
            or not (0 <= probability <= 1):
        return iv
    head = f"{action}:{decimal_format(cost, 17)}:{decimal_format(probability, 17)}"
    return head + (" |" if not iv else f" {iv}")


_PREFERRED_LABEL_NS = [("Y", "y"), ("Z", "z"), ("Λ", "λ")]


def determine_label_namespaces(used_namespaces: set[str]) -> tuple[str, str]:
    """Collision-free (class, dummy) label namespace chars
    (VwMultilabelRowCreator.scala:94-205): VW keys namespaces on their
    FIRST character, so the label namespaces must not share a first
    char with any user namespace.  Preference order (Y,y), (Z,z),
    (Λ,λ); otherwise the first two valid letter characters (by code
    point) not already used."""
    used = {s[0] for s in used_namespaces if s}
    for actual, dummy in _PREFERRED_LABEL_NS:
        if actual not in used and dummy not in used:
            return actual, dummy
    found: list[str] = []
    for cp in range(0x10000):            # Java Char range
        c = chr(cp)
        if c in used or not c.isalpha() or c.isspace():
            continue
        found.append(c)
        if len(found) == 2:
            return found[0], found[1]
    raise ValueError("could not determine collision-free label namespaces")


def multilabel_vw_block(bags: Bags, n_labels: int, positive_indices: set[int],
                        default_ns: Optional[Sequence[int]] = None,
                        namespaces: Optional[Sequence[tuple[str, Sequence[int]]]] = None,
                        class_ns: str = "Y", dummy_class_ns: str = "y") -> list[str]:
    """CSOAA-LDF training block: n_labels + 3 lines."""
    shared = SHARED + unlabeled_vw_line(bags, default_ns, namespaces, False)
    lines = [
        shared,
        f"{NEG_DUMMY_CLASS_ID}:{NEGATIVE_COST} |{dummy_class_ns} N",
        f"{POS_DUMMY_CLASS_ID}:{POSITIVE_COST} |{dummy_class_ns} P",
    ]
    for i in range(n_labels):
        cost = POSITIVE_COST if i in positive_indices else NEGATIVE_COST
        lines.append(f"{i}:{cost} |{class_ns} _{i}")
    return lines


_NS_RE = re.compile(r"\|(\w)\s+([^|]+)")
_WEIGHTED_RE = re.compile(r".+:(.+)$")


def normalize_vw_line(line: str) -> str:
    """L2 namespace normalizer: ``|n f1:2 f2`` -> ``|n:0.44721 f1:2 f2``
    (weight = 1/sqrt(sum of squared feature values, unweighted = 1))."""
    def repl(m: re.Match) -> str:
        total = 0.0
        for tok in re.split(r"\s+", m.group(2).strip()):
            wm = _WEIGHTED_RE.match(tok)
            if wm:
                try:
                    w = float(wm.group(1))
                except ValueError:
                    # a feature NAME containing ':' (raw text token) —
                    # not a weight; count as unweighted instead of
                    # crashing the whole line (the reference normalizer
                    # shares this ambiguity; we resolve it robustly)
                    total += 1.0
                    continue
                total += w * w
            elif tok:
                total += 1.0
        norm = 0.0 if total == 0 else 1.0 / math.sqrt(total)
        return f"|{m.group(1)}:{_format5(norm)} {m.group(2)}"

    return _NS_RE.sub(repl, line)


def _format5(x: float) -> str:
    # DecimalFormat("0.00000"): fixed 5 fraction digits, HALF_EVEN.
    from decimal import ROUND_HALF_EVEN, Decimal
    return str(Decimal(x).quantize(Decimal("0.00001"), rounding=ROUND_HALF_EVEN))
