"""Java-compatible number formatting.

The reference's VW sink formats feature values with
``new DecimalFormat("0.######")`` (6 fraction digits, HALF_EVEN against
the exact binary double value) and labels with a 17-digit variant
(reference aloha-core/.../dataset/vw/unlabeled/VwRowCreator.scala:64-83).
LibSVM emits values via Scala string interpolation, i.e.
``java.lang.Double.toString`` (LibSvmRowCreator.scala:46).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_EVEN, Decimal, localcontext

_QUANTA: dict[int, Decimal] = {}


def decimal_format(value: float, digits: int = 6) -> str:
    """Equivalent of ``new DecimalFormat("0." + "#"*digits).format(value)``.

    Java rounds HALF_EVEN against the double's *exact* binary value, so we
    quantize ``Decimal(value)`` (exact binary expansion), then strip
    trailing fractional zeros; integer part keeps at least one digit.
    """
    if math.isnan(value):
        return "�"  # DecimalFormat NaN symbol; never hit in practice
    if math.isinf(value):
        return "∞" if value > 0 else "-∞"
    q = _QUANTA.get(digits)
    if q is None:
        q = _QUANTA[digits] = Decimal(1).scaleb(-digits)
    with localcontext() as ctx:
        ctx.prec = 60
        d = Decimal(value).quantize(q, rounding=ROUND_HALF_EVEN)
    s = format(d, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    if s in ("-0", ""):
        return "0"
    return s


# epsilon rules from VwRowCreator.scala:75-83: a value within
# (-eps, eps) of 1 prints as the elided feature name; within (-eps, eps)
# of 0 it is dropped unless includeZeroValues.
def in_epsilon_interval(x: float, digits: int = 6) -> bool:
    eps = 10.0 ** (-digits) / 2
    return -eps < x < eps


def java_double_to_string(value: float) -> str:
    """``java.lang.Double.toString`` — shortest decimal that round-trips,
    plain form for 1e-3 <= |v| < 1e7, otherwise computerized scientific
    notation ``d.dddEe``.  Always at least one fractional digit."""
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "Infinity" if value > 0 else "-Infinity"
    if value == 0.0:
        return "-0.0" if math.copysign(1.0, value) < 0 else "0.0"
    sign = "-" if value < 0 else ""
    a = abs(value)
    # Python repr is also the shortest round-tripping decimal.
    d = Decimal(repr(a))
    digits = "".join(map(str, d.as_tuple().digits)).rstrip("0") or "0"
    adjusted = d.adjusted()
    if 1e-3 <= a < 1e7:
        if adjusted >= 0:
            int_part = digits[: adjusted + 1].ljust(adjusted + 1, "0")
            frac_part = digits[adjusted + 1:] or "0"
            return f"{sign}{int_part}.{frac_part}"
        frac_part = "0" * (-adjusted - 1) + digits
        return f"{sign}0.{frac_part}"
    mant_str = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant_str}E{adjusted}"
