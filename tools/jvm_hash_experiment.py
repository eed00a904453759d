"""Negative-result experiment: Catalyst-expression MurmurHash3.stringHash.

The one stage of the flagship pipeline that still runs in Python workers
is hashed text featurization (bag/ngram keys -> scala
MurmurHash3.stringHash, salt 0xf7ca7fd2, UTF-16 code units — reference:
aloha-core/src/main/scala/com/eharmony/aloha/util/hashing/package.scala:9-37).
Round-2's verdict asked whether moving it JVM-side would lift the
full-machine-width (8->32) scaling efficiency toward the measured
zero-Python ceiling.  This module is the measured answer: NO — by
composition of built-in expressions the hash is bit-exact but ~40x
SLOWER than the memoized numpy/Arrow kernel, so the Arrow tier stays.

Implementation here (kept runnable so the result can be reproduced):
UTF-16 code units via ``hex(encode(s,'utf-16be'))`` + per-unit
``conv(substring(...),16,10)``, then the murmur pair-mix fold as an
``aggregate`` over a pair array, with every 32-bit multiply decomposed
into two 16-bit partial products (``_mul32``) so the math stays inside
non-overflowing BIGINT under ANSI mode.

Measured (this host, local[32], 6M distinct-ish tokens, best of 3,
sums materialized — see git history for the raw script):

    catalyst expression tier : 96.1 s   (~62k tokens/s)
    numpy/Arrow kernel tier  :  2.14 s  (~2.8M tokens/s)
    sample parity            : equal (and 313-case unit parity incl.
                               surrogates, empty, control chars)

Why it loses: higher-order functions (``transform``/``aggregate``)
evaluate their lambdas interpreted (no whole-stage codegen), and each
code unit costs a ``substring`` + base-16 ``conv`` string round-trip.
The numpy kernel advances all rows in lockstep per 2-char column and
memoizes the (zipfian) key vocabulary across batches.  Conclusion
recorded in BENCH/BASELINE.md: the residual Python fraction of the
flagship is already the fastest available implementation of this hash
on a stock PySpark cluster; a JVM fix would require a native Scala UDF
jar, out of scope for a pure-Python deliverable.

Run: python tools/jvm_hash_experiment.py   (prints parity + timing)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

M32 = (1 << 32) - 1


def _mul32(x, c):
    """(x * c) mod 2^32 without exceeding BIGINT under ANSI mode:
    x < 2^32 and c < 2^32; split c into 16-bit halves so each partial
    product stays <= 2^48."""
    c_lo, c_hi = c & 0xFFFF, c >> 16
    t = x * F.lit(c_lo)
    u = ((x * F.lit(c_hi)).bitwiseAND(F.lit(0xFFFF))) * F.lit(65536)
    return (t + u).bitwiseAND(F.lit(M32))


def _rotl(x, r):
    return (F.shiftleft(x, r).bitwiseAND(F.lit(M32))) \
        .bitwiseOR(F.shiftrightunsigned(x, 32 - r))


def _mix_last(h, k):
    k = _mul32(k, 0xCC9E2D51)
    k = _rotl(k, 15)
    k = _mul32(k, 0x1B873593)
    return h.bitwiseXOR(k)


def _mix(h, k):
    h = _mix_last(h, k)
    h = _rotl(h, 13)
    return (h * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(M32))


def _avalanche(h):
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 16))
    h = _mul32(h, 0x85EBCA6B)
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 13))
    h = _mul32(h, 0xC2B2AE35)
    return h.bitwiseXOR(F.shiftrightunsigned(h, 16))


def units_col(col):
    """UTF-16 code units of a string column as array<bigint> (surrogate
    pairs stay two units, matching JVM char semantics)."""
    hexs = F.hex(F.encode(col, "utf-16be"))
    n = (F.length(hexs) / F.lit(4)).cast("int")
    return F.when(n > 0, F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(
            F.substring(hexs, (i - F.lit(1)) * F.lit(4) + F.lit(1), 4),
            16, 10).cast("bigint"),
    )).otherwise(F.array().cast("array<bigint>"))


def hash_from_units(units, seed=0xF7CA7FD2):
    """scala MurmurHash3.stringHash over a precomputed unit array."""
    n = F.size(units)
    pairs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), (n / F.lit(2)).cast("int") - F.lit(1)),
        lambda j: F.shiftleft(
            F.element_at(units, (j * F.lit(2) + F.lit(1)).cast("int")), 16)
        + F.element_at(units, (j * F.lit(2) + F.lit(2)).cast("int")),
    )).otherwise(F.array().cast("array<bigint>"))
    h = F.aggregate(pairs, F.lit(seed).cast("bigint"), _mix)
    h = F.when(n % 2 == 1,
               _mix_last(h, F.element_at(units, n))).otherwise(h)
    h = h.bitwiseXOR(n.cast("bigint"))
    h = _avalanche(h)
    return F.when(h > F.lit(0x7FFFFFFF), h - F.lit(1 << 32)) \
        .otherwise(h).cast("int")


def string_hash_col(col, seed=0xF7CA7FD2):
    return hash_from_units(units_col(col), seed)


def main():
    import random
    import string as st
    import time

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from aloha_spark.functions.hashing import string_hash
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())

    random.seed(7)
    cases = ["", "a", "ab", "abc", "hello_world", "é", "日本語テスト",
             "a𝄞b", "𝄞", "x" * 101, " ", "\x00", "=a_b"]
    for _ in range(300):
        n = random.randint(0, 24)
        cases.append("".join(
            random.choice(st.ascii_letters + "àé日𝄞_0189 ")
            for _ in range(n)))
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r[0] for r in df.select(string_hash_col(F.col("s"))).collect()]
    exp = [string_hash(c) for c in cases]
    bad = sum(1 for g, e in zip(got, exp) if g != e)
    print(f"parity: {len(cases)} cases, {bad} mismatches")

    big = spark.range(1_000_000).select(
        F.concat(F.lit("tok_"), (F.col("id") % 50000).cast("string"))
        .alias("s")).repartition(16).persist()
    big.count()
    t0 = time.time()
    big.select(F.sum(string_hash_col(F.col("s")).cast("bigint"))).collect()
    print(f"catalyst tier: {time.time() - t0:.2f}s / 1M tokens")
    spark.stop()


if __name__ == "__main__":
    main()
