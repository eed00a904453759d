"""CSV sinks + stateless java.util.Random-compatible sampler."""

import pytest

from aloha_spark.functions.rand import (
    downsample_negatives,
    init_seed_scramble,
    partition_seed,
    sample_combination,
)
from aloha_spark.sinks.csv_sink import csv_columns, csv_lines


class _JavaRandom:
    """Minimal java.util.Random for oracle comparison."""

    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_int(self, bound):
        if bound & -bound == bound:
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if not ((bits - val + (bound - 1)) & 0x80000000):
                return val


def _reservoir_oracle(n, k, seed):
    r = _JavaRandom(seed)
    res = list(range(k))
    for i in range(k + 1, n + 1):
        j = r.next_int(i)
        if j < k:
            res[j] = i - 1
    return res


class TestRand:
    @pytest.mark.parametrize("n,k,seed", [
        (10, 3, 0), (10, 3, 42), (100, 7, 123456789),
        (4, 2, 0), (33, 1, 7), (2, 2, 5), (1, 3, 9),
    ])
    def test_matches_java_random_reservoir(self, n, k, seed):
        got, _ = sample_combination(n, k, init_seed_scramble(seed))
        if n <= k:
            assert got == list(range(n))
        else:
            assert got == _reservoir_oracle(n, k, seed)

    def test_seed_threading_continues_stream(self):
        s0 = init_seed_scramble(0)
        c1, s1 = sample_combination(10, 2, s0)
        c2, s2 = sample_combination(10, 2, s1)
        assert s1 != s0 and s2 != s1
        # re-running from the same seed reproduces exactly
        assert sample_combination(10, 2, s1)[0] == c2

    def test_partition_seeds_differ(self):
        seeds = {partition_seed(42, p) for p in range(100)}
        assert len(seeds) == 100

    def test_downsample_keeps_positives(self):
        kept, _ = downsample_negatives(10, {2, 5}, 3, init_seed_scramble(1))
        assert {2, 5} <= set(kept)
        assert len(kept) == 5

    def test_downsample_roughly_uniform(self):
        counts = [0] * 10
        seed = init_seed_scramble(7)
        for _ in range(3000):
            kept, seed = downsample_negatives(10, set(), 3, seed)
            for k in kept:
                counts[k] += 1
        # each index kept w.p. 0.3 -> ~900
        assert all(700 < c < 1100 for c in counts), counts


class TestCsvSink:
    def test_docs_golden_row(self, spark):
        # docs/dataset.md:180-181: `MALE,170,0` / `FEMALE,NULL,3`
        df = spark.createDataFrame(
            [("MALE", 170, 0), ("FEMALE", None, 3)],
            "gender string, height int, n int")
        feats = [{"name": "gender", "column": "gender"},
                 {"name": "height", "column": "height"},
                 {"name": "n", "column": "n"}]
        out, header = csv_lines(df, feats)
        lines = sorted(r.csv_line for r in out.collect())
        assert header == "gender,height,n"
        assert lines == ["FEMALE,NULL,3", "MALE,170,0"]

    def test_hot_one(self, spark):
        df = spark.createDataFrame([("MALE",), ("FEMALE",)], "g string")
        wide = csv_columns(df, [{
            "name": "g", "column": "g", "encoding": "hotOne",
            "values": ["MALE", "FEMALE"]}])
        assert wide.columns == ["g_MALE", "g_FEMALE"]
        rows = {tuple(r) for r in wide.collect()}
        assert rows == {(1, 0), (0, 1)}

    def test_thermometer_unimplemented_for_parity(self, spark):
        df = spark.createDataFrame([("x",)], "g string")
        with pytest.raises(NotImplementedError):
            csv_columns(df, [{"name": "g", "column": "g",
                              "encoding": "thermometer"}])
