"""Golden-value tests for the Aloha-parity feature kernels.

Golden constants come from the reference's own test pins:
* hashes / skip-grams / min-hash winners —
  aloha-core/src/test/scala/com/eharmony/aloha/feature/SkipGramsTest.scala
* sos2 tables — aloha-core/.../feature/Sos2.scala scaladoc (:53-65, :108-121)
* VW line formats — aloha-core/.../dataset/vw/unlabeled/VwRowCreatorTest.scala
  and docs/src/main/tut/docs/dataset.md:364-367
"""

import math

import numpy as np
import pytest

from aloha_spark.functions.formatting import decimal_format, java_double_to_string
from aloha_spark.functions.hashing import (
    masked_hash_array,
    string_hash,
    string_hash_array,
)
from aloha_spark.functions.scalars import (
    clamp,
    csos2,
    ge_le,
    gt_lt,
    ind,
    intercept,
    log2,
    scalar_bag,
    sos2,
    sos2_u,
    densify_map,
)
from aloha_spark.functions.textfeatures import bag, n_grams, skip_grams
from aloha_spark.sinks.libsvm import libsvm_line
from aloha_spark.sinks.vw import (
    cb_vw_line,
    labeled_vw_line,
    multilabel_vw_block,
    normalize_vw_line,
    unlabeled_vw_line,
)

S1 = "the brown fox jumped over the red fence"
S2 = "Insurgents killed in ongoing fighting"
S3 = "5 of us walked the 8 street with 8 dwarfs"


class TestHashParity:
    def test_reference_golden_hashes(self):
        expected = {
            S1: [126075915, 515500153, -396237494, -797340276, -243956657,
                 126075915, 992691106, 393316680],
            S2: [20532734, 1484921003, -709633187, -49958258, -1420263381],
            S3: [2100358791, -1698111023, 301784327, 1640444393, 126075915,
                 2046920067, -567488318, -63834616, 2046920067, 1373084603],
        }
        for s, exp in expected.items():
            assert string_hash_array(s.split(" ")).tolist() == exp

    def test_scalar_matches_vector(self):
        toks = S3.split(" ")
        assert [string_hash(t) for t in toks] == string_hash_array(toks).tolist()

    def test_unicode_and_empty(self):
        # surrogate pair + empty string go through without error and are
        # stable (self-consistency; JVM cross-check done via BMP goldens)
        vals = string_hash_array(["", "é", "日本語", "🎉x"])
        assert vals.dtype == np.int32
        assert len(set(vals.tolist())) == 4

    def test_masked_hash_default_18_bits(self):
        h = masked_hash_array(["the"])[0]
        assert h == 126075915 & ((1 << 18) - 1)
        with pytest.raises(ValueError):
            masked_hash_array(["x"], num_bits=0)


class TestTextFeatures:
    def test_2skip3_grams_golden(self):
        expected = {f"={g}": 1.0 for g in [
            "Insurgents_killed_in", "Insurgents_killed_ongoing",
            "Insurgents_killed_fighting", "Insurgents_in_ongoing",
            "Insurgents_in_fighting", "Insurgents_ongoing_fighting",
            "killed_in_ongoing", "killed_in_fighting",
            "killed_ongoing_fighting", "in_ongoing_fighting"]}
        assert skip_grams(S2, 3, 2) == expected

    def test_minhash_truncation_winners(self):
        assert bag(S1, max_elements=2) == {"=red": 1.0, "=over": 1.0}
        assert bag(S2, max_elements=2) == {"=Insurgents": 1.0, "=fighting": 1.0}
        assert bag(S3, max_elements=2) == {"=with": 1.0, "=of": 1.0}

    def test_bag_counts(self):
        assert bag(S1)["=the"] == 2.0
        assert bag(S3)["=8"] == 2.0

    def test_ngrams_match_naive(self):
        for n in range(1, 5):
            for s in (S1, S2, S3):
                toks = s.split(" ")
                naive = {}
                for i in range(len(toks) - n + 1):
                    g = "=" + "_".join(toks[i:i + n])
                    naive[g] = naive.get(g, 0) + 1.0
                assert n_grams(s, n) == naive

    def test_4skip2_grams_golden(self):
        exp = {}
        for t in ["the_brown", "the_fox", "the_jumped", "the_over", "the_the",
                  "brown_fox", "brown_jumped", "brown_over", "brown_the",
                  "brown_red", "fox_jumped", "fox_over", "fox_the", "fox_red",
                  "fox_fence", "jumped_over", "jumped_the", "jumped_red",
                  "jumped_fence", "over_the", "over_red", "over_fence",
                  "the_red", "the_fence", "red_fence"]:
            exp["=" + t] = exp.get("=" + t, 0) + 1.0
        assert skip_grams(S1, 2, 4) == exp

    def test_empty_and_custom_affixes(self):
        assert bag("") == {"=": 1.0}  # java split("") -> [""]
        assert bag("a b a", prefix="w:", suffix="!") == {"w:a!": 2.0, "w:b!": 1.0}


class TestScalars:
    @pytest.mark.parametrize("v,expected", [
        (-0.25, [("=0", 1.0)]), (0.0, [("=0", 1.0)]),
        (0.25, [("=0", 0.75), ("=1", 0.25)]), (0.5, [("=0", 0.5), ("=1", 0.5)]),
        (0.75, [("=0", 0.25), ("=1", 0.75)]), (1.0, [("=1", 1.0)]),
        (1.25, [("=1", 0.75), ("=2", 0.25)]), (1.5, [("=1", 0.5), ("=2", 0.5)]),
        (1.75, [("=1", 0.25), ("=2", 0.75)]), (2.0, [("=2", 1.0)]),
        (2.25, [("=2", 1.0)]),
    ])
    def test_sos2_golden_table(self, v, expected):
        assert sorted(sos2(v, 0, 2, 1).items()) == expected

    def test_sos2u_underflow_and_unknown(self):
        assert sos2_u(-0.25, 0, 2, 1) == {"=UNDERFLOW": 1.0}
        assert sos2_u(None, 0, 2, 1) == {"=UNK": 1.0}
        assert sos2_u(float("nan"), 0, 2, 1) == {"=UNK": 1.0}
        assert sos2_u(1.25, 0, 2, 1) == {"=1": 0.75, "=2": 0.25}

    def test_sos2_isomorphism(self):
        # scaladoc invariant: sum(k * w) == v for v in [min, max]
        for v in [0.0, 0.31, 1.0, 1.99, 2.0]:
            pairs = sos2(v, 0, 2, 1)
            recon = sum(float(k[1:]) * w for k, w in pairs.items())
            assert recon == pytest.approx(v)

    def test_csos2(self):
        assert csos2(5.5, [0, 2, 4, 8]) == {"=4": 0.625, "=8": 0.375}
        assert csos2(4.0, [0, 2, 4, 8]) == {"=4": 1.0}
        assert csos2(-3.0, [0, 2, 4, 8]) == {"=0": 1.0}
        assert csos2(100.0, [0, 2, 4, 8]) == {"=8": 1.0}
        assert csos2(None, [0, 2, 4, 8]) == {"=UNK": 1.0}
        assert csos2(1.0, [5]) == {}

    def test_indicator_and_intercept(self):
        assert ind("MALE") == {"=MALE": 1.0}
        assert ind(None) == {"=UNK": 1.0}
        assert ind(7) == {"=7": 1.0}
        assert ind(["a", None, "b"]) == {"=a": 1.0, "=b": 1.0}
        assert ind(True) == {"=true": 1.0}
        assert intercept() == {"": 1.0}
        assert scalar_bag(23.0) == {"": 23.0}
        assert scalar_bag(None) == {"=UNK": 1.0}

    def test_math_and_predicates(self):
        assert clamp(5, 0, 3) == 3 and clamp(-1, 0, 3) == 0
        assert log2(8) == 3.0
        assert gt_lt(1.5, 1, 2) is True and gt_lt(1.0, 1, 2) is False
        assert ge_le(1.0, 1, 2) is True
        assert gt_lt(None, 1, 2) is None
        assert densify_map(["a", "b"], {"a": 2.0}, 0.0) == [2.0, 0.0]


class TestVwSink:
    def test_reference_golden_lines(self):
        # VwRowCreatorTest.scala:25-52
        assert unlabeled_vw_line([{"f1": 1.0}], default_ns=[],
                                 namespaces=[("ns1", [0])]) == "|ns1 f1"
        assert unlabeled_vw_line([{"f0": 1.0}], default_ns=[0]) == "| f0"
        # docs/dataset.md:364-367 (proto example)
        bags = [{"name=Alan": 1.0}, {"gender=MALE": 1.0},
                {"bmi:23": 1.0}, {"num_photos": 2.0}]
        # reference emits key with embedded value for bmi via spec; here
        # exercise value formatting + 1-elision + ordering
        line = unlabeled_vw_line(
            [{"name=Alan": 1.0}, {"gender=MALE": 1.0}, {"bmi": 23.0},
             {"num_photos": 2.0}], default_ns=[0, 1, 2, 3])
        assert line == "| name=Alan gender=MALE bmi:23 num_photos:2"

    def test_zero_drop_and_near_one_elision(self):
        bags = [{"a": 0.0, "b": 1.0 - 1e-9, "c": 0.5}]
        assert unlabeled_vw_line(bags, default_ns=[0]) == "| b c:0.5"
        assert unlabeled_vw_line(bags, default_ns=[0], include_zero=True) \
            == "| a:0 b c:0.5"

    def test_empty_namespace_skipped(self):
        assert unlabeled_vw_line([{}, {"x": 2.0}], default_ns=[0],
                                 namespaces=[("n", [1]), ("m", [])]) == "|n x:2"

    def test_labeled(self):
        bags = [{"f": 1.0}]
        assert labeled_vw_line(bags, 0.5, 1.0, "t5", default_ns=[0]) == "0.5 t5| f"
        assert labeled_vw_line(bags, 1.0, 2.0, None, default_ns=[0]) == "1 2 | f"
        assert labeled_vw_line(bags, None, 1.0, "t", default_ns=[0]) == "| f"
        assert labeled_vw_line([{}], 1.0, 1.0, "t", default_ns=[0]) == "1 t|"

    def test_cb(self):
        bags = [{"f": 1.0}]
        assert cb_vw_line(bags, 2, 0.5, 0.25, default_ns=[0]) == "2:0.5:0.25 | f"
        # invalid action / prob fall back to unlabeled
        assert cb_vw_line(bags, 0, 0.5, 0.25, default_ns=[0]) == "| f"
        assert cb_vw_line(bags, 1, 0.5, 1.25, default_ns=[0]) == "| f"
        assert cb_vw_line([{}], 3, 1.0, 1.0, default_ns=[0]) == "3:1:1 |"

    def test_multilabel_block(self):
        block = multilabel_vw_block([{"f": 1.0}], 3, {1}, default_ns=[0])
        assert block == [
            "shared | f",
            "2147483648:1 |y N",
            "2147483649:0 |y P",
            "0:1 |Y _0",
            "1:0 |Y _1",
            "2:1 |Y _2",
        ]

    def test_normalizer(self):
        # VwFeatureNormalizerTest-style: |n f1:2 f2 -> weight 1/sqrt(5)
        out = normalize_vw_line("1 |n f1:2 f2")
        assert out == "1 |n:0.44721 f1:2 f2"


class TestLibSvmSink:
    def test_indices_sorted_masked(self):
        line = libsvm_line([{"the": 1.0}], num_bits=18)
        assert line == f"{126075915 & ((1 << 18) - 1)}:1.0"

    def test_dedupe_last_wins_and_sort(self):
        # same key twice in different bags -> one entry, value of the later
        line = libsvm_line([{"the": 1.0}, {"the": 7.5, "fox": 2.0}])
        idx_the = 126075915 & ((1 << 18) - 1)
        idx_fox = -396237494 & ((1 << 18) - 1)
        entries = dict(p.split(":") for p in line.split(" "))
        assert entries[str(idx_the)] == "7.5"
        assert entries[str(idx_fox)] == "2.0"
        ints = [int(p.split(":")[0]) for p in line.split(" ")]
        assert ints == sorted(ints)

    def test_java_double_format(self):
        assert java_double_to_string(1.0) == "1.0"
        assert java_double_to_string(1e-4) == "1.0E-4"
        assert java_double_to_string(12345678.0) == "1.2345678E7"
        assert java_double_to_string(-0.5) == "-0.5"


class TestDecimalFormat:
    @pytest.mark.parametrize("v,expected", [
        (1.0, "1"), (23.0, "23"), (2.5, "2.5"), (0.1234567, "0.123457"),
        (0.12345649, "0.123456"), (1.0000004, "1"), (0.0000004, "0"),
        (-0.25, "-0.25"), (1e-7, "0"), (1000000.5, "1000000.5"),
    ])
    def test_six_digit(self, v, expected):
        assert decimal_format(v) == expected

    def test_seventeen_digit_label(self):
        assert decimal_format(1.0, 17) == "1"
        assert decimal_format(1 - 1e-18, 17) == "1"
        assert decimal_format(0.5, 17) == "0.5"
