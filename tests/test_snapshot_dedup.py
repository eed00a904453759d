"""Incremental dedup against a persisted snapshot (operators/snapshot.py):
exact anti-join semantics, minhash near-dup estimation against stored
signatures, append-then-converge, and the param-mismatch contracts."""

import pandas as pd
import pytest

from aloha_spark.operators.snapshot import (
    append_to_snapshot, incremental_exact_dedup,
    incremental_neardup_dedup, incremental_neardup_old_pairs,
    load_snapshot_meta, write_dedup_snapshot)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BASE = "the quick brown fox jumps over the lazy dog near the river bank"


@pytest.fixture()
def old_corpus(spark):
    return _df(spark, [
        (1, BASE),
        (2, "completely different content about spark shuffles"),
        (3, None),                       # NULL content is a content too
    ])


class TestExactIncrement:
    def test_drops_seen_keeps_fresh_and_first_of_batch(self, spark,
                                                       old_corpus,
                                                       tmp_path):
        path = str(tmp_path / "snap")
        write_dedup_snapshot(old_corpus, path)
        new = _df(spark, [
            (10, BASE),                          # dup of old -> dropped
            (11, "brand new document"),          # fresh -> kept
            (12, "brand new document"),          # in-batch dup -> dropped
            (13, None),                          # NULL seen in old -> dropped
            (14, "another fresh one"),           # fresh -> kept
        ])
        got = sorted(r.doc_id for r in
                     incremental_exact_dedup(new, path).collect())
        assert got == [11, 14]

    def test_append_converges(self, spark, old_corpus, tmp_path):
        path = str(tmp_path / "snap")
        write_dedup_snapshot(old_corpus, path)
        new = _df(spark, [(11, "brand new document")])
        kept = incremental_exact_dedup(new, path)
        assert kept.count() == 1
        append_to_snapshot(kept, path)
        # re-running the same increment now drops everything
        assert incremental_exact_dedup(new, path).count() == 0

    def test_cols_mismatch_is_loud(self, spark, old_corpus, tmp_path):
        path = str(tmp_path / "snap")
        write_dedup_snapshot(old_corpus, path)
        with pytest.raises(ValueError, match="incomparable"):
            incremental_exact_dedup(old_corpus, path, cols=["doc_id"])

    def test_missing_meta_is_loud(self, spark, old_corpus, tmp_path):
        with pytest.raises(FileNotFoundError, match="commit marker"):
            incremental_exact_dedup(old_corpus, str(tmp_path / "nope"))


class TestNearDupIncrement:
    @pytest.fixture()
    def snap(self, spark, old_corpus, tmp_path):
        path = str(tmp_path / "mh_snap")
        write_dedup_snapshot(old_corpus.where("text IS NOT NULL"), path,
                             minhash=True, num_hashes=64, shingle_n=3,
                             bands=16, rows_per_band=4)
        return path

    def test_near_dup_of_old_detected_and_dropped(self, spark, snap):
        near = BASE.replace("lazy", "sleepy")          # 1-token edit
        new = _df(spark, [
            (20, near),                                # near-dup of old#1
            (21, "entirely unrelated text about parquet row groups"),
        ])
        pairs = incremental_neardup_old_pairs(new, snap, threshold=0.5) \
            .collect()
        assert {(r.new_id, r.old_id) for r in pairs} == {(20, 1)}
        assert all(0.5 <= r.est_jaccard <= 1.0 for r in pairs)
        kept = sorted(r.doc_id for r in
                      incremental_neardup_dedup(new, snap,
                                                threshold=0.5).collect())
        assert kept == [21]

    def test_exact_copy_estimates_one(self, spark, snap):
        new = _df(spark, [(30, BASE)])
        pairs = incremental_neardup_old_pairs(new, snap,
                                              threshold=0.99).collect()
        assert len(pairs) == 1 and pairs[0].est_jaccard == 1.0

    def test_unrelated_passes(self, spark, snap):
        new = _df(spark, [(40, "nothing in common with anything here "
                               "at all whatsoever truly")])
        assert incremental_neardup_dedup(new, snap,
                                         threshold=0.5).count() == 1

    def test_without_minhash_is_loud(self, spark, old_corpus, tmp_path):
        path = str(tmp_path / "plain")
        write_dedup_snapshot(old_corpus, path)          # no minhash
        with pytest.raises(ValueError, match="minhash=True"):
            incremental_neardup_old_pairs(old_corpus, path)

    def test_append_extends_neardup_reach(self, spark, snap):
        fresh = _df(spark, [(50, "a genuinely novel paragraph about "
                                 "watermark semantics in streams")])
        kept = incremental_neardup_dedup(fresh, snap, threshold=0.5)
        assert kept.count() == 1
        append_to_snapshot(kept, snap)
        near = _df(spark, [(51, "a genuinely novel paragraph about "
                                "watermark semantics in rivers")])
        pairs = incremental_neardup_old_pairs(near, snap, threshold=0.5) \
            .collect()
        assert {(r.new_id, r.old_id) for r in pairs} == {(51, 50)}

    def test_bad_band_arithmetic_is_loud(self, spark, old_corpus,
                                         tmp_path):
        with pytest.raises(ValueError, match="num_hashes"):
            write_dedup_snapshot(old_corpus, str(tmp_path / "x"),
                                 minhash=True, num_hashes=64, bands=10,
                                 rows_per_band=4)


class TestMeta:
    def test_roundtrip(self, spark, old_corpus, tmp_path):
        path = str(tmp_path / "snap")
        meta = write_dedup_snapshot(old_corpus, path)
        assert load_snapshot_meta(path) == meta


class TestEstimatorQuality:
    def test_estimate_tracks_exact_jaccard(self, spark, tmp_path):
        """The minhash agreement estimator lands near the true shingle
        Jaccard (64 hashes => s.e. ~ 0.06 at j=0.5)."""
        a = " ".join(f"w{i}" for i in range(40))
        b = " ".join(f"w{i}" for i in range(34)) + " " + \
            " ".join(f"x{i}" for i in range(6))
        old = _df(spark, [(1, a)])
        path = str(tmp_path / "est")
        write_dedup_snapshot(old, path, minhash=True)
        pairs = incremental_neardup_old_pairs(
            _df(spark, [(2, b)]), path, threshold=0.0).collect()
        assert len(pairs) == 1
        est = pairs[0].est_jaccard

        def shingles(t):
            w = t.split()
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        sa, sb = shingles(a), shingles(b)
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(est - true_j) < 0.2, (est, true_j)
