"""Corpus-curation job: stage semantics (quality -> lang -> scrub ->
exact dedup -> near-dup keep-canonical) and lineage-gated resume."""

import importlib.util
import os

import pyspark.sql.functions as F
import pytest

_spec = importlib.util.spec_from_file_location(
    "curate_job", os.path.join(os.path.dirname(__file__), "..",
                               "jobs", "curate.py"))
curate_job = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and curate_job)


GOOD = ("the cat sat on the mat and it was a fine day for sitting "
        "in the sun with a book about the history of cats")


def _write_docs(spark, path):
    rows = [
        # near-dup family: same text modulo one trailing word
        (0, GOOD + " today"),
        (1, GOOD + " yesterday"),
        # exact-dup-after-scrub family: differ only in the email
        (2, "contact me at alice@example.com about the big cat project "
            "that we discussed in the meeting of the team"),
        (3, "contact me at bob@other.org about the big cat project "
            "that we discussed in the meeting of the team"),
        # junk: too short -> low quality
        (4, "x!"),
        # German doc (stopword-vote lang id)
        (5, "der hund und die katze sind in den garten von dem haus "
            "zu der zeit mit dem ball gegangen und das ist gut"),
        # clean unique keeper
        (6, "a completely different document that is long enough to "
            "pass the quality band and it is about the sea and ships"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
         .write.mode("overwrite").parquet(path)


def _args(docs, out, lineage, extra=()):
    return curate_job.parse_args([
        "--docs", docs, "--out", out, "--lineage", lineage,
        "--min-quality", "0.5", "--langs", "en", "--scrub-pii",
        "--exact-dedup", "--neardup-threshold", "0.6",
        "--num-buckets", "8", "--group-size", "4", "--stage-counts",
        *extra])


def test_curate_stages(spark, tmp_path):
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs)
    args = _args(docs, str(tmp_path / "out"), str(tmp_path / "lin"))
    x, pairs, report = curate_job.curate(spark, args)
    rows = {r["doc_id"]: r for r in x.collect()}
    # 4 dropped by quality, 5 dropped by lang filter,
    # 3 dropped by exact dedup (identical after email scrub),
    # 1 dropped by near-dup (keep canonical 0)
    assert sorted(rows) == [0, 2, 6]
    # PII really gone, placeholder present, count recorded
    assert "alice@example.com" not in rows[2]["text"]
    assert "<EMAIL>" in rows[2]["text"]
    assert rows[2]["n_redactions"] == 1
    stage_rows = {s["stage"]: s["rows"] for s in report["stages"]}
    assert stage_rows == {"quality_filter": 6, "lang_filter": 5,
                          "pii_scrub": 5, "exact_dedup": 4,
                          "neardup_dedup": 3}
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(0, 1)}


def test_curate_write_resume(spark, tmp_path):
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs)
    out, lin = str(tmp_path / "out"), str(tmp_path / "lin")
    args = _args(docs, out, lin)
    from aloha_spark.plans.lineage import (
        completed_buckets, write_with_lineage)

    x, _, _ = curate_job.curate(spark, args)
    r1 = write_with_lineage(x, out, lin, key=args.id_col,
                            ts_col=args.id_col,
                            num_buckets=args.num_buckets,
                            group_size=args.group_size)
    assert len(r1.written_buckets) == 8 and not r1.skipped_buckets
    back = spark.read.parquet(out)
    assert {r["doc_id"] for r in back.select("doc_id").collect()} \
        == {0, 2, 6}
    # resume: every bucket already in the lineage table is skipped
    r2 = write_with_lineage(x, out, lin, key=args.id_col,
                            ts_col=args.id_col,
                            num_buckets=args.num_buckets,
                            group_size=args.group_size)
    assert not r2.written_buckets and len(r2.skipped_buckets) == 8
    assert completed_buckets(spark, lin) == set(range(8))
