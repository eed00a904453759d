"""Curate-job wiring of the mixing/training-order family
(--token-budgets, --epochs, --shuffle-seed, --data-card) plus the
order-preserving lineage write (bucket_col / sort_cols)."""

import glob
import hashlib
import importlib.util
import json
import os

import pyspark.sql.functions as F
import pytest

_spec = importlib.util.spec_from_file_location(
    "curate_job2", os.path.join(os.path.dirname(__file__), "..",
                                "jobs", "curate.py"))
curate_job = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(curate_job)


def _write_docs(spark, path, n=60):
    rows = [(i, f"src{i % 3}",
             " ".join(f"tok{i}w{j}" for j in range(5 + i % 7)),
             "en" if i % 4 else "de")
            for i in range(n)]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string") \
        .write.mode("overwrite").parquet(path)
    return rows


def test_token_budget_and_epoch_stages(spark, tmp_path):
    docs = str(tmp_path / "docs")
    rows = _write_docs(spark, docs)
    args = curate_job.parse_args([
        "--docs", docs, "--out", str(tmp_path / "o"),
        "--lineage", str(tmp_path / "l"),
        "--sample-col", "source",
        "--token-budgets", "src0=40,src1=25",
        "--token-budget-default", "15",
        "--split", "train=0.9,val=0.1",
        "--epochs", "src0=2.5,src1=1.0",
        "--epochs-default", "0.5",
        "--stage-counts"])
    x, _, report = curate_job.curate(spark, args)
    out = x.toPandas()
    stages = [s["stage"] for s in report["stages"]]
    assert stages == ["token_budget", "split_assign", "epoch_mix"]
    # ids rewritten to 'origid:copy' and unique
    assert out.doc_id.str.match(r"^\d+:\d+$").all()
    assert out.doc_id.is_unique
    # all copies of one document share its split (no eval leakage)
    base = out.assign(orig=out.doc_id.str.split(":").str[0])
    assert (base.groupby("orig").split.nunique() == 1).all()
    # src0 got >= 2 copies of every surviving doc, default strata <= 1
    per = base.groupby(["orig", "source"]).size().reset_index(name="n")
    assert (per[per.source == "src0"].n >= 2).all()
    assert (per[per.source == "src2"].n == 1).all()
    # token budget respected: tokens of src1 survivors reach 25 but
    # dropping the last-priority survivor would fall below
    toks = {str(i): len(t.split()) for i, s, t, _ in rows if s == "src1"}
    kept = sorted({o for o, s in zip(base.orig, base.source)
                   if s == "src1"},
                  key=lambda d: (int(hashlib.md5(
                      f"budget{d}".encode()).hexdigest()[:15], 16)
                      % 10000, int(d)))
    total = sum(toks[k] for k in kept)
    assert total >= 25 and total - toks[kept[-1]] < 25


def test_shuffle_write_and_data_card(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs)
    out, lin = str(tmp_path / "o"), str(tmp_path / "l")
    argv = ["--docs", docs, "--out", out, "--lineage", lin,
            "--sample-col", "source", "--shuffle-seed", "11",
            "--data-card", "--num-buckets", "4", "--group-size", "2"]
    curate_job.main(argv)
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["shuffle"] == {"seed": 11, "n_shards": 4}
    card = {c["source"]: c for c in report["data_card"]}
    assert set(card) == {"src0", "src1", "src2"}
    assert card["src0"]["n_docs"] == 20
    # exact token-length quantiles ride the card (docs cycle 5..11
    # tokens; every source sees the full cycle, so p100 >= p50 >= 5)
    assert card["src0"]["q_0_5"] >= 5
    assert card["src0"]["q_0_99"] <= 11
    assert card["src0"]["dup_frac"] == 0.0
    assert card["src0"]["top_lang"] == "en"
    # one internally-ordered file per bucket; shard == bucket == the
    # md5-derived shard of the row's id; rows sorted by shuffle_key
    import pandas as pd
    seen = 0
    for b in range(4):
        files = glob.glob(f"{out}/bucket={b}/*.parquet")
        if not files:
            continue
        assert len(files) == 1
        pdf = pd.read_parquet(files[0])
        seen += len(pdf)
        assert list(pdf.shuffle_key) == sorted(pdf.shuffle_key)
        for r in pdf.itertuples():
            k = hashlib.md5(f"shuffle11:{r.doc_id}".encode()).hexdigest()
            assert r.shuffle_key == k and int(k[:15], 16) % 4 == b
    assert seen == 60
    # resume: nothing rewritten on a second run
    curate_job.main(argv)
    report2 = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert report2["written_buckets"] == 0
    assert report2["skipped_buckets"] == 4


def test_ordered_lineage_write_resume_midway(spark, tmp_path):
    """bucket_col/sort_cols writes survive a crash: resume completes the
    remaining buckets and ordering holds in every bucket."""
    from aloha_spark.operators.mixture import with_shuffle_order
    from aloha_spark.plans.lineage import write_with_lineage

    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"))
    x = with_shuffle_order(df, n_shards=6, seed=2)
    out, lin = str(tmp_path / "o"), str(tmp_path / "l")
    with pytest.raises(RuntimeError, match="injected failure"):
        write_with_lineage(x, out, lin, key="doc_id", ts_col="doc_id",
                           num_buckets=6, group_size=2,
                           bucket_col="shard",
                           sort_cols=["shuffle_key", "doc_id"],
                           fail_after_groups=1)
    wr = write_with_lineage(x, out, lin, key="doc_id", ts_col="doc_id",
                           num_buckets=6, group_size=2,
                           bucket_col="shard",
                           sort_cols=["shuffle_key", "doc_id"])
    assert len(wr.written_buckets) + len(wr.skipped_buckets) == 6
    back = spark.read.parquet(out)
    assert back.count() == 200
    import pandas as pd
    for b in range(6):
        files = glob.glob(f"{out}/bucket={b}/*.parquet")
        assert len(files) == 1
        pdf = pd.read_parquet(files[0])
        assert list(pdf.shuffle_key) == sorted(pdf.shuffle_key)


def test_shuffle_with_chunks_deterministic_and_card(spark, tmp_path,
                                                    capsys):
    """--chunk-budget + --shuffle-seed + --data-card: the card reads
    chunk_text (this combo used to crash on the dropped text column)
    and a document's chunks land in a deterministic within-shard order
    across runs."""
    docs = str(tmp_path / "docs")
    rows = [(i, f"src{i % 2}",
             " ".join(f"t{i}w{j}" for j in range(11)), "en")
            for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string") \
        .write.mode("overwrite").parquet(docs)

    def run(out, lin):
        curate_job.main([
            "--docs", docs, "--out", out, "--lineage", lin,
            "--sample-col", "source", "--chunk-budget", "4",
            "--shuffle-seed", "3", "--data-card",
            "--num-buckets", "4", "--group-size", "2"])
        return json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])

    import pandas as pd
    r1 = run(str(tmp_path / "o1"), str(tmp_path / "l1"))
    assert "data_card" in r1 and r1["data_card"][0]["total_tokens"] > 0
    r2 = run(str(tmp_path / "o2"), str(tmp_path / "l2"))
    for b in range(4):
        f1 = glob.glob(f"{tmp_path}/o1/bucket={b}/*.parquet")
        f2 = glob.glob(f"{tmp_path}/o2/bucket={b}/*.parquet")
        assert len(f1) == 1 and len(f2) == 1
        p1 = pd.read_parquet(f1[0])[["doc_id", "chunk_idx"]]
        p2 = pd.read_parquet(f2[0])[["doc_id", "chunk_idx"]]
        # identical row ORDER across runs, chunks contiguous ascending
        assert p1.values.tolist() == p2.values.tolist()
        for _, g in p1.groupby("doc_id", sort=False):
            assert list(g.chunk_idx) == sorted(g.chunk_idx)
