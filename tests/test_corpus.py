"""Corpus dataset ops: deterministic split / stratified sample /
decontamination / top-k vocabulary / sequence packing."""

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from aloha_spark.operators.corpus import (
    N_BUCKETS, decontaminate, deterministic_split, hash_bucket, ngrams_col,
    pack_sequences, stratified_sample, top_tokens)


def _docs(spark, n=400):
    return spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 4}",
             text=" ".join(f"w{(i * 7 + j) % 50}" for j in range(12)))
         for i in range(n)])


# ---------------------------------------------------------------- split

def test_split_covers_every_row_and_is_stable(spark):
    df = _docs(spark)
    out = deterministic_split(df, "doc_id",
                              weights=(("train", 0.8), ("val", 0.1),
                                       ("test", 0.1)))
    pdf = out.select("doc_id", "split").toPandas()
    assert pdf["split"].notna().all()
    assert set(pdf["split"]) == {"train", "val", "test"}
    # proportions in the right ballpark at n=400
    frac = (pdf["split"] == "train").mean()
    assert 0.7 < frac < 0.9
    # subset invariance: assignment is per-id, not per-dataset
    half = deterministic_split(df.where(F.col("doc_id") < 200), "doc_id",
                               weights=(("train", 0.8), ("val", 0.1),
                                        ("test", 0.1)))
    merged = pdf.merge(half.select("doc_id", "split").toPandas(),
                       on="doc_id", suffixes=("", "_half"))
    assert (merged["split"] == merged["split_half"]).all()


def test_split_null_id_stays_null_and_salt_changes_assignment(spark):
    df = spark.createDataFrame([Row(doc_id=None), Row(doc_id=7)],
                               "doc_id int")
    out = deterministic_split(df, "doc_id").toPandas()
    assert out.loc[out["doc_id"].isna(), "split"].isna().all()
    a = deterministic_split(_docs(spark), "doc_id", salt="a") \
        .select("split").toPandas()["split"]
    b = deterministic_split(_docs(spark), "doc_id", salt="b") \
        .select("split").toPandas()["split"]
    assert not (a == b).all()


def test_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        deterministic_split(_docs(spark), weights=())
    with pytest.raises(ValueError):
        deterministic_split(_docs(spark), weights=(("a", -0.1), ("b", 1.1)))


# --------------------------------------------------------------- sample

def test_stratified_sample_rates_and_determinism(spark):
    df = _docs(spark, 800)
    out = stratified_sample(df, "source", {"s0": 1.0, "s1": 0.0},
                            default_fraction=0.5)
    pdf = out.toPandas()
    per = pdf.groupby("source").size()
    assert per.get("s0", 0) == 200          # fraction 1.0 keeps all
    assert per.get("s1", 0) == 0            # fraction 0.0 drops all
    assert 60 < per.get("s2", 0) < 140      # ~50% of 200
    again = stratified_sample(df, "source", {"s0": 1.0, "s1": 0.0},
                              default_fraction=0.5).toPandas()
    assert sorted(again["doc_id"]) == sorted(pdf["doc_id"])


def test_stratified_sample_null_stratum_uses_default(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source=None) for i in range(100)],
        "doc_id int, source string")
    kept = stratified_sample(df, "source", {"x": 1.0},
                             default_fraction=1.0).count()
    assert kept == 100
    none_kept = stratified_sample(df, "source", {"x": 1.0},
                                  default_fraction=0.0).count()
    assert none_kept == 0
    with pytest.raises(ValueError):
        stratified_sample(df, "source", {"x": 1.5})


# --------------------------------------------------------------- ngrams

def test_ngrams_col_basic_short_and_null(spark):
    df = spark.createDataFrame(
        [Row(text="a b c d"), Row(text="a b"), Row(text=None)])
    out = df.select(ngrams_col("text", 3).alias("g")).toPandas()["g"]
    assert list(out[0]) == ["a b c", "b c d"]
    assert list(out[1]) == []
    assert out[2] is None


# -------------------------------------------------------------- decontam

def test_decontaminate_exact_fracs(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e"),      # grams: abc bcd cde
        Row(doc_id=2, text="a b c x y"),      # grams: abc bcx cxy -> 1/3
        Row(doc_id=3, text="p q r s t"),      # no overlap
        Row(doc_id=4, text="a b"),            # too short: 0 grams
        Row(doc_id=5, text=None),             # NULL text: 0 grams
    ])
    bench = spark.createDataFrame([Row(text="a b c d e")])
    out = decontaminate(docs, bench, n=3, threshold=0.5) \
        .toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "contam_frac"] == 1.0 and out.loc[1, "contaminated"]
    assert abs(out.loc[2, "contam_frac"] - 1 / 3) < 1e-12
    assert not out.loc[2, "contaminated"]
    assert out.loc[3, "contam_frac"] == 0.0
    assert out.loc[4, "total_grams"] == 0 and out.loc[4, "contam_frac"] == 0.0
    assert out.loc[5, "total_grams"] == 0 and not out.loc[5, "contaminated"]
    assert len(out) == 5                      # every input doc has a row


def test_decontaminate_counts_distinct_grams_once(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b a b a b")])
    bench = spark.createDataFrame([Row(text="a b a")])
    out = decontaminate(docs, bench, n=2, threshold=0.9).toPandas()
    # doc grams: {a b, b a} (distinct), bench: {a b, b a} -> frac 1.0
    assert out.loc[0, "total_grams"] == 2
    assert out.loc[0, "hit_grams"] == 2


def test_bloom_decontaminate_matches_exact_and_edge_cases(spark):
    from aloha_spark.operators.corpus import bloom_decontaminate
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e"),
        Row(doc_id=2, text="a b c x y"),
        Row(doc_id=3, text="p q r s t"),
        Row(doc_id=4, text="a b"),            # too short: 0 grams
        Row(doc_id=5, text=None),             # NULL text: 0 grams
    ])
    bench = spark.createDataFrame([Row(text="a b c d e")])
    exact = decontaminate(docs, bench, n=3, threshold=0.5) \
        .toPandas().set_index("doc_id").sort_index()
    # generous sizing: fp probability ~ 0 at this scale, so the bloom
    # result must EQUAL the exact operator row-for-row
    bloom = bloom_decontaminate(
        docs, bench, n=3, threshold=0.5,
        expected_items=16, fpp=1e-6).toPandas() \
        .set_index("doc_id").sort_index()
    for c in ("total_grams", "hit_grams", "contam_frac", "contaminated"):
        assert bloom[c].tolist() == exact[c].tolist(), c


def test_bloom_no_false_negatives_and_fpr_bound(spark):
    from aloha_spark.operators.corpus import bloom_decontaminate
    # 200 benchmark members + 2000 disjoint probes, tight-ish filter
    bench_rows = [Row(text=f"m{i} m{i+1} m{i+2}") for i in range(200)]
    member_docs = [Row(doc_id=i, text=f"m{i} m{i+1} m{i+2}")
                   for i in range(200)]
    other_docs = [Row(doc_id=10_000 + i, text=f"z{i} z{i+1} z{i+2}")
                  for i in range(2000)]
    out = bloom_decontaminate(
        spark.createDataFrame(member_docs + other_docs),
        spark.createDataFrame(bench_rows),
        n=3, threshold=0.5, expected_items=200, fpp=0.01) \
        .toPandas().set_index("doc_id").sort_index()
    # NO false negatives: every member doc is flagged
    assert out.loc[:9_999]["contaminated"].all()
    # false-positive rate on the disjoint probes stays near fpp
    # (single-gram docs: doc FPR == gram FPR); 5x slack over the
    # asymptotic formula absorbs small-filter variance
    fpr = out.loc[10_000:]["contaminated"].mean()
    assert fpr <= 0.05, fpr


def test_bloom_sizing_contracts(spark):
    from aloha_spark.operators.corpus import bloom_decontaminate
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    bench = spark.createDataFrame([Row(text="a b c")])
    with pytest.raises(ValueError, match="expected_items"):
        bloom_decontaminate(docs, bench)
    with pytest.raises(ValueError, match="max_filter_bytes"):
        bloom_decontaminate(docs, bench, expected_items=10 ** 12,
                            fpp=0.001)
    # empty benchmark: nothing is contaminated, rows still emitted
    empty = spark.createDataFrame([], "text string")
    out = bloom_decontaminate(docs, empty, n=2, num_bits=1024) \
        .toPandas()
    assert len(out) == 1 and not out.loc[0, "contaminated"]


# ------------------------------------------------------------ top tokens

def test_top_tokens_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [Row(text="b a"), Row(text="a b"), Row(text="c c z")])
    out = top_tokens(df, "text", k=3).toPandas()
    assert list(out["token"]) == ["a", "b", "c"]   # 2,2,2 -> token asc
    assert list(out["cnt"]) == [2, 2, 2]


# ---------------------------------------------------------------- packing

def _pack_df(spark, counts):
    return spark.createDataFrame(
        [Row(doc_id=i, n_tokens=c) for i, c in enumerate(counts)])


def test_pack_exactly_once_and_budget(spark):
    counts = [700, 600, 500, 400, 300, 200, 100, 50, 2100]
    out = pack_sequences(_pack_df(spark, counts), budget=1000,
                         num_partitions=1).toPandas()
    assert sorted(out["doc_id"]) == list(range(len(counts)))   # exactly once
    sums = out.groupby("pack_id")["n_tokens"].sum()
    n_docs = out.groupby("pack_id").size()
    for pid, s in sums.items():
        assert s <= 1000 or n_docs[pid] == 1
    big = out[out["doc_id"] == 8]
    assert bool(big["oversized"].iloc[0]) and n_docs[big["pack_id"].iloc[0]] == 1
    assert not out[out["doc_id"] != 8]["oversized"].any()
    # BFD actually packs: 2850 non-oversized tokens / 1000 -> 3 packs
    assert len(sums) == 4


def test_pack_deterministic_and_partition_local(spark):
    counts = [97 * (i % 17) + 3 for i in range(500)]   # max 1555 < budget
    a = pack_sequences(_pack_df(spark, counts), budget=2048,
                       num_partitions=4).toPandas()
    b = pack_sequences(_pack_df(spark, counts), budget=2048,
                       num_partitions=4).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    assert not a["oversized"].any()
    sums = a.groupby("pack_id")["n_tokens"].sum()
    assert (sums <= 2048).all()
    # utilization sanity: far fewer packs than docs
    assert len(sums) < len(counts) / 2


def test_pack_rejects_null_and_negative_counts(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, n_tokens=None), Row(doc_id=2, n_tokens=10)],
        "doc_id int, n_tokens int")
    with pytest.raises(Exception, match="NULL/negative"):
        pack_sequences(df, budget=100, num_partitions=1).count()


def test_hash_bucket_matches_duckdb(spark):
    import duckdb
    ids = [f"id{i}" for i in range(50)]
    df = spark.createDataFrame([Row(k=s) for s in ids])
    got = dict(df.select("k", hash_bucket(F.col("k"), salt="z")
                         .alias("b")).collect())
    want = dict(duckdb.sql(
        "SELECT k, ('0x' || substr(md5('z' || k), 1, 15))::BIGINT % "
        f"{N_BUCKETS} FROM (SELECT UNNEST({ids!r}) AS k)").fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# hypothesis fuzz of the pure BFD kernel (no Spark): invariants + exact
# equivalence with an independent O(n^2) best-fit reference

from hypothesis import given, settings, strategies as st


def _bfd_reference(cnts, budget):
    """Naive best-fit-decreasing: linear scan for the tightest open
    pack that fits: the SMALLEST remaining >= c, and among equal
    capacities the MOST RECENTLY inserted one — mirroring the kernel's
    bisect_left discipline, which inserts new capacities at the left
    end of an equal run and pops from the left (LIFO among ties)."""
    rem = []     # remaining capacity per open pack, insertion-ordered
    order = []   # (capacity, seq) as the sorted list would hold them
    seq = 0
    min_cnt = int(cnts[-1]) if len(cnts) else 0
    pack_idx, slot_idx, fills = [], [], []
    for c in cnts:
        c = int(c)
        # candidates: packs whose tracked capacity fits c
        fitting = [(cap, s, p) for (cap, s, p) in order if cap >= c]
        if fitting:
            cap, s, p = min(fitting, key=lambda t: (t[0], -t[1]))
            order.remove((cap, s, p))
            r = cap - c
        else:
            p = len(fills)
            fills.append(0)
            r = budget - c
        pack_idx.append(p)
        slot_idx.append(fills[p])
        fills[p] += 1
        if r >= min_cnt:
            order.append((r, seq, p))
            seq += 1
    return pack_idx, slot_idx


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=0,
                max_size=120),
       st.integers(min_value=1, max_value=4096))
def test_bfd_pack_invariants_and_reference_parity(cnts, budget):
    from aloha_spark.operators.corpus import bfd_pack
    cnts = sorted(cnts, reverse=True)
    pack_idx, slot_idx = bfd_pack(cnts, budget)
    assert len(pack_idx) == len(cnts) and len(slot_idx) == len(cnts)
    if not cnts:
        return
    # packs are numbered contiguously from 0
    n_packs = max(pack_idx) + 1
    assert set(pack_idx) == set(range(n_packs))
    # slots are contiguous 0..k-1 within each pack, in scan order
    seen = {}
    totals = {}
    sizes = {}
    for c, p, s in zip(cnts, pack_idx, slot_idx):
        assert s == seen.get(p, 0)
        seen[p] = s + 1
        totals[p] = totals.get(p, 0) + c
        sizes[p] = sizes.get(p, 0) + 1
    for p, tot in totals.items():
        # budget respected, except oversized singletons
        if tot > budget:
            assert sizes[p] == 1
    # exact assignment parity with the independent reference
    ref_pack, ref_slot = _bfd_reference(cnts, budget)
    assert pack_idx == ref_pack
    assert slot_idx == ref_slot


# -------------------------------------------------------------- chunking

def test_chunk_documents_windows_and_overlap(spark):
    from aloha_spark.operators.corpus import chunk_documents
    docs = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"t{i}" for i in range(10))),
        Row(doc_id=2, text="a b c"),
        Row(doc_id=3, text=""),
        Row(doc_id=4, text=None),
    ])
    out = chunk_documents(docs, budget=4, overlap=1) \
        .toPandas().sort_values(["doc_id", "chunk_idx"])
    d1 = out[out["doc_id"] == 1]
    # stride 3 over 10 tokens -> starts 0,3,6 cover everything: 3 chunks
    assert list(d1["chunk_idx"]) == [0, 1, 2]
    assert list(d1["chunk_text"]) == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert list(d1["n_tokens"]) == [4, 4, 4]
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk_text"]) == ["a b c"]    # fits in one chunk
    assert not (out["doc_id"] > 2).any()          # empty/NULL -> no chunks


def test_chunk_documents_reassembles_and_packs(spark):
    """Round-trip with pack_sequences: chunk the oversized docs, then
    no pack is oversized and the non-overlap token stream re-assembles
    the original document."""
    from aloha_spark.operators.corpus import chunk_documents
    long_text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([Row(doc_id=1, text=long_text)])
    chunks = chunk_documents(docs, budget=32, overlap=0)
    pdf = chunks.toPandas().sort_values("chunk_idx")
    assert " ".join(pdf["chunk_text"]) == long_text
    packed = pack_sequences(
        chunks.select(F.col("chunk_idx").alias("doc_id"), "n_tokens"),
        budget=32, num_partitions=1).toPandas()
    assert not packed["oversized"].any()


def test_chunk_documents_validates_args(spark):
    from aloha_spark.operators.corpus import chunk_documents
    docs = _docs(spark, 5)
    with pytest.raises(ValueError):
        chunk_documents(docs, budget=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, budget=8, overlap=8)


def test_chunk_documents_passes_through_metadata(spark):
    from aloha_spark.operators.corpus import chunk_documents
    docs = spark.createDataFrame([
        Row(doc_id=1, source="s0", split="train",
            text=" ".join(f"w{i}" for i in range(10)))])
    out = chunk_documents(docs, budget=4, overlap=0).toPandas()
    assert list(out.columns) == ["doc_id", "source", "split",
                                 "chunk_idx", "chunk_text", "n_tokens"]
    assert (out["source"] == "s0").all() and (out["split"] == "train").all()
    assert len(out) == 3


def test_pack_survives_empty_partitions(spark):
    """num_partitions > distinct ids leaves empty partitions: the
    mapInPandas closure must yield nothing for them, not crash on
    pd.concat of zero batches."""
    out = pack_sequences(_pack_df(spark, [10, 20]), budget=100,
                         num_partitions=8).toPandas()
    assert sorted(out["doc_id"]) == [0, 1]
    empty = pack_sequences(
        _pack_df(spark, [10]).where(F.col("doc_id") < 0),
        budget=100, num_partitions=4)
    assert empty.count() == 0


def test_chunk_documents_rechunks_own_output(spark):
    """The advertised re-chunk flow: chunk_documents output (which
    carries chunk_idx/chunk_text/n_tokens) must chunk again without
    column-reference ambiguity — output names shadow input ones."""
    from aloha_spark.operators.corpus import chunk_documents
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"w{i}" for i in range(40)))])
    first = chunk_documents(docs, budget=16, overlap=0)
    second = chunk_documents(first, text="chunk_text", budget=4,
                             overlap=0).toPandas()
    assert list(second.columns) == ["doc_id", "chunk_idx", "chunk_text",
                                    "n_tokens"]
    # 40 tokens -> 3 chunks of <=16 -> re-chunked at 4: 10 chunks total
    assert second["n_tokens"].sum() == 40
    assert (second["n_tokens"] <= 4).all()


# -------------------------------------------------- temperature sample

def test_temperature_sample_rates_and_determinism(spark):
    """alpha=1 keeps natural proportions (rate == target everywhere);
    alpha->0 flattens toward uniform-over-sources; membership is a
    pure per-id filter (subset-invariant and repeatable)."""
    from aloha_spark.operators.corpus import temperature_sample
    # skewed strata: s0 has 600 rows, s1..s3 have 100 each
    rows = [Row(doc_id=i, source="s0") for i in range(600)] + \
           [Row(doc_id=600 + i, source=f"s{1 + i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows)

    nat = temperature_sample(df, "source", alpha=1.0, target_frac=0.5)
    per = nat.toPandas().groupby("source").size()
    # alpha=1: every stratum at ~50% of its natural size
    assert 250 < per["s0"] < 350
    for s in ("s1", "s2", "s3"):
        assert 30 < per[s] < 70

    flat = temperature_sample(df, "source", alpha=0.1, target_frac=0.5)
    perf = flat.toPandas().groupby("source").size()
    # alpha~0: weights near-uniform over 4 sources -> each stratum
    # targets ~ 0.5*900/4 = 112.5 rows; small strata cap at 100 (rate 1)
    assert perf["s1"] == 100 and perf["s2"] == 100 and perf["s3"] == 100
    assert 80 < perf["s0"] < 150

    again = temperature_sample(df, "source", alpha=1.0, target_frac=0.5)
    assert sorted(again.toPandas()["doc_id"]) == \
        sorted(nat.toPandas()["doc_id"])


def test_temperature_sample_caps_and_validates(spark):
    from aloha_spark.operators.corpus import temperature_sample
    rows = [Row(doc_id=i, source="big") for i in range(900)] + \
           [Row(doc_id=900 + i, source="tiny") for i in range(10)]
    df = spark.createDataFrame(rows)
    # alpha=0.2 pushes the tiny stratum's rate above 1 -> capped: all
    # 10 tiny rows kept, never upsampled
    out = temperature_sample(df, "source", alpha=0.2,
                             target_frac=0.5).toPandas()
    assert (out["source"] == "tiny").sum() == 10
    with pytest.raises(ValueError):
        temperature_sample(df, alpha=0.0)
    with pytest.raises(ValueError):
        temperature_sample(df, target_frac=1.5)


def test_temperature_sample_null_stratum_and_plan(spark):
    """NULL strata form their own stratum (null-safe join); the plan
    stays broadcast + filter — no corpus-wide shuffle."""
    from aloha_spark.operators.corpus import temperature_sample
    df = spark.createDataFrame(
        [Row(doc_id=i, source=None if i % 2 else "a") for i in range(200)],
        "doc_id int, source string")
    out = temperature_sample(df, "source", alpha=0.5, target_frac=0.5)
    pdf = out.toPandas()
    assert (pdf["source"].isna()).sum() > 0      # NULL stratum sampled
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan
