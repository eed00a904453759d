"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time featurization pipeline
(as-of join + windowed features + sparse feature vectors) over a
transcript view derived deterministically from the events table at
sf0.001.  ``queries()`` exposes each implemented operator from
SURVEY.md §2 as (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for everything SQL-expressible (hash-parity and
training-line formats are covered by pytest goldens instead and run as
rows-only checks here).

Column aliasing rule: every computed column is aliased identically in
the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aloha_spark.operators.windows import epoch_seconds

SF0001 = "/root/testdata/sf0.001"

# --------------------------------------------------------------------------
# shared derivations (Spark + SQL twins)

# tool := event_type for click/view events, else NULL (gives the backfill
# operators realistic sparsity)
_TRANSCRIPTS_SQL = """
SELECT CAST(user_id AS VARCHAR) AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
            AS BIGINT) AS turn_idx,
       event_type AS role,
       props AS text,
       CASE WHEN event_type IN ('click', 'view') THEN event_type END AS tool,
       ts,
       value
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("long").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type").isin("click", "view"),
               F.col("event_type")).alias("tool"),
        F.col("ts"),
        F.col("value"),
    )


_STATE_SQL = """
SELECT CAST(user_id AS VARCHAR) AS conv_id, ts,
       value AS state_score
FROM (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'signup') t
WHERE rn = 1
"""


def state_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup events as a feature-state table keyed (conv_id, ts); at
    most one state row per (key, ts) — greatest event_id wins."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .where(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    return (ev.withColumn("rn", F.row_number().over(w)).where("rn = 1")
              .select(F.col("user_id").cast("string").alias("conv_id"),
                      "ts", F.col("value").alias("state_score")))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# window / sessionization / as-of queries

def q_window_lag_lead(spark, sf_dir):
    from aloha_spark.operators.windows import with_lag_lead
    t = transcripts_from_events(spark, sf_dir)
    out = with_lag_lead(t, ["text", "role"], order=("turn_idx",))
    return out.select("conv_id", "turn_idx", "prev_text", "next_text",
                      "prev_role", "next_role")


def q_backfill_last_tool(spark, sf_dir):
    from aloha_spark.operators.windows import with_backfill
    t = transcripts_from_events(spark, sf_dir)
    return with_backfill(t, ["tool"], order=("turn_idx",)) \
        .select("conv_id", "turn_idx", "tool", "last_tool")


def q_sessionize(spark, sf_dir):
    from aloha_spark.operators.windows import with_session_id
    t = transcripts_from_events(spark, sf_dir)
    return with_session_id(t, gap_seconds=1800.0, order=("turn_idx",)) \
        .select("conv_id", "turn_idx",
                F.col("session_id").cast("long").alias("session_id"))


def q_turn_delta(spark, sf_dir):
    from aloha_spark.operators.windows import with_ts_delta
    t = transcripts_from_events(spark, sf_dir)
    return with_ts_delta(t, order=("turn_idx",)) \
        .select("conv_id", "turn_idx",
                F.round("dt_prev_sec", 6).alias("dt_prev_sec"))


def q_rolling_tool_count(spark, sf_dir):
    from aloha_spark.operators.windows import with_rolling_count
    t = transcripts_from_events(spark, sf_dir)
    return with_rolling_count(t, F.col("tool").isNotNull(), k=5,
                              order=("turn_idx",), out_col="tools_in_window") \
        .select("conv_id", "turn_idx", "tools_in_window")


def q_session_stats(spark, sf_dir):
    from aloha_spark.operators.windows import with_session_id
    t = transcripts_from_events(spark, sf_dir)
    s = with_session_id(t, gap_seconds=1800.0, order=("turn_idx",))
    return (s.groupBy("conv_id",
                      F.col("session_id").cast("long").alias("session_id"))
             .agg(F.count("*").alias("n_turns"),
                  F.round(F.max(epoch_seconds("ts"))
                          - F.min(epoch_seconds("ts")), 6)
                  .alias("duration_sec"),
                  F.sum(F.col("tool").isNotNull().cast("long"))
                  .alias("n_tool_turns")))


def q_asof_state(spark, sf_dir):
    from aloha_spark.operators.asof import asof_join
    t = transcripts_from_events(spark, sf_dir)
    s = state_from_events(spark, sf_dir)
    out = asof_join(t, s, on="ts", by="conv_id", state_cols=["state_score"])
    return out.select("conv_id", "turn_idx", "state_score")


def q_asof_salted(spark, sf_dir):
    from aloha_spark.operators.asof import asof_join
    t = transcripts_from_events(spark, sf_dir)
    s = state_from_events(spark, sf_dir)
    hot = [r[0] for r in t.groupBy("conv_id").count()
           .orderBy(F.desc("count")).limit(3).collect()]
    out = asof_join(t, s, on="ts", by="conv_id", state_cols=["state_score"],
                    hot_keys=hot, salt_buckets=4)
    return out.select("conv_id", "turn_idx", "state_score")


def q_asof_strict(spark, sf_dir):
    from aloha_spark.operators.asof import asof_join
    t = transcripts_from_events(spark, sf_dir)
    s = state_from_events(spark, sf_dir)
    out = asof_join(t, s, on="ts", by="conv_id", state_cols=["state_score"],
                    allow_exact=False)
    return out.select("conv_id", "turn_idx", "state_score")


def q_pit_pipeline(spark, sf_dir):
    """Flagship: as-of join + lag + backfill + sessionization combined."""
    from aloha_spark.plans.flagship import point_in_time_features
    t = transcripts_from_events(spark, sf_dir)
    s = state_from_events(spark, sf_dir)
    x = point_in_time_features(t, s, state_cols=["state_score"])
    return x.select("conv_id", "turn_idx", "text", "prev_text", "last_tool",
                    F.col("session_id").cast("long").alias("session_id"),
                    "state_score")


# --------------------------------------------------------------------------
# relational / aggregation parity

def q_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= F.lit("2002-09-01"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count("*").alias("count_order")))


def q_broadcast_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy(F.col("n_name").alias("nation"))
             .agg(F.count("*").alias("n_orders"),
                  F.round(F.sum("o_totalprice"), 2).alias("revenue")))


def q_interval_filter(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # gtLt / geLe interval predicates (Comparisons.scala:14-47)
    return (ev.where((F.lit(50.0) < F.col("value")) & (F.col("value") < 150.0))
              .groupBy("event_type")
              .agg(F.count("*").alias("n"),
                   F.round(F.avg("value"), 6).alias("avg_value")))


def q_linear_score(spark, sf_dir):
    """A1 analog: sparse linear dot product w.x over token weights.

    Shuffle-free formulation: the weight vector is a map LITERAL inside
    the projection (the degenerate broadcast join), and the per-document
    score is one `aggregate` over the token array — a single scan, no
    explode, no shuffle, whole-stage-codegen'd.  Documents with no
    matching token are excluded (inner-join semantics, same as the
    oracle's join + groupBy)."""
    weights = [("the", 1.0), ("data", 2.0), ("spark", 3.0), ("query", -1.5),
               ("fast", 0.5), ("slow", -0.5)]
    docs = _docs(spark, sf_dir)
    wmap = F.create_map(
        *[F.lit(x) for kv in weights for x in kv])
    toks = F.split(F.trim("text"), r"\s+")
    score = F.aggregate(
        toks, F.lit(0.0),
        lambda acc, t: acc + F.coalesce(wmap[t], F.lit(0.0)))
    hit = F.exists(toks, lambda t: wmap[t].isNotNull())
    return (docs.select("doc_id", F.round(score, 6).alias("score"),
                        hit.alias("__hit"))
                .where("__hit").drop("__hit"))


def q_proto_roundtrip(spark, sf_dir):
    """S2 proto scan, oracle-gated: transcripts are encoded to protobuf
    wire bytes + base64 (executor-side pandas UDF), then scanned back
    through ``decode_proto_lines`` — the typed output must equal the
    direct derivation (the oracle SQL never sees protobuf)."""
    from typing import Iterator

    import pandas as pd

    from aloha_spark.sources.proto import (
        TRANSCRIPT_PROTO, decode_proto_lines, encode_message)

    t = transcripts_from_events(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        (epoch_seconds("ts") * 1000).cast("long").alias("ts_epoch_ms"))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import base64
        for pdf in batches:
            if pdf.empty:
                continue
            lines = []
            for rec in pdf.to_dict("records"):
                msg = {k: (None if v is None or v != v else v)
                       for k, v in rec.items()}
                lines.append(base64.b64encode(
                    encode_message(msg, TRANSCRIPT_PROTO)).decode("ascii"))
            yield pd.DataFrame({"line": lines})

    lines_df = t.mapInPandas(enc, "line string")
    out = decode_proto_lines(lines_df, "line", TRANSCRIPT_PROTO)
    return out.select("conv_id",
                      F.col("turn_idx").cast("long").alias("turn_idx"),
                      "role", "text", "tool", "ts_epoch_ms")


def q_avro_roundtrip(spark, sf_dir):
    """S3 avro scan, oracle-gated: transcripts encoded to Avro binary
    records (spec wire format, executor-side) and decoded back; the
    typed output must equal the direct derivation."""
    from typing import Iterator

    import pandas as pd

    from aloha_spark.sources.avro import (
        TRANSCRIPT_AVRO, _Reader, encode_value)

    t = transcripts_from_events(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        (epoch_seconds("ts") * 1000).cast("long").alias("ts_epoch_ms"))

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f["name"] for f in TRANSCRIPT_AVRO["fields"]]
        for pdf in batches:
            if pdf.empty:
                continue
            decoded = {n: [] for n in names}
            for rec in pdf.to_dict("records"):
                rec = {k: (None if v is None or v != v else v)
                       for k, v in rec.items()}
                buf = bytearray()
                encode_value(buf, rec, TRANSCRIPT_AVRO)
                out = _Reader(bytes(buf)).value(TRANSCRIPT_AVRO)
                for n in names:
                    decoded[n].append(out.get(n))
            yield pd.DataFrame(decoded)

    return t.mapInPandas(
        roundtrip,
        "conv_id string, turn_idx long, role string, text string, "
        "tool string, ts_epoch_ms long")


def q_tree_risk(spark, sf_dir):
    """M3 decision tree (BasicDecisionTree) compiled to nested CASE WHEN
    — lazy per-branch evaluation, no UDF."""
    from aloha_spark.plans.models import apply_model
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    m = {"modelType": "DecisionTree", "returnBest": True,
         "nodes": [
             {"id": 0, "value": 0.0,
              "selector": {"predicates": ["${c_acctbal} < 0",
                                          "${c_acctbal} >= 0"]},
              "children": [1, 2]},
             {"id": 1, "value": -1.0},
             {"id": 2, "value": 0.5,
              "selector": {"predicates": ["${c_acctbal} > 5000",
                                          "${c_acctbal} <= 5000"]},
              "children": [3, 4]},
             {"id": 3, "value": 2.0},
             {"id": 4, "value": 1.0},
         ]}
    return apply_model(c, m, "risk").select("c_custkey", "risk")


def q_order_segment(spark, sf_dir):
    """M5 segmentation: threshold-scan of a submodel score -> label."""
    from aloha_spark.plans.models import apply_model
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m = {"modelType": "Segmentation",
         "submodel": {"modelType": "Spec", "spec": "${o_totalprice}"},
         "thresholds": [50000, 150000],
         "labels": ["small", "mid", "large"]}
    return apply_model(o, m, "segment").select("o_orderkey", "segment")


def q_price_bucket(spark, sf_dir):
    """M7 DoubleToLong: clamp(round(scale*x + translation)) — scala
    .round = floor(x + 0.5)."""
    from aloha_spark.plans.models import apply_model
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    m = {"modelType": "DoubleToLong",
         "submodel": {"modelType": "Spec", "spec": "${l_extendedprice}"},
         "scale": 0.001, "translation": 0.0, "round": True,
         "clampLower": 0, "clampUpper": 60}
    return apply_model(li, m, "bucket") \
        .select("l_orderkey", "l_linenumber", "bucket")


# --------------------------------------------------------------------------
# text features (documents table)

def q_doc_tokens(spark, sf_dir):
    """bag() kernel over Arrow batches, exploded to (doc_id, token, cnt)."""
    from typing import Iterator

    import pandas as pd

    from aloha_spark.functions.textfeatures import bag

    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, toks, cnts = [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                for k, v in bag(txt if isinstance(txt, str) else "").items():
                    ids.append(did)
                    toks.append(k)
                    cnts.append(v)
            yield pd.DataFrame({"doc_id": ids, "token": toks, "cnt": cnts})

    return docs.mapInPandas(run, "doc_id long, token string, cnt double")


def q_doc_bigrams(spark, sf_dir):
    from typing import Iterator

    import pandas as pd

    from aloha_spark.functions.textfeatures import n_grams

    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, gs, cnts = [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                for k, v in n_grams(txt if isinstance(txt, str) else "", 2).items():
                    ids.append(did)
                    gs.append(k)
                    cnts.append(v)
            yield pd.DataFrame({"doc_id": ids, "gram": gs, "cnt": cnts})

    return docs.mapInPandas(run, "doc_id long, gram string, cnt double")


def q_doc_skipgrams(spark, sf_dir):
    """1-skip-2-grams via the Aloha kernel (SkipGrams.scala window
    semantics), exploded to (doc_id, gram, cnt)."""
    from typing import Iterator

    import pandas as pd

    from aloha_spark.functions.textfeatures import skip_grams

    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, gs, cnts = [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                for k, v in skip_grams(txt if isinstance(txt, str) else "",
                                       2, 1).items():
                    ids.append(did)
                    gs.append(k)
                    cnts.append(v)
            yield pd.DataFrame({"doc_id": ids, "gram": gs, "cnt": cnts})

    return docs.mapInPandas(run, "doc_id long, gram string, cnt double")


def q_turn_reindex(spark, sf_dir):
    from aloha_spark.operators.windows import with_turn_reindex
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("conv_id"), "event_id",
        "value")
    out = with_turn_reindex(ev, by="conv_id", order=["value", "event_id"],
                            out_col="value_rank")
    return out.select("conv_id", "event_id",
                      F.col("value_rank").cast("long").alias("value_rank"))


def q_csv_lines(spark, sf_dir):
    from aloha_spark.sinks.csv_sink import csv_lines
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    feats = [{"name": "name", "column": "c_name"},
             {"name": "segment", "column": "c_mktsegment"},
             {"name": "acctbal", "column": "c_acctbal",
              "type": "decimal(12,2)"}]
    out, _header = csv_lines(cust.withColumn(
        "c_mktsegment", F.when(F.col("c_acctbal") < 0, None)
                         .otherwise(F.col("c_mktsegment"))), feats)
    return out.select(F.col("name").alias("c_name"), "csv_line")


def q_doc_stats(spark, sf_dir):
    from aloha_spark.operators.textstats import with_token_stats
    return with_token_stats(_docs(spark, sf_dir)).select(
        "doc_id",
        F.col("token_count").cast("long").alias("token_count"),
        F.col("char_count").cast("long").alias("char_count"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"))


def q_lang_guess(spark, sf_dir):
    from aloha_spark.operators.textstats import with_lang_id
    return with_lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_guess")


def q_dedup_exact(spark, sf_dir):
    from aloha_spark.operators.dedup import exact_dedup
    return exact_dedup(_docs(spark, sf_dir), ["text"]) \
        .select("content_hash", "keep_id", "dup_count")


def q_media_meta(spark, sf_dir):
    from aloha_spark.sources.multimodal import synthesize_media
    m = synthesize_media(_docs(spark, sf_dir))
    return m.select("media_id", "kind",
                    F.octet_length("payload").cast("long").alias("n_bytes"))


# --------------------------------------------------------------------------
# embeddings

def q_ann_topk(spark, sf_dir):
    from aloha_spark.operators.similarity import brute_force_topk
    embs = _embs(spark, sf_dir)
    q = embs.where("vec_id < 10")
    return brute_force_topk(q, embs, k=3).select(
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("long").alias("rank"))


def q_ann_topk_ivf(spark, sf_dir):
    """IVF ANN with nprobe == n_centroids (exhaustive probing) — exact
    by construction, so the brute-force DuckDB oracle gates the whole
    IVF machinery (train / assign / probe / verify)."""
    from aloha_spark.operators.similarity import ivf_topk
    embs = _embs(spark, sf_dir)
    q = embs.where("vec_id < 10")
    return ivf_topk(q, embs, k=3, n_centroids=8, nprobe=8).select(
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("long").alias("rank"))


def q_embed_neardup(spark, sf_dir):
    """Exact cosine-threshold pair baseline (the LSH-accelerated variant
    is q_embed_neardup_lsh, rows-only)."""
    from aloha_spark.operators.similarity import _cosine_expr
    e = _embs(spark, sf_dir).select(F.col("vec_id").alias("id"),
                                    F.col("embedding").alias("v"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     _cosine_expr("a.v", "b.v").alias("c")))
    return pairs.where(F.col("c") >= 0.35) \
        .select("id_a", "id_b", F.round("c", 6).alias("cosine"))


# ---- rows-only queries (hash parity / line formats / approx algorithms) --

def q_feature_vectors(spark, sf_dir):
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    spec = PipelineSpec.from_json({
        "features": [
            {"name": "bow", "spec": "bag(${text})"},
            {"name": "lang", "spec": "ind(${lang})"},
            {"name": "nchars", "spec": "clamp(${n_chars:-0}, 0, 100000)"},
        ],
        "namespaces": {}, "numBits": 18})
    pipe = FeaturePipeline(spec)
    out = pipe.to_sparse_vectors(_docs(spark, sf_dir), keep_cols=["doc_id"])
    # the driver's rows-only canonicalizer sorts the frame — array
    # columns are unhashable there, so serialize the vector to one
    # deterministic JSON string per row
    return out.select(
        "doc_id",
        F.to_json(F.struct("indices", "values")).alias("vec_json"),
        F.array_join("missing_features", ",").alias("missing"))


def q_vw_lines(spark, sf_dir):
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    spec = PipelineSpec.from_json({
        "features": [
            {"name": "bow", "spec": "bag(${text})"},
            {"name": "lang", "spec": "ind(${lang})"},
        ],
        "namespaces": {"t": ["bow"], "m": ["lang"]},
        "label": "${n_chars} / 1000.0"})
    pipe = FeaturePipeline(spec)
    return pipe.to_vw_lines(_docs(spark, sf_dir), keep_cols=["doc_id"])


def q_libsvm_lines(spark, sf_dir):
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    spec = PipelineSpec.from_json({
        "features": [{"name": "bow", "spec": "bag(${text})"}],
        "namespaces": {}})
    pipe = FeaturePipeline(spec)
    return pipe.to_libsvm_lines(_docs(spark, sf_dir), keep_cols=["doc_id"])


def q_dedup_minhash(spark, sf_dir):
    from aloha_spark.operators.dedup import minhash_dedup_pairs
    return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.35,
                               num_hashes=64, bands=32)


def q_simhash(spark, sf_dir):
    from aloha_spark.operators.dedup import with_simhash
    return with_simhash(_docs(spark, sf_dir)).select("doc_id", "simhash")


def q_doc_fingerprint(spark, sf_dir):
    from aloha_spark.operators.textstats import with_fingerprint
    return with_fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def q_embed_neardup_lsh(spark, sf_dir):
    from aloha_spark.operators.dedup import embedding_neardup_pairs
    return embedding_neardup_pairs(_embs(spark, sf_dir), threshold=0.35,
                                   planes=8, probe_hamming=1)


def q_doc_quality(spark, sf_dir):
    from aloha_spark.operators.textstats import with_quality_score
    return with_quality_score(_docs(spark, sf_dir)) \
        .select("doc_id", "quality_score")


def q_media_features(spark, sf_dir):
    from aloha_spark.sources.multimodal import (
        extract_media_features, synthesize_media)
    return extract_media_features(synthesize_media(_docs(spark, sf_dir)))


# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: point-in-time featurization — as-of join +
    window features + hashed sparse feature vectors."""
    from aloha_spark.operators.windows import stable_output_order
    from aloha_spark.plans.flagship import point_in_time_features
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec

    t = transcripts_from_events(spark, SF0001)
    s = state_from_events(spark, SF0001)
    # windows-first ordering: turn-side window features are computed on
    # the narrow turns frame, then the as-of join attaches state
    x = point_in_time_features(t, s, state_cols=["state_score"])

    spec = PipelineSpec.from_json({
        "features": [
            {"name": "role", "spec": "ind(${role})"},
            {"name": "tool", "spec": "ind(${last_tool})"},
            {"name": "bow", "spec": "bag(${text})"},
            {"name": "prev_bow", "spec": "bag(${prev_text:-''})"},
            {"name": "dt", "spec": "clamp(${dt_prev_sec:-0}, 0, 86400)"},
            {"name": "dt_bin", "spec": "sos2U(${dt_prev_sec}, 0, 7200, 600)"},
            {"name": "state", "spec": "${state_score:-0}"},
        ],
        "namespaces": {"t": ["bow", "prev_bow"],
                       "s": ["role", "tool", "dt", "dt_bin", "state"]},
        "numBits": 18})
    pipe = FeaturePipeline(spec)
    out = pipe.to_sparse_vectors(
        x, keep_cols=["conv_id", "turn_idx", "text", "session_id",
                      "state_score"])
    return stable_output_order(out)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # windows / sessionization / as-of (SURVEY §2.4, §2.6)
        "window_lag_lead": q_window_lag_lead,
        "backfill_last_tool": q_backfill_last_tool,
        "sessionize": q_sessionize,
        "turn_delta": q_turn_delta,
        "rolling_tool_count": q_rolling_tool_count,
        "session_stats": q_session_stats,
        "asof_state": q_asof_state,
        "asof_salted": q_asof_salted,
        "asof_strict": q_asof_strict,
        "pit_pipeline": q_pit_pipeline,
        # relational / aggregation
        "pricing_summary": q_pricing_summary,
        "broadcast_join": q_broadcast_join,
        "interval_filter": q_interval_filter,
        "linear_score": q_linear_score,
        "proto_roundtrip": q_proto_roundtrip,
        "avro_roundtrip": q_avro_roundtrip,
        # model dataflow layer (SURVEY §2.8)
        "tree_risk": q_tree_risk,
        "order_segment": q_order_segment,
        "price_bucket": q_price_bucket,
        # text features (§2.3)
        "doc_tokens": q_doc_tokens,
        "doc_bigrams": q_doc_bigrams,
        "doc_skipgrams": q_doc_skipgrams,
        "turn_reindex": q_turn_reindex,
        "csv_lines": q_csv_lines,
        "doc_stats": q_doc_stats,
        "lang_guess": q_lang_guess,
        "doc_quality": q_doc_quality,
        "dedup_exact": q_dedup_exact,
        "media_meta": q_media_meta,
        # embeddings
        "ann_topk": q_ann_topk,
        "ann_topk_ivf": q_ann_topk_ivf,
        "embed_neardup": q_embed_neardup,
        # rows-only (hash parity / formats / approx)
        "feature_vectors": q_feature_vectors,
        "vw_lines": q_vw_lines,
        "libsvm_lines": q_libsvm_lines,
        "dedup_minhash": q_dedup_minhash,
        "simhash": q_simhash,
        "doc_fingerprint": q_doc_fingerprint,
        "embed_neardup_lsh": q_embed_neardup_lsh,
        "media_features": q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    T = f"WITH transcripts AS ({_TRANSCRIPTS_SQL}), state AS ({_STATE_SQL})"
    return {
        "window_lag_lead": f"""{T}
SELECT conv_id, turn_idx,
       LAG(text) OVER w AS prev_text, LEAD(text) OVER w AS next_text,
       LAG(role) OVER w AS prev_role, LEAD(role) OVER w AS next_role
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)""",
        "backfill_last_tool": f"""{T}
SELECT conv_id, turn_idx, tool,
       LAST_VALUE(tool IGNORE NULLS) OVER
         (PARTITION BY conv_id ORDER BY turn_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_tool
FROM transcripts""",
        "sessionize": f"""{T}
SELECT conv_id, turn_idx,
       CAST(SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) OVER
         (PARTITION BY conv_id ORDER BY turn_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
FROM (SELECT conv_id, turn_idx,
             EPOCH(ts) - LAG(EPOCH(ts)) OVER
               (PARTITION BY conv_id ORDER BY turn_idx) AS gap
      FROM transcripts) g""",
        "turn_delta": f"""{T}
SELECT conv_id, turn_idx,
       ROUND(EPOCH(ts) - LAG(EPOCH(ts)) OVER
         (PARTITION BY conv_id ORDER BY turn_idx), 6) AS dt_prev_sec
FROM transcripts""",
        "rolling_tool_count": f"""{T}
SELECT conv_id, turn_idx,
       CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) OVER
         (PARTITION BY conv_id ORDER BY turn_idx
          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS tools_in_window
FROM transcripts""",
        "session_stats": f"""{T},
sess AS (
  SELECT conv_id, turn_idx, tool, ts,
         CAST(SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) OVER
           (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM (SELECT conv_id, turn_idx, tool, ts,
               EPOCH(ts) - LAG(EPOCH(ts)) OVER
                 (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        FROM transcripts) g)
SELECT conv_id, session_id, COUNT(*) AS n_turns,
       ROUND(MAX(EPOCH(ts)) - MIN(EPOCH(ts)), 6) AS duration_sec,
       CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool_turns
FROM sess GROUP BY conv_id, session_id""",
        "asof_state": f"""{T}
SELECT t.conv_id, t.turn_idx, s.state_score
FROM transcripts t ASOF LEFT JOIN state s
  ON t.conv_id = s.conv_id AND t.ts >= s.ts""",
        "asof_salted": f"""{T}
SELECT t.conv_id, t.turn_idx, s.state_score
FROM transcripts t ASOF LEFT JOIN state s
  ON t.conv_id = s.conv_id AND t.ts >= s.ts""",
        "asof_strict": f"""{T}
SELECT t.conv_id, t.turn_idx, s.state_score
FROM transcripts t ASOF LEFT JOIN state s
  ON t.conv_id = s.conv_id AND t.ts > s.ts""",
        "pit_pipeline": f"""{T},
joined AS (
  SELECT t.conv_id, t.turn_idx, t.text, t.tool, t.ts, s.state_score
  FROM transcripts t ASOF LEFT JOIN state s
    ON t.conv_id = s.conv_id AND t.ts >= s.ts),
win AS (
  SELECT conv_id, turn_idx, text, ts, state_score,
         LAG(text) OVER w AS prev_text,
         LAST_VALUE(tool IGNORE NULLS) OVER
           (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_tool,
         EPOCH(ts) - LAG(EPOCH(ts)) OVER w AS gap
  FROM joined
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT conv_id, turn_idx, text, prev_text, last_tool,
       CAST(SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) OVER
         (PARTITION BY conv_id ORDER BY turn_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id,
       state_score
FROM win""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-01'
GROUP BY l_returnflag, l_linestatus""",
        "broadcast_join": """
SELECT n.n_name AS nation, COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name""",
        "interval_filter": """
SELECT event_type, COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
FROM events WHERE 50.0 < value AND value < 150.0
GROUP BY event_type""",
        "linear_score": """
WITH weights(token, w) AS (VALUES
  ('the', 1.0), ('data', 2.0), ('spark', 3.0), ('query', -1.5),
  ('fast', 0.5), ('slow', -0.5)),
toks AS (
  SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\\s+')) AS token
  FROM documents)
SELECT t.doc_id, ROUND(SUM(w.w), 6) AS score
FROM toks t JOIN weights w ON t.token = w.token
GROUP BY t.doc_id""",
        "doc_tokens": """
SELECT doc_id, '=' || token AS token, CAST(COUNT(*) AS DOUBLE) AS cnt
FROM (SELECT doc_id,
             UNNEST(string_split_regex(TRIM(text), '\\s+')) AS token
      FROM documents) t
GROUP BY doc_id, token""",
        "doc_bigrams": """
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(text), '\\s+') AS ts
  FROM documents)
SELECT doc_id, gram, CAST(COUNT(*) AS DOUBLE) AS cnt
FROM (SELECT doc_id,
             UNNEST(list_transform(range(1, len(ts)),
                    i -> '=' || ts[i] || '_' || ts[i+1])) AS gram
      FROM toks) g
GROUP BY doc_id, gram""",
        "doc_skipgrams": """
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(text), '\\s+') AS ts
  FROM documents)
SELECT doc_id, gram, CAST(COUNT(*) AS DOUBLE) AS cnt
FROM (SELECT doc_id,
             UNNEST(flatten(list_transform(range(1, len(ts) + 1),
                 i -> list_transform(range(i + 1, least(len(ts), i + 2) + 1),
                      j -> '=' || ts[i] || '_' || ts[j])))) AS gram
      FROM toks) g
GROUP BY doc_id, gram""",
        "turn_reindex": """
SELECT CAST(user_id AS VARCHAR) AS conv_id, event_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY value, event_id) - 1 AS BIGINT)
         AS value_rank
FROM events""",
        "csv_lines": """
SELECT c_name,
       c_name || ',' ||
       COALESCE(CASE WHEN c_acctbal < 0 THEN NULL
                     ELSE c_mktsegment END, 'NULL') || ',' ||
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS csv_line
FROM customer""",
        "proto_roundtrip": """
SELECT conv_id, turn_idx, role, text, tool,
       CAST(epoch_ms(ts) AS BIGINT) AS ts_epoch_ms
FROM (SELECT CAST(user_id AS VARCHAR) AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
            AS BIGINT) AS turn_idx,
       event_type AS role,
       props AS text,
       CASE WHEN event_type IN ('click', 'view') THEN event_type END AS tool,
       ts
FROM events) t""",
        "avro_roundtrip": """
SELECT conv_id, turn_idx, role, text, tool,
       CAST(epoch_ms(ts) AS BIGINT) AS ts_epoch_ms
FROM (SELECT CAST(user_id AS VARCHAR) AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
            AS BIGINT) AS turn_idx,
       event_type AS role,
       props AS text,
       CASE WHEN event_type IN ('click', 'view') THEN event_type END AS tool,
       ts
FROM events) t""",
        "tree_risk": """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN -1.0
            WHEN c_acctbal > 5000 THEN 2.0
            ELSE 1.0 END AS risk
FROM customer""",
        "order_segment": """
SELECT o_orderkey,
       CASE WHEN o_totalprice <= 50000 THEN 'small'
            WHEN o_totalprice <= 150000 THEN 'mid'
            ELSE 'large' END AS segment
FROM orders""",
        "price_bucket": """
SELECT l_orderkey, l_linenumber,
       CAST(LEAST(60, GREATEST(0,
            FLOOR(l_extendedprice * 0.001 + 0.5))) AS BIGINT) AS bucket
FROM lineitem""",
        "doc_quality": """
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE string_split_regex(TRIM(text), '\\s+') END AS ts,
         LENGTH(text) AS n_chars,
         LENGTH(regexp_replace(text, '[^\\.,;:!?]', '', 'g')) AS punct
  FROM documents),
s AS (
  SELECT doc_id,
    CASE WHEN n_chars > 0 THEN punct::DOUBLE / n_chars ELSE 0.0 END
      AS punct_ratio,
    CASE WHEN len(ts) > 0 THEN
      len(list_filter(ts, x -> list_contains(
        ['the','a','of','and','to','in','is','it','that','for'],
        lower(x))))::DOUBLE / len(ts)
    ELSE 0.0 END AS stop_ratio,
    CASE WHEN len(ts) > 0
         THEN 1.0 - len(list_distinct(ts))::DOUBLE / len(ts)
         ELSE 1.0 END AS rep_ratio,
    CASE WHEN n_chars BETWEEN 20 AND 10000 THEN 1.0 ELSE 0.2 END
      AS length_band
  FROM t)
SELECT doc_id,
       ROUND(0.4 * length_band
             + 0.2 * LEAST(1.0, stop_ratio * 5)
             + 0.2 * (1.0 - LEAST(1.0, punct_ratio * 10))
             + 0.2 * (1.0 - rep_ratio), 6) AS quality_score
FROM s""",
        "doc_stats": """
WITH toks AS (
  SELECT doc_id, text,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE string_split_regex(TRIM(text), '\\s+') END AS ts
  FROM documents)
SELECT doc_id,
       CAST(len(ts) AS BIGINT) AS token_count,
       CAST(LENGTH(text) AS BIGINT) AS char_count,
       CASE WHEN len(ts) > 0 THEN
         ROUND(list_sum(list_transform(ts, t -> LENGTH(t)))::DOUBLE / len(ts), 6)
       END AS avg_token_len,
       CASE WHEN len(ts) > 0 THEN
         ROUND(len(list_distinct(ts))::DOUBLE / len(ts), 6)
       END AS distinct_ratio
FROM toks""",
        "lang_guess": f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split_regex(TRIM(text), '\\s+'),
                        t -> LOWER(t)) AS ts
  FROM documents),
scored AS (
  SELECT doc_id,
         len(list_filter(ts, t -> list_contains({_sql_list('de')}, t))) AS h_de,
         len(list_filter(ts, t -> list_contains({_sql_list('en')}, t))) AS h_en,
         len(list_filter(ts, t -> list_contains({_sql_list('es')}, t))) AS h_es
  FROM toks)
SELECT doc_id,
       CASE WHEN GREATEST(h_de, h_en, h_es) = 0 THEN 'und'
            WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
            WHEN h_en >= h_de THEN 'en'
            ELSE 'de' END AS lang_guess
FROM scored""",
        "dedup_exact": """
SELECT md5(COALESCE(text, CHR(0) || 'NULL' || CHR(0))) AS content_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS dup_count
FROM documents GROUP BY 1""",
        "media_meta": """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents""",
        "ann_topk": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         (SELECT SUM(CAST(x.a AS DOUBLE) * CAST(x.b AS DOUBLE))
          FROM (SELECT UNNEST(q.embedding) AS a,
                       UNNEST(c.embedding) AS b) x)
         / (SQRT((SELECT SUM(CAST(y.a AS DOUBLE) * CAST(y.a AS DOUBLE))
                  FROM (SELECT UNNEST(q.embedding) AS a) y))
            * SQRT((SELECT SUM(CAST(z.b AS DOUBLE) * CAST(z.b AS DOUBLE))
                    FROM (SELECT UNNEST(c.embedding) AS b) z))) AS cos
  FROM q, embeddings c WHERE q.vec_id != c.vec_id)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
       CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM pairs) r
WHERE rnk <= 3""",
        "ann_topk_ivf": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         (SELECT SUM(CAST(x.a AS DOUBLE) * CAST(x.b AS DOUBLE))
          FROM (SELECT UNNEST(q.embedding) AS a,
                       UNNEST(c.embedding) AS b) x)
         / (SQRT((SELECT SUM(CAST(y.a AS DOUBLE) * CAST(y.a AS DOUBLE))
                  FROM (SELECT UNNEST(q.embedding) AS a) y))
            * SQRT((SELECT SUM(CAST(z.b AS DOUBLE) * CAST(z.b AS DOUBLE))
                    FROM (SELECT UNNEST(c.embedding) AS b) z))) AS cos
  FROM q, embeddings c WHERE q.vec_id != c.vec_id)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
       CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER
        (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM pairs) r
WHERE rnk <= 3""",
        "embed_neardup": """
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         (SELECT SUM(CAST(x.u AS DOUBLE) * CAST(x.v AS DOUBLE))
          FROM (SELECT UNNEST(a.embedding) AS u,
                       UNNEST(b.embedding) AS v) x)
         / (SQRT((SELECT SUM(CAST(y.u AS DOUBLE) * CAST(y.u AS DOUBLE))
                  FROM (SELECT UNNEST(a.embedding) AS u) y))
            * SQRT((SELECT SUM(CAST(z.v AS DOUBLE) * CAST(z.v AS DOUBLE))
                    FROM (SELECT UNNEST(b.embedding) AS v) z))) AS c
  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, ROUND(c, 6) AS cosine
FROM pairs WHERE c >= 0.35""",
    }


def _sql_list(lang: str) -> str:
    from aloha_spark.operators.textstats import STOPWORDS
    inner = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"[{inner}]"
