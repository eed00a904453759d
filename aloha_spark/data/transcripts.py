"""Deterministic synthetic multi-turn transcript tables.

Shape per BASELINE.json input_hint:
``(conv_id: string, turn_idx: int, role: string, text: string,
tool: string, ts: timestamp)`` plus a feature-state side table keyed
``(conv_id, ts)``.

Everything derives from ``spark.range`` + hash arithmetic (seeded,
order-independent) — no external data, reproducible at any scale, and
generation itself is distributed (no driver-side loops).  One
configurable mega-conversation exercises skew; deterministic NULL
``tool`` values exercise backfill; hash-driven inter-turn gaps create
session boundaries; the state table contains rows timestamped between,
exactly at, and after turn timestamps to exercise leakage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "browser", "python", "bash", "editor"]
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]
EPOCH = "2025-01-01 00:00:00"


def _h(*cols, seed: int = 7) -> F.Column:
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols],
                      F.lit(seed))


def make_transcripts(spark: SparkSession, n_convs: int = 100,
                     turns_per_conv: int = 20, mega_turns: int = 0,
                     partitions: int = 0) -> DataFrame:
    """Deterministic transcript table with n_convs*turns_per_conv +
    mega_turns rows.  ``mega_turns`` > 0 adds one skewed conversation
    ``conv_id='mega'``."""
    n = n_convs * turns_per_conv
    base = spark.range(0, n, 1, partitions or None).select(
        F.concat(F.lit("c"), (F.col("id") % n_convs).cast("string")).alias("conv_id"),
        (F.col("id") / n_convs).cast("int").alias("turn_idx"),
    )
    if mega_turns > 0:
        mega = spark.range(0, mega_turns, 1, partitions or None).select(
            F.lit("mega").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
        )
        base = base.unionByName(mega)
    return _decorate_turns(base)


def _decorate_turns(base: DataFrame) -> DataFrame:
    # inter-turn gap: mostly 45s, every ~17th turn a 40-minute gap
    # (session boundary), every ~23rd turn a zero gap (duplicate-ts tie
    # fixture); cumulative sum keeps ts non-decreasing per conv.
    step = F.when(F.pmod(_h("conv_id", "turn_idx", seed=11), F.lit(17)) == 0,
                  F.lit(2400)) \
            .when(F.pmod(_h("conv_id", "turn_idx", seed=19), F.lit(23)) == 0,
                  F.lit(0)) \
            .otherwise(F.lit(45) + F.pmod(_h("conv_id", "turn_idx", seed=13), F.lit(20)))
    w = Window.partitionBy("conv_id").orderBy("turn_idx") \
              .rowsBetween(Window.unboundedPreceding, 0)
    df = base.withColumn("__offset", F.sum(step).over(w))

    base_text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(2) + F.pmod(_h("conv_id", "turn_idx", seed=17), F.lit(9))),
        lambda i: F.element_at(
            F.array(*[F.lit(wd) for wd in WORDS]),
            (F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx"), i, F.lit(23)),
                    F.lit(len(WORDS))) + 1).cast("int"))))

    # missing-data fixtures: occasional empty text and NULL text
    text = F.when(F.pmod(_h("conv_id", "turn_idx", seed=53), F.lit(29)) == 0,
                  F.lit("")) \
            .when(F.pmod(_h("conv_id", "turn_idx", seed=59), F.lit(31)) == 0,
                  F.lit(None).cast("string")) \
            .otherwise(base_text)

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]),
                        (F.pmod(_h("conv_id", "turn_idx", seed=29), F.lit(len(ROLES))) + 1).cast("int"))
    tool = F.when(
        F.pmod(_h("conv_id", "turn_idx", seed=31), F.lit(3)) == 0,
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]),
                     (F.pmod(_h("conv_id", "turn_idx", seed=37), F.lit(len(TOOLS))) + 1).cast("int")))

    return df.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (F.to_timestamp(F.lit(EPOCH)) +
         F.make_interval(secs=F.col("__offset").cast("double"))).alias("ts"),
    )


def make_state(spark: SparkSession, transcripts: DataFrame,
               future_rows: bool = True) -> DataFrame:
    """Feature-state table keyed (conv_id, ts): one state row roughly
    every 4 turns, timestamped 1s AFTER the emitting turn (so the
    emitting turn itself must NOT see it — leakage probe), plus, when
    ``future_rows``, per-conv rows dated after the last turn that no
    turn may ever see."""
    st = (transcripts
          .where(F.pmod(_h("conv_id", "turn_idx", seed=41), F.lit(4)) == 0)
          .select(
              "conv_id",
              (F.col("ts") + F.make_interval(secs=F.lit(1.0))).alias("ts"),
              (F.pmod(_h("conv_id", "turn_idx", seed=43), F.lit(1000)) / 10.0)
              .alias("state_score"),
              F.concat(F.lit("tag"),
                       F.pmod(_h("conv_id", "turn_idx", seed=47), F.lit(5)))
              .alias("state_tag"),
          ))
    if future_rows:
        fut = (transcripts.groupBy("conv_id")
               .agg(F.max("ts").alias("max_ts"))
               .select("conv_id",
                       (F.col("max_ts") + F.make_interval(secs=F.lit(9999.0))).alias("ts"),
                       F.lit(-1e9).alias("state_score"),
                       F.lit("LEAKED_FROM_FUTURE").alias("state_tag")))
        st = st.unionByName(fut)
    return st
