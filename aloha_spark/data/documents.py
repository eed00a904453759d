"""Deterministic synthetic document corpus for curation benchmarks.

Same shape as the driver's ``documents`` table (``doc_id: bigint,
text: string, lang: string, source: string, n_chars: bigint``), built
entirely from ``spark.range`` + hash arithmetic: generation is
distributed (no driver loops), reproducible at any scale, and seeded so
every curation stage in jobs/curate.py does real work:

- **exact-duplicate clusters**: inside each 13-document block, documents
  whose in-block position hashes into the dup band regenerate their text
  from the block-leader's seed — identical bytes, so exact dedup finds
  deterministic multi-member groups at every scale.
- **low-quality rows**: a hash band yields empty / two-word documents
  that a ``--min-quality`` filter drops.
- **non-English rows**: a hash band draws from a non-stopword vocab so
  ``with_lang_id`` guesses something other than ``en``.
- **PII tokens**: a hash band appends an e-mail + phone so
  ``--scrub-pii`` has matches to redact (and scrubbed dup-cluster
  members still deduplicate together).
- **benchmark overlap**: ``make_benchmark`` returns a small slice of the
  corpus verbatim, so decontamination finds real contaminated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# English-ish vocab (stopword-heavy so the n-gram lang heuristic reads
# "en") and a disjoint "foreign" vocab for the non-English band.
_EN_WORDS = [
    "the", "a", "and", "of", "to", "in", "is", "that", "for", "with",
    "table", "query", "join", "scan", "merge", "window", "batch",
    "stream", "column", "value", "data", "spark", "row", "sort",
]
_XX_WORDS = [
    "zrk", "qwv", "xhl", "pzt", "vrn", "klm", "wqz", "jxv", "bdg",
    "tsk", "nvx", "grp", "hzl", "mwq", "fkt", "drz",
]

_DUP_BLOCK = 13          # block size for exact-dup clusters


def _h(seed: int) -> F.Column:
    return F.xxhash64(F.col("doc_id"), F.lit(seed))


def _word_salad(seed_col, vocab: list, min_words: int, spread: int):
    """Deterministic text: ``min_words + (hash % spread)`` words drawn
    per-position from ``vocab``, all derived from ``seed_col``."""
    n_words = (F.lit(min_words) +
               F.pmod(F.xxhash64(seed_col, F.lit(101)), F.lit(spread)))
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: F.element_at(
            arr,
            (F.pmod(F.xxhash64(seed_col, i, F.lit(103)),
                    F.lit(len(vocab))) + 1).cast("int"))))


def make_documents(spark: SparkSession, n_docs: int,
                   partitions: int = 0) -> DataFrame:
    """Deterministic corpus with ~8% exact-dup rows, ~6% low-quality
    rows, ~5% non-English rows, and ~10% rows carrying PII tokens."""
    df = spark.range(0, n_docs, 1, partitions or None) \
              .withColumnRenamed("id", "doc_id")

    block_leader = F.col("doc_id") - F.pmod(F.col("doc_id"),
                                            F.lit(_DUP_BLOCK))
    is_dup = (F.pmod(_h(7), F.lit(_DUP_BLOCK)) < 1) & \
             (F.col("doc_id") != block_leader)
    # dup rows re-derive text from the BLOCK LEADER's seed -> exact
    # byte-identical clusters of 1-3 members per 13-block
    text_seed = F.when(is_dup, block_leader).otherwise(F.col("doc_id"))

    def _hs(seed: int) -> F.Column:
        # every text-affecting band hashes TEXT_SEED (not doc_id) so a
        # dup-cluster member mirrors its leader byte-for-byte
        return F.xxhash64(text_seed, F.lit(seed))

    is_lowq = F.pmod(_hs(11), F.lit(16)) == 0          # ~6%
    is_xx = (~is_lowq) & (F.pmod(_hs(13), F.lit(20)) == 0)   # ~5%
    has_pii = F.pmod(_hs(17), F.lit(10)) == 0          # ~10%

    base = _word_salad(text_seed, _EN_WORDS, 20, 60)
    foreign = _word_salad(text_seed, _XX_WORDS, 20, 60)
    lowq = F.when(F.pmod(_hs(19), F.lit(2)) == 0, F.lit("")) \
            .otherwise(F.lit("ok ok"))
    pii = F.concat(
        F.lit(" contact user"),
        F.pmod(F.xxhash64(text_seed, F.lit(23)), F.lit(1000)).cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad(F.pmod(F.xxhash64(text_seed, F.lit(29)),
                      F.lit(10000)).cast("string"), 4, "0"),
        F.lit("-1234."))

    text = F.when(is_lowq, lowq) \
            .otherwise(F.when(is_xx, foreign).otherwise(base))
    # PII derives from text_seed so dup-cluster members stay identical
    text = F.when(has_pii & ~is_lowq, F.concat(text, pii)).otherwise(text)

    return df.select(
        "doc_id",
        text.alias("text"),
        F.when(is_xx, F.lit("xx")).otherwise(F.lit("en")).alias("lang"),
        F.concat(F.lit("src"),
                 F.pmod(_h(31), F.lit(5)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))


def make_benchmark(documents: DataFrame, every: int = 997) -> DataFrame:
    """A small verbatim slice of the corpus (one doc in ``every``) to
    stand in for an eval benchmark: decontamination must drop the
    surviving originals of these rows."""
    return (documents
            .where(F.pmod(F.col("doc_id"), F.lit(every)) == 3)
            .select("doc_id", "text"))
