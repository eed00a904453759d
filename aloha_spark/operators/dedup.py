"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Spark-first design notes (the 100 TB story):
* exact dedup is a hash-groupBy — one shuffle on a 16-byte digest, no
  Python.
* MinHash signatures / SimHash are computed per document inside
  Arrow-batched pandas UDFs (one vectorized murmur pass per batch);
  LSH banding turns near-dup detection into an equi-join on (band,
  band_hash) — a shuffle whose key count grows with corpus size, no
  pairwise blow-up outside buckets.  Candidate pairs are then verified
  with exact Jaccard so precision is 1 regardless of banding.
* the candidate self-join keys on the band bucket; bucket skew (a very
  common band hash) is bounded with ``max_bucket_size`` (oversized
  buckets dropped and logged — standard practice for web-scale dedup).
"""

from __future__ import annotations

import weakref
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..functions.hashing import string_hash_array

# persisted intermediates keyed by the result DataFrame they back; the
# finalizer auto-unpersists when the result is garbage-collected, so a
# long-lived session running many dedup/ANN queries does not accumulate
# plan caches in the CacheManager.  release_intermediates() frees them
# eagerly once the caller has materialized the result.
_INTERMEDIATES: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _safe_unpersist(jdf_holder: DataFrame) -> None:
    try:
        jdf_holder.unpersist(blocking=False)
    except Exception:
        pass                      # session already stopped


def _track_intermediates(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    _INTERMEDIATES[result] = list(persisted)
    for p in persisted:
        weakref.finalize(result, _safe_unpersist, p)
    return result


def release_intermediates(result: DataFrame) -> int:
    """Unpersist the cached intermediates backing a pairs DataFrame
    returned by :func:`minhash_dedup_pairs` /
    :func:`embedding_neardup_pairs`.  Spark cannot know when a lazily
    returned plan is done being consumed, so call this after the result
    has been written/collected.  (If never called, the same frames are
    unpersisted when the result is garbage-collected.)  Returns the
    number of frames released."""
    frames = _INTERMEDIATES.pop(result, [])
    for f in frames:
        _safe_unpersist(f)
    return len(frames)

# ---------------------------------------------------------------------------
# exact dedup

def _hamming_ball_masks(bits: int, radius: int) -> list:
    """XOR masks for every non-zero bit pattern of weight <= radius —
    the probe set for 'code within Hamming <= radius' LSH multi-probe.
    (Previously only weight-1 masks were generated, silently treating
    any radius >= 2 as 1.)"""
    import itertools
    masks = []
    for h in range(1, radius + 1):
        for combo in itertools.combinations(range(bits), h):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def content_digest(cols: Sequence[str]) -> "F.Column":
    """16-byte md5 content digest, NULL-sentinel encoded.  NULLs encode
    distinctly (concat_ws silently DROPS null columns, which would merge
    ('x', NULL) with (NULL, 'x') and with ('x','') — distinct contents):
    every column is coalesced to a sentinel that cannot collide with a
    real empty string.  Shared by batch exact_dedup and the streaming
    dedup tail — their agreement on what counts as a duplicate is a
    correctness contract."""
    return F.md5(F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
          for c in cols]))


def exact_dedup(df: DataFrame, cols: Sequence[str] = ("text",),
                id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: keeps min(id) as the canonical id,
    counts duplicates.  Pure JVM: one shuffle on the 16-byte digest."""
    return (df.withColumn("content_hash", content_digest(cols))
              .groupBy("content_hash")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count("*").alias("dup_count")))


def exact_dedup_keep(df: DataFrame, cols: Sequence[str] = ("text",),
                     id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (the minimum-``id_col`` one),
    preserving every input column.

    This is the row-filtering counterpart of :func:`exact_dedup` (which
    returns the digest->keeper SUMMARY): a min window over the content
    digest, so the plan is ONE shuffle on the 16-byte hash and the
    upstream is computed exactly once.  The naive
    ``join(exact_dedup(df), 'left_semi')`` shape computes the upstream
    twice (once under the aggregate, once as the probe side) and adds a
    join exchange — at curation scale the upstream is the expensive
    quality/lang/scrub chain, so this halves the map work and removes
    two shuffles."""
    w = Window.partitionBy("content_hash")
    return (df.withColumn("content_hash", content_digest(cols))
              .withColumn("__keep", F.min(id_col).over(w))
              .where(F.col(id_col) == F.col("__keep"))
              .drop("content_hash", "__keep"))


def dedup_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text: str = "text", delim: str = "\n\n",
                     out_col: str = "text") -> DataFrame:
    """Paragraph-level exact dedup (the RefinedWeb/Falcon curation
    step): split every document on ``delim``, drop any paragraph whose
    trimmed text already appeared in an earlier position of the corpus
    (first occurrence by ``(id, paragraph_idx)`` wins), and reassemble
    each document from its surviving paragraphs in original order.

    Boilerplate (cookie banners, navigation footers, license headers)
    repeats across millions of pages without making whole documents
    identical, so document-level :func:`exact_dedup` misses it; this is
    the sub-document companion.

    Returns one row per document that keeps >= 1 paragraph:
    ``(id, out_col, n_paras_kept)``.  Whitespace-only paragraphs are
    dropped before dedup (they carry no content and a global
    first-empty-wins rule would shred document structure).

    100 TB story: two shuffles, both skew-proof.  The keeper choice is
    ``min(struct(id, idx))`` grouped by a 16-byte paragraph digest —
    partial aggregation collapses a boilerplate paragraph repeated a
    billion times to ONE row per map partition before the exchange, so
    hot paragraphs never concentrate on a reducer (a row_number window
    over the digest, the textbook formulation, would).  Reassembly is a
    second partial-aggregated groupBy on the document id.  No Python
    anywhere.  ``delim`` is matched literally (``\\Q...\\E``), so regex
    metacharacters in the delimiter are safe.
    """
    paras = (df.select(
                 F.col(id_col).alias("_did"),
                 F.posexplode(F.split(F.col(text),
                                      "\\Q" + delim + "\\E"))
                  .alias("_pidx", "_para"))
             .withColumn("_para", F.trim("_para"))
             .where(F.col("_para") != ""))
    keepers = (paras
               .groupBy(F.md5(F.col("_para")).alias("_digest"))
               .agg(F.min(F.struct("_did", "_pidx", "_para")).alias("_k")))
    return (keepers
            .select(F.col("_k._did").alias(id_col),
                    F.col("_k._pidx").alias("_pidx"),
                    F.col("_k._para").alias("_para"))
            .groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("_pidx", "_para"))),
                         lambda s: s["_para"]),
                     delim).alias(out_col),
                 F.count(F.lit(1)).alias("n_paras_kept")))


def filter_frequent_lines(df: DataFrame, id_col: str = "doc_id",
                          text: str = "text", delim: str = "\n",
                          max_freq: int = 2,
                          out_col: str = "text") -> DataFrame:
    """Corpus-frequency line filter (the CCNet / Gopher boilerplate
    rule): split every document on ``delim``, count how many times each
    trimmed non-empty line occurs ACROSS THE WHOLE CORPUS, drop every
    occurrence of any line whose corpus frequency exceeds ``max_freq``,
    and reassemble each document from its surviving lines in original
    order.

    This differs from :func:`dedup_paragraphs` in the keep rule:
    paragraph dedup keeps the FIRST occurrence of a repeated block,
    while the frequency filter removes ALL occurrences of
    high-frequency boilerplate (navigation text, cookie banners,
    timestamps) — the CCNet preprocessing step applied before
    perplexity bucketing.

    Returns one row per document that keeps >= 1 line:
    ``(id, out_col, n_lines_kept, n_lines_dropped)``.
    Whitespace-only lines are dropped before counting (they are
    formatting, not content) and count as neither kept nor dropped.

    100 TB story: two shuffles, both skew-proof.  The frequency
    relation is a partial-aggregated count grouped on a 16-byte line
    digest — a boilerplate line repeated a billion times collapses to
    one row per map partition before the exchange.  The line→frequency
    join keys on that digest, and a hot digest carries a ONE-row build
    side per key (the shape AQE skew-join splitting handles).
    Reassembly is a second partial-aggregated groupBy on the document
    id.  No Python anywhere; ``delim`` is matched literally.
    """
    lines = (df.select(
                 F.col(id_col).alias("_did"),
                 F.posexplode(F.split(F.col(text),
                                      "\\Q" + delim + "\\E"))
                  .alias("_lidx", "_line"))
             .withColumn("_line", F.trim("_line"))
             .where(F.col("_line") != "")
             .withColumn("_digest", F.md5(F.col("_line"))))
    freq = (lines
            .groupBy("_digest")
            .agg(F.count(F.lit(1)).alias("_freq")))
    tagged = lines.join(freq, "_digest")
    return (tagged
            .groupBy(F.col("_did").alias(id_col))
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("_freq") <= max_freq,
                                    F.struct("_lidx", "_line")))),
                         lambda s: s["_line"]),
                     delim).alias(out_col),
                 F.sum((F.col("_freq") <= max_freq).cast("long"))
                  .alias("n_lines_kept"),
                 F.sum((F.col("_freq") > max_freq).cast("long"))
                  .alias("n_lines_dropped"))
            .where(F.col("n_lines_kept") > 0))


def remove_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text: str = "text", n: int = 20,
                           out_col: str = "text") -> DataFrame:
    """Exact duplicated-span removal (the ExactSubstr step of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, token-granular): any ``n``-token window
    whose exact content already occurred at an earlier corpus position
    (first occurrence by ``(id, pos)`` wins) is a duplicate occurrence,
    and every token it covers is removed from the document.

    This catches what neither document-level nor paragraph-level exact
    dedup can: boilerplate RUNS embedded mid-sentence (license headers,
    quoted replies, templated spans) that never align with paragraph
    boundaries.  Overlapping duplicate windows mask the union of their
    positions, so an internally repeated run like ``x y z x y z``
    (n=2) keeps exactly one copy.

    Returns one row per input document: ``(id, out_col,
    n_tokens_removed)`` — documents shorter than ``n`` tokens (and
    NULL text) pass through untouched with 0 removed.

    100 TB story: span occurrences shuffle ONCE pre-aggregated to one
    row per (span, doc) — the global keeper is then an algebraic min
    over those rows, so a boilerplate span repeated a billion times
    partial-aggregates map-side instead of hot-spotting a reducer.
    The keeper join back onto the (span, doc) relation keys on the
    span digest; a hot span there has a ONE-row build side per key,
    exactly the shape AQE's skew-join splitting handles.  Everything
    downstream (range union, token filtering, reassembly) is per-doc
    JVM array work; token positions are masked with a transform over
    the materialized token array (free-variable splits inside HOF
    lambdas re-run per element — see ``ngrams_of``).
    """
    if n < 2:
        raise ValueError(f"span length must be >= 2 tokens: {n}")
    from .textstats import tokens_col

    toks = F.col("__sp_tk")
    m = F.size(toks) - (n - 1)
    # span enumeration as a zip_with chain over shifted slices, and the
    # md5 at ROW level after the explode: HOF lambda bodies evaluate in
    # interpreted mode (no whole-stage codegen), so every expression
    # node in them costs ~µs PER ELEMENT — an array_join(slice(...))
    # body measured 10.4s over 255k spans on one core, the one-node
    # concat below 2.7s, and an in-lambda md5 another ~12s (all hoisted)
    from ..operators.corpus import ngrams_of
    spans = (df.select(F.col(id_col).alias("_did"),
                       tokens_col(text).alias("__sp_tk"))
             .select("_did",
                     F.coalesce(ngrams_of(toks, n),
                                F.array().cast("array<string>"))
                      .alias("_sps"))
             .select("_did", F.posexplode("_sps").alias("_pos", "_sp"))
             .select("_did", "_pos", F.md5("_sp").alias("_digest")))
    # one row per (span, doc): positions collected, min kept for the
    # global-keeper race; partial aggregation collapses hot spans.
    # persisted: it feeds BOTH the keeper aggregation and the probe
    # side of the keeper join — without the cache the whole
    # explode+shuffle subtree runs twice (released with the result via
    # _track_intermediates / release_intermediates)
    per_doc = (spans.groupBy("_digest", "_did")
               .agg(F.sort_array(F.collect_list("_pos")).alias("_poss"),
                    F.min("_pos").alias("_minpos"))
               .persist())
    keeper = (per_doc.groupBy("_digest")
              .agg(F.min(F.struct("_did", "_minpos")).alias("_k")))
    # duplicate occurrences: every position except the keeper's
    dup_pos = (per_doc.join(keeper, "_digest")
               .select("_did",
                       F.when(F.col("_did") == F.col("_k._did"),
                              F.filter(F.col("_poss"),
                                       lambda p: p != F.col("_k._minpos")))
                        .otherwise(F.col("_poss")).alias("_dups"))
               .where(F.size("_dups") > 0)
               .groupBy("_did")
               .agg(F.flatten(F.collect_list("_dups")).alias("_dups")))
    # covered token positions = union of [p, p+n) over dup occurrences
    covered = F.array_distinct(F.flatten(F.transform(
        F.col("_dups"), lambda p: F.sequence(p, p + (n - 1)))))
    base = df.select(id_col, tokens_col(text).alias("__sp_tk"))
    joined = (base.join(dup_pos,
                        base[id_col] == dup_pos["_did"], "left")
              .drop("_did")
              .withColumn("_cov", F.when(F.col("_dups").isNotNull(),
                                         covered)
                                   .otherwise(F.array().cast("array<int>"))))
    # surviving positions via one codegen'd array_except (order
    # preserved), then a cheap element_at lambda — a per-token
    # array_contains filter would run interpreted per element at
    # O(|covered|) each
    sz = F.size("__sp_tk")
    kept_pos = F.when(sz > 0,
                      F.array_except(F.sequence(F.lit(0), sz - 1),
                                     F.col("_cov"))) \
                .otherwise(F.array().cast("array<int>"))
    kept = F.transform(kept_pos,
                       lambda j: F.element_at(F.col("__sp_tk"), j + 1))
    out = (joined.select(
        id_col,
        F.when(F.col("__sp_tk").isNull(),
               F.lit(None).cast("string"))
         .otherwise(F.array_join(kept, " ")).alias(out_col),
        F.coalesce(F.size("_cov"), F.lit(0)).cast("long")
         .alias("n_tokens_removed")))
    return _track_intermediates(out, per_doc)


# ---------------------------------------------------------------------------
# minhash + LSH

def _shingles(text: str, n: int) -> list[str]:
    toks = text.split() if text else []
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def make_minhash_udf(num_hashes: int = 64, shingle_n: int = 3, seed: int = 1):
    """Returns a pandas UDF text -> array<long> of MinHash values.

    Multiply-shift permutations of one murmur base hash:
    ``h_i(x) = (a_i * murmur(x) + b_i) mod 2^64`` with odd ``a_i``
    (a bijection on Z_2^64, the standard multiply-shift family) drawn
    from a seeded generator — fully deterministic across runs and
    executors, and ~2x cheaper than a Mersenne-prime modulus on the
    (num_hashes x shingles) permutation matrix."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2 ** 63, size=num_hashes, dtype=np.uint64) \
        | np.uint64(1)
    b = rng.integers(0, 2 ** 63, size=num_hashes, dtype=np.uint64)

    @pandas_udf("array<long>")
    def minhash(texts: pd.Series) -> pd.Series:
        docs = [_shingles(t if isinstance(t, str) else "", shingle_n)
                for t in texts]
        lens = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
        flat = [s for d in docs for s in d]
        n_docs = len(docs)
        if not flat:
            return pd.Series([[0] * num_hashes] * n_docs)
        base = string_hash_array(flat).astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            # (num_hashes, total_shingles) permutations for the WHOLE
            # batch at once, then segment-min per doc via reduceat
            perm = a[:, None] * base[None, :] + b[:, None]
        offs = np.concatenate(([0], np.cumsum(lens)))
        nonempty = lens > 0
        # reduceat over non-empty docs only: their starts are strictly
        # increasing and each segment ends exactly at the next one
        starts_ne = offs[:-1][nonempty]
        mins_ne = np.minimum.reduceat(perm, starts_ne, axis=1)
        # bit-reinterpret (not value-cast): uint64 mins above 2^63 must
        # map deterministically into the long-typed signature column
        sigs_ne = np.ascontiguousarray(mins_ne.T).view(np.int64)
        out: list = [[0] * num_hashes] * n_docs
        for j, i in enumerate(np.nonzero(nonempty)[0]):
            out[i] = sigs_ne[j].tolist()
        return pd.Series(out)

    return minhash


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the heavy signature UDF gets cluster-wide parallelism: a
    small file count (one parquet file -> one partition locally) would
    otherwise serialize the whole kernel on one task.  At real scale the
    input already has >= defaultParallelism partitions and this is a
    no-op (no shuffle)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # Exact probe: file COUNT is not a proxy for scan partitions in
    # either direction — FileSourceScan bin-packs many small files into
    # few partitions (maxPartitionBytes/openCostInBytes), and splits one
    # large file into many.  getNumPartitions() only builds the physical
    # plan (no job runs; the file listing is already cached in the
    # FileIndex), so the cost is planning-time, not data-touch.
    nparts = df.rdd.getNumPartitions()
    if nparts < target:
        return df.repartition(target)
    return df


def with_minhash(df: DataFrame, text: str = "text", num_hashes: int = 64,
                 shingle_n: int = 3, seed: int = 1,
                 out_col: str = "minhash") -> DataFrame:
    return _spread(df).withColumn(
        out_col, make_minhash_udf(num_hashes, shingle_n, seed)(F.col(text)))


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                        minhash_col: str = "minhash", bands: int = 16,
                        rows_per_band: int = 4,
                        max_bucket_size: int = 1000) -> DataFrame:
    """Band the signatures and emit candidate id pairs (a < b) that share
    at least one (band, band-signature) bucket."""
    band_exprs = []
    for bi in range(bands):
        # hash the band's longs directly (no array<string> cast — that
        # allocated rows x bands strings just to feed the hash); equal
        # slices hash equal either way, which is all banding needs
        elems = [F.element_at(F.col(minhash_col), bi * rows_per_band + j + 1)
                 for j in range(rows_per_band)]
        band_exprs.append(F.struct(F.lit(bi).alias("band"),
                                   F.xxhash64(*elems, F.lit(bi)).alias("sig")))
    exploded = (df.select(F.col(id_col).alias("id"),
                          F.explode(F.array(*band_exprs)).alias("b"))
                  .select("id", F.col("b.band").alias("band"),
                          F.col("b.sig").alias("sig")))
    # ONE shuffle: group ids per bucket, bound pathological buckets
    # (all-identical band) there, expand in-bucket pairs JVM-side.
    # The per-bucket pair expansion is O(bucket^2) but bucket size is
    # capped, so the blow-up is bounded by max_bucket_size^2 per bucket
    # — the standard web-scale LSH contract.  (Replaces the previous
    # count-window + self-join formulation: 3 shuffles -> 2.)
    buckets = (exploded.groupBy("band", "sig")
               .agg(F.collect_list("id").alias("ids"))
               .where((F.size("ids") > 1)
                      & (F.size("ids") <= max_bucket_size)))
    # upper triangle only, streamed: explode the anchor index first so
    # no row ever holds more than O(n) ids (the nested-transform form
    # materialized the full n^2 pair array in ONE row before filtering —
    # ~1M structs at the default cap, tens of MB per near-cap bucket).
    # array_sort orders ids ascending, so every id in the sliced tail
    # already satisfies id_a < id_b.
    arr = F.array_sort("ids")
    anchored = (buckets
                .select(arr.alias("arr"))
                .select("arr",
                        F.explode(F.sequence(
                            F.lit(0), F.size("arr") - 2)).alias("i"))
                .select(F.element_at("arr", F.col("i") + 1).alias("id_a"),
                        F.slice("arr", F.col("i") + 2,
                                F.size("arr")).alias("rest")))
    pairs = (anchored.select("id_a", F.explode("rest").alias("id_b"))
             .distinct())
    return pairs


def exact_jaccard(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text: str = "text", shingle_n: int = 3) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard (JVM array
    ops — no Python)."""
    toks = F.split(F.trim(F.col(text)), r"\s+")
    # only documents that appear in a candidate pair need shingles: at
    # corpus scale the pair set touches a small fraction of rows, so the
    # semi-join prunes the expensive shingle computation to that set
    wanted = (pairs.select(F.col("id_a").alias("__wid"))
              .unionByName(pairs.select(F.col("id_b").alias("__wid")))
              .distinct())
    # no broadcast hint: AQE picks broadcast when the pair set is small
    # and falls back to shuffle semi-join when it isn't (at 100 TB the
    # candidate id set can itself be large)
    pruned = df.join(wanted, df[id_col] == F.col("__wid"), "left_semi")
    # tokenize once per row, then shingle over the materialized array —
    # a lambda that re-splits per shingle would be O(tokens^2).
    # split(trim(''), '\\s+') yields [''] not [], and the shingle
    # sequence below always emits index 0 — without the empty-token
    # filter and the empty-doc guard, every pair of empty/whitespace
    # documents would score a phantom jaccard of 1.0 (the Python
    # shingle helper returns the empty set for them)
    toks = F.filter(toks, lambda x: x != F.lit(""))
    with_toks = pruned.select(F.col(id_col).alias("id"), toks.alias("toks"))
    sh = F.when(F.size(F.col("toks")) == 0,
                F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(F.transform(
            F.sequence(F.lit(0),
                       F.greatest(F.size(F.col("toks")) - F.lit(shingle_n),
                                  F.lit(0))),
            lambda i: F.array_join(F.slice(F.col("toks"), i + 1, shingle_n),
                                   " "))))
    docs = with_toks.select("id", sh.alias("sh"))
    a = docs.alias("a")
    b = docs.alias("b")
    return (pairs
            .join(a, pairs.id_a == F.col("a.id"))
            .join(b, pairs.id_b == F.col("b.id"))
            .select(
                "id_a", "id_b",
                # 0/0 (both shingle sets empty) throws under ANSI and
                # is NULL under try_divide; the Python shingle helper
                # defines it as 0.0
                F.coalesce(
                    F.try_divide(
                        F.size(F.array_intersect("a.sh", "b.sh"))
                        .cast("double"),
                        F.size(F.array_union("a.sh", "b.sh"))),
                    F.lit(0.0)).alias("jaccard")))


def shared_shingle_pairs(df: DataFrame, id_col: str = "doc_id",
                         text: str = "text",
                         shingle_n: int = 3) -> DataFrame:
    """Candidate pairs via an inverted shingle index: explode each
    document's distinct shingles, equi-join on the shingle, keep
    distinct ``id_a < id_b`` pairs.  LOSSLESS for any Jaccard
    threshold > 0 (a pair with a single common shingle still blocks
    together), unlike MinHash banding which trades recall for cost —
    use this as the deterministic, oracle-replayable blocker for
    small/medium corpora and as the recall-1.0 baseline that gates
    :func:`minhash_dedup_pairs`.

    Scale story: one explode + one self-equi-join on the shingle key
    — both plain shuffles.  Cost is sum(df_s^2) over shingle document
    frequencies, so a heavy-tailed shingle distribution (stop-phrases)
    makes this superlinear; at corpus scale that is exactly the regime
    where :func:`minhash_dedup_pairs` takes over (banding keys are
    uniform by construction).  Empty/whitespace documents produce no
    shingles and therefore never pair (matching ``exact_jaccard``'s
    empty-set semantics)."""
    # tokenize once per row into a projected column: the split as a
    # free variable inside the shingle lambda would re-run per shingle
    # (O(tokens²) — same trap exact_jaccard already guards against)
    toks = F.col("__sh_tk")
    sh = F.when(F.size(toks) == 0, F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(F.transform(
            F.sequence(F.lit(0),
                       F.greatest(F.size(toks) - F.lit(shingle_n),
                                  F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, shingle_n), " "))))
    ex = (df.select(F.col(id_col).alias("id"),
                    F.filter(F.split(F.trim(F.col(text)), r"\s+"),
                             lambda x: x != F.lit("")).alias("__sh_tk"))
          .select("id", F.explode(sh).alias("g")))
    a, b = ex.alias("a"), ex.alias("b")
    return (a.join(b, "g")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())


def minhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id",
                        text: str = "text", threshold: float = 0.7,
                        num_hashes: int = 64, bands: int = 16,
                        shingle_n: int = 3, seed: int = 1) -> DataFrame:
    """End-to-end near-dup pairs: minhash -> LSH banding -> exact-Jaccard
    verification >= threshold."""
    rows_per_band = num_hashes // bands
    sigs = with_minhash(df.select(id_col, text), text, num_hashes,
                        shingle_n, seed)
    cands = lsh_candidate_pairs(sigs, id_col, "minhash", bands, rows_per_band)
    # the verify stage consumes the candidate set three times (the
    # pruning semi-join + both sides of the pair join); without a
    # materialization point Catalyst re-plans the whole
    # minhash-UDF -> banding -> groupBy subtree per consumer (measured
    # 3x Python eval nodes, zero reused exchanges).  Candidates are
    # tiny relative to the corpus — persisting them is also what a
    # 100 TB run would do (write the candidate table once, verify
    # against it).
    cands = cands.persist()
    verified = exact_jaccard(df, cands, id_col, text, shingle_n)
    return _track_intermediates(
        verified.where(F.col("jaccard") >= threshold), cands)


# ---------------------------------------------------------------------------
# simhash

def make_simhash_udf(bits: int = 64):
    """pandas UDF text -> long: token-count-weighted sign aggregation of
    per-token hashes.  Tokens hashed with the Aloha murmur kernel; the
    64-bit token hash is (h(tok), h(tok + chr(1))) concatenated."""

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        docs = [t.split() if isinstance(t, str) and t else [] for t in texts]
        lens = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
        flat = [tok for d in docs for tok in d]
        if not flat:
            return pd.Series(out)
        # hash + bit-expand only the UNIQUE tokens (vocab-sized), then
        # gather per occurrence; unpackbits replaces the 64-wide shift
        # matrix (measured ~15x on the kernel)
        from ..functions.batch import factorize_strings
        codes, uniq = factorize_strings(np.array(flat, dtype=object))
        uniq_list = list(uniq)
        lo = string_hash_array(uniq_list).astype(np.int64) & 0xFFFFFFFF
        hi = string_hash_array([t + "\x01" for t in uniq_list]) \
            .astype(np.int64) & 0xFFFFFFFF
        h64_u = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        bits_u = np.unpackbits(
            h64_u.view(np.uint8).reshape(-1, 8), axis=1,
            bitorder="little")[:, :bits].astype(np.int32)
        contrib_u = bits_u * 2 - 1  # 0 -> -1, 1 -> +1  (U, bits)
        contrib = contrib_u[codes]                       # (N, bits) gather
        offs = np.concatenate(([0], np.cumsum(lens)))
        nonempty = lens > 0
        starts_ne = offs[:-1][nonempty]
        votes_ne = np.add.reduceat(contrib, starts_ne, axis=0)
        pos = votes_ne > 0                       # (n_nonempty, bits)
        weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64))
        vals = (pos.astype(np.uint64) * weights[None, :]).sum(axis=1)
        vals = vals.view(np.int64)  # bit-preserving (bit 63 may be set)
        for j, i in enumerate(np.nonzero(nonempty)[0]):
            out[i] = vals[j]
        return pd.Series(out)

    return simhash


def with_simhash(df: DataFrame, text: str = "text",
                 out_col: str = "simhash") -> DataFrame:
    return _spread(df).withColumn(out_col, make_simhash_udf()(F.col(text)))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       simhash_col: str = "simhash",
                       max_hamming: int = 3,
                       max_bucket_size: int = 1000) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming using
    4-block banding (Charikar-style): two docs within Hamming 3 of a
    64-bit hash share at least one identical 16-bit block.

    Skew contract: bucket sizes are counted FIRST (so no task ever
    collects a pathological bucket into one array).  Buckets up to
    ``max_bucket_size`` expand all O(n^2) in-bucket pairs; oversized
    buckets (a degenerate common block — e.g. many near-empty docs
    hashing to 0) degrade to STAR pairing against the min-id anchor —
    O(n) pairs that keep duplicate-cluster connectivity (an exact
    duplicate still pairs with its anchor at Hamming 0) instead of
    silently dropping the bucket."""
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col(simhash_col), 16 * i)
             .bitwiseAND(F.lit(0xFFFF)).alias("blk"))
        for i in range(4)
    ])
    # persisted: consumed by the sizes agg, the ex2 join probe, and
    # (through ex2) the small/big branches and anchors — without a
    # materialization point every consumer re-evaluates the upstream
    # simhash pandas-UDF subtree over the full corpus (the same measured
    # failure mode minhash_dedup_pairs fixes by persisting candidates)
    exploded = (df.select(F.col(id_col).alias("id"),
                          F.col(simhash_col).alias("sh"),
                          F.explode(bands).alias("b"))
                  .select("id", "sh", F.col("b.band").alias("band"),
                          F.col("b.blk").alias("blk"))
                  .persist())
    sizes = exploded.groupBy("band", "blk").agg(F.count("*").alias("n"))
    ex2 = exploded.join(sizes, ["band", "blk"])

    small = ex2.where((F.col("n") > 1) & (F.col("n") <= max_bucket_size))
    buckets = (small.groupBy("band", "blk")
               .agg(F.collect_list(F.struct("id", "sh")).alias("ms")))
    # upper triangle only, streamed: explode the anchor index first so no
    # row ever holds more than O(n) structs (the old nested-transform
    # form materialized the full n^2 pair array in a single row before
    # filtering).  array_sort orders by id, so every pair in the sliced
    # tail already satisfies id_a < id_b — no filter needed.
    arr = F.array_sort("ms")
    anchored = (buckets
                .select(arr.alias("arr"))
                .select("arr",
                        F.explode(F.sequence(
                            F.lit(0), F.size("arr") - 2)).alias("i"))
                .select(F.element_at("arr", F.col("i") + 1).alias("x"),
                        F.slice("arr", F.col("i") + 2,
                                F.size("arr")).alias("rest")))
    pairs_small = (anchored
                   .select("x", F.explode("rest").alias("y"))
                   .select(F.col("x.id").alias("id_a"),
                           F.col("y.id").alias("id_b"),
                           F.col("x.sh").alias("sh_a"),
                           F.col("y.sh").alias("sh_b")))

    big = ex2.where(F.col("n") > max_bucket_size)
    anchors = big.groupBy("band", "blk").agg(
        F.min_by(F.struct("id", "sh"), "id").alias("a"))
    pairs_big = (big.join(anchors, ["band", "blk"])
                 .where(F.col("id") != F.col("a.id"))
                 .select(F.col("a.id").alias("id_a"),
                         F.col("id").alias("id_b"),
                         F.col("a.sh").alias("sh_a"),
                         F.col("sh").alias("sh_b")))

    pairs = pairs_small.unionByName(pairs_big) \
        .dropDuplicates(["id_a", "id_b"])
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return _track_intermediates(
        (pairs.withColumn("hamming", hamming)
              .where(F.col("hamming") <= max_hamming)
              .select("id_a", "id_b", "hamming")),
        exploded)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95,
                            planes: int = 12, seed: int = 5,
                            probe_hamming: int = 1,
                            n_tables: int = 1) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold.

    Scale path: random-hyperplane LSH code per vector (numpy matmul in
    a pandas UDF), candidates = pairs sharing a code within Hamming <=
    probe_hamming in ANY of ``n_tables`` independent tables (the
    standard recall amplification: miss probability decays as
    ``(1-p^planes)^n_tables``), verified with exact cosine.  The verify
    is an Arrow-vectorized dot product over UNIT vectors: each vector
    is L2-normalized exactly once (in the same UDF pass that codes it),
    so the per-pair work is a 1-row einsum term instead of a
    dot+2-norms higher-order-function chain — the candidate set is the
    quadratic object here, so per-pair cost is what dominates at every
    scale.  Candidate volume grows linearly in n_tables; the equi-join
    key (table, code) keeps every table's buckets disjoint in one
    shuffle."""
    # NULL embeddings carry no content: they can never pair, so drop
    # them up front — this also makes the dim probe robust (the probe
    # previously read the FIRST row, crashing on an empty corpus or a
    # leading NULL vector)
    df = df.where(F.col(vec_col).isNotNull())
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None or dim_row["d"] is None:
        # empty (or all-NULL) corpus: no pairs, correctly typed
        return (df.select(F.col(id_col).alias("id_a"),
                          F.col(id_col).alias("id_b"),
                          F.lit(0.0).alias("cosine"))
                  .limit(0))
    dim = int(dim_row["d"])
    rng = np.random.default_rng(seed)
    mats = rng.standard_normal((n_tables, dim, planes)).astype(np.float64)

    @pandas_udf("struct<codes:array<int>,vn:array<double>>")
    def code_norm_udf(vecs: pd.Series) -> pd.DataFrame:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if m.size == 0:
            return pd.DataFrame({"codes": [], "vn": []})
        weights = (np.int64(1) << np.arange(planes, dtype=np.int64))
        out = np.empty((len(m), n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (m @ mats[t]) > 0
            out[:, t] = bits.astype(np.int64) @ weights
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        # zero vectors stay zero: their cosine with anything is NaN in
        # the exact formula; dot(0-vector) = 0 < any threshold > 0,
        # preserving the drop
        vn = m / np.where(nrm > 0.0, nrm, 1.0)
        return pd.DataFrame({"codes": list(out.astype(np.int32)),
                             "vn": list(vn)})

    # persisted: consumed by the (table, code) join AND twice more to
    # re-attach unit vectors after candidate dedup — without a
    # materialization point the coding UDF would re-run per consumer
    coded = (df.select(F.col(id_col).alias("id"),
                       code_norm_udf(F.col(vec_col)).alias("cn"))
               .select("id", F.col("cn.codes").alias("codes"),
                       F.col("cn.vn").alias("vn"))
               .persist())
    # one row per (vector, table): the join key is (table, code).
    # Ids only — the n_tables x (1 + planes) probe explosion must not
    # replicate the embedding vectors through the shuffle (at dim=64
    # that is ~30x more bytes than the int keys); vectors are attached
    # AFTER the candidate pairs are deduped, from the persisted coded
    # table.
    tbl = coded.select("id", F.posexplode("codes").alias("tbl", "code"))
    # multi-probe: also join on every code within Hamming distance
    # <= probe_hamming (all k-bit flips for k = 1..probe_hamming; probe
    # count is sum C(planes, k) — linear in planes at the default 1,
    # quadratic at 2 — and the explode replicates int keys only, never
    # the vectors)
    probes = [F.col("code")] + [
        F.col("code").bitwiseXOR(F.lit(m))
        for m in _hamming_ball_masks(planes, probe_hamming)]
    exploded = tbl.select(
        "id", "tbl",
        F.explode(F.array(*[p.alias("p") for p in probes])).alias("probe"))
    l = tbl.alias("l")
    r = exploded.alias("r")
    cand_ids = (l.join(r, (F.col("l.tbl") == F.col("r.tbl"))
                       & (F.col("l.code") == F.col("r.probe")))
                .where(F.col("l.id") < F.col("r.id"))
                .select(F.col("l.id").alias("id_a"),
                        F.col("r.id").alias("id_b"))
                .dropDuplicates(["id_a", "id_b"]))
    cands = (cand_ids
             .join(coded.select(F.col("id").alias("id_a"),
                                F.col("vn").alias("va")), "id_a")
             .join(coded.select(F.col("id").alias("id_b"),
                                F.col("vn").alias("vb")), "id_b"))

    @pandas_udf("double")
    def unit_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=float)
        A = np.asarray([np.asarray(x, dtype=np.float64) for x in a])
        B = np.asarray([np.asarray(x, dtype=np.float64) for x in b])
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return _track_intermediates(
        cands.withColumn("cosine", unit_dot(F.col("va"), F.col("vb")))
             .where(F.col("cosine") >= threshold)
             .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")),
        coded)


# ---------------------------------------------------------------------------
# near-dup clustering: pairs -> connected components -> canonical doc

def connected_components(pairs: DataFrame, nodes: Optional[DataFrame] = None,
                         id_a: str = "id_a", id_b: str = "id_b",
                         max_iterations: int = 20,
                         algorithm: str = "star") -> DataFrame:
    """Connected components over an undirected pair list: returns
    ``(id, component)`` where component = the minimum id reachable from
    the node (so each cluster is labeled by its canonical member, and
    ``id == component`` marks the document to KEEP in a dedup pass).

    ``algorithm="star"`` (default): alternating large-star/small-star
    (the MapReduce CC formulation of Kiveris et al., "Connected
    Components in MapReduce and Beyond") — per round two window-min
    passes over the edge set, converging in O(log n) rounds regardless
    of cluster diameter.  This is the 100 TB default: boilerplate
    dup-chains at corpus scale routinely exceed 20 hops, which the
    propagation loop below refuses (by design — see the raise).

    ``algorithm="label"``: min-label propagation — per iteration ONE
    join (edges x labels) + ONE groupBy-min.  Converges in O(cluster
    diameter) iterations; cheaper per round on shallow dup-family
    graphs, kept as the reference implementation and for graphs known
    to be star-shaped already.

    Both run only over the PAIR set, which for near-dup dedup is orders
    of magnitude smaller than the corpus, with a per-round convergence
    check (a count, not a collect of rows) and a loud RuntimeError if
    ``max_iterations`` is hit — returning moving labels would silently
    KEEP duplicate documents.

    ``nodes`` (optional, single ``id`` column): isolated documents to
    carry through with ``component = id`` (pairs alone cannot mention
    them).

    The returned frame is PERSISTED (the loop materialized it; dropping
    the cache would make any later consumer replay the whole iteration
    chain).  ``unpersist()`` it once consumed — or consume it through
    :func:`dedup_keep_canonical`, which transfers the cache to the
    result's auto-release tracking.
    """
    if algorithm not in ("star", "label"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    # both orientations in ONE scan of the pair subtree (a union of two
    # selects would evaluate the — possibly expensive — candidate/verify
    # lineage twice before the persist below caches anything)
    edges = (pairs.select(F.explode(F.array(
                 F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                 F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
             )).alias("e"))
             .select("e.src", "e.dst")
             .where(F.col("src") != F.col("dst"))
             .distinct())
    members = edges.select(F.col("src").alias("id")).distinct()
    if nodes is not None:
        members = members.unionByName(
            nodes.selectExpr(f"{nodes.columns[0]} as id")).distinct()
    if algorithm == "star":
        return _cc_star(edges, members, max_iterations)
    return _cc_label(edges, members, max_iterations)


def _cc_fail(max_iterations: int, algorithm: str) -> RuntimeError:
    return RuntimeError(
        "connected_components did not converge within "
        f"{max_iterations} iterations ({algorithm}) — raise "
        "max_iterations (cost is a bounded number of edge-set shuffles "
        "per extra iteration)")


def _cc_label(edges: DataFrame, members: DataFrame,
              max_iterations: int) -> DataFrame:
    # iterated frames are localCheckpoint(eager=True)-ed, NOT persist()ed:
    # the new labels reference the old ones TWICE (union + join), so
    # without lineage truncation the logical plan doubles per round and
    # a long chain OOMs the driver building plan trees before the loop
    # even hits its iteration cap.  Checkpointed RDDs are reclaimed by
    # Spark's ContextCleaner once the loop drops its references.
    labels = (members.withColumn("component", F.col("id"))
              .localCheckpoint(eager=True))
    edges = edges.persist()
    try:
        changed = 1
        for _ in range(max_iterations):
            # neighbor labels: for every edge (src,dst) the dst node
            # hears src's current label; keep the min over self + heard
            heard = (edges.join(labels.withColumnRenamed("id", "src"),
                                "src")
                     .select(F.col("dst").alias("id"), "component"))
            new_labels = (labels.select("id", "component")
                          .unionByName(heard)
                          .groupBy("id")
                          .agg(F.min("component").alias("component"))
                          .localCheckpoint(eager=True))
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "id")
                       .where(F.col("n.component") != F.col("o.component"))
                       .limit(1).count())
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            raise _cc_fail(max_iterations, "label")
        return labels
    finally:
        edges.unpersist(blocking=False)


def _cc_star(edges: DataFrame, members: DataFrame,
             max_iterations: int) -> DataFrame:
    """Alternating large-star / small-star over a canonical (big, small)
    edge list.  Each operator is ONE window-min shuffle over the edges;
    at the fixpoint the edge set is a union of stars (node -> component
    minimum), from which labels read off directly.

    large-star: every node connects its LARGER neighbors to the minimum
    of its neighborhood (self included) — halves long chains.
    small-star: every node connects its smaller-or-equal neighborhood
    to its minimum — flattens local stars.  Alternating the two
    converges in O(log n) rounds (Kiveris et al.), each round a fixed
    number of edge-set shuffles, so a 10^6-hop dup chain costs ~20
    rounds instead of 10^6 label-propagation iterations.
    """
    from pyspark.sql import Window

    def large_star(e: DataFrame) -> DataFrame:
        # bidirectional view: for node src, m = min(src, min over dst)
        bidir = e.select(F.explode(F.array(
            F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))
        )).alias("x")).select("x.src", "x.dst")
        m = F.least(F.col("src"), F.min("dst").over(Window.partitionBy("src")))
        return (bidir.withColumn("m", m)
                .where(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("a"), F.col("m").alias("b"))
                .where(F.col("a") != F.col("b"))
                .distinct())

    def small_star(e: DataFrame) -> DataFrame:
        # canonical (a=big, b=small); m = min of a's smaller neighborhood
        m = F.min("b").over(Window.partitionBy("a"))
        withm = e.withColumn("m", m)
        out = withm.select(F.explode(F.array(
            F.struct(F.col("a").alias("u"), F.col("m").alias("v")),
            F.struct(F.col("b").alias("u"), F.col("m").alias("v"))
        )).alias("x")).select(F.col("x.u").alias("a"),
                              F.col("x.v").alias("b"))
        return out.where(F.col("a") != F.col("b")).distinct()

    # canonicalize: a = greatest, b = least (src != dst already filtered).
    # Iterated frames are lineage-truncated via localCheckpoint (see
    # _cc_label): each round's plan references the previous round's
    # frame several times (star op + both fixpoint subtracts), so an
    # un-truncated plan tree grows multiplicatively with rounds.
    cur = (edges.select(F.greatest("src", "dst").alias("a"),
                        F.least("src", "dst").alias("b"))
           .distinct().localCheckpoint(eager=True))

    def same_set(x: DataFrame, y: DataFrame) -> bool:
        # set equality via both subtract directions, each an edge-set-
        # sized job with limit(1) short-circuit
        return (x.subtract(y).limit(1).count() == 0
                and y.subtract(x).limit(1).count() == 0)

    converged = False
    for _ in range(max_iterations):
        ls = large_star(cur).localCheckpoint(eager=True)
        nxt = small_star(ls).localCheckpoint(eager=True)
        # the paper's termination condition: BOTH operators at a
        # fixpoint (which provably implies the edge set is a union
        # of stars) — a fixpoint of the composition alone would not
        # guarantee star shape
        same = same_set(ls, cur) and same_set(nxt, ls)
        cur = nxt
        if same:
            converged = True
            break
    if not converged:
        raise _cc_fail(max_iterations, "star")
    # at the fixpoint every edge is (node, component-min); roots and
    # isolated members label themselves.  The groupBy-min is a
    # safety net (a node listed with two roots would violate the
    # fixpoint) and deduplicates the union.
    labels = (cur.select(F.col("a").alias("id"),
                         F.col("b").alias("component"))
              .unionByName(members.withColumn("component", F.col("id")))
              .groupBy("id")
              .agg(F.min("component").alias("component"))
              .persist())
    labels.count()          # materialize; the loop's checkpoint caches
    return labels           # are reclaimed by the ContextCleaner


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Drop every document that belongs to a near-dup cluster except the
    cluster's minimum-id member — the standard keep-one policy over the
    pair output of :func:`minhash_dedup_pairs` (or any pair source).
    Documents in no pair are kept as-is (left anti join on the evicted
    set; the components frame only spans pair members, so the corpus
    never shuffles on the cluster label)."""
    comp = connected_components(pairs)
    evict = comp.where(F.col("id") != F.col("component")) \
                .select(F.col("id").alias(id_col))
    out = df.join(evict, id_col, "left_anti")
    # comp is persisted (see connected_components): hand its cache to
    # the result's lifetime so a long-lived session doesn't accumulate
    # one label cache per dedup pass
    return _track_intermediates(out, comp)
