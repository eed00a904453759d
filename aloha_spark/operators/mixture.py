"""Corpus mixing and training-order operators: the last mile between a
curated corpus and the exact row stream a training run consumes.

Four concerns the curation stages (dedup / filter / split) deliberately
leave open, each implemented as a pure deterministic function of row
content so membership and order are reproducible across runs,
partitionings, and engines:

* ``token_budget_sample`` — "give me exactly 100B tokens of src0, 40B of
  src1" — per-stratum sampling to an exact TOKEN budget (not a row
  fraction: web documents vary 1000x in length, so row-fraction sampling
  misses token targets badly).
* ``epoch_mix`` — repetition factors / fractional epochs ("2.4 epochs of
  Wikipedia, 0.7 of CommonCrawl"): the upsampling counterpart of
  ``temperature_sample``'s downsampling (whose docstring defers exactly
  this concern here).
* ``with_shuffle_order`` / ``shuffle_shards`` — deterministic global
  shuffle into ordered training shards: a seeded content-hash total
  order, so the training row stream is reproducible bit-for-bit given
  (corpus, seed) and re-shuffling is a metadata-only re-sort, never a
  recompute of the pipeline.
* ``corpus_report`` — the data-card aggregate: per-source doc/token
  counts, exact-duplicate fraction, dominant language.

Spark-first design notes (the 100 TB story):
* ``token_budget_sample`` NEVER runs a per-stratum global window (a
  window partitioned by a 20-value source column would funnel billions
  of rows through 20 reducers).  It reuses the coarse-bucket trick:
  per-(stratum, md5-bucket) token sums partially aggregate map-side to
  a <= S x 10k-row relation, the budget boundary is located on that
  relation, and only the ONE boundary bucket per stratum (~1/10000 of
  the stratum) takes a fine-grained window.  Everything else is a
  broadcast-joined map-only filter.
* ``epoch_mix`` is a zero-shuffle map-side explode: copy counts are a
  CASE expression over stratum literals, the fractional copy is the
  same md5-bucket filter every sampler here uses.
* shuffle order is ``md5(seed || id)``: shard membership AND within-
  shard order both derive from it, so one column drives the exchange,
  the sort, and the audit SQL.  ``shuffle_shards`` hash-partitions on
  the shard id and sorts within partitions — exactly one exchange,
  which doubles as the write layout (each shard lands contiguous and
  internally ordered).
* ``corpus_report`` is two partial-aggregated groupBys on a low-
  cardinality stratum column; the exact-distinct count runs on a
  16-byte digest, not the text.

Reference parity note: the reference engine (eHarmony/aloha) stops at
per-row feature emission (``aloha-core``'s RowCreator contract,
``CsvRowCreator.scala``); corpus-level mixing/ordering has no reference
analog and follows the published pretraining-pipeline recipes instead
(GPT-3 appendix A sampling weights; epoch/repetition factors per
Muennighoff et al. 2023, arXiv:2305.16264).
"""

from __future__ import annotations

import math
from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .corpus import N_BUCKETS, hash_bucket
from .textstats import tokens_col


def _case_over_strata(strata_col: str, literal_by_stratum: Mapping[str, int],
                      default: int) -> Column:
    """CASE chain mapping each stratum literal to an int — keeps the
    tiny per-stratum config in the PLAN (constant-folded, no join)."""
    expr = None
    for k, v in literal_by_stratum.items():
        cond = F.col(strata_col) == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None \
            else expr.when(cond, F.lit(v))
    dflt = F.lit(int(default))
    return dflt if expr is None else expr.otherwise(dflt)


def token_budget_sample(df: DataFrame,
                        budgets: Mapping[str, int], *,
                        strata_col: str = "source",
                        id_col: str = "doc_id",
                        tokens_col_name: Optional[str] = None,
                        text: str = "text",
                        default_budget: int = 0,
                        salt: str = "budget",
                        broadcast_verdicts: bool = True) -> DataFrame:
    """Deterministic per-stratum sampling to an exact TOKEN budget.

    Contract (engine-portable, replayed verbatim by the oracle SQL): a
    row is kept iff the total token count of same-stratum rows ordered
    strictly before it by ``(hash_bucket(id, salt), id)`` is < the
    stratum's budget.  The kept set is therefore the minimal prefix of
    the stratum's deterministic priority order whose token sum reaches
    the budget (overshooting by at most one document), or the whole
    stratum when it holds fewer tokens than the budget.  Growing the
    corpus never evicts a kept row's priority position ahead of it
    except by genuinely higher-priority new rows — the same
    content-hash stability property as ``stratified_sample``.

    Token counts come from ``tokens_col_name`` if given (e.g. a
    precomputed BPE count), else whitespace tokens of ``text``.
    Strata missing from ``budgets`` get ``default_budget`` (0 = drop,
    matching ``stratified_sample``'s default-off posture).  NULL id
    rows are dropped (no stable priority); NULL stratum uses
    ``default_budget``.

    Scale: the naive implementation is one window over each stratum —
    a guaranteed hot reducer at corpus scale.  Instead:

    1. ONE scan partially aggregates (stratum, bucket) -> (token sum,
       min tokens): <= S x N_BUCKETS rows cross the wire.
    2. Bucket-level running totals over that tiny relation classify
       every bucket KEEP / DROP / BOUNDARY.  A bucket is wholly kept
       only when even its worst-placed row (which excludes its own
       tokens, hence the min-token term guarding 0-token rows at an
       exact boundary) stays under budget.
    3. The verdicts broadcast-join back: KEEP/DROP rows are a map-only
       filter; only BOUNDARY-bucket rows (~1/N_BUCKETS of each
       stratum) take a fine window, partitioned by (stratum, bucket)
       so no reducer sees more than a bucket.

    The verdict relation is <= n_strata x N_BUCKETS rows; the default
    broadcast is right for the usual tens-of-sources mixture.  With
    thousands of strata pass ``broadcast_verdicts=False`` and let AQE
    pick the join strategy instead of forcing a driver-side build.
    """
    budgets = {k: int(v) for k, v in dict(budgets or {}).items()}
    for k, v in list(budgets.items()) + [("default", int(default_budget))]:
        if v < 0:
            raise ValueError(f"budget for {k!r} must be >= 0: {v}")
    # NULL token counts (NULL text) contribute 0 — made explicit here
    # so the coarse classifier's min-token boundary guard sees the 0
    # instead of min() skipping the NULL (a NULL-token row at an exact
    # budget boundary must drop, same as a 0-token row)
    tok = F.coalesce((F.col(tokens_col_name) if tokens_col_name
                      else F.size(tokens_col(text))).cast("long"),
                     F.lit(0))
    budget = _case_over_strata(strata_col, budgets, int(default_budget))
    d = (df.where(F.col(id_col).isNotNull())
           .withColumn("_tok", tok)
           .withColumn("_b", hash_bucket(F.col(id_col), salt=salt)))

    # (1) coarse relation: <= S x N_BUCKETS rows after map-side combine
    coarse = d.groupBy(strata_col, "_b").agg(
        F.sum("_tok").alias("_bsum"), F.min("_tok").alias("_bmin"))
    w = Window.partitionBy(strata_col).orderBy("_b") \
              .rowsBetween(Window.unboundedPreceding, -1)
    coarse = coarse.withColumn(
        "_cum0", F.coalesce(F.sum("_bsum").over(w), F.lit(0)))
    # (2) verdicts; _budget is re-derived from the same CASE literals
    end = F.col("_cum0") + F.col("_bsum")
    coarse = coarse.withColumn("_budget", budget).withColumn(
        "_verdict",
        F.when(F.col("_cum0") >= F.col("_budget"), F.lit("drop"))
         .when((end < F.col("_budget"))
               | ((end == F.col("_budget")) & (F.col("_bmin") > 0)),
               F.lit("keep"))
         .otherwise(F.lit("boundary")))
    verdicts = coarse.select(
        F.col(strata_col).alias("_vs"), F.col("_b").alias("_vb"),
        "_cum0", "_verdict", "_budget")
    if broadcast_verdicts:
        verdicts = F.broadcast(verdicts)

    j = d.join(verdicts,
               F.col(strata_col).eqNullSafe(F.col("_vs"))
               & (F.col("_b") == F.col("_vb")), "inner")
    kept_whole = j.where(F.col("_verdict") == "keep")
    # (3) fine pass over boundary buckets only: each (stratum, bucket)
    # partition holds ~stratum_size/N_BUCKETS rows — no hot reducer
    wf = Window.partitionBy(strata_col, "_b").orderBy(id_col) \
               .rowsBetween(Window.unboundedPreceding, -1)
    boundary = (j.where(F.col("_verdict") == "boundary")
                 .withColumn("_cumin",
                             F.coalesce(F.sum("_tok").over(wf), F.lit(0)))
                 .where(F.col("_cum0") + F.col("_cumin")
                        < F.col("_budget"))
                 .drop("_cumin"))
    helper = ["_tok", "_b", "_vs", "_vb", "_cum0", "_verdict", "_budget"]
    return kept_whole.unionByName(boundary).drop(*helper)


def epoch_mix(df: DataFrame,
              epochs: Mapping[str, float], *,
              strata_col: str = "source",
              id_col: str = "doc_id",
              default_epochs: float = 1.0,
              copy_col: str = "copy_idx",
              salt: str = "epoch") -> DataFrame:
    """Repetition factors / fractional epochs per stratum.

    Each row is emitted ``floor(e)`` times unconditionally plus one more
    time iff its md5-bucket clears ``frac(e)`` — so a stratum at
    ``e=2.4`` contributes every document twice and a deterministic 40%
    of documents a third time, the standard way published pretraining
    mixes realize fractional epoch counts (e.g. 3.4 epochs of Wikipedia
    in GPT-3 appendix A).  Output rows carry ``copy_col`` in
    ``[0, n_copies)``; ``e=0`` drops the stratum, ``e=1`` is the
    identity (plus the copy column).  The fractional-copy membership is
    the same pure content-hash filter as ``stratified_sample`` —
    reproducible row-for-row, auditable in one line of SQL.

    Scale: zero shuffle.  Copy counts are a constant-folded CASE over
    stratum literals; the explode is map-side; downstream consumers see
    (id, copy_idx) as the new row identity (e.g. feed
    ``with_shuffle_order`` ``id || ':' || copy_idx`` so repeated copies
    land in different shards).
    """
    epochs = {k: float(v) for k, v in dict(epochs or {}).items()}
    for k, v in list(epochs.items()) + [("default", float(default_epochs))]:
        if not (v >= 0.0 and math.isfinite(v)):
            raise ValueError(f"epochs for {k!r} must be finite >= 0: {v}")

    def _full(e: float) -> int:
        return int(math.floor(e))

    def _thr(e: float) -> int:
        # +1e-9 absorbs float representation noise (0.7*10000 ->
        # 6999.999...), same epsilon convention as temperature_sample
        return int(math.floor((e - math.floor(e)) * N_BUCKETS + 1e-9))

    full = _case_over_strata(
        strata_col, {k: _full(v) for k, v in epochs.items()},
        _full(default_epochs))
    thr = _case_over_strata(
        strata_col, {k: _thr(v) for k, v in epochs.items()},
        _thr(default_epochs))
    b = hash_bucket(F.col(id_col), salt=salt)
    n = (full + F.when(b < thr, F.lit(1)).otherwise(F.lit(0))) \
        .alias("_n_copies")
    return (df.where(F.col(id_col).isNotNull())
              .withColumn("_n_copies", n)
              .where(F.col("_n_copies") > 0)
              .withColumn(copy_col,
                          F.explode(F.sequence(
                              F.lit(0), F.col("_n_copies") - 1)))
              .drop("_n_copies"))


def with_shuffle_order(df: DataFrame, *,
                       n_shards: int,
                       seed: int = 0,
                       id_col: str = "doc_id",
                       shard_col: str = "shard",
                       key_col: str = "shuffle_key") -> DataFrame:
    """Seeded deterministic global shuffle order: shard + sort key.

    ``shuffle_key = md5('shuffle<seed>:' || id)`` and
    ``shard = int(key[:15]) % n_shards`` — one hash drives both shard
    membership and within-shard order, so the full training stream
    order is "shards in numeric order, rows by (key, id) within" and is
    a pure function of (corpus, seed): bit-reproducible across runs and
    engines, and changing the seed re-orders WITHOUT recomputing any
    upstream stage (the key is a projection).  Ties on the 128-bit key
    are broken by id, so order is total even under md5 collisions.

    NULL ids are dropped (no stable position in a deterministic order).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    prefix = f"shuffle{int(seed)}:"
    key = F.md5(F.concat(F.lit(prefix), F.col(id_col).cast("string")))
    return (df.where(F.col(id_col).isNotNull())
              .withColumn(key_col, key)
              .withColumn(shard_col,
                          F.conv(F.substring(F.col(key_col), 1, 15), 16, 10)
                          .cast("long") % n_shards))


def shuffle_shards(df: DataFrame, *,
                   n_shards: int,
                   seed: int = 0,
                   id_col: str = "doc_id",
                   shard_col: str = "shard",
                   key_col: str = "shuffle_key") -> DataFrame:
    """Materialize the shuffle order physically: ONE exchange hash-
    partitioned on the shard id, rows sorted by (shard, key, id) within
    partitions.  Written out with ``partitionBy(shard)`` each shard
    directory holds exactly one internally-ordered file chain, so a
    data loader reading shards in order replays the deterministic
    global shuffle with zero further sorting.  Choose ``n_shards`` to
    size shards (corpus_rows / n_shards per shard); the exchange doubles
    as the write layout, so shuffling costs nothing beyond the write's
    own repartition.
    """
    x = with_shuffle_order(df, n_shards=n_shards, seed=seed, id_col=id_col,
                           shard_col=shard_col, key_col=key_col)
    return (x.repartition(n_shards, F.col(shard_col))
             .sortWithinPartitions(shard_col, key_col, id_col))


def pps_sample(df: DataFrame, k: int, *,
               weight_col: Optional[str] = None,
               strata_col: str = "source",
               id_col: str = "doc_id",
               text: str = "text",
               salt: str = "pps",
               hits_col: str = "n_hits") -> DataFrame:
    """Systematic probability-proportional-to-size sampling: draw
    EXACTLY ``k`` grid points per stratum, each document hit in
    proportion to its weight — the classical survey-sampling design
    (systematic PPS over a randomized order), deterministic and
    integer-exact here.

    Contract (engine-portable): per stratum, order documents by
    ``(hash_bucket(id, salt), id)``; with integer weights ``w_i`` and
    total ``W``, document i is hit

        ``n_hits_i = floor(cum_i * k / W) - floor(cum_{i-1} * k / W)``

    times, where ``cum_i`` is the cumulative weight through document i.
    All arithmetic is exact integer (decimal-38 product + integral
    division), so membership replays bit-for-bit in any engine — no
    float keys whose last-ulp ordering could differ across libms (the
    reason this is systematic PPS rather than Efraimidis–Spirakis
    exponential keys).  Properties: ``sum(n_hits) == k`` exactly per
    stratum with ``W > 0``; a document with ``w_i <= W/k`` is selected
    with probability exactly ``k * w_i / W``; heavier documents can be
    hit multiple times (``n_hits > 1``) — the honest PPS semantics for
    e.g. token-weighted corpus subsampling, where ``n_hits`` becomes a
    repetition count.  NULL/non-positive weights and NULL ids are
    never selected; weights default to whitespace token counts.

    Scale: the per-document cumulative weight reuses the
    token_budget_sample decomposition — ONE partially-aggregated
    (stratum, bucket) scan gives exact bucket offsets via a window
    over the tiny coarse relation; each document's within-bucket
    cumsum is a window partitioned by (stratum, bucket), so no reducer
    ever sees more than ~1/N_BUCKETS of a stratum.  Everything after
    the offsets broadcast is map-side arithmetic.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    w_expr = (F.col(weight_col) if weight_col
              else F.size(tokens_col(text))).cast("long")
    d = (df.where(F.col(id_col).isNotNull())
           .withColumn("_w", F.greatest(F.lit(0),
                                        F.coalesce(w_expr, F.lit(0))))
           .withColumn("_b", hash_bucket(F.col(id_col), salt=salt)))

    coarse = d.groupBy(strata_col, "_b").agg(F.sum("_w").alias("_bsum"))
    w_off = Window.partitionBy(strata_col).orderBy("_b") \
                  .rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.partitionBy(strata_col)
    coarse = coarse \
        .withColumn("_off", F.coalesce(F.sum("_bsum").over(w_off),
                                       F.lit(0))) \
        .withColumn("_W", F.sum("_bsum").over(w_tot))
    offsets = F.broadcast(coarse.select(
        F.col(strata_col).alias("_os"), F.col("_b").alias("_ob"),
        "_off", "_W"))

    # within-bucket cumsum BEFORE the join (partitioned by (stratum,
    # bucket): ~1/N_BUCKETS of a stratum per reducer); the join then
    # only attaches the bucket offset + stratum total, map-side.
    # Explicit L/R aliases: offsets derives from d, and Spark 4's
    # self-join dedup otherwise reports every shared-lineage column as
    # AMBIGUOUS_REFERENCE.
    w_in = Window.partitionBy(strata_col, "_b").orderBy(id_col) \
                 .rowsBetween(Window.unboundedPreceding, 0)
    d = d.withColumn("_cumin", F.sum("_w").over(w_in))
    j = d.alias("L").join(
        offsets.alias("R"),
        F.col(f"L.{strata_col}").eqNullSafe(F.col("R._os"))
        & (F.col("L._b") == F.col("R._ob")), "inner")
    j = j.withColumn("_cum", F.col("R._off") + F.col("L._cumin"))
    # exact integral division on decimal(38,0): cum*k <= W*k — far
    # below 10^38 for any real corpus, and `div` truncates exactly
    # (no decimal-division rounding anywhere near the grid boundaries)
    dec = "decimal(38,0)"
    j = j.withColumn(
        hits_col,
        F.when(
            F.col("R._W") > 0,
            F.expr(f"(CAST(_cum AS {dec}) * CAST({int(k)} AS {dec})) "
                   f"div CAST(R.`_W` AS {dec})")
            - F.expr(f"(CAST(_cum - L.`_w` AS {dec}) "
                     f"* CAST({int(k)} AS {dec})) "
                     f"div CAST(R.`_W` AS {dec})"))
        .otherwise(F.lit(0)).cast("long"))
    return (j.where(F.col(hits_col) > 0)
             .select(*[F.col(f"L.{c}").alias(c) for c in df.columns],
                     F.col(hits_col)))


def exact_group_quantiles(df: DataFrame, value_col: str,
                          qs: Sequence[float], *,
                          by: str = "source",
                          weight_col: Optional[str] = None) -> DataFrame:
    """EXACT per-group quantiles without a global sort — and without
    ``percentile_approx``, whose answers are sketch-dependent and
    therefore unverifiable across engines (a data card should say the
    true p99, not an approximation of it).

    Contract (discrete / "lower" quantile, replayable anywhere): for a
    group of n values, quantile q is the ``max(1, ceil(q*n))``-th
    smallest value — q=0 is the minimum, q=1 the maximum, no
    interpolation (the answer is always a value that actually occurs).
    Output: one row per group with one ``q_<q>`` column per requested
    quantile (dots become underscores: q=0.5 -> ``q_0_5``).  NULL
    values are ignored; a group with only NULLs yields NULL quantiles.

    ``weight_col`` generalizes to WEIGHTED quantiles: with integer
    weights ``w_i`` and total ``W``, quantile q is the smallest value
    whose cumulative weight reaches ``max(1, ceil(q*W))`` — e.g.
    token-weighted document-length percentiles ("half the CORPUS
    TOKENS live in documents shorter than this"), which row-counted
    quantiles misstate badly on long-tailed web data.  NULL/negative
    weights count as 0; an all-zero-weight group yields NULL
    quantiles.

    Scale: the classic exact-quantile trap is a per-group global sort
    (or collect).  This runs on the DISTINCT-VALUE HISTOGRAM instead:
    one partially-aggregated groupBy on (group, value) — a billion
    repeated doc-lengths collapse map-side to one row — then a window
    over each group's distinct values (thousands, not billions) finds
    the ranked value per quantile.  Right-sized for the integer-ish
    distributions a corpus pipeline measures (token counts, scores,
    n-gram stats); for continuous high-cardinality values the
    histogram degenerates toward row count and a t-digest sketch is
    the honest tool — which is exactly when exactness stops being
    verifiable anyway.
    """
    qs = [float(q) for q in qs]
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile must be in [0, 1]: {q}")
    if not qs:
        raise ValueError("qs must be non-empty")

    wexpr = (F.lit(1) if weight_col is None
             else F.greatest(F.lit(0), F.coalesce(
                 F.col(weight_col).cast("long"), F.lit(0))))
    counts = (df.where(F.col(value_col).isNotNull())
                .groupBy(by, value_col)
                .agg(F.sum(wexpr).alias("_c")))
    w_cum = Window.partitionBy(by).orderBy(value_col) \
                  .rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(by)
    h = (counts.withColumn("_cum", F.sum("_c").over(w_cum))
               .withColumn("_n", F.sum("_c").over(w_all)))
    aggs = []
    for q in qs:
        name = "q_" + repr(q).replace(".", "_").replace("-", "m")
        rank = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n")))
        aggs.append(F.min(F.when(F.col("_cum") >= rank,
                                 F.col(value_col))).alias(name))
    out = h.groupBy(by).agg(*aggs)
    # groups whose every value is NULL vanish from `counts`; restore
    # them with NULL quantiles so the output covers every input group.
    # NULL-SAFE join: a NULL group name is still a group, and a plain
    # equality join would discard its computed quantiles
    all_groups = df.select(by).distinct().alias("G")
    return (all_groups.join(
                out.alias("O"),
                F.col(f"G.{by}").eqNullSafe(F.col(f"O.{by}")), "left")
            .drop(F.col(f"O.{by}")))


def corpus_report(df: DataFrame, *,
                  strata_col: str = "source",
                  text: str = "text",
                  lang_col: Optional[str] = None,
                  length_quantiles: Sequence[float] = ()) -> DataFrame:
    """Per-source data-card aggregate: the numbers a dataset release
    documents per subset.

    One row per stratum: ``n_docs``, ``total_tokens`` (whitespace),
    ``mean_tokens``, ``n_unique_texts`` (exact, via 16-byte digest),
    ``dup_frac`` (1 - unique/docs), and — when ``lang_col`` is given —
    ``top_lang`` + ``top_lang_frac`` (dominant language, ties broken by
    language string so the answer is deterministic).
    ``length_quantiles`` adds exact token-length quantile columns
    (``q_0_5`` etc.) via :func:`exact_group_quantiles` — the true
    p50/p99, not a sketch.

    All statistics are chosen to be exactly reproducible in any engine:
    integer sums/counts and their ratios (no approximate percentiles,
    no order-dependent float accumulation), so the report itself can be
    oracle-verified — a data card whose numbers can't be replayed
    elsewhere is an assertion, not a report.

    Scale: two partial-aggregated groupBys on the low-cardinality
    stratum (the distinct-count runs on (stratum, digest) — boilerplate
    collapses map-side); the optional language pass adds one more
    count over (stratum, lang).  Output is S rows.
    """
    toks = F.size(tokens_col(text)).cast("long")
    digest = F.md5(F.coalesce(F.col(text), F.lit("\x00null")))
    base = (df.withColumn("_tok", toks).withColumn("_dg", digest)
              .groupBy(strata_col).agg(
                  F.count(F.lit(1)).alias("n_docs"),
                  F.sum("_tok").alias("total_tokens"),
                  F.countDistinct("_dg").alias("n_unique_texts"))
              .withColumn("mean_tokens",
                          F.col("total_tokens") / F.col("n_docs"))
              .withColumn("dup_frac",
                          F.lit(1.0) - F.col("n_unique_texts")
                          / F.col("n_docs")))
    if length_quantiles:
        qs = exact_group_quantiles(
            df.withColumn("_ntok", toks), "_ntok",
            list(length_quantiles), by=strata_col) \
            .withColumnRenamed(strata_col, "_qs")
        base = base.join(F.broadcast(qs),
                         F.col(strata_col).eqNullSafe(F.col("_qs")),
                         "left").drop("_qs")
    if lang_col is None:
        return base
    lw = Window.partitionBy(strata_col).orderBy(
        F.desc("_lc"), F.asc_nulls_last(lang_col))
    langs = (df.groupBy(strata_col, lang_col)
               .agg(F.count(F.lit(1)).alias("_lc"))
               .withColumn("_rk", F.row_number().over(lw))
               .where(F.col("_rk") == 1)
               .select(F.col(strata_col).alias("_ls"),
                       F.col(lang_col).alias("top_lang"),
                       F.col("_lc").alias("_top_n")))
    return (base.join(F.broadcast(langs),
                      F.col(strata_col).eqNullSafe(F.col("_ls")), "left")
                .withColumn("top_lang_frac",
                            F.col("_top_n") / F.col("n_docs"))
                .drop("_ls", "_top_n"))
