"""Interval (range) join: attach point-in-time rows to the time
intervals containing them — ``left.ts BETWEEN right.start AND
right.end`` with optional equi-keys.

Spark has no native range-join strategy: a plain non-equi join compiles
to BroadcastNestedLoopJoin (or a cartesian product with per-pair
filtering) — O(|L| x |R|) work that is the single most common way a
correct-looking temporal query melts down at scale.  This operator
implements the standard bucketized-expansion rewrite (the same family
as Databricks' range-join optimization, described publicly, and the
binned overlap joins of time-series stores): both sides are binned on a
fixed time width, intervals explode into the bins they cover, and the
match becomes an EQUI-join on (keys..., bin) plus a residual
``BETWEEN`` — hash-joinable, partition-parallel, skew-manageable.

Exactly-once pairing: a point row has exactly ONE bin, so a qualifying
(point, interval) pair meets in exactly one bin — no post-join dedup
pass, unlike rewrites that bin both sides symmetrically.

Scale knobs (the 100 TB story):
* ``bin_width`` should approximate the TYPICAL interval length: too
  small and long intervals explode into many bins (write amplification
  on the build side), too large and each bin carries unrelated rows
  (residual-filter waste).  The operator measures nothing — binning is
  a pure projection — but it REFUSES (loudly, with the offending span)
  intervals covering more than ``max_bins_per_interval`` bins, because
  a silent million-row explode from one malformed open-ended interval
  is exactly the failure mode this rewrite must not have.
* the join itself is a plain equi-join: AQE picks broadcast vs shuffle,
  handles skewed bins, and the usual salting applies if one (key, bin)
  is pathological.

Reference parity note: the reference engine has no join layer at all
(models see one already-joined row; SURVEY §2.4) — this extends the
engine's as-of family (operators/asof.py) with the other temporal-join
shape a transcript pipeline needs (session windows, promotion windows,
outage windows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

# 2^53: beyond this a double-typed exact integer division would lose
# ulps; micros-since-epoch stays below it until the year ~2255
_EXACT_DOUBLE = 1 << 53


def _bin_of(ts_col: Column, width_us: int) -> Column:
    """Floor-division bin of a timestamp in exact integer arithmetic:
    ``(um - pmod(um, w)) / w`` — pmod is non-negative, so this floors
    correctly for pre-1970 timestamps too, and the division is exact
    (the numerator is a multiple of w).  The ltz cast handles
    TIMESTAMP_NTZ (parquet default in Spark 4, rejected by
    unix_micros); NTZ is interpreted in the session time zone, which
    only shifts every bin uniformly — pairing is unaffected."""
    um = F.unix_micros(ts_col.cast("timestamp_ltz"))
    return ((um - F.pmod(um, F.lit(width_us))) / F.lit(width_us)) \
        .cast("long")


def interval_join(points: DataFrame, intervals: DataFrame, *,
                  on: Optional[Sequence[str]] = None,
                  point_ts: str = "ts",
                  start_ts: str = "start_ts",
                  end_ts: str = "end_ts",
                  bin_width_seconds: int = 300,
                  max_bins_per_interval: int = 10_000,
                  how: str = "inner") -> DataFrame:
    """Join point rows into the intervals containing them.

    Emits one output row per (point, interval) pair with
    ``interval.start <= point.ts <= interval.end`` (inclusive on both
    ends) and equality on every ``on`` key; a point inside k
    overlapping intervals appears k times.  ``how="left"`` keeps
    unmatched points with NULL interval columns.  ``how="left_semi"`` /
    ``"left_anti"`` turn the join into time-window FILTERING: keep /
    drop each point (once, point columns only) iff it falls inside ANY
    matching interval — outage windows, embargo periods, session
    membership tests.  Rows with NULL timestamps never match (NULL
    never satisfies BETWEEN; they survive ``left_anti``); empty
    intervals (``end < start``) match nothing.

    Column contract: the two frames must not share column names apart
    from the ``on`` keys (raise otherwise — silent duplicate-name
    output is how downstream ``select``s pick the wrong side).

    Scale: binned-expansion equi-join — see the module docstring.  An
    interval spanning more than ``max_bins_per_interval`` bins raises
    with the offending span; raise ``bin_width_seconds`` (or fix the
    open-ended interval) rather than the cap.

    Streaming: ``points`` may be a STREAMING DataFrame with a static
    ``intervals`` side (``how="inner"`` only — stream-static anti-join
    is unsupported upstream): the rewrite is projection + stream-static
    equi-join + filter, all streamable, so late-arriving points join
    their (static) windows per micro-batch with no state.  Verified in
    tests/test_intervals.py.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError("how must be 'inner', 'left', 'left_semi' or "
                         f"'left_anti': {how!r}")
    if points.isStreaming and how != "inner":
        # fail at plan time with the real reason — otherwise the
        # persist()/anti-join machinery below dies mid-query with an
        # obscure unsupported-operation error
        raise ValueError(
            f"interval_join: streaming points support how='inner' only "
            f"(got {how!r}) — stream-static anti/outer joins are "
            f"unsupported upstream")
    if bin_width_seconds < 1:
        raise ValueError(
            f"bin_width_seconds must be >= 1: {bin_width_seconds}")
    on = list(on or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"column name collision outside the join keys: "
            f"{sorted(overlap)} — rename one side first")
    width_us = int(bin_width_seconds) * 1_000_000

    p = points.withColumn("_pbin", _bin_of(F.col(point_ts), width_us))
    s_bin = _bin_of(F.col(start_ts), width_us)
    e_bin = _bin_of(F.col(end_ts), width_us)
    span = (e_bin - s_bin + F.lit(1)).alias("_span")
    iv = (intervals
          .where(F.col(start_ts).isNotNull()
                 & F.col(end_ts).isNotNull()
                 & (F.col(end_ts) >= F.col(start_ts)))
          .withColumn("_sbin", s_bin).withColumn("_ebin", e_bin))
    # loud guard BEFORE the explode: one malformed open-ended interval
    # must not silently fan out into millions of rows.  assert_true
    # keeps the check distributed (no extra action/collect).
    iv = iv.withColumn(
        "_guard",
        F.assert_true(
            (F.col("_ebin") - F.col("_sbin")) < max_bins_per_interval,
            F.concat(
                F.lit("interval_join: interval spans too many bins ("),
                (F.col("_ebin") - F.col("_sbin") + 1).cast("string"),
                F.lit(f" > {max_bins_per_interval}); raise "
                      f"bin_width_seconds or fix the interval: start="),
                F.col(start_ts).cast("string"), F.lit(" end="),
                F.col(end_ts).cast("string")))).drop("_guard")
    iv = iv.withColumn(
        "_pbin", F.explode(F.sequence(F.col("_sbin"), F.col("_ebin")))) \
        .drop("_sbin", "_ebin")

    if how in ("left_semi", "left_anti"):
        # time-window FILTERING (keep / drop points inside any
        # interval — outage windows, embargo periods): the residual
        # BETWEEN must live in the join condition itself (a semi join
        # has no post-filterable right columns), which Spark's hash
        # joins support as an extra condition.  Each point is emitted
        # at most once by semi/anti semantics — no dedup pass.
        pl, ivl = p.alias("P"), iv.alias("IV")
        cond = F.col("P._pbin") == F.col("IV._pbin")
        for c in on:
            cond &= F.col(f"P.{c}") == F.col(f"IV.{c}")
        cond &= F.col(f"P.{point_ts}").between(
            F.col(f"IV.{start_ts}"), F.col(f"IV.{end_ts}"))
        return pl.join(ivl, cond, how).drop("_pbin")

    cond = F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    joined = p.join(iv, on + ["_pbin"], "inner").where(cond).drop("_pbin")
    if how == "inner":
        return joined
    # left: matched pairs + unmatched points with NULL interval
    # columns.  The match-detection anti-join must be NULL-SAFE on
    # every point column — with plain equality a matched point carrying
    # a NULL payload column would never equal itself and be emitted a
    # second time as "unmatched".  Persisted: both the union branch and
    # the anti-join's build side read `joined`, and without the cache
    # the whole binned join would execute twice (released with the
    # result via the intermediate tracker).
    from .dedup import _track_intermediates

    joined = joined.persist()
    matched_keys = joined.select(*points.columns).alias("M")
    pl = p.drop("_pbin").alias("P")
    anti_cond = None
    for c in points.columns:
        eq = F.col(f"P.{c}").eqNullSafe(F.col(f"M.{c}"))
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    unmatched = pl.join(matched_keys, anti_cond, "left_anti")
    out = joined.unionByName(unmatched, allowMissingColumns=True)
    return _track_intermediates(out, joined)


def sessionize_intervals(df: DataFrame, *,
                         key: str = "conv_id",
                         ts: str = "ts",
                         gap_seconds: int = 1800) -> DataFrame:
    """Collapse per-row gap sessionization into one row per session:
    ``(key, session_start, session_end, n_rows)`` — the interval table
    an ``interval_join`` then probes (e.g. attach outage windows or
    promo windows to sessions).  One window exchange on ``key`` plus a
    partial-aggregated groupBy on (key, session start).
    """
    from .windows import with_session_id

    s = with_session_id(df, ts=ts, by=key, gap_seconds=gap_seconds)
    return (s.groupBy(key, "session_id").agg(
                F.min(ts).alias("session_start"),
                F.max(ts).alias("session_end"),
                F.count(F.lit(1)).alias("n_rows")))
