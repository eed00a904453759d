"""Models-as-dataflow: JSON model specs -> DataFrame transformations.

The reference's model factory (aloha-core/.../factory/ModelFactory.scala:
80-262) parses a JSON document by "modelType" and recursively builds
submodels; every (sub)model output is audited.  Here a model compiles to
a builder ``df -> df.withColumn(out, ...)``; where the semantics are
pure scalar logic they become Catalyst expressions (nested CASE WHEN for
trees — lazy per-branch evaluation exactly like the reference's selling
point, README.md:15-23); sparse-vector scoring runs in an Arrow-batched
pandas UDF over the featurized bags.

Implemented model types (reference files in each builder's docstring):
Constant, Regression (1st-order w.x + constant-delta spline + numMissing
threshold), DecisionTree / ModelDecisionTree (linear node selector),
Segmentation, CategoricalDistribution (MurmurHash3 orderedHash + alias-
method sampler — bit-parity hash, same alias construction), DoubleToLong,
Error, ErrorSwallowing, EpsilonGreedy / Bootstrap exploration
(deterministic salted-hash randomization; the reference delegates to the
external MWT explore-java library, so parity here is semantic, not
bit-exact).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import ordered_hash_strings
from .spec import parse_feature_spec, try_compile_column

# ---------------------------------------------------------------------------
# alias-method sampler (util/rand/AliasMethodSampler.scala:33-120)


def alias_structures(probs: Sequence[float]) -> tuple[list[int], list[float]]:
    k = len(probs)
    if k == 0:
        raise ValueError("prob must have at least one element")
    z = k / sum(probs)
    q = [0.0] * k
    j = [0] * k
    smaller: list[int] = []
    larger: list[int] = []
    for kk, p in enumerate(probs):
        q[kk] = z * p
        (smaller if q[kk] < 1 else larger).append(kk)
    # reference uses cons lists (LIFO); match pop-from-front-of-cons
    smaller.reverse()
    larger.reverse()
    while smaller and larger:
        small = smaller.pop(0)
        large = larger.pop(0)
        j[small] = large
        q[large] -= 1 - q[small]
        (smaller if q[large] < 1 else larger).insert(0, large)
    for idx in smaller:
        q[idx] = 1.0
    for idx in larger:
        q[idx] = 1.0
    return j, q


def alias_sample(alias: Sequence[int], probabilities: Sequence[float],
                 k: int, f: float) -> int:
    return k if f < probabilities[k] else alias[k]


def hashed_categorical(values: Sequence[str], probs: Sequence[float]) -> int:
    """HashedCategoricalDistribution.scala:35-45: h = orderedHash(data);
    k = |h| % n; f = |h| / Int.MaxValue; alias-sample."""
    alias, pr = alias_structures(probs)
    h = ordered_hash_strings([str(v) for v in values])
    h_abs = abs(h)
    f = np.float32(h_abs) / np.float32(2147483647.0)
    k = h_abs % len(probs)
    return alias_sample(alias, pr, k, float(f))


# ---------------------------------------------------------------------------
# spline (models/reg/spline.scala:18-42)

def constant_delta_spline(vmin: float, vmax: float,
                          knots: Sequence[float]) -> Callable[[float], float]:
    if not ((vmin < vmax and len(knots) > 1)
            or (vmin == vmax and len(knots) == 1)):
        raise ValueError("invalid spline domain/knots")
    bin_ = 1.0 if len(knots) == 1 else (vmax - vmin) / (len(knots) - 1)

    def apply(score: float) -> float:
        xp = min(max(score, vmin), vmax)
        k = (xp - vmin) / bin_
        i = int(k)
        if k == i:
            return knots[i]
        w_hi = k - i
        return (1 - w_hi) * knots[i] + w_hi * knots[i + 1]

    return apply


# ---------------------------------------------------------------------------
# model builders

@dataclass
class ModelContext:
    """Carries shared compilation context (feature column name etc.)."""
    features_col: str = "features"          # array<map<string,double>>
    missing_col: str = "missing_features"
    feature_order: Optional[list[str]] = None  # names aligned with the array
    # When not None, submodel-bearing builders register
    # (model_id, score_column) here instead of dropping the score column
    # — apply_model(audit=True) folds them into the audit struct's
    # ``children`` array (the dataflow rendering of the reference's
    # nested score-audit tree, tree_auditors.scala:107-196).
    audit_nodes: Optional[list] = None


Builder = Callable[[DataFrame, str, ModelContext], DataFrame]


def _model_id(doc: dict) -> str:
    return str(doc.get("modelId", {}).get("id", doc.get("modelType", "?")))


def _finish_sub(df: DataFrame, ctx: ModelContext, sub_doc: dict,
                sub_col: str) -> DataFrame:
    """Drop a submodel score column — unless auditing, in which case it
    is registered and kept for apply_model to fold into ``children``."""
    if ctx.audit_nodes is not None:
        ctx.audit_nodes.append((_model_id(sub_doc), sub_col))
        return df
    return df.drop(sub_col)


def _compile_scalar(spec: str) -> Column:
    parsed = parse_feature_spec("_m", spec)
    col = try_compile_column(parsed)
    if col is None:
        raise ValueError(f"model spec not Column-expressible: {spec}")
    return col


def build_model(doc: dict) -> Builder:
    mt = doc["modelType"]
    builder = _BUILDERS.get(mt)
    if builder is None:
        raise ValueError(f"unknown modelType: {mt}")
    return builder(doc)


def _constant(doc) -> Builder:
    """ConstantModel.scala:13"""
    value = doc["value"]

    def b(df, out, ctx):
        return df.withColumn(out, F.lit(value))
    return b


def _error(doc) -> Builder:
    """ErrorModel.scala:12 — always a null score plus error messages."""
    errors = doc.get("errors", ["Error with errors"])

    def b(df, out, ctx):
        return (df.withColumn(out, F.lit(None).cast("double"))
                  .withColumn(out + "_errors",
                              F.array(*[F.lit(e) for e in errors])))
    return b


def _error_swallowing(doc) -> Builder:
    """ErrorSwallowingModel.scala:42 — scoring NEVER propagates an
    error: any failure yields a null score with the error recorded in
    ``<out>_errors``.

    Failure surfaces in this dataflow engine and how each is swallowed:
    * model-compile / plan-build errors (bad submodel doc, spec that
      references a missing column) — caught here, whole column becomes
      null + one error message per row;
    * per-row expression failures — Column-tier arithmetic already
      yields SQL NULL instead of raising (div-by-zero, log of a
      negative, bad cast: the ``try_*`` semantics), and the batch tier
      records per-row exceptions in ``erring_features``; a null score
      with no explicit submodel error column is annotated as a
      swallowed scoring error.
    """
    sub_doc = doc["submodel"]

    def b(df, out, ctx):
        err_col = out + "_errors"
        n_audit = len(ctx.audit_nodes) if ctx.audit_nodes is not None else 0
        try:
            df2 = build_model(sub_doc)(df, out, ctx)
            # force plan analysis so unresolved-column errors surface
            # here (lazily they would escape the swallow at action time)
            df2.schema
        except Exception as e:  # noqa: BLE001 — the model's contract
            # roll back audit registrations from the failed subtree:
            # their columns never materialized, and a dangling
            # reference would crash apply_model(audit=True) — an error
            # escaping the swallow
            if ctx.audit_nodes is not None:
                del ctx.audit_nodes[n_audit:]
            msg = f"{type(e).__name__} swallowed: {e}"
            return (df.withColumn(out, F.lit(None).cast("double"))
                      .withColumn(err_col, F.array(F.lit(msg))))
        existing = (F.col(err_col) if err_col in df2.columns
                    else F.array().cast("array<string>"))
        swallowed = F.when(
            F.col(out).isNull() & (F.size(existing) == 0),
            F.array(F.lit("error swallowed: submodel produced no score"))
        ).otherwise(existing)
        return df2.withColumn(err_col, swallowed)
    return b


def _double_to_long(doc) -> Builder:
    """doubleToLong.scala:25-47: clamp(round_or_floor(scale*x + transl))."""
    sub = build_model(doc["submodel"])
    scale = float(doc.get("scale", 1.0))
    translation = float(doc.get("translation", 0.0))
    lo = int(doc.get("clampLower", -(2 ** 63)))
    hi = int(doc.get("clampUpper", 2 ** 63 - 1))
    do_round = bool(doc.get("round", False))

    def b(df, out, ctx):
        df2 = sub(df, out + "_sub", ctx)
        x = F.col(out + "_sub") * scale + translation
        # scala .round = floor(x + 0.5); .toLong truncates toward zero
        conv = F.floor(x + F.lit(0.5)) if do_round else x.cast("long")
        clamped = F.greatest(F.lit(lo),
                             F.least(conv.cast("long"), F.lit(hi)))
        return _finish_sub(df2.withColumn(out, clamped), ctx,
                           doc["submodel"], out + "_sub")
    return b


def _segmentation(doc) -> Builder:
    """SegmentationModel.scala:38-50: first threshold with score <= t."""
    sub_doc = doc["subModel"] if "subModel" in doc else doc["submodel"]
    sub = build_model(sub_doc)
    thresholds = doc["thresholds"]
    labels = doc["labels"]
    if len(thresholds) + 1 != len(labels):
        raise ValueError("labels must have one more element than thresholds")
    if sorted(thresholds) != list(thresholds):
        raise ValueError("thresholds must be sorted")

    def b(df, out, ctx):
        df2 = sub(df, out + "_sub", ctx)
        col = F.lit(labels[-1])
        for t, lab in reversed(list(zip(thresholds, labels[:-1]))):
            col = F.when(F.col(out + "_sub") <= F.lit(t), F.lit(lab)) \
                   .otherwise(col)
        return _finish_sub(
            df2.withColumn(
                out, F.when(F.col(out + "_sub").isNotNull(), col)),
            ctx, sub_doc, out + "_sub")
    return b


def _decision_tree(doc) -> Builder:
    """BasicDecisionTree + ModelDecisionTree (models/tree/decision/):
    nodes with predicate lists; nested CASE WHEN gives the same lazy
    per-branch evaluation.  A node ``value`` may itself be a model doc
    (ModelDecisionTree.scala:39-55) — submodel leaves are precomputed
    into temp columns the CASE references, so unchosen branches still
    cost nothing at the expression level while Column-tier submodels
    collapse into the same projection.  ``returnBest`` controls whether
    an unmatched interior node yields its own value (True) or null
    (False, missingDataOk=false semantics)."""
    return_best = bool(doc.get("returnBest", False))
    nodes = {n["id"]: n for n in doc["nodes"]}
    root_id = doc["nodes"][0]["id"]
    submodel_leaves = {n["id"]: build_model(n["value"])
                       for n in doc["nodes"] if isinstance(n["value"], dict)}

    def node_expr(nid, out) -> Column:
        node = nodes[nid]
        if nid in submodel_leaves:
            value = F.col(f"{out}__leaf{nid}")
        else:
            value = F.lit(node["value"])
        selector = node.get("selector")
        if not selector:
            return value
        # linear selector: list of (predicate, child) evaluated in order
        children = node["children"]
        preds = selector["predicates"]
        branches = []
        for p, child in zip(preds, children):
            branches.append((_compile_scalar(p), node_expr(child, out)))
        if return_best:
            fallback = value
        else:
            v = node["value"]
            fallback = F.lit(None).cast(
                "double" if isinstance(v, (int, float, dict)) else "string")
        col = fallback
        for pred, sub in reversed(branches):
            col = F.when(pred, sub).otherwise(col)
        return col

    def b(df, out, ctx):
        tmp_cols = []
        for nid, sub in submodel_leaves.items():
            tmp = f"{out}__leaf{nid}"
            df = sub(df, tmp, ctx)
            tmp_cols.append((nid, tmp))
        df = df.withColumn(out, node_expr(root_id, out))
        for nid, tmp in tmp_cols:
            df = _finish_sub(df, ctx, nodes[nid]["value"], tmp)
        return df
    return b


def _regression(doc) -> Builder:
    """RegressionModel.scala:64-113: score = Σ w[key]*x[key] over the
    prefixed feature-bag keys, plus higher-order terms
    (``higherOrderFeatures``: [{"features": {featureName: [key...]},
    "wt": w}] — term = wt * Π bag_of(featureName)[key], zero if any key
    absent; RegressionModelJson.scala:12-22, RegressionModel.scala:
    167-176), optional constant-delta spline + numMissingThreshold
    abort.  Runs as one Arrow-batched pandas UDF over the featurized
    bags column."""
    weights: dict[str, float] = {k: float(v)
                                 for k, v in doc.get("weights", {}).items()}
    hof_docs = doc.get("higherOrderFeatures") or []
    spline_doc = doc.get("spline")
    spline = (constant_delta_spline(spline_doc["min"], spline_doc["max"],
                                    spline_doc["knots"])
              if spline_doc else None)
    threshold = doc.get("numMissingThreshold")

    def _spline_col(score: Column) -> Column:
        """Constant-delta spline as Catalyst arithmetic (same math as
        constant_delta_spline)."""
        vmin, vmax = float(spline_doc["min"]), float(spline_doc["max"])
        knots = [float(k) for k in spline_doc["knots"]]
        if len(knots) == 1:
            return F.when(score.isNotNull(), F.lit(knots[0]))
        bin_ = (vmax - vmin) / (len(knots) - 1)
        karr = F.array(*[F.lit(k) for k in knots])
        xp = F.least(F.greatest(score, F.lit(vmin)), F.lit(vmax))
        k = (xp - F.lit(vmin)) / F.lit(bin_)
        i = F.floor(k).cast("int")
        frac = k - i
        lo = F.get(karr, i)
        hi = F.coalesce(F.get(karr, i + 1), lo)   # k == i at the top knot
        return F.when(frac == 0, lo) \
                .otherwise((F.lit(1.0) - frac) * lo + frac * hi)

    def _first_order_column(ctx) -> Column:
        """Pure w.x over the prefixed bag keys as a JVM `aggregate` —
        no Python in the scoring hot path (the common case: no
        higher-order terms).  One pass over the bags array, weight
        lookup from a map literal, whole-stage-codegen'd."""
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv])
        score = F.aggregate(
            F.col(ctx.features_col), F.lit(0.0),
            lambda acc, bag: acc + F.aggregate(
                F.map_entries(bag), F.lit(0.0),
                lambda a, e: a + F.coalesce(wmap[e["key"]], F.lit(0.0))
                * e["value"]))
        if spline_doc:
            score = _spline_col(score)
        if threshold is not None:
            score = F.when(
                F.size(F.col(ctx.missing_col)) <= threshold, score)
        return score

    def b(df, out, ctx):
        from pyspark.sql.pandas.functions import pandas_udf

        if not hof_docs:
            return df.withColumn(out, _first_order_column(ctx))

        hof_terms: list[tuple[list[tuple[int, str]], float]] = []
        if hof_docs:
            if not ctx.feature_order:
                raise ValueError("higherOrderFeatures need "
                                 "ModelContext.feature_order")
            name_to_idx = {n: i for i, n in enumerate(ctx.feature_order)}
            for h in hof_docs:
                pairs = [(name_to_idx[fname], key)
                         for fname, keys in h["features"].items()
                         for key in keys]
                hof_terms.append((pairs, float(h["wt"])))

        @pandas_udf("double")
        def score_udf(features: pd.Series, missing: pd.Series) -> pd.Series:
            res = np.full(len(features), np.nan)
            for i, (bags, miss) in enumerate(zip(features, missing)):
                if threshold is not None and miss is not None \
                        and len(miss) > threshold:
                    continue
                s = 0.0
                for bag in bags:
                    for k, v in bag.items():
                        w = weights.get(k)
                        if w is not None:
                            s += w * v
                for pairs, wt in hof_terms:
                    term = wt
                    for fi, key in pairs:
                        x = bags[fi].get(key)
                        if x is None:
                            term = 0.0
                            break
                        term *= x
                    s += term
                res[i] = spline(s) if spline else s
            return pd.Series(res)

        return df.withColumn(out, score_udf(F.col(ctx.features_col),
                                            F.col(ctx.missing_col)))
    return b


def _categorical_dist(doc) -> Builder:
    """CategoricalDistibutionModel.scala:31-80: deterministic hash-random
    label via orderedHash of the feature values + alias sampling."""
    probs = [float(p) for p in doc["probabilities"]]
    labels = doc["labels"]
    features = doc["features"]           # column names hashed in order
    if len(probs) != len(labels):
        raise ValueError("labels and probabilities must align")

    def b(df, out, ctx):
        from pyspark.sql.pandas.functions import pandas_udf

        alias, pr = alias_structures(probs)
        n = len(probs)

        @pandas_udf("int")
        def pick(*cols: pd.Series) -> pd.Series:
            out_ = np.zeros(len(cols[0]), dtype=np.int32)
            for i in range(len(cols[0])):
                vals = [c.iloc[i] for c in cols]
                h = ordered_hash_strings([str(v) for v in vals])
                h_abs = abs(h)
                f = float(np.float32(h_abs) / np.float32(2147483647.0))
                out_[i] = alias_sample(alias, pr, h_abs % n, f)
            return pd.Series(out_)

        idx_col = pick(*[F.col(c) for c in features])
        label_arr = F.array(*[F.lit(l) for l in labels])
        return df.withColumn(out, F.element_at(label_arr, idx_col + 1))
    return b


def _epsilon_greedy(doc) -> Builder:
    """EpsilonGreedyModel.scala:44-66 (semantic port): explore w.p.
    epsilon via a salted hash, else follow the default policy; emit the
    action label and its probability."""
    sub = build_model(doc["defaultPolicy"])
    epsilon = float(doc["epsilon"])
    labels = doc["classLabels"]
    salt_spec = doc.get("salt", "${__salt:-0}")
    n = len(labels)

    def b(df, out, ctx):
        df2 = sub(df, out + "_policy", ctx)
        salt = _compile_scalar(salt_spec)
        u = (F.pmod(F.xxhash64(salt.cast("string"), F.lit(101)),
                    F.lit(10 ** 9)).cast("double") / 1e9)
        pick = (F.pmod(F.xxhash64(salt.cast("string"), F.lit(211)),
                       F.lit(n)).cast("int") + 1)
        explore = u < F.lit(epsilon)
        action = F.when(explore, pick).otherwise(F.col(out + "_policy"))
        label_arr = F.array(*[F.lit(l) for l in labels])
        # logged propensity of the CHOSEN action under the epsilon-greedy
        # policy: P(a) = 1-eps+eps/N when a equals the greedy (policy)
        # action, eps/N otherwise — independent of which way the explore
        # coin happened to land (exploring can still pick the greedy arm)
        prob = F.when(action == F.col(out + "_policy"),
                      F.lit(1.0 - epsilon + epsilon / n)) \
                .otherwise(F.lit(epsilon / n))
        return _finish_sub(
            df2.withColumn(out, F.element_at(label_arr, action))
               .withColumn(out + "_prob", prob),
            ctx, doc["defaultPolicy"], out + "_policy")
    return b


def _bootstrap(doc) -> Builder:
    """BootstrapModel.scala:45-85 (semantic port): pick one of N policies
    by salted hash; probability = votes-for-chosen-action / N."""
    subs = [build_model(m) for m in doc["policies"]]
    labels = doc["classLabels"]
    salt_spec = doc.get("salt", "${__salt:-0}")
    n = len(subs)

    def b(df, out, ctx):
        df2 = df
        for i, s in enumerate(subs):
            df2 = s(df2, f"{out}_p{i}", ctx)
        salt = _compile_scalar(salt_spec)
        chooser = F.pmod(F.xxhash64(salt.cast("string"), F.lit(307)),
                         F.lit(n)).cast("int")
        actions = F.array(*[F.col(f"{out}_p{i}") for i in range(n)])
        action = F.element_at(actions, chooser + 1)
        votes = F.aggregate(
            actions, F.lit(0),
            lambda acc, x: acc + F.when(x == action, 1).otherwise(0))
        label_arr = F.array(*[F.lit(l) for l in labels])
        out_df = (df2.withColumn(out, F.element_at(label_arr, action))
                     .withColumn(out + "_prob",
                                 votes.cast("double") / F.lit(float(n))))
        for i in range(n):
            out_df = _finish_sub(out_df, ctx, doc["policies"][i],
                                 f"{out}_p{i}")
        return out_df
    return b


def _spec_model(doc) -> Builder:
    """Engine extension: a model whose score is a Column-expressible
    feature spec (the trivial 'compiled semantics as a model' case)."""
    col = _compile_scalar(doc["spec"])

    def b(df, out, ctx):
        return df.withColumn(out, col)
    return b


_BUILDERS: dict[str, Callable[[dict], Builder]] = {
    "Spec": _spec_model,
    "Constant": _constant,
    "Error": _error,
    "ErrorSwallowingModel": _error_swallowing,
    "DoubleToLong": _double_to_long,
    "Segmentation": _segmentation,
    "DecisionTree": _decision_tree,
    "Regression": _regression,
    "CategoricalDistribution": _categorical_dist,
    "EpsilonGreedyExploration": _epsilon_greedy,
    "BootstrapExploration": _bootstrap,
}


def apply_model(df: DataFrame, doc: dict, out: str = "score",
                ctx: Optional[ModelContext] = None,
                audit: bool = False) -> DataFrame:
    """Compile + apply a model JSON to a DataFrame.

    ``audit=True`` additionally emits ``<out>_audit`` — a struct
    ``(model_id, value, prob, missing, errors, children)`` per row.
    ``children`` is an array of ``(model_id, value)`` structs holding
    every submodel score computed anywhere in the model tree (depth-
    first registration order) — the dataflow rendering of the
    reference's nested score-audit tree (audit/impl/tree/
    tree_auditors.scala:107-196, which audits each submodel with child
    scores); per-stage dataset-level audit lives in the lineage table
    (plans/lineage.py)."""
    ctx = ctx or ModelContext()
    if audit:
        # fresh registration list per apply: a reused ctx must not leak
        # another model's (already-dropped) score columns into children
        ctx.audit_nodes = []
    df2 = build_model(doc)(df, out, ctx)
    if audit:
        model_id = _model_id(doc)
        prob = (F.col(out + "_prob")
                if out + "_prob" in df2.columns else F.lit(None).cast("double"))
        errors = (F.col(out + "_errors")
                  if out + "_errors" in df2.columns
                  else F.array().cast("array<string>"))
        missing = (F.col(ctx.missing_col)
                   if ctx.missing_col in df2.columns
                   else F.array().cast("array<string>"))
        present = set(df2.columns)
        nodes = [(mid, col) for mid, col in (ctx.audit_nodes or [])
                 if col in present]
        children = F.array(*[
            F.struct(F.lit(mid).alias("model_id"),
                     F.col(col).cast("string").alias("value"))
            for mid, col in nodes
        ]) if nodes else \
            F.array().cast("array<struct<model_id:string,value:string>>")
        df2 = df2.withColumn(out + "_audit", F.struct(
            F.lit(model_id).alias("model_id"),
            F.col(out).cast("string").alias("value"),
            prob.alias("prob"),
            missing.alias("missing"),
            errors.alias("errors"),
            children.alias("children")))
        for _mid, col in nodes:
            df2 = df2.drop(col)
    return df2
