"""Connected components + keep-canonical dedup: chains that force
multiple propagation rounds, isolated nodes, multi-cluster graphs."""

import pyspark.sql.functions as F

from aloha_spark.operators.dedup import (
    connected_components, dedup_keep_canonical, exact_jaccard,
    release_intermediates, shared_shingle_pairs)


def _labels(spark, edges, nodes=None):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nd = (spark.createDataFrame([(n,) for n in nodes], "id long")
          if nodes is not None else None)
    rows = connected_components(pairs, nodes=nd).collect()
    return {r["id"]: r["component"] for r in rows}


def test_long_chain_converges(spark):
    # a 7-node path needs several min-propagation rounds: the label 0
    # must travel the full diameter
    edges = [(i, i + 1) for i in range(6)]
    labs = _labels(spark, edges)
    assert labs == {i: 0 for i in range(7)}


def test_two_clusters_and_isolated(spark):
    edges = [(10, 11), (11, 12), (20, 21)]
    labs = _labels(spark, edges, nodes=[10, 11, 12, 20, 21, 30])
    assert labs == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}


def test_edge_order_irrelevant(spark):
    # min id arrives through the "wrong" end of the pair columns too
    labs = _labels(spark, [(5, 1), (5, 9), (9, 3)])
    assert labs == {1: 1, 5: 1, 9: 1, 3: 1}


def test_shared_shingle_blocking_lossless(spark):
    # every pair with jaccard > 0 must survive the blocker (shares at
    # least one shingle); empty/whitespace docs never pair
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat today"),
         (1, "the cat sat on the mat yesterday"),
         (2, "a completely different sentence with other words"),
         (3, "a completely different sentence with other words"),
         (4, ""), (5, "   "), (6, "one two")],
        "doc_id long, text string")
    all_pairs = (docs.select(F.col("doc_id").alias("id_a"))
                 .crossJoin(docs.select(F.col("doc_id").alias("id_b")))
                 .where("id_a < id_b"))
    brute = {(r["id_a"], r["id_b"])
             for r in exact_jaccard(docs, all_pairs).collect()
             if r["jaccard"] > 0}
    blocked = {(r["id_a"], r["id_b"])
               for r in shared_shingle_pairs(docs).collect()}
    assert brute <= blocked
    assert not any(4 in p or 5 in p for p in blocked)
    # and the post-verify edge sets are identical at any threshold
    verified = {(r["id_a"], r["id_b"])
                for r in exact_jaccard(docs, shared_shingle_pairs(docs))
                .where("jaccard >= 0.35").collect()}
    brute35 = {(r["id_a"], r["id_b"])
               for r in exact_jaccard(docs, all_pairs)
               .where("jaccard >= 0.35").collect()}
    assert verified == brute35 and (2, 3) in verified


def test_star_handles_100_hop_chain_where_label_refuses(spark):
    # a 100-hop path exceeds the label-propagation budget (O(diameter)
    # rounds vs max_iterations=20) but star-CC converges in O(log n)
    edges = [(i, i + 1) for i in range(100)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    import pytest
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, algorithm="label")
    labs = {r["id"]: r["component"]
            for r in connected_components(pairs, algorithm="star").collect()}
    assert labs == {i: 0 for i in range(101)}


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min labeling
    return {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}


def test_star_matches_union_find_on_random_graphs(spark):
    import random
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
        edges = [e for e in edges if e[0] != e[1]]
        nodes = list(range(n))
        want = _union_find(edges, nodes)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        nd = spark.createDataFrame([(x,) for x in nodes], "id long")
        got = {r["id"]: r["component"]
               for r in connected_components(
                   pairs, nodes=nd, algorithm="star").collect()}
        assert got == want, f"seed {seed}"
        got_label = {r["id"]: r["component"]
                     for r in connected_components(
                         pairs, nodes=nd, algorithm="label").collect()}
        assert got_label == want, f"seed {seed} (label)"


def test_star_string_ids(spark):
    # doc ids are strings in real corpora; ordering comparisons must
    # work lexically
    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-c", "doc-b"), ("zz", "yy")],
        "id_a string, id_b string")
    labs = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert labs == {"doc-a": "doc-a", "doc-b": "doc-a",
                    "doc-c": "doc-a", "yy": "yy", "zz": "yy"}


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 4), (1, 5)], "id_a long, id_b long")
    out = dedup_keep_canonical(docs, pairs)
    kept = sorted(r["doc_id"] for r in out.collect())
    # clusters {0,3,4} -> keep 0; {1,5} -> keep 1; isolated 2 kept
    assert kept == [0, 1, 2]
    # the persisted components label frame is transferred to the
    # result's auto-release tracking (exactly one cache to free)
    assert release_intermediates(out) == 1
