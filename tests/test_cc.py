"""Connected-components near-dup clustering: min-label propagation over the
LSH pair graph (transitive closure — pairwise near-dup output alone
under-deduplicates chains)."""

from __future__ import annotations

import pytest

from pdf2dom_spark.textops import connected_components, dedup_cluster
from tests.conftest import SF_SMOKE


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_cc_chain_clique_and_island(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4),
                           (10, 11), (11, 12), (10, 12),
                           (20, 21)])
    got = {(r.node, r.cluster_id)
           for r in connected_components(edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10),
                   (20, 20), (21, 20)}


def test_cc_long_chain_converges(spark):
    # diameter 300: plain O(diameter) propagation would blow the 20-round
    # cap — only the pointer-halving O(log d) convergence passes this
    n = 300
    edges = _edges(spark, [(i, i + 1) for i in range(n)])
    rows = connected_components(edges).collect()
    assert len(rows) == n + 1
    assert {r.cluster_id for r in rows} == {0}


def test_cc_direction_insensitive(spark):
    # same component regardless of (u, v) orientation
    a = connected_components(_edges(spark, [(5, 9), (9, 7)])).collect()
    b = connected_components(_edges(spark, [(9, 5), (7, 9)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cc_nonconvergence_raises(spark, monkeypatch):
    from pdf2dom_spark import textops

    monkeypatch.setattr(textops, "CC_MAX_ROUNDS", 2)
    edges = _edges(spark, [(i, i + 1) for i in range(40)])
    with pytest.raises(ValueError, match="did not converge"):
        textops.connected_components(edges)


def test_cc_converged_at_init_verifies_in_one_round(spark, monkeypatch):
    """Graphs whose init labels (min of self+neighbors) are already the
    component minima — every near-dup clique where the min doc neighbors
    all members — must pass the convergence check in round 1 (the r6b
    early exit that skips the pointer-halving self-join)."""
    from pdf2dom_spark import textops

    monkeypatch.setattr(textops, "CC_MAX_ROUNDS", 1)
    edges = _edges(spark, [(1, 2), (1, 3), (2, 3),  # clique, min central
                           (50, 51)])               # isolated pair
    got = {(r.node, r.cluster_id)
           for r in textops.connected_components(edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (50, 50), (51, 50)}


def test_dedup_cluster_covers_lsh_pairs(spark):
    """Every doc in an LSH near-dup pair lands in a cluster; cluster ids are
    component minima; exactly one keeper per cluster."""
    from pdf2dom_spark.textops import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, SF_SMOKE).collect()
    clusters = dedup_cluster(spark, SF_SMOKE).collect()
    by_doc = {r.doc_id: r for r in clusters}
    assert set(by_doc) == {d for p in pairs for d in (p.doc_a, p.doc_b)}
    for p in pairs:  # paired docs always share a component
        assert by_doc[p.doc_a].cluster_id == by_doc[p.doc_b].cluster_id
    from collections import Counter

    sizes = Counter(r.cluster_id for r in clusters)
    for r in clusters:
        assert r.cluster_id == min(
            d.doc_id for d in clusters if d.cluster_id == r.cluster_id)
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.is_keeper == (r.doc_id == r.cluster_id)
    assert sum(1 for r in clusters if r.is_keeper) == len(sizes)


def test_incremental_lsh_equals_full(spark):
    """Splitting the corpus into (existing, new) and running the
    incremental band-join must reproduce EXACTLY the full query's pairs:
    full == pairs(existing only) ∪ incremental(new vs existing+new)."""
    from pyspark.sql import functions as F

    from pdf2dom_spark.textops import (_docs, _mh_bands, _mh_n_match,
                                       _mh_signatures,
                                       dedup_minhash_lsh,
                                       dedup_minhash_lsh_incremental)

    full = {(r.doc_a, r.doc_b, r.n_match)
            for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()}
    assert full  # non-vacuous

    d = _docs(spark, SF_SMOKE).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    old = d.where(F.col("doc_id") % 10 != 0)
    new = d.where(F.col("doc_id") % 10 == 0)
    old_sig = _mh_signatures(old, 8).localCheckpoint(eager=True)

    # pairs among the existing corpus only (the precomputed state)
    b = _mh_bands(old_sig)
    a2, b2 = b.alias("a"), b.alias("b")
    nm = _mh_n_match()
    old_pairs = {(r.doc_a, r.doc_b, r.n_match) for r in
                 (a2.join(b2, (F.col("a.band_id") == F.col("b.band_id"))
                          & (F.col("a.bh") == F.col("b.bh"))
                          & (F.col("a.doc_id") < F.col("b.doc_id")))
                  .where(nm >= 4)
                  .select(F.col("a.doc_id").alias("doc_a"),
                          F.col("b.doc_id").alias("doc_b"),
                          nm.cast("int").alias("n_match"))
                  .distinct().collect())}

    inc = {(r.doc_a, r.doc_b, r.n_match) for r in
           dedup_minhash_lsh_incremental(spark, new, old_sig).collect()}
    assert old_pairs | inc == full
    # the incremental result only reports pairs touching a new doc
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    for pa, pb, _ in inc:
        assert pa in new_ids or pb in new_ids


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min node id per component
    comp = {}
    for n in parent:
        comp[n] = find(n)
    # path-compress to true minima (find() keeps min as root by merge rule)
    return {n: find(n) for n in parent}


def test_cc_matches_union_find_random_graphs(spark):
    """Distributed min-label CC vs a driver-side union-find reference over
    deterministic pseudo-random graphs of varied shape (sparse, dense,
    multi-component, self-contained stars)."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n_nodes = rng.randint(10, 60)
        n_edges = rng.randint(5, 80)
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        want = _union_find(edges)
        got = {r.node: r.cluster_id
               for r in connected_components(_edges(spark, edges)).collect()}
        assert got == want, f"seed {seed}"
