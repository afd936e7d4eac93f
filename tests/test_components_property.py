"""Property test: large-star/small-star CC vs brute-force union-find on
seeded random graphs (chains, cliques, stars, random sparse)."""
import random

import pytest

from wdd.operators.components import connected_components


def _brute_cc(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min of component
    comp = {}
    for v in vertices:
        comp.setdefault(find(v), []).append(v)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def _check(spark, edges, vertices):
    e_df = spark.createDataFrame(edges or [(0, 0)], ["a", "b"])
    if not edges:
        e_df = e_df.limit(0)
    v_df = spark.createDataFrame([(v,) for v in vertices], ["id"])
    res = connected_components(e_df, v_df)
    assert res.converged, "did not converge"
    got = {r.id: r.cluster_id for r in res.labels.collect()}
    expected = _brute_cc(edges, vertices)
    assert got == expected
    return res.iterations


def test_cc_chain(spark):
    # worst case for plain label propagation: a long chain with shuffled ids
    rng = random.Random(11)
    ids = list(range(100))
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    iters = _check(spark, edges, ids)
    assert iters <= 10  # O(log n) rounds, not O(n)


def test_cc_random_sparse(spark):
    rng = random.Random(7)
    vertices = list(range(200))
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges, vertices)


def test_cc_cliques_and_isolated(spark):
    edges = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    edges += [(100 + i, 100 + i + 1) for i in range(5)]
    vertices = list(range(10)) + list(range(100, 106)) + [999]
    _check(spark, edges, vertices)


def test_hash_min_parity(spark):
    """The plain hash-min reference implementation labels identically to the
    star-contraction default (and to brute force) on a mixed graph."""
    from wdd.operators.components import hash_min_components
    rng = random.Random(23)
    vertices = list(range(120))
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    e_df = spark.createDataFrame(edges, ["a", "b"])
    v_df = spark.createDataFrame([(v,) for v in vertices], ["id"])
    star = connected_components(e_df, v_df)
    hmin = hash_min_components(e_df, v_df)
    assert star.converged and hmin.converged
    got_star = {r.id: r.cluster_id for r in star.labels.collect()}
    got_hmin = {r.id: r.cluster_id for r in hmin.labels.collect()}
    assert got_star == got_hmin == _brute_cc(edges, vertices)


def test_cc_two_stars_bridged(spark):
    edges = [(0, i) for i in range(1, 20)] + [(50, 50 + i) for i in range(1, 20)]
    edges.append((19, 69))
    vertices = list(range(20)) + list(range(50, 70))
    got_iters = _check(spark, edges, vertices)
    assert got_iters <= 8
