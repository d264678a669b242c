"""Connected components: alternating large-star/small-star vs a plain
Python union-find on random graphs."""

import random

import pytest

from minhash_rs_spark.operators.connected_components import connected_components


def _uf_components(n_nodes, edges):
    parent = {f"n{i:04d}": f"n{i:04d}" for i in range(n_nodes)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted([ra, rb])
            parent[hi] = lo
    # normalize: root = min member of component
    comp = {}
    for k in parent:
        comp.setdefault(find(k), []).append(k)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 200, 150), (3, 30, 200),
])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = []
    for _ in range(n_edges):
        a, b = rng.sample(range(n_nodes), 2)
        edges.append((f"n{max(a, b):04d}", f"n{min(a, b):04d}"))
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["conv_id"]: r["cc_id"]
           for r in connected_components(df).collect()}
    expect = _uf_components(n_nodes, edges)
    touched = {x for e in edges for x in e}
    assert set(got) == touched
    for node in touched:
        assert got[node] == expect[node], node


def test_cc_long_chain_converges_logarithmically(spark):
    """A path graph is the worst case for naive label propagation;
    star-contraction must still converge quickly (O(log n) rounds)."""
    n = 64
    edges = [(f"p{i + 1:04d}", f"p{i:04d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = connected_components(df, max_iterations=20).collect()
    assert len(got) == n
    assert {r["cc_id"] for r in got} == {"p0000"}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert connected_components(df).count() == 0
