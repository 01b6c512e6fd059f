"""connected_components / dedup_keep_list: transitive closure of the
near-dup pair graph into canonical keep-groups, checked against a
pure-NumPy union-find oracle."""

import numpy as np
import pytest

from miaplpy_spark.functions.dedup import (connected_components,
                                           dedup_keep_list,
                                           minhash_lsh_pairs)

SF_DIR = "/root/testdata/sf0.001"


def _uf_components(edges):
    """Union-find oracle: {node: min-label component id}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in list(parent):
        root = find(n)
        out[n] = min(out.get(root, root), root)
    # normalize to the minimum MEMBER of each component
    comp_min = {}
    for n in parent:
        comp_min.setdefault(find(n), n)
        comp_min[find(n)] = min(comp_min[find(n)], n)
    return {n: comp_min[find(n)] for n in parent}


def test_chain_transitivity(spark):
    """A~B, B~C (A~C never surfaced) must be ONE component — the whole
    point of running components after pair generation."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "doc1 string, doc2 string")
    got = {r["node"]: r["comp"]
           for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_matches_union_find_on_random_graph(spark):
    rng = np.random.RandomState(7)
    n = 300
    edges = [(f"n{min(a, b):04d}", f"n{max(a, b):04d}")
             for a, b in rng.randint(0, n, size=(250, 2)) if a != b]
    pairs = spark.createDataFrame(edges, "doc1 string, doc2 string")
    got = {r["node"]: r["comp"]
           for r in connected_components(pairs).collect()}
    assert got == _uf_components(edges)


def test_long_path_converges(spark):
    """A 40-node path is the adversarial diameter case for min-label
    propagation (pointer-halving via the checkpointedly reused labels
    still walks it); the safety bound must not trip."""
    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(40)]
    pairs = spark.createDataFrame(edges, "doc1 string, doc2 string")
    got = {r["node"]: r["comp"]
           for r in connected_components(pairs, max_iter=50).collect()}
    assert set(got.values()) == {"p00"}


def test_max_iter_raises_instead_of_partial(spark):
    edges = [(f"q{i:02d}", f"q{i + 1:02d}") for i in range(20)]
    pairs = spark.createDataFrame(edges, "doc1 string, doc2 string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_star_converges_logarithmically_on_path(spark):
    """Round-4 VERDICT item 5: the large-star/small-star mode must
    label the 40-node path in <= 6 rounds (O(log n)) where min-label
    needs 40 sweeps — same labels."""
    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(40)]
    pairs = spark.createDataFrame(edges, "doc1 string, doc2 string")
    got = {r["node"]: r["comp"]
           for r in connected_components(pairs, max_iter=6,
                                         algorithm="star").collect()}
    assert len(got) == 41 and set(got.values()) == {"p00"}


def test_star_matches_minlabel_on_random_graph(spark):
    rng = np.random.RandomState(11)
    n = 200
    edges = [(f"s{min(a, b):04d}", f"s{max(a, b):04d}")
             for a, b in rng.randint(0, n, size=(180, 2)) if a != b]
    pairs = spark.createDataFrame(edges, "doc1 string, doc2 string")
    star = {r["node"]: r["comp"]
            for r in connected_components(pairs,
                                          algorithm="star").collect()}
    assert star == _uf_components(edges)


def test_star_on_real_minhash_pairs(spark):
    pairs = minhash_lsh_pairs(spark, SF_DIR).localCheckpoint(eager=True)
    a = {r["node"]: r["comp"]
         for r in connected_components(pairs).collect()}
    b = {r["node"]: r["comp"]
         for r in connected_components(pairs,
                                       algorithm="star").collect()}
    assert a == b


def test_auto_small_graph_uses_driver_union_find(spark):
    """auto below the edge threshold = exact driver union-find; above
    it (threshold forced to 0) = the star rounds; identical labels."""
    rng = np.random.RandomState(23)
    n = 150
    edges = [(f"a{min(a, b):04d}", f"a{max(a, b):04d}")
             for a, b in rng.randint(0, n, size=(120, 2)) if a != b]
    pairs = spark.createDataFrame(edges, "doc1 string, doc2 string")
    exp = _uf_components(edges)
    small = {r["node"]: r["comp"]
             for r in connected_components(pairs,
                                           algorithm="auto").collect()}
    big = {r["node"]: r["comp"]
           for r in connected_components(pairs, algorithm="auto",
                                         driver_max_edges=0).collect()}
    assert small == exp and big == exp


def test_auto_long_path_converges(spark):
    """auto must stay diameter-safe in both regimes."""
    edges = [(f"z{i:02d}", f"z{i + 1:02d}") for i in range(40)]
    pairs = spark.createDataFrame(edges, "doc1 string, doc2 string")
    got = {r["node"]: r["comp"]
           for r in connected_components(pairs, max_iter=8,
                                         algorithm="auto",
                                         driver_max_edges=0).collect()}
    assert len(got) == 41 and set(got.values()) == {"z00"}


def test_unknown_algorithm_raises(spark):
    pairs = spark.createDataFrame([("a", "b")], "doc1 string, doc2 string")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(pairs, algorithm="frobnicate")


def test_keep_list_on_real_minhash_pairs(spark):
    """End-to-end: LSH pairs at sf0.001 -> one canonical keep per
    component, keeps are the component minima, everything else drops."""
    pairs = minhash_lsh_pairs(spark, SF_DIR)
    keep = dedup_keep_list(pairs).collect()
    assert len(keep) > 0
    by_comp = {}
    for r in keep:
        by_comp.setdefault(r["comp"], []).append(r)
    for comp, rows in by_comp.items():
        kept = [r["doc_id"] for r in rows if r["keep"]]
        assert kept == [min(r["doc_id"] for r in rows)]
        assert comp == min(r["doc_id"] for r in rows)
