"""connected_components / cluster_dedup: the distributed large-star /
small-star labels must equal a local union-find on every graph shape —
chains (worst diameter), cliques, stars, disjoint unions, random graphs
(hypothesis), string ids, and the empty graph."""

from hypothesis import given, settings, strategies as st

from jsonschema_infer_spark.operators.dedup import (
    cluster_dedup,
    connected_components,
)


def _uf_labels(edges, nodes=None):
    """Local union-find oracle: node -> min node id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    all_nodes = set(nodes or []) | {n for e in edges for n in e}
    return sorted((n, find(n)) for n in all_nodes)


def _cc_rows(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(df)
    return sorted((r["node"], r["component"]) for r in got.collect())


def test_chain_worst_diameter(spark):
    edges = [(i, i + 1) for i in range(20)]
    assert _cc_rows(spark, edges) == _uf_labels(edges)


def test_two_cliques_and_isolated_pair(spark):
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        + [(100, 200)]
    )
    assert _cc_rows(spark, edges) == _uf_labels(edges)


def test_star_and_reverse_star(spark):
    edges = [(0, i) for i in range(1, 8)] + [(20 + i, 20) for i in range(1, 8)]
    assert _cc_rows(spark, edges) == _uf_labels(edges)


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(3, 3), (1, 2), (2, 1), (1, 2), (5, 5)]
    # self-loop-only nodes never enter the graph (no pair relation)
    assert _cc_rows(spark, edges) == [(1, 1), (2, 1)]


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], "id_a string, id_b string"
    )
    got = sorted((r["node"], r["component"]) for r in connected_components(df).collect())
    assert got == [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")]


def test_empty_graph(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_random_graphs_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    assert _cc_rows(spark, edges) == _uf_labels(edges)


def test_cluster_dedup_keeps_component_minimum(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    # components {0,1,2}, {5,6}; 3,4,7 untouched
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in cluster_dedup(docs, pairs).collect())
    assert kept == [0, 3, 4, 5, 7]


def test_max_iter_exhaustion_raises(spark):
    """A non-converged star forest would emit duplicate, inconsistent
    labels downstream — exhausting max_iter must fail loudly (ADVICE r2)."""
    import pytest

    chain = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(df, max_iter=1)
    # and the same graph converges fine with the default budget
    assert _cc_rows(spark, chain) == _uf_labels(chain)
