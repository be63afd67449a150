"""Integer-exact PageRank (operators/graph.py)."""

import pytest


def _py_pagerank(edges, iters=3, scale=1_000_000, num=85, den=100):
    base = scale * (den - num) // den
    nodes = {n for e in edges for n in e}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: scale for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += r[s] // outdeg[s]
        r = {n: base + (num * inc[n]) // den for n in nodes}
    return r


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 1)],                       # cycle: symmetric ranks
        [(1, 2), (3, 2), (4, 2), (2, 1)],               # hub node 2
        [(1, 2), (1, 3), (2, 3)],                       # node 3 dangling (leaks)
    ],
)
def test_pagerank_matches_python_mirror(spark, edges):
    from whatsapp_vectordb_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=3).collect()}
    assert got == _py_pagerank(edges)


def test_pagerank_hub_ranks_highest(spark):
    from whatsapp_vectordb_spark.operators.graph import pagerank

    edges = [(i, 99) for i in range(1, 9)] + [(99, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=5).collect()}
    assert max(got, key=got.get) == 99


def test_pagerank_rejects_zero_iters(spark):
    from whatsapp_vectordb_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


class TestTriangleCount:
    def test_known_graph(self, spark):
        from whatsapp_vectordb_spark.operators.graph import triangle_count

        # K4 minus edge (3,4): triangles {1,2,3}, {1,2,4}; dup/reversed/self
        # edges must collapse
        edges = spark.createDataFrame(
            [
                (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4),
                (3, 3),  # self-loop dropped
                (4, 2),  # duplicate of (2, 4)
            ],
            "src long, dst long",
        )
        r = triangle_count(edges).head()
        assert (r["n_triangles"], r["n_edges"], r["n_nodes"]) == (2, 5, 4)

    def test_triangle_free_graph(self, spark):
        from whatsapp_vectordb_spark.operators.graph import triangle_count

        # a path 1-2-3-4 has wedges but no triangles
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
        r = triangle_count(edges).head()
        assert (r["n_triangles"], r["n_edges"], r["n_nodes"]) == (0, 3, 4)
