"""PageRank: hand-checkable graphs + a pure-Python reference twin."""

from __future__ import annotations

import pytest

from data_warehouse_spark.operators import graph


def _py_pagerank(edges, iterations=10, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for a, b in edges:
            contrib[b] += rank[a] / out[a]
        dangling = sum(r for v, r in rank.items() if v not in out)
        base = (1.0 - d) / n + d * dangling / n
        rank = {v: base + d * contrib[v] for v in nodes}
    return rank


def test_pagerank_cycle_is_uniform(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    out = {r["node"]: r["rank"] for r in graph.pagerank(edges, iterations=5).collect()}
    for v in "abc":
        assert out[v] == pytest.approx(1.0 / 3, rel=1e-12)


def test_pagerank_matches_python_reference(spark):
    edges_py = [
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
        ("c", "a"),
        ("d", "c"),  # d is pointed at by nobody; e is dangling
        ("a", "e"),
    ]
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, iterations=10).collect()}
    want = _py_pagerank(edges_py, iterations=10)
    assert set(got) == set(want)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, rel=1e-9), v
    # total mass conserved (dangling correction works)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_parallel_edges_vote_twice(spark):
    # two a->b edges against one a->c: b must outrank c
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], ["src", "dst"]
    )
    out = {r["node"]: r["rank"] for r in graph.pagerank(edges, iterations=4).collect()}
    assert out["b"] > out["c"]


def test_supplier_importance_runs_on_testdata(spark):
    from data_warehouse_spark import catalog as cat

    from .conftest import SF_DIR

    out = graph.supplier_importance(
        cat.load_table(spark, SF_DIR, "lineitem"),
        cat.load_table(spark, SF_DIR, "orders"),
    ).collect()
    assert len(out) > 0
    # suppliers receive all authority: the top-ranked node is a supplier
    assert out[0]["node"].startswith("s")
    assert sum(r["rank"] for r in out) == pytest.approx(1.0, rel=1e-6)
