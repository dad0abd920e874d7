"""pipeline.graph.pagerank — numpy power-iteration parity, the
Σ rank = 1 invariant, dangling handling, and argument gates."""

from __future__ import annotations

import numpy as np
import pytest

from xarray_scipy_spark.pipeline import pagerank


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {i: [] for i in range(n)}
    for s, t in edges:
        out[idx[s]].append(idx[t])
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        new = np.full(n, (1.0 - d) / n)
        dm = sum(r[v] for v in range(n) if not out[v])
        new += d * dm / n
        for v, ds in out.items():
            for u in ds:
                new[u] += d * r[v] / len(ds)
        r = new
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (4, 2), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=12).collect()}
    exp = _numpy_pagerank(edges, n_iter=12)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_larger_random_graph_parity(spark):
    rng = np.random.default_rng(3)
    edges = list(
        {
            (int(s), int(t))
            for s, t in zip(
                rng.integers(0, 40, 300), rng.integers(0, 40, 300)
            )
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    exp = _numpy_pagerank(edges, n_iter=10)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-11)


def test_pagerank_all_dangling_stays_uniform(spark):
    # one edge into a sink: after many iterations ranks still sum to 1
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=7).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert got[2] > got[1]  # the sink receives, never sends


def test_pagerank_zero_iterations_is_uniform(spark):
    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=0).collect()}
    assert got == {0: pytest.approx(0.5), 1: pytest.approx(0.5)}


def test_pagerank_argument_gates(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
