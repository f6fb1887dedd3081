"""Fixed-point PageRank / frontier-priority semantics (operators/linkgraph).

Cross-engine exactness is pinned by the driver oracle (link_pagerank);
these tests pin partitioning-independence (the fixed-point design
claim), hub ordering, and the rank→priority fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.linkgraph import (
    pagerank,
    priority_from_rank,
    synthetic_edges,
)


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.range(60).select(F.col("id").cast("long"))
    edges = synthetic_edges(nodes).cache()
    return nodes, edges


def test_rank_partitioning_independent(spark, graph):
    """The fixed-point claim: identical longs no matter the layout."""
    nodes, edges = graph
    a = {r["id"]: r["rank"] for r in pagerank(edges, nodes, 3).collect()}
    b = {
        r["id"]: r["rank"]
        for r in pagerank(
            edges.repartition(13), nodes.repartition(5), 3
        ).collect()
    }
    assert a == b


def test_hubs_outrank_leaves(spark, graph):
    """synthetic_edges targets H60 % n — every node gets hit roughly
    uniformly, but nodes nothing points to must sit at the damping
    floor while any linked node sits above it."""
    nodes, edges = graph
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, nodes, 3).collect()}
    targets = {r["dst"] for r in edges.collect()}
    floor = 150_000  # (1-d) * scale with d=0.85
    for nid, rank in ranks.items():
        if nid not in targets:
            assert rank == floor
        else:
            assert rank > floor
    # total mass never exceeds the initial scale * n (division drops
    # remainders; damping leaks dangling mass)
    assert sum(ranks.values()) <= 1_000_000 * len(ranks)


def test_priority_from_rank(spark, graph):
    nodes, edges = graph
    ranks = pagerank(edges, nodes, 3).select(
        F.col("id").cast("string").alias("id"), "rank"
    )
    frontier = spark.createDataFrame(
        [(str(i), f"https://h{i}/x", 0) for i in range(70)],
        "host string, url string, priority int",
    )
    out = priority_from_rank(frontier, ranks, key="host").collect()
    assert len(out) == 70
    got = {r["host"]: r["priority"] for r in out}
    rank_map = {r["id"]: r["rank"] for r in ranks.collect()}
    for host, prio in got.items():
        if host in rank_map:
            assert prio == min(7, rank_map[host] // (1_000_000 // 8))
        else:
            assert prio == 0  # unranked hosts (60..69) default to lowest
    assert 0 <= min(got.values()) and max(got.values()) <= 7
