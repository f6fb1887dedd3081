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


def test_anchor_text_agg_modal_tiebreak(spark):
    from inform_spark.operators.linkgraph import anchor_text_agg

    # dst 1: 'b' wins by count; dst 2: tie between 'a' and 'b' -> 'a'
    # (count DESC, anchor ASC); dst 3: single edge
    edges = spark.createDataFrame(
        [
            (10, 1, "b"), (11, 1, "b"), (12, 1, "a"),
            (10, 2, "b"), (11, 2, "a"),
            (10, 3, "z"),
        ],
        "src long, dst long, anchor string",
    )
    got = {r["dst"]: r for r in anchor_text_agg(edges).collect()}
    assert got[1]["top_anchor"] == "b" and got[1]["top_anchor_cnt"] == 2
    assert got[1]["in_degree"] == 3 and got[1]["n_anchors"] == 2
    assert got[2]["top_anchor"] == "a" and got[2]["top_anchor_cnt"] == 1
    assert got[3]["top_anchor"] == "z" and got[3]["in_degree"] == 1
    # scale property: plan is pure aggregation — no window/sort/cartesian
    plan = anchor_text_agg(edges)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "CartesianProduct" not in plan


def test_trustrank_unreachable_is_zero(spark):
    """Trust flows only FROM seeds: a node with no path from the seed
    set holds exactly zero trust, however high its in-degree — the
    anti-spam property vanilla pagerank lacks."""
    from inform_spark.operators.linkgraph import trustrank

    # 0 -> 1 -> 2 (seeded chain), 3 -> 2 heavily (spam farm into 2),
    # 4 isolated, 3 unlinked-from-seeds
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 2), (3, 2), (3, 2)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(i, i == 0) for i in range(5)], "id long, is_seed boolean"
    )
    t = {r["id"]: r["trust"] for r in trustrank(edges, nodes, 3).collect()}
    assert t[3] == 0 and t[4] == 0  # no path from seed 0
    assert t[0] > 0 and t[1] > 0 and t[2] > 0
    # trust decays with distance from the seed
    assert t[0] > t[1] > t[2]


def test_trustrank_partitioning_independent(spark, graph):
    """Same fixed-point claim as pagerank: identical longs no matter
    the physical layout."""
    from inform_spark.operators.linkgraph import trustrank
    from inform_spark.operators.textops import _h60

    nodes, edges = graph
    seeded = nodes.withColumn(
        "is_seed",
        F.pmod(
            _h60(F.concat(F.lit("trust"), F.col("id").cast("string"))),
            F.lit(8),
        )
        == 0,
    )
    a = {r["id"]: r["trust"] for r in trustrank(edges, seeded, 3).collect()}
    b = {
        r["id"]: r["trust"]
        for r in trustrank(
            edges.repartition(11), seeded.repartition(7), 3
        ).collect()
    }
    assert a == b
    # seeds hold the teleport floor; at least one non-seed earned trust
    seeds = {r["id"] for r in seeded.filter("is_seed").collect()}
    assert all(a[s] >= 150_000 for s in seeds)
    assert any(v > 0 for k, v in a.items() if k not in seeds)


# ---------------------------------------------------------------------------
# HITS + degree stats
# ---------------------------------------------------------------------------


def _ref_hits(edge_list, node_ids, iterations=2, scale=1_000_000):
    """Sequential reference with the same integer arithmetic."""
    hub = {n: scale for n in node_ids}
    auth = {n: scale for n in node_ids}
    for _ in range(iterations):
        araw = {n: 0 for n in node_ids}
        for s, d in edge_list:
            araw[d] += hub[s]
        m = max(max(araw.values()), 1)
        auth = {n: v * scale // m for n, v in araw.items()}
        hraw = {n: 0 for n in node_ids}
        for s, d in edge_list:
            hraw[s] += auth[d]
        m = max(max(hraw.values()), 1)
        hub = {n: v * scale // m for n, v in hraw.items()}
    return {n: (hub[n], auth[n]) for n in node_ids}


def test_hits_matches_reference(spark):
    from inform_spark.operators.linkgraph import hits

    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (4, 4)]
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["id"]: (r["hub"], r["auth"])
        for r in hits(edges, nodes, iterations=2).collect()
    }
    assert got == _ref_hits(edge_list, range(5))


def test_hits_partitioning_invariant(spark):
    from inform_spark.operators.linkgraph import hits, synthetic_edges

    nodes = spark.range(60).select(F.col("id"))
    edges = synthetic_edges(nodes)
    a = sorted(tuple(r) for r in hits(edges, nodes, 2).collect())
    b = sorted(
        tuple(r)
        for r in hits(edges.repartition(7, "dst"), nodes.repartition(3), 2).collect()
    )
    assert a == b
    # top authority is a low-id hub (synthetic graph skews in-degree low)
    top_auth = max(a, key=lambda r: r[2])
    assert top_auth[2] == 1_000_000  # max-normalized: the argmax IS scale


def test_degree_stats(spark):
    from inform_spark.operators.linkgraph import degree_stats

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (0, 2), (2, 2), (3, 0)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = {
        r["id"]: (r["out_deg"], r["in_deg"], r["n_reciprocal"])
        for r in degree_stats(edges, nodes).collect()
    }
    assert got == {
        # multi-edge 0->2 collapsed; 0<->1 reciprocal both sides;
        # 2->2 self-loop is its own reverse; node 4 isolated
        0: (2, 2, 1),
        1: (1, 1, 1),
        2: (1, 2, 1),
        3: (1, 0, 0),
        4: (0, 0, 0),
    }
