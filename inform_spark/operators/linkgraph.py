"""Link-graph analytics for crawl prioritization — fixed-point PageRank.

The reference crawls strictly FIFO (src/WebCrawler.js:248-249); this
engine's frontier already carries a ``priority`` dimension (plans/
crawl.py — higher priority is admitted first within the politeness
budget). A production crawler sets that priority from the link graph it
has already discovered: pages many crawled pages point to are fetched
first. This module computes that signal as a DataFrame-iterative
PageRank over the discovered edge set, plus the trivial in-degree prior.

Determinism at scale — the reason for fixed-point: float PageRank sums
are shuffle-order-dependent (FP addition is not associative), so two
runs of the same job can rank ties differently and a DuckDB oracle can
never hash-match. Here every quantity is a LONG: ranks are scaled by
``scale`` (default 1e6), each node ships ``rank div out_degree`` to its
targets (integer division; the dropped remainder is deterministic), and
the damping update is ``(1-d)*scale + (d_num * sum) div d_den`` in
integer arithmetic. Exact associativity of integer sums makes the
result independent of partitioning, execution order, and engine.

Scale design:
- ``edges`` (src, dst) is joined with out-degrees ONCE and cached; each
  iteration is exactly two shuffles: ranks→src join (reuses the hash
  partitioning ranks already has from the previous groupBy when the
  shuffle-partition counts line up — EnsureRequirements elides the
  exchange) and the contribution groupBy(dst) with map-side partial
  aggregation.
- No collect() in the loop; the driver only counts iterations.
- Skewed in-degree (everyone links to the hub) is absorbed by the
  partial aggregation: per-partition sums reduce before the shuffle.
- Ranks feed back into the frontier as ``priority`` via a broadcast (or
  bucketed, at 10^10) join on host — see :func:`priority_from_rank`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def out_degrees(edges: DataFrame) -> DataFrame:
    """(src, deg) — multi-edges count multiply (both engines agree)."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-point PageRank: returns (id, rank) with rank a LONG in
    units of ``1/scale``. ``nodes`` must have column ``id``; ``edges``
    columns ``src``/``dst`` referencing ids. Dangling mass is dropped
    (deterministically) — ranks are a priority signal, not a
    probability distribution."""
    base = (damping_den - damping_num) * scale // damping_den
    ed = edges.join(out_degrees(edges), "src").persist()
    ranks = nodes.select("id", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select(ed["dst"], F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                nodes["id"],
                (
                    F.lit(base)
                    + F.expr(f"{damping_num} * coalesce(s, 0) div {damping_den}")
                ).cast("long").alias("rank"),
            )
        )
    return ranks


def priority_from_rank(
    frontier: DataFrame,
    ranks: DataFrame,
    key: str = "host",
    levels: int = 8,
    scale: int = SCALE,
) -> DataFrame:
    """Fold graph ranks into the frontier's ``priority`` column: rank
    quantized to ``levels`` buckets relative to ``scale`` (priority 0 =
    unranked/lowest). Broadcast join — the rank table is hosts, orders
    of magnitude smaller than the frontier; at 10^10 frontier scale with
    10^8 hosts, swap the broadcast for a bucketed join on ``key``."""
    r = ranks.select(
        F.col("id").alias(key),
        F.least(
            F.lit(levels - 1),
            F.expr(f"rank div {max(scale // levels, 1)}"),
        ).cast("int").alias("__prio"),
    )
    return (
        frontier.join(F.broadcast(r), key, "left")
        .withColumn("priority", F.coalesce(F.col("__prio"), F.lit(0)))
        .drop("__prio")
    )


def synthetic_edges(nodes: DataFrame, salt: str = "edge") -> DataFrame:
    """Deterministic test/bench edge set over (id) nodes: node i emits
    ``1 + i % 3`` edges whose targets are ``H60(salt‖i‖-‖k) % n`` —
    reproducible in DuckDB (the oracle builds the identical graph).
    The modulus makes low ids hubs: a realistic skewed in-degree."""
    from inform_spark.operators.textops import _h60

    n = nodes.count()
    fan = F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(3)).cast("int"))
    return (
        nodes.select(F.col("id").alias("src"), F.explode(fan).alias("k"))
        .select(
            "src",
            F.pmod(
                _h60(
                    F.concat(
                        F.lit(salt),
                        F.col("src").cast("string"),
                        F.lit("-"),
                        F.col("k").cast("string"),
                    )
                ),
                F.lit(n),
            ).cast("long").alias("dst"),
        )
    )
