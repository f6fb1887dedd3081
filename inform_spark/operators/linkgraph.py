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


# the one edge⋈degree cache a ranker call may pin: each new call
# releases the previous call's (blocking=False), bounding a long
# session's accumulation to a single cached relation — the pin-forever
# class an earlier review pass removed from sitemap expansion
_ACTIVE_EDGE_CACHE: list[DataFrame] = []


def _fixed_point_ranks(
    edges: DataFrame,
    seeded: DataFrame,
    iterations: int,
    damping_num: int,
    damping_den: int,
) -> DataFrame:
    """Shared teleport-weighted power-iteration kernel: ``seeded`` must
    carry (id, init, base) LONG columns — per-node initial mass and
    per-node teleport mass. PageRank is the all-nodes-uniform special
    case, TrustRank the seed-gated one; both inherit the same integer
    arithmetic (associative sums + integer division), so results are
    partitioning- and engine-independent and any fix to the loop
    (join pattern, skew handling, cache discipline) lands in both."""
    while _ACTIVE_EDGE_CACHE:
        _ACTIVE_EDGE_CACHE.pop().unpersist(blocking=False)
    ed = edges.join(out_degrees(edges), "src").persist()
    _ACTIVE_EDGE_CACHE.append(ed)
    ranks = seeded.select("id", F.col("init").cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select(ed["dst"], F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            seeded.join(contrib, seeded["id"] == contrib["dst"], "left")
            .select(
                seeded["id"],
                (
                    F.col("base")
                    + F.expr(f"{damping_num} * coalesce(s, 0) div {damping_den}")
                ).cast("long").alias("rank"),
            )
        )
    return ranks


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
    seeded = nodes.select(
        "id",
        F.lit(scale).cast("long").alias("init"),
        F.lit(base).cast("long").alias("base"),
    )
    return _fixed_point_ranks(
        edges, seeded, iterations, damping_num, damping_den
    )


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


def with_synthetic_anchors(edges: DataFrame, salt: str = "anchor",
                           vocab: int = 5) -> DataFrame:
    """Deterministic anchor text per edge for tests/benchmarks:
    ``'a' ‖ H60(salt‖src‖-‖dst) % vocab`` — the DuckDB oracle rebuilds
    the identical column from the same edge set."""
    from inform_spark.operators.textops import _h60

    return edges.withColumn(
        "anchor",
        F.concat(
            F.lit("a"),
            F.pmod(
                _h60(
                    F.concat(
                        F.lit(salt),
                        F.col("src").cast("string"),
                        F.lit("-"),
                        F.col("dst").cast("string"),
                    )
                ),
                F.lit(vocab),
            ).cast("string"),
        ),
    )


def anchor_text_agg(edges: DataFrame, anchor_col: str = "anchor") -> DataFrame:
    """Anchor-text aggregation per link TARGET — the classic web-scale
    relevance/labeling signal (how the rest of the web describes a
    page), mined from the crawl's discovered link graph the same way
    the reference surfaces per-page link lists (src/WebCrawler.js
    extractLinks) but rolled up across documents.

    Returns (dst, in_degree, n_anchors, top_anchor, top_anchor_cnt):
    total in-links, distinct anchor strings, and the modal anchor with
    deterministic tie-break (count DESC, anchor ASC).

    Scale design: two-phase aggregation. Phase 1 groups by
    (dst, anchor) with map-side partial aggregation, so a hub page
    linked a billion times with the same anchor reduces inside each map
    task before anything shuffles. Phase 2 groups by dst over the
    already-tiny per-anchor counts; the modal pick is an order-free
    ``min(struct(-cnt, anchor))`` — associative, so no window, no sort,
    partitioning-independent. No step is ever proportional to edge
    count after phase 1's combine."""
    per = edges.groupBy("dst", anchor_col).agg(F.count(F.lit(1)).alias("cnt"))
    top = F.min(
        F.struct(
            (-F.col("cnt")).alias("neg_cnt"), F.col(anchor_col).alias("a")
        )
    ).alias("_top")
    return (
        per.groupBy("dst")
        .agg(
            F.sum("cnt").cast("long").alias("in_degree"),
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            top,
        )
        .select(
            "dst",
            "in_degree",
            "n_anchors",
            F.col("_top.a").alias("top_anchor"),
            (-F.col("_top.neg_cnt")).cast("long").alias("top_anchor_cnt"),
        )
    )


def trustrank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
    seed_col: str = "is_seed",
) -> DataFrame:
    """Fixed-point TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB
    2004): PageRank with the teleport mass restricted to a hand- or
    heuristically-labeled TRUSTED seed set, so trust decays with link
    distance from the seeds and link-farm neighborhoods that inflate
    vanilla PageRank stay near zero. In this engine it is the
    spam-aware counterpart to :func:`pagerank` for frontier
    prioritization: `priority_from_rank` accepts its output unchanged,
    and the difference (high pagerank, low trust) is the classic
    spam-mass signal.

    ``nodes`` must carry ``id`` and a boolean ``seed_col``. Returns
    (id, trust, is_seed) with trust a LONG in 1/scale units; seeds
    start at ``scale``, non-seeds at 0, and each iteration applies
    ``trust = seed*(1-d)*scale + d * sum(in-contribs)`` in the same
    integer arithmetic as :func:`pagerank` — associative sums, integer
    division, so the result is partitioning- and engine-independent
    (the DuckDB oracle hash-matches it exactly).

    Scale design is :func:`pagerank`'s — both run the shared
    :func:`_fixed_point_ranks` kernel (the edge⋈out-degree relation
    built once and cached, two shuffles per iteration with map-side
    combine absorbing hub skew, no collect in the loop); trustrank is
    just the seed-gated (init, base) vector."""
    base = (damping_den - damping_num) * scale // damping_den
    seeds = nodes.select(
        "id", F.col(seed_col).cast("boolean").alias("__seed")
    )
    seeded = seeds.select(
        "id",
        F.when(F.col("__seed"), F.lit(scale))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("init"),
        F.when(F.col("__seed"), F.lit(base))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("base"),
    )
    ranks = _fixed_point_ranks(
        edges, seeded, iterations, damping_num, damping_den
    )
    return ranks.join(seeds, "id").select(
        "id",
        F.col("rank").alias("trust"),
        F.col("__seed").alias("is_seed"),
    )


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 2,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg 1999): returns (id, hub, auth) with
    both scores LONGS in units of ``1/scale``, max-normalized to
    exactly ``scale`` each half-step. The classic companion signal to
    :func:`pagerank` for crawl prioritization: authorities are the
    pages worth fetching, hubs the pages worth re-scanning for links.

    Determinism: the usual L2 normalization is replaced by L-infinity
    (divide by the global max, integer ``div``) — associative long
    sums, one scalar aggregate per half-step, no floats anywhere, so
    the result is partitioning-independent and the DuckDB oracle
    hash-matches it. Rank ORDER under max-norm equals L2-norm order
    (normalization is a positive scalar either way).

    Scale: per half-step, one shuffle (groupBy on the receiving side,
    map-side combine absorbing hub skew) plus a 1-row max aggregate
    broadcast back — never a driver-side collect. The raw sums are
    bounded by scale * max_degree = 1e6 * 1e8 < 2^63 for a
    10^8-degree hub, but the normalization numerator s * scale is NOT
    (it overflows long past in-degree ~9.2e6), so it runs in
    decimal(38,0) — 38 digits covers scale^2 * degree up to 10^26 —
    and the quotient (<= scale by construction, since s <= m) casts
    back to long exactly. DuckDB mirrors it with hugeint. Each
    half-step's scores persist (released on the next hits/pagerank
    call via the module cache) so the twice-referenced score relation
    costs one bounded recompute, never a chain that deepens with
    ``iterations``."""
    while _ACTIVE_EDGE_CACHE:
        _ACTIVE_EDGE_CACHE.pop().unpersist(blocking=False)
    norm = F.expr(
        f"cast((cast(s as decimal(38,0)) * {scale}) div m as long)"
    )
    hubs = nodes.select("id", F.lit(scale).cast("long").alias("hub"))
    auths = nodes.select("id", F.lit(scale).cast("long").alias("auth"))
    for _ in range(iterations):
        araw = (
            nodes.join(
                edges.join(hubs, edges["src"] == hubs["id"])
                .groupBy("dst")
                .agg(F.sum("hub").alias("s")),
                nodes["id"] == F.col("dst"),
                "left",
            )
            .select(nodes["id"], F.coalesce("s", F.lit(0)).alias("s"))
        )
        amax = araw.agg(F.greatest(F.max("s"), F.lit(1)).alias("m"))
        auths = (
            araw.join(F.broadcast(amax))
            .select("id", norm.alias("auth"))
            .persist()
        )
        _ACTIVE_EDGE_CACHE.append(auths)
        hraw = (
            nodes.join(
                edges.join(auths, edges["dst"] == auths["id"])
                .groupBy("src")
                .agg(F.sum("auth").alias("s")),
                nodes["id"] == F.col("src"),
                "left",
            )
            .select(nodes["id"], F.coalesce("s", F.lit(0)).alias("s"))
        )
        hmax = hraw.agg(F.greatest(F.max("s"), F.lit(1)).alias("m"))
        hubs = (
            hraw.join(F.broadcast(hmax))
            .select("id", norm.alias("hub"))
            .persist()
        )
        _ACTIVE_EDGE_CACHE.append(hubs)
    return hubs.join(auths, "id").select("id", "hub", "auth")


def degree_stats(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-node link-graph profile: (id, out_deg, in_deg,
    n_reciprocal) — reciprocal = this node's out-edges whose reverse
    edge also exists (multi-edges collapsed first; self-loops count as
    their own reverse, the standard digraph-reciprocity convention).

    Scale: distinct-edge dedup + two degree groupBys + one self-join
    on the reversed key — all equi-shuffles on (src, dst) pairs,
    map-side combine on the degree counts; no window, no collect."""
    de = edges.select("src", "dst").distinct()
    rev = de.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = (
        de.join(rev, ["src", "dst"], "left_semi")
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
        .select(F.col("src").alias("__rid"), "n_reciprocal")
    )
    outd = de.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("out_deg")
    ).select(F.col("src").alias("__oid"), "out_deg")
    ind = de.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("in_deg")
    ).select(F.col("dst").alias("__iid"), "in_deg")
    return (
        nodes.join(outd, nodes["id"] == F.col("__oid"), "left")
        .join(ind, nodes["id"] == F.col("__iid"), "left")
        .join(recip, nodes["id"] == F.col("__rid"), "left")
        .select(
            nodes["id"],
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("n_reciprocal", F.lit(0))
            .cast("long")
            .alias("n_reciprocal"),
        )
    )
