"""Redirect-chain resolution — pointer jumping over the redirect graph.

A web-scale crawl accumulates a large functional graph of 3xx edges
(src → Location). Frontier admission, dedup keys, and link-graph
analysis all need the FINAL target of each chain: following chains
one hop per crawl batch wastes fetches, and naive per-row loops don't
distribute. The reference follows redirects inline per request (urllib
default in this repo's fetch stage, src/WebCrawler.js fetch) and keeps
no graph; the corpus-side resolver is what lets a crawler canonicalize
frontier URLs WITHOUT re-fetching.

Algorithm: pointer jumping (the components/tree-contraction classic):
``rounds`` iterations of f ← f∘f give every chain up to 2^rounds hops
in O(log) self-joins — never a per-hop sequential walk. ``max_hops``
is REQUIRED to be 2^rounds so the capped semantics are an exact closed
form (final = f^max_hops), reproducible by a bounded recursive CTE in
any engine: chains longer than max_hops (including genuine cycles)
come back ``unresolved`` with hops = max_hops.

Scale: each round is one self-equi-join on the jump target + the
distance sum; the state is (url, final, hops) — three columns, never
the page bodies. Multiple out-edges per src (a URL observed with
different Locations across snapshots) normalize to min(dst) first so
the graph is functional and the result deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``(url, final_url, hops, unresolved)`` for every distinct src of
    the redirect graph. ``max_hops`` must be a power of two (the
    pointer-jumping round count is log2 of it)."""
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    rounds = max_hops.bit_length() - 1
    f = (
        edges.groupBy(F.col(src_col).alias("u"))
        .agg(F.min(F.col(dst_col)).alias("f"))
        .withColumn("d", F.lit(1).cast("long"))
    )
    f = f.persist()
    f.count()
    for _ in range(rounds):
        nxt = f.select(
            F.col("u").alias("__t"),
            F.col("f").alias("__tf"),
            F.col("d").alias("__td"),
        )
        f2 = (
            f.join(nxt, f["f"] == nxt["__t"], "left")
            .select(
                "u",
                F.coalesce("__tf", "f").alias("f"),
                (F.col("d") + F.coalesce("__td", F.lit(0)))
                # exact up to the cap; past it only "unresolved" matters
                .cast("long")
                .alias("d"),
            )
            .persist()
        )
        f2.count()
        f.unpersist()
        f = f2
    # the returned plan reads the final iterate twice (mapping + the
    # has-out-edge probe); localCheckpoint pins it once and lets the
    # loop's last persist be released — no session-lifetime leak
    final = f.localCheckpoint(eager=True)
    f.unpersist()
    f = final
    has_out = f.select(F.col("u").alias("__src")).distinct()
    out = f.join(has_out, f["f"] == has_out["__src"], "left").select(
        F.col("u").alias("url"),
        F.col("f").alias("final_url"),
        F.least(F.col("d"), F.lit(max_hops)).cast("long").alias("hops"),
        F.col("__src").isNotNull().alias("unresolved"),
    )
    return out
