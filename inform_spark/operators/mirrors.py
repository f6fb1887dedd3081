"""Host-level mirror detection — hosts serving the same content set.

Mirror farms (the same corpus served under many hostnames: region
mirrors, scraped re-hosts, parked-domain duplicates) are invisible to
doc-level dedup policies that act per URL/host, and they distort every
per-host statistic (reputation, crawl budget, source caps). The
crawl-scale defense is host-PAIR analysis over content fingerprints:
two hosts sharing most of their distinct documents are one logical
site, and the crawler should fold their budgets and keep one.

The reference dedups feed items by id only (src/FeedMonitor.js); it has
no cross-host notion. This operator is the corpus-side analysis a
100 TB crawl runs between snapshots.

Scale design:
- (host, fp) distinct pairs: one shuffle; only a 60-bit hash + host
  string move, never text;
- **fingerprint-spread cap**: a fp present on > ``max_hosts_per_fp``
  hosts (a boilerplate/error page the whole web serves) would fan out
  O(hosts²) pairs while carrying zero mirror signal — exactly the
  stop-term pruning of tfidf_cosine_topk / the degenerate-bucket star
  rewrite of LSH. Such fps are EXCLUDED before the self-join, which
  bounds per-fp pair fan-out at C(cap, 2); host sizes are counted over
  the same eligible-fp set so containment stays a ratio of comparable
  quantities (documented, mirrored in the oracle — the cut is part of
  the operator's spec, not a silent truncation);
- pair counts: self-equi-join on fp (co-partitioned, no cartesian),
  groupBy (host_a, host_b) with map-side combine;
- per-host sizes: a tiny dimension broadcast back.

All ratios are integer ppm (cross-engine exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60


def host_mirror_pairs(
    pages: DataFrame,
    min_shared: int = 3,
    max_hosts_per_fp: int = 64,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """``(host_a, host_b, shared_docs, docs_a, docs_b, containment_ppm,
    jaccard_ppm)`` for every host pair (host_a < host_b) sharing at
    least ``min_shared`` distinct eligible content fingerprints.
    ``containment_ppm`` = shared / min(docs_a, docs_b) — 1e6 means the
    smaller host is entirely contained in the larger (the mirror
    signature); ``jaccard_ppm`` the symmetric overlap."""
    fps = pages.select(
        F.col(host_col).alias("host"), _h60(F.col(text_col)).alias("fp")
    ).distinct()
    spread = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__nh"))
    kept = (
        fps.join(spread, "fp")
        .filter(F.col("__nh") <= max_hosts_per_fp)
        .drop("__nh")
    )
    sizes = kept.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    a = kept.select(F.col("host").alias("host_a"), "fp")
    b = kept.select(F.col("host").alias("host_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_docs"))
        .filter(F.col("shared_docs") >= min_shared)
    )
    out = (
        pairs.join(
            F.broadcast(sizes.select(F.col("host").alias("host_a"),
                                     F.col("n_docs").alias("docs_a"))),
            "host_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_b"),
                                     F.col("n_docs").alias("docs_b"))),
            "host_b",
        )
    )
    return out.select(
        "host_a",
        "host_b",
        "shared_docs",
        F.col("docs_a").cast("long").alias("docs_a"),
        F.col("docs_b").cast("long").alias("docs_b"),
        F.expr(
            "cast(shared_docs * 1000000 div least(docs_a, docs_b) as bigint)"
        ).alias("containment_ppm"),
        F.expr(
            "cast(shared_docs * 1000000 div "
            "(docs_a + docs_b - shared_docs) as bigint)"
        ).alias("jaccard_ppm"),
    )
