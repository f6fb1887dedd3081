"""Hot-host skew: salted two-phase politeness rank is loss-free, and a
hot-host fixture crawls to the same result regardless of salt fan-out."""

import pytest

from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
from inform_spark.schemas import ROBOTS
from inform_spark.sources.pages import generate_site


@pytest.fixture(scope="module")
def hot_site(spark):
    # host 0 gets 70% of all pages (hot); wide fanout
    pages, robots = generate_site(
        4, 30, hot_host_share=0.7, index_link_cap=None
    )
    pages_df = spark.createDataFrame(pages).cache()
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    ).cache()
    pages_df.count()
    return pages_df, robots_df


def crawl(spark, hot_site, tmp, salts):
    pages_df, robots_df = hot_site
    cfg = CrawlConfig(
        seeds=[f"https://site{h}.test/" for h in range(4)],
        limit=80,
        batch_wall_budget_ms=8000,   # politeness ON: per-host budget binds
        default_delay_ms=1000,
        politeness_salts=salts,
        render_partitions=8,
    )
    eng = CrawlEngine(spark, pages_df, robots_df, cfg, checkpoint_dir=str(tmp))
    eng.run()
    return eng


def test_salted_politeness_equals_unsalted(spark, hot_site, tmp_path):
    a = crawl(spark, hot_site, tmp_path / "salted", salts=8)
    b = crawl(spark, hot_site, tmp_path / "plain", salts=1)
    seen_a = {(r["url"], r["crawl_rank"]) for r in a.seen().collect()}
    seen_b = {(r["url"], r["crawl_rank"]) for r in b.seen().collect()}
    assert seen_a == seen_b


def test_star_pairs_same_clusters_as_all_pairs(spark):
    """Clustering via star pairs must produce the identical transitive
    closure as the O(|bucket|^2) all-pairs expansion — on a corpus with
    real near-dup families AND singletons."""
    from inform_spark.operators import textops
    from inform_spark.operators.components import connected_components

    base = [
        "the quick brown fox jumps over the lazy dog today again",
        "pack my box with five dozen liquor jugs for the party",
        "sphinx of black quartz judge my vow said the old man",
    ]
    rows = []
    for i in range(120):
        fam = i % 3
        # near-dups: same family text with a small suffix tweak every 4th
        suffix = "" if i % 4 else f" v{i % 2}"
        rows.append((i, base[fam] + suffix))
    rows += [(1000 + j, f"totally unique document number {j} content") for j in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bands = textops.minhash_band_keys(docs).persist()
    full = {
        (r["v"], r["component"])
        for r in connected_components(
            textops.pairs_from_bands(bands), "a", "b"
        ).collect()
    }
    star = {
        (r["v"], r["component"])
        for r in connected_components(
            textops.star_pairs_from_bands(bands), "a", "b"
        ).collect()
    }
    bands.unpersist()
    assert star == full


def test_degenerate_bucket_10k_identical_docs(spark):
    """~10k identical docs = ONE giant band bucket per band. The star
    path must complete with O(n) edges (no per-bucket array, no n^2
    expansion) and resolve to a single cluster; the capped all-pairs
    path must bound its output and account for every dropped pair."""
    from inform_spark.operators import textops
    from inform_spark.operators.components import minhash_clusters, minhash_survivors

    n = 10_000
    text = "boilerplate cookie banner accept all cookies to continue reading"
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    bands = textops.minhash_band_keys(docs)
    star = textops.star_pairs_from_bands(bands)
    # no per-bucket array materialization anywhere in the star plan
    plan = star._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" not in plan and "collect_list" not in plan
    assert star.count() == n - 1  # O(|bucket|) edges, not ~5*10^7 pairs
    clusters = minhash_clusters(docs)
    assert clusters.select("cluster_id").distinct().count() == 1
    surv = minhash_survivors(docs).collect()
    assert len(surv) == 1 and surv[0]["n_members"] == n

    # capped exact path: bounded output + never-silent audit
    cap = 50
    pairs, audit = textops.pairs_from_bands_capped(bands, cap)
    assert pairs.count() == cap * (cap - 1) // 2
    arow = audit.collect()
    # every band of the signature maps the identical docs to one bucket
    assert all(r["bucket_n"] == n for r in arow)
    assert all(
        r["n_dropped_pairs"] == n * (n - 1) // 2 - cap * (cap - 1) // 2
        for r in arow
    )


def test_budget_binds_per_host(spark, hot_site, tmp_path):
    eng = crawl(spark, hot_site, tmp_path / "budget", salts=8)
    lineage = eng.lineage().orderBy("batch_id").collect()
    # with budget 8000/1000ms = 8 per host and 4 hosts, no batch after the
    # seeds may attempt more than 8 urls of one host
    per_batch = (
        eng.seen()
        .groupBy("attempted_in_batch")
        .count()
        .collect()
    )
    assert all(r["count"] <= 8 * 4 for r in per_batch)
    assert len(lineage) >= 2


def test_semdedup_degenerate_cell(spark):
    """A boilerplate class of 2,000 byte-identical vectors lands in ONE
    cell: since round 4, semdedup pre-collapses exact-identical vectors
    to their min-id representative BEFORE cell assignment, so the
    cell-scoped pair join runs at O(distinct) — the counters prove the
    join saw 2 representatives, not 2,002 rows — while the family still
    resolves to one component with one survivor."""
    from pyspark.sql import functions as F

    from inform_spark.operators.similarity import semdedup

    base = spark.range(2_000).select(
        (F.col("id") + 100).alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)).alias(
            "embedding"
        ),
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    counters = {}
    out = semdedup(
        cents.unionByName(base), n_cells=2, tau=0.99, _counters=counters
    )
    fam = out.filter(F.col("component") == 0)
    assert fam.count() == 2_001  # centroid 0 + the 2,000 copies
    assert fam.filter("keep = 1").count() == 1
    assert out.filter("keep = 1").count() == 2  # + centroid 1's singleton
    # the degenerate class collapsed: 2,002 inputs -> 2 distinct vectors,
    # and the tau-pair join produced ZERO pairs (the copies' edges are
    # implied by the collapse, never materialized)
    assert counters["n_input"] == 2_002
    assert counters["n_reps"] == 2
    assert counters["n_rep_pairs"] == 0
