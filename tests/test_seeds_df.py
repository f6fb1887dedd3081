"""Distributed DataFrame seeding (CrawlConfig.seeds_df) — the bulk
recrawl path: seeding must never collect to the driver, and a df-seeded
crawl must behave exactly like a list-seeded crawl over the sorted
equivalent seed list."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
from inform_spark.sources.pages import generate_site

N_HOSTS = 3
PAGES_PER_HOST = 10


@pytest.fixture(scope="module")
def site_dfs(spark):
    pages, robots = generate_site(N_HOSTS, PAGES_PER_HOST)
    from inform_spark.schemas import ROBOTS

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


def test_df_seeding_equals_list_seeding(spark, site_dfs, tmp_path):
    pages_df, robots_df = site_dfs
    seeds = [f"https://site{i}.test/" for i in range(N_HOSTS)]

    lst = CrawlEngine(
        spark,
        pages_df,
        robots_df,
        CrawlConfig(seeds=sorted(seeds), limit=40),
        checkpoint_dir=str(tmp_path / "list"),
    )
    lst.run()

    sdf = spark.createDataFrame(
        [(s,) for s in seeds] + [(seeds[0],)],  # duplicate must dedup
        "url string",
    ).repartition(4)
    dfe = CrawlEngine(
        spark,
        pages_df,
        robots_df,
        # seeds list still provides the host scope; seeds_df the frontier
        CrawlConfig(seeds=seeds, seeds_df=sdf, limit=40),
        checkpoint_dir=str(tmp_path / "df"),
    )
    dfe.run()

    a = sorted(
        (r["url"], r["status"], r["crawl_rank"]) for r in lst.seen().collect()
    )
    b = sorted(
        (r["url"], r["status"], r["crawl_rank"]) for r in dfe.seen().collect()
    )
    assert a == b
    # documents byte-equal too
    da = sorted(str(r) for r in lst.documents().select("doc_id", "spans").collect())
    db = sorted(str(r) for r in dfe.documents().select("doc_id", "spans").collect())
    assert da == db


def test_df_seeding_open_scope(spark, site_dfs, tmp_path):
    """seeds_df with an empty seeds list: scope is open — URLs from any
    seeded host are admitted, links crawl onward."""
    pages_df, robots_df = site_dfs
    sdf = spark.createDataFrame(
        [(f"https://site{i}.test/",) for i in range(N_HOSTS)], "url string"
    )
    eng = CrawlEngine(
        spark,
        pages_df,
        robots_df,
        CrawlConfig(seeds=[], seeds_df=sdf, limit=20),
        checkpoint_dir=str(tmp_path / "open"),
    )
    summary = eng.run()
    assert summary.attempted == 20
    hosts = {
        r["url"].split("/")[2] for r in eng.seen().collect()
    }
    assert len(hosts) == N_HOSTS  # all three seeded sites crawled


def test_df_seeding_priority_column(spark, site_dfs, tmp_path):
    """A priority column in seeds_df orders batch admission (LOWER pops
    first, matching the engine's priority-queue convention; ties break
    by frontier offset). site1 gets the lower value so it must be
    attempted first despite sorting after site0 by URL."""
    pages_df, robots_df = site_dfs
    sdf = spark.createDataFrame(
        [("https://site0.test/", 5), ("https://site1.test/", 0)],
        "url string, priority int",
    )
    eng = CrawlEngine(
        spark,
        pages_df,
        robots_df,
        CrawlConfig(seeds=[], seeds_df=sdf, limit=2, batch_size=1),
        checkpoint_dir=str(tmp_path / "prio"),
    )
    eng.run()
    rows = sorted(
        eng.seen().collect(), key=lambda r: r["crawl_rank"]
    )
    assert [r["url"] for r in rows][0] == "https://site1.test/"
