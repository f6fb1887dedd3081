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
