"""Sitemap source (sources/sitemaps.py): protocol parsing, robots.txt
discovery, and bounded breadth-first index expansion with cycle safety."""

import pytest
from pyspark.sql import Row

from inform_spark.sources import sitemaps

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.test/1</loc><lastmod>2026-02-03</lastmod>"
    "<changefreq>daily</changefreq><priority>0.8</priority></url>"
    "<url><loc>https://a.test/2</loc></url>"
    "<url><priority>0.5</priority></url>"  # no loc -> dropped
    "</urlset>"
)

INDEX = (
    '<?xml version="1.0"?>'
    "<sitemapindex><sitemap><loc>https://a.test/s1.xml</loc>"
    "<lastmod>2026-01-01</lastmod></sitemap>"
    "<sitemap><loc>https://a.test/s2.xml</loc></sitemap></sitemapindex>"
)


def test_parse_urlset_with_namespace():
    entries = sitemaps.parse_sitemap_xml(URLSET)
    assert [e["loc"] for e in entries] == ["https://a.test/1", "https://a.test/2"]
    assert entries[0]["lastmod"] == "2026-02-03"
    assert entries[0]["changefreq"] == "daily"
    assert entries[0]["priority"] == 0.8
    assert entries[1]["priority"] is None
    assert all(e["kind"] == "url" for e in entries)


def test_parse_sitemapindex():
    entries = sitemaps.parse_sitemap_xml(INDEX)
    assert [e["loc"] for e in entries] == [
        "https://a.test/s1.xml", "https://a.test/s2.xml"
    ]
    assert all(e["kind"] == "sitemap" for e in entries)


def test_malformed_and_foreign_xml_yield_nothing():
    assert sitemaps.parse_sitemap_xml("<urlset><url><loc>x") == []
    assert sitemaps.parse_sitemap_xml("<rss><channel/></rss>") == []
    assert sitemaps.parse_sitemap_xml("") == []
    # bad priority string -> None, entry kept
    bad = "<urlset><url><loc>https://a.test/p</loc><priority>high</priority></url></urlset>"
    (e,) = sitemaps.parse_sitemap_xml(bad)
    assert e["priority"] is None


def test_sitemap_urls_from_robots():
    txt = (
        "User-agent: *\nDisallow: /admin/\n"
        "Sitemap: https://a.test/sitemap.xml  # comment\n"
        "User-agent: other\nDisallow: /\n"
        "sitemap: https://cdn.other.test/map.xml\n"
    )
    assert sitemaps.sitemap_urls_from_robots(txt) == [
        "https://a.test/sitemap.xml",
        "https://cdn.other.test/map.xml",
    ]
    assert sitemaps.sitemap_urls_from_robots("") == []


def test_parse_sitemaps_df(spark):
    from inform_spark.session import ship_package

    ship_package(spark)
    df = spark.createDataFrame(
        [Row(url="https://a.test/sm.xml", body=URLSET),
         Row(url="https://a.test/idx.xml", body=INDEX),
         Row(url="https://a.test/broken.xml", body="not xml")]
    )
    rows = sitemaps.parse_sitemaps(df).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert len(by_kind["url"]) == 2
    assert len(by_kind["sitemap"]) == 2
    assert all(r["sitemap_url"] == "https://a.test/sm.xml" for r in by_kind["url"])


def _fixture_fetcher(spark, site: dict):
    from inform_spark.session import ship_package

    ship_package(spark)

    def fetch(urls):
        return spark.createDataFrame(
            [Row(url=u, body=site.get(u, "")) for u in urls]
        )

    return fetch


def test_expand_index_two_levels(spark):
    site = {
        "https://a.test/idx.xml": INDEX,
        "https://a.test/s1.xml": (
            "<urlset><url><loc>https://a.test/page1</loc></url></urlset>"
        ),
        "https://a.test/s2.xml": (
            "<urlset><url><loc>https://a.test/page2</loc></url>"
            "<url><loc>https://a.test/page3</loc></url></urlset>"
        ),
    }
    out = sitemaps.expand_sitemap_index(
        _fixture_fetcher(spark, site), ["https://a.test/idx.xml"]
    )
    locs = sorted(r["loc"] for r in out.collect())
    assert locs == [
        "https://a.test/page1", "https://a.test/page2", "https://a.test/page3"
    ]


def test_expand_index_cycle_terminates(spark):
    site = {
        "https://a.test/x.xml": (
            "<sitemapindex><sitemap><loc>https://a.test/y.xml</loc>"
            "</sitemap></sitemapindex>"
        ),
        "https://a.test/y.xml": (
            "<sitemapindex><sitemap><loc>https://a.test/x.xml</loc>"
            "</sitemap><sitemap><loc>https://a.test/z.xml</loc>"
            "</sitemap></sitemapindex>"
        ),
        "https://a.test/z.xml": (
            "<urlset><url><loc>https://a.test/leaf</loc></url></urlset>"
        ),
    }
    out = sitemaps.expand_sitemap_index(
        _fixture_fetcher(spark, site), ["https://a.test/x.xml"], max_depth=5
    )
    assert [r["loc"] for r in out.collect()] == ["https://a.test/leaf"]


def test_expand_index_fetches_each_child_once(spark):
    # two sibling indexes list the SAME child: it must be fetched once
    # and its URLs must not be duplicated in the result
    calls = []
    site = {
        "https://a.test/i.xml": (
            "<sitemapindex>"
            "<sitemap><loc>https://a.test/c1.xml</loc></sitemap>"
            "<sitemap><loc>https://a.test/c2.xml</loc></sitemap>"
            "</sitemapindex>"
        ),
        "https://a.test/c1.xml": (
            "<sitemapindex><sitemap><loc>https://a.test/shared.xml</loc>"
            "</sitemap></sitemapindex>"
        ),
        "https://a.test/c2.xml": (
            "<sitemapindex><sitemap><loc>https://a.test/shared.xml</loc>"
            "</sitemap></sitemapindex>"
        ),
        "https://a.test/shared.xml": (
            "<urlset><url><loc>https://a.test/leaf</loc></url></urlset>"
        ),
    }
    base = _fixture_fetcher(spark, site)

    def counting_fetch(urls):
        calls.append(list(urls))
        return base(urls)

    out = sitemaps.expand_sitemap_index(
        counting_fetch, ["https://a.test/i.xml"]
    )
    assert [r["loc"] for r in out.collect()] == ["https://a.test/leaf"]
    fetched = [u for lvl in calls for u in lvl]
    assert len(fetched) == len(set(fetched)), fetched


def test_expand_index_depth_bound(spark):
    # a chain deeper than max_depth: deepest urlset never reached
    site = {
        f"https://a.test/d{i}.xml": (
            f"<sitemapindex><sitemap><loc>https://a.test/d{i+1}.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        for i in range(6)
    }
    site["https://a.test/d6.xml"] = (
        "<urlset><url><loc>https://a.test/deep</loc></url></urlset>"
    )
    out = sitemaps.expand_sitemap_index(
        _fixture_fetcher(spark, site), ["https://a.test/d0.xml"], max_depth=3
    )
    assert out.count() == 0


def test_sitemap_inventory_seeds_the_crawl_engine(spark, tmp_path):
    """End-to-end composition: robots `Sitemap:` discovery -> index
    expansion -> inventory URLs feed CrawlConfig.seeds_df (the
    distributed bulk-seeding path) -> the engine crawls exactly those
    pages plus what they link to, without the inventory ever being
    collected to the driver as a seed list."""
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.schemas import ROBOTS
    from inform_spark.sources.pages import generate_site

    pages, robots = generate_site(2, 10)
    pages_df = spark.createDataFrame(pages).cache()
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    ).cache()

    robots_txt = "User-agent: *\nSitemap: https://site0.test/sitemap.xml\n"
    discovered = sitemaps.sitemap_urls_from_robots(robots_txt)
    assert discovered == ["https://site0.test/sitemap.xml"]
    site = {
        "https://site0.test/sitemap.xml": (
            "<urlset>"
            "<url><loc>https://site0.test/docs</loc></url>"
            "<url><loc>https://site0.test/blog</loc></url>"
            "</urlset>"
        ),
    }
    inv = sitemaps.expand_sitemap_index(_fixture_fetcher(spark, site), discovered)
    eng = CrawlEngine(
        spark,
        pages_df,
        robots_df,
        CrawlConfig(
            seeds=["https://site0.test/"],  # host scope
            seeds_df=inv.selectExpr("loc as url"),
            limit=30,
        ),
        checkpoint_dir=str(tmp_path / "smck"),
    )
    eng.run()
    seen = [r["url"] for r in eng.seen().collect()]
    assert "https://site0.test/docs" in seen
    assert "https://site0.test/blog" in seen
    # the sitemap seeds were the frontier roots: the home page is only
    # crawled if some sitemap page links back to it
    ranks = {
        r["url"]: r["crawl_rank"]
        for r in eng.seen().orderBy("crawl_rank").collect()
    }
    first_two = sorted(u for u, k in ranks.items() if k <= 2)
    assert first_two == [
        "https://site0.test/blog", "https://site0.test/docs"
    ]
