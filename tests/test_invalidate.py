"""Invalidation / recrawl / revocation — the deletable-seen-set workflow.

The reference keeps its seen set in an in-memory Set that dies with the
process (src/WebCrawler.js:54), so it has no invalidation story; the
north_star pins one ("bloom-filter with cuckoo-filter fallback for
deletes"). These tests lock the contract:

- invalidate(urls): tombstones the attempts, the URLs are re-fetched on
  resume, views show exactly one (latest) row per URL afterwards
- invalidate(urls, revoke=True): additionally forgets the frontier rows,
  so a later re-discovery re-admits the URL as brand new; with
  seen_filter='cuckoo' the pre-probe itself unlearns the key (delete),
  with a bloom it degrades to a safe exact re-check — both end states
  must be identical
"""

import pytest
from pyspark.sql import functions as F

from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
from inform_spark.schemas import ROBOTS
from inform_spark.sources.pages import generate_site


@pytest.fixture(scope="module")
def site(spark):
    pages, robots = generate_site(2, 22)
    pages_df = spark.createDataFrame(pages).cache()
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    )
    yield pages_df, robots_df
    pages_df.unpersist()


def _crawl(spark, site, ck, **cfg_kw):
    pages_df, robots_df = site
    cfg = CrawlConfig(seeds=["https://site0.test/"], limit=500, **cfg_kw)
    eng = CrawlEngine(spark, pages_df, robots_df, cfg, checkpoint_dir=str(ck))
    eng.run()
    return eng


def test_invalidate_recrawls_only_targets(spark, site, tmp_path):
    eng = _crawl(spark, site, tmp_path / "ck1")
    before = {r["url"]: r for r in eng.seen().collect()}
    n_before = len(before)
    targets = ["https://site0.test/docs", "https://site0.test/guide"]
    assert all(t in before for t in targets)
    last_batch = max(r["attempted_in_batch"] for r in before.values())

    assert eng.invalidate(targets) == 2
    # the targets fall out of the seen view until re-fetched
    live_gone = {r["url"] for r in eng.seen().collect()}
    assert set(targets).isdisjoint(live_gone)

    s = eng.run(resume=True)
    assert s.attempted == 2  # exactly the invalidated urls, nothing else
    after = {r["url"]: r for r in eng.seen().collect()}
    assert len(after) == n_before  # one row per url again
    for t in targets:
        assert after[t]["attempted_in_batch"] > last_batch
    # untouched urls keep their original rows
    for u, r in before.items():
        if u not in targets:
            assert after[u]["crawl_rank"] == r["crawl_rank"]
    # crawl ranks stay globally distinct (re-attempts extend the order)
    ranks = [r["crawl_rank"] for r in after.values()]
    assert len(ranks) == len(set(ranks))
    # documents view: single (fresh) doc per re-crawled url
    docs = eng.documents().filter(F.col("url").isin(targets)).collect()
    assert len(docs) == 2
    assert all(d["batch_id"] > last_batch for d in docs)


def _revoke_scenario(spark, site, ck, **cfg_kw):
    """Full crawl, then revoke a leaf X and invalidate its parent P; on
    resume P is re-fetched, re-discovers X, and X — being revoked — is
    re-admitted as brand new and fetched again."""
    eng = _crawl(spark, site, ck, **cfg_kw)
    parent = "https://site0.test/docs"
    leaf = "https://site0.test/docs/item-0"
    eng.invalidate([parent])
    eng.invalidate([leaf], revoke=True)
    s = eng.run(resume=True)
    return eng, parent, leaf, s


def test_revoke_readmits_fresh(spark, site, tmp_path):
    eng, parent, leaf, s = _revoke_scenario(spark, site, tmp_path / "ck2")
    # parent re-fetch (batch 1) + readmitted leaf fetch (batch 2)
    assert s.attempted == 2
    # raw storage keeps full history: two attempts of each
    raw = eng.catalog.tables["attempts"].read()
    assert raw.filter(F.col("url") == leaf).count() == 2
    # the leaf re-entered the frontier as a NEW row with a fresh offset
    fr = eng.catalog.tables["frontier"].read().filter(F.col("url") == leaf)
    assert fr.count() == 2
    offs = sorted(r["frontier_offset"] for r in fr.collect())
    assert offs[1] > offs[0]
    # net views: exactly one live row per url
    seen = {r["url"]: r for r in eng.seen().collect()}
    assert leaf in seen and parent in seen
    ranks = [r["crawl_rank"] for r in seen.values()]
    assert len(ranks) == len(set(ranks))


def test_revoke_cuckoo_deletes_from_probe(spark, site, tmp_path):
    eng, parent, leaf, s = _revoke_scenario(
        spark, site, tmp_path / "ck3",
        use_bloom=True, seen_filter="cuckoo",
        bloom_shards=4, bloom_bits_per_shard=1 << 16,
    )
    assert s.attempted == 2
    assert eng.catalog.tables["attempts"].read().filter(
        F.col("url") == leaf
    ).count() == 2


def test_revoke_bloom_and_cuckoo_end_states_match(spark, site, tmp_path):
    eng_b, _, _, s_b = _revoke_scenario(
        spark, site, tmp_path / "ck4",
        use_bloom=True, bloom_shards=4, bloom_bits_per_shard=1 << 18,
    )
    eng_c, _, _, s_c = _revoke_scenario(
        spark, site, tmp_path / "ck5",
        use_bloom=True, seen_filter="cuckoo",
        bloom_shards=4, bloom_bits_per_shard=1 << 16,
    )
    assert s_b.attempted == s_c.attempted == 2
    sb = {(r["url"], r["status"]) for r in eng_b.seen().collect()}
    sc = {(r["url"], r["status"]) for r in eng_c.seen().collect()}
    assert sb == sc


def test_invalidate_from_fresh_engine_via_checkpoint(spark, site, tmp_path):
    ck = tmp_path / "ck6"
    eng1 = _crawl(spark, site, ck)
    n = eng1.seen().count()
    target = "https://site0.test/blog"
    # a brand-new engine object pointed at the checkpoint: invalidate must
    # auto-restore, persist the tombstone, and resume correctly
    pages_df, robots_df = site
    eng2 = CrawlEngine(
        spark, pages_df, robots_df,
        CrawlConfig(seeds=["https://site0.test/"], limit=500),
        checkpoint_dir=str(ck),
    )
    eng2.invalidate([target])
    s = eng2.run(resume=True)
    assert s.attempted == 1
    after = {r["url"]: r["attempted_in_batch"] for r in eng2.seen().collect()}
    assert len(after) == n
