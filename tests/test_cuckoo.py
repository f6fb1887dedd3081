"""Sharded cuckoo filter: membership, deletes, and drop-in engine parity."""

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.bloom import _with_hashes
from inform_spark.operators.cuckoo import ShardedCuckoo


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _probe(spark, filt, urls):
    df = _with_hashes(_urls_df(spark, urls))
    probe = filt.probe_udf(spark)
    rows = df.withColumn("m", probe(F.col("__h1"), F.col("__h2"))).select(
        "url", "m"
    ).collect()
    return {r["url"]: r["m"] for r in rows}


URLS = [f"https://site{i % 7}.test/page-{i}" for i in range(3000)]
OTHERS = [f"https://other{i % 5}.test/x-{i}" for i in range(3000)]


@pytest.fixture(scope="module")
def built(spark):
    return ShardedCuckoo.build(
        spark, _urls_df(spark, URLS), n_shards=8, buckets_per_shard=1 << 11
    )


def test_no_false_negatives(spark, built):
    got = _probe(spark, built, URLS)
    assert all(got.values()), "inserted key reported absent"


def test_false_positive_rate_sane(spark, built):
    got = _probe(spark, built, OTHERS)
    fp_rate = sum(got.values()) / len(got)
    assert fp_rate < 0.05, f"fp rate {fp_rate}"


def test_delete_removes_membership(spark, built):
    victims, keep = URLS[:1500], URLS[1500:]
    filt = built.delete(spark, _urls_df(spark, victims))
    assert filt.version == built.version + 1
    got_keep = _probe(spark, filt, keep)
    assert all(got_keep.values()), "delete broke a remaining key"
    got_victims = _probe(spark, filt, victims)
    # deleted keys may still collide with remaining fingerprints, but the
    # vast majority must be gone (a bloom can remove NONE)
    still = sum(got_victims.values()) / len(got_victims)
    assert still < 0.05, f"{still:.3f} of deleted keys still present"


def test_incremental_add_versions(spark):
    f0 = ShardedCuckoo.empty(n_shards=4, buckets_per_shard=1 << 10)
    f1 = f0.add(spark, _urls_df(spark, URLS[:100]))
    f2 = f1.add(spark, _urls_df(spark, URLS[100:200]))
    assert (f0.version, f1.version, f2.version) == (0, 1, 2)
    got = _probe(spark, f2, URLS[:200])
    assert all(got.values())
    # immutable snapshots: f1 does not see f2's keys (beyond collisions)
    got1 = _probe(spark, f1, URLS[100:200])
    assert sum(got1.values()) / len(got1) < 0.05


def test_crawl_with_cuckoo_filter_matches_oracle(spark, tmp_path):
    """Engine parity: seen_filter='cuckoo' must produce the identical seen
    set / order / documents as the exact path (same contract as the bloom
    path test)."""
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.reference_impl import crawl_sequential
    from inform_spark.schemas import ROBOTS
    from inform_spark.sources.pages import generate_site

    pages, robots = generate_site(2, 22)
    pages_df = spark.createDataFrame(pages)
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    )
    seed = "https://site0.test/"
    oracle = crawl_sequential(pages, robots, seed, limit=60)
    cfg = CrawlConfig(
        seeds=[seed], limit=60, use_bloom=True, seen_filter="cuckoo",
        bloom_shards=4, bloom_bits_per_shard=1 << 16,
    )
    eng = CrawlEngine(spark, pages_df, robots_df, cfg,
                      checkpoint_dir=str(tmp_path / "cuckoo-ck"))
    eng.run()
    seen_rows = eng.seen().collect()
    assert {r["url"]: r["status"] for r in seen_rows} == oracle.seen
    order = [r["url"] for r in sorted(seen_rows, key=lambda r: r["crawl_rank"])]
    assert order == oracle.order


def test_small_add_path_identical_entries(spark):
    """The approx_count small path must build the same filter as the
    distributed applyInPandas path: identical table bytes and stashes for
    the cuckoo, so membership (and deletes) are indistinguishable."""
    df = _urls_df(spark, URLS[:500])
    dist = ShardedCuckoo.build(spark, df, n_shards=8, buckets_per_shard=1 << 11)
    small = ShardedCuckoo.build(
        spark, df, n_shards=8, buckets_per_shard=1 << 11, approx_count=500
    )
    assert set(dist.shards) == set(small.shards)
    for sid in dist.shards:
        import numpy as np

        # same multiset of fingerprints per shard (layout may differ by
        # insert order, membership may not)
        assert sorted(dist.shards[sid][dist.shards[sid] != 0].tolist()) == sorted(
            small.shards[sid][small.shards[sid] != 0].tolist()
        )
    assert dist.stashes == small.stashes
    got_d = _probe(spark, dist, URLS[:500] + OTHERS[:200])
    got_s = _probe(spark, small, URLS[:500] + OTHERS[:200])
    assert got_d == got_s


def test_bloom_small_add_path_identical(spark):
    from inform_spark.operators.bloom import ShardedBloom

    df = _urls_df(spark, URLS[:500])
    dist = ShardedBloom.build(spark, df, n_shards=8, bits_per_shard=1 << 16)
    small = ShardedBloom.build(
        spark, df, n_shards=8, bits_per_shard=1 << 16, approx_count=500
    )
    assert set(dist.shards) == set(small.shards)
    for sid in dist.shards:
        assert (dist.shards[sid] == small.shards[sid]).all()


def test_small_add_merge_onto_nonempty_identical(spark):
    """The crawl's per-batch pipelined add always folds into an ALREADY
    POPULATED filter — assert the small path's merge branch (bitmap OR /
    insert-into-existing-table) equals the distributed one, for both
    filter kinds."""
    import numpy as np

    from inform_spark.operators.bloom import ShardedBloom

    base_b = ShardedBloom.build(
        spark, _urls_df(spark, URLS[:300]), n_shards=8, bits_per_shard=1 << 16
    )
    delta = _urls_df(spark, URLS[300:600])
    b_dist = base_b.add(spark, delta)
    b_small = base_b.add(spark, delta, approx_count=300)
    assert set(b_dist.shards) == set(b_small.shards)
    for sid in b_dist.shards:
        assert (b_dist.shards[sid] == b_small.shards[sid]).all()

    base_c = ShardedCuckoo.build(
        spark, _urls_df(spark, URLS[:300]), n_shards=8, buckets_per_shard=1 << 11
    )
    c_dist = base_c.add(spark, delta)
    c_small = base_c.add(spark, delta, approx_count=300)
    got_d = _probe(spark, c_dist, URLS[:600] + OTHERS[:200])
    got_s = _probe(spark, c_small, URLS[:600] + OTHERS[:200])
    assert got_d == got_s
    for sid in set(c_dist.shards) | set(c_small.shards):
        assert sorted(
            np.asarray(c_dist.shards[sid])[np.asarray(c_dist.shards[sid]) != 0]
            .tolist()
        ) == sorted(
            np.asarray(c_small.shards[sid])[np.asarray(c_small.shards[sid]) != 0]
            .tolist()
        )
    assert c_dist.stashes == c_small.stashes


def _entry_of(row, nb):
    """Driver-side (bucket-pair, fp) for a hashed url row, same helpers as
    the filter itself."""
    import numpy as np

    from inform_spark.operators.cuckoo import _alt_bucket, _bucket1, _fingerprints

    fp = int(_fingerprints(np.array([row["__h2"]], dtype=np.int64))[0])
    i1 = int(_bucket1(np.array([row["__h1"]], dtype=np.int64), nb)[0])
    i2 = int(_alt_bucket(np.array([i1]), np.array([fp], dtype=np.uint16), nb)[0])
    return fp, frozenset((i1, i2))


def test_colliding_keys_survive_partner_delete(spark):
    """Two DISTINCT urls that collide on (fingerprint, bucket-pair) must
    each store a copy: deleting one may NOT erase the other's membership
    (the false-negative the crawl's bloom-negative fresh path can't
    tolerate). Regression for the idempotent-insert/cross-key-dedup bug."""
    nb = 1 << 4
    cand = _urls_df(spark, [f"https://c.test/p-{i}" for i in range(40000)])
    rows = _with_hashes(cand).select("url", "__h1", "__h2").collect()
    by_entry = {}
    pair = None
    for r in rows:
        key = _entry_of(r, nb)
        if key in by_entry and by_entry[key]["url"] != r["url"]:
            pair = (by_entry[key]["url"], r["url"])
            break
        by_entry[key] = r
    assert pair is not None, "no (fp, bucket-pair) collision in 40k urls"
    a, b = pair
    filt = ShardedCuckoo.build(
        spark, _urls_df(spark, [a, b]), n_shards=1, buckets_per_shard=nb,
        approx_count=2,
    )
    after = filt.delete(spark, _urls_df(spark, [a]), approx_count=1)
    assert _probe(spark, after, [b])[b], (
        "deleting one colliding key erased the other's membership"
    )


def test_stash_overflow_multiset_no_false_negatives(spark):
    """Tiny table forces eviction overflow into the stash; every inserted
    key must still probe True, and deleting half must not break the rest
    (stash is a multiset — counts, not a set)."""
    urls = [f"https://o.test/q-{i}" for i in range(60)]
    filt = ShardedCuckoo.build(
        spark, _urls_df(spark, urls), n_shards=1, buckets_per_shard=4,
        approx_count=60,
    )
    assert sum(len(s) for s in filt.stashes.values()) > 0, (
        "test premise: overflow should reach the stash at this sizing"
    )
    assert all(_probe(spark, filt, urls).values())
    after = filt.delete(spark, _urls_df(spark, urls[:30]), approx_count=30)
    assert all(_probe(spark, after, urls[30:]).values())


def test_small_delete_path_matches_distributed(spark):
    built = ShardedCuckoo.build(
        spark, _urls_df(spark, URLS[:400]), n_shards=8, buckets_per_shard=1 << 11
    )
    victims = URLS[:50]
    d_dist = built.delete(spark, _urls_df(spark, victims))
    d_small = built.delete(spark, _urls_df(spark, victims), approx_count=50)
    probe_set = URLS[:450] + OTHERS[:100]
    assert _probe(spark, d_dist, probe_set) == _probe(spark, d_small, probe_set)
