"""DNS TTL-cache resolver stage and pay-level-domain extraction."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


NOW = 1_700_000_000_000
TTL = 3_600_000


def test_resolve_hosts_cache_ttl_semantics(spark):
    from inform_spark.operators.dns import resolve_hosts

    hosts = spark.createDataFrame(
        [Row(host=h) for h in ("fresh.test", "stale.test", "miss.test")]
    )
    cache = spark.createDataFrame(
        [
            Row(host="fresh.test", ip="1.1.1.1", resolved_at_ms=NOW - TTL + 1),
            Row(host="stale.test", ip="2.2.2.2", resolved_at_ms=NOW - TTL),
        ]
    )
    out = {
        r["host"]: r.asDict()
        for r in resolve_hosts(hosts, cache, now_ms=NOW, ttl_ms=TTL).collect()
    }
    assert out["fresh.test"]["from_cache"] is True
    assert out["fresh.test"]["ip"] == "1.1.1.1"
    assert out["fresh.test"]["resolved_at_ms"] == NOW - TTL + 1
    # exactly-TTL-old is stale (strict <)
    for h in ("stale.test", "miss.test"):
        assert out[h]["from_cache"] is False
        assert out[h]["resolved_at_ms"] == NOW
        # deterministic fixture resolver
        v = _h60(f"dns-{h}")
        assert out[h]["ip"] == f"10.{v % 256}.{(v >> 8) % 256}.1"


def test_resolve_hosts_dedups_input(spark):
    from inform_spark.operators.dns import resolve_hosts

    hosts = spark.createDataFrame([Row(host="a.test")] * 5)
    cache = spark.createDataFrame(
        [Row(host="x", ip="0", resolved_at_ms=0)]
    ).filter("1=0")
    out = resolve_hosts(hosts, cache, now_ms=NOW).collect()
    assert len(out) == 1


def test_registered_domain_rules(spark):
    from inform_spark.operators.dns import registered_domain_col

    cases = {
        "www.example.com": "example.com",
        "a.b.example.co.uk": "example.co.uk",
        "user.github.io": "user.github.io",
        "deep.x.user.github.io": "user.github.io",
        "example.com.au": "example.com.au",
        "co.uk": "co.uk",            # bare suffix: its own PLD
        "localhost": "localhost",    # single label
        "192.168.10.5": "192.168.10.5",  # IP literal
        "MiXeD.ExAmPle.OrG": "example.org",  # lowercased
    }
    df = spark.createDataFrame([Row(host=h) for h in cases])
    got = {
        r["host"]: r["pld"]
        for r in df.select("host", registered_domain_col("host")).collect()
    }
    for h, want in cases.items():
        assert got[h] == want, (h, got[h], want)


def test_pld_budget_counts(spark):
    from inform_spark.operators.dns import pld_budget_counts

    rows = (
        [Row(host=f"h{i}.spam.co.uk") for i in range(10)]
        + [Row(host="www.real.com")] * 3
    )
    out = {
        r["pld"]: r.asDict()
        for r in pld_budget_counts(spark.createDataFrame(rows)).collect()
    }
    # 10 minted hostnames collapse into ONE budget-bearing PLD
    assert out["spam.co.uk"]["n_hosts"] == 10
    assert out["spam.co.uk"]["n_rows"] == 10
    assert out["real.com"]["n_hosts"] == 1
    assert out["real.com"]["n_rows"] == 3


def test_registered_domain_longest_match_any_list_order(spark):
    from inform_spark.operators.dns import registered_domain_col

    # nested suffixes, committed LONGEST-first: the longest must still
    # win (the chain is built shortest-first internally)
    df = spark.createDataFrame([Row(host="a.b.x.co.uk")])
    got = df.select(
        registered_domain_col("host", suffixes=["x.co.uk", "co.uk"])
    ).collect()[0]["pld"]
    assert got == "b.x.co.uk"


def test_resolve_hosts_merges_duplicate_cache_rows(spark):
    from inform_spark.operators.dns import resolve_hosts

    hosts = spark.createDataFrame([Row(host="a.test")])
    # append-style cache with two rows for one host: newest wins, and
    # the output stays one-row-per-host
    cache = spark.createDataFrame(
        [
            Row(host="a.test", ip="1.1.1.1", resolved_at_ms=NOW - 100),
            Row(host="a.test", ip="2.2.2.2", resolved_at_ms=NOW - 50),
        ]
    )
    rows = resolve_hosts(hosts, cache, now_ms=NOW, ttl_ms=TTL).collect()
    assert len(rows) == 1
    assert rows[0]["ip"] == "2.2.2.2"
    assert rows[0]["from_cache"] is True


def test_dedup_dns_dim_newest_wins(spark):
    from pyspark.sql import Row

    from inform_spark.operators.dns import dedup_dns_dim

    dns = spark.createDataFrame(
        [
            Row(host="a", ip="1.1.1.1", resolved_at_ms=100),
            Row(host="a", ip="2.2.2.2", resolved_at_ms=200),
            Row(host="b", ip="3.3.3.3", resolved_at_ms=50),
        ]
    )
    out = {r["host"]: r["ip"] for r in dedup_dns_dim(dns).collect()}
    assert out == {"a": "2.2.2.2", "b": "3.3.3.3"}


def test_dedup_dns_dim_without_timestamp_max_ip(spark):
    from inform_spark.operators.dns import dedup_dns_dim

    dns = spark.createDataFrame(
        [("a", "1.1.1.1"), ("a", "9.9.9.9")], "host string, ip string"
    )
    out = dedup_dns_dim(dns).collect()
    assert len(out) == 1 and out[0]["ip"] == "9.9.9.9"
