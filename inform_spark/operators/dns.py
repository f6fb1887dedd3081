"""DNS resolution stage (TTL cache) and pay-level-domain extraction.

A web-scale fetcher spends real wall-clock on name resolution —
Mercator (Heydon & Najork 1999, §3.2) found DNS was its single
largest bottleneck until they built a caching resolver — and budgets
politeness/crawl quotas at the PAY-LEVEL DOMAIN (the registrable unit
under a public suffix: ``example.co.uk``, ``user.github.io``), not
the hostname, because a spammer mints hostnames for free but pays for
PLDs (IRLbot's STRIKE budget — Lee et al. 2008). The reference crawls
one site per process and needs neither (builder-brief scope: crawl
infrastructure).

- :func:`resolve_hosts` — batch resolver stage against a persisted
  ``(host, ip, resolved_at_ms)`` cache table with TTL semantics:
  fresh entries are served from the cache (``from_cache = true``),
  stale/missing hosts get a new resolution stamped ``now_ms``. The
  resolver itself is injectable; the default is the deterministic
  synthetic resolver (H60-keyed /16) used across the test fixtures —
  swap in a mapInPandas stage that does real ``getaddrinfo`` batching
  outside this sandbox.
- :func:`registered_domain_col` — in-row PLD extraction against a
  COMMITTED public-suffix subset (the full PSL is a data file this
  repo cannot fetch; the subset covers the multi-label suffixes the
  tests exercise and falls back to last-two-labels, which is the PSL
  default rule ``*``). Pure when-chain over ``split(host, '.')`` —
  codegen, zero shuffle, DuckDB-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60

#: committed multi-label public-suffix subset (PSL is >9k rules; these
#: are the high-traffic two-label suffixes — extend by committing more
#: rows, never by fetching at runtime)
PUBLIC_SUFFIXES_2 = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "github.io", "gitlab.io", "blogspot.com",
]


def default_resolver(host_col: Column) -> Column:
    """Deterministic synthetic A-record: 10.x.y/16 keyed on the host
    hash — the fixture resolver (replace with a real batched
    ``getaddrinfo`` mapInPandas stage in production)."""
    h = _h60(F.concat(F.lit("dns-"), host_col))
    # shiftright == div 256 on the non-negative 60-bit hash; DuckDB
    # mirror: (h // 256) % 256
    return F.concat(
        F.lit("10."),
        F.pmod(h, F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(F.shiftright(h, 8), F.lit(256)).cast("string"),
        F.lit(".1"),
    )


def resolve_hosts(
    hosts: DataFrame,
    cache: DataFrame,
    now_ms: int,
    ttl_ms: int = 3_600_000,
    resolver=None,
) -> DataFrame:
    """``(host, ip, resolved_at_ms, from_cache)`` for every distinct
    input host. A cache row is FRESH iff ``now_ms - resolved_at_ms <
    ttl_ms``; fresh rows pass through, stale/missing hosts re-resolve
    with ``resolved_at_ms = now_ms``. The output IS the next cache
    state for these hosts (append/merge it back by host).

    ``resolver`` maps a host Column to an ip Column
    (:func:`default_resolver` if None). Scale: one equi-join on host
    (both sides hash-partitioned; the cache side is the big one at
    10^8+ hosts — never broadcast it), resolution itself narrow. The
    distinct() guards double-resolution when the frontier emits a
    host many times in one batch."""
    resolver = resolver or default_resolver
    h = hosts.select("host").distinct()
    # the docstring invites appending the output back to the cache, so
    # tolerate duplicate host rows there: keep the NEWEST entry per
    # host (max (resolved_at, ip) — deterministic tie-break), which is
    # exactly append-then-merge-on-read semantics
    c = (
        cache.select(
            "host",
            F.struct(
                F.col("resolved_at_ms").cast("long").alias("at"),
                F.col("ip").alias("ip"),
            ).alias("__e"),
        )
        .groupBy("host")
        .agg(F.max("__e").alias("__e"))
        .select(
            "host",
            F.col("__e.ip").alias("__cip"),
            F.col("__e.at").alias("__cat"),
        )
    )
    j = h.join(c, "host", "left")
    fresh = (
        F.col("__cat").isNotNull()
        & (F.lit(int(now_ms)) - F.col("__cat") < F.lit(int(ttl_ms)))
    )
    return j.select(
        "host",
        F.when(fresh, F.col("__cip"))
        .otherwise(resolver(F.col("host")))
        .alias("ip"),
        F.when(fresh, F.col("__cat"))
        .otherwise(F.lit(int(now_ms)).cast("long"))
        .alias("resolved_at_ms"),
        fresh.alias("from_cache"),
    )


def dedup_dns_dim(dns: "DataFrame") -> "DataFrame":
    """Merge an append-style DNS cache to one row per host: newest
    ``resolved_at_ms`` wins (max-ip tie-break; max ip alone when no
    timestamp column exists) — the same newest-wins kernel as
    :func:`resolve_hosts`' cache merge. Output: ``(host, ip)``. Every
    consumer that broadcasts a DNS dim joins through this, so duplicate
    cache rows can never fan out the probe side."""
    at = (
        F.col("resolved_at_ms").cast("long")
        if "resolved_at_ms" in dns.columns
        else F.lit(0).cast("long")
    )
    return (
        dns.select(
            "host",
            F.struct(at.alias("at"), F.col("ip").alias("ip")).alias("__e"),
        )
        .groupBy("host")
        .agg(F.max("__e").alias("__e"))
        .select("host", F.col("__e.ip").alias("ip"))
    )


def registered_domain_col(
    host_col: Column | str = "host",
    suffixes: list[str] | None = None,
) -> Column:
    """Pay-level domain of a hostname as an in-row Column: the label
    directly below the longest matching public suffix. Rules, in
    order:

    - IPv4 literals (all-digit labels) are their own PLD,
    - ``host`` equal to a committed suffix, or a bare single label,
      is its own PLD (nothing registrable below it),
    - ``*.s`` for a committed two-label suffix s -> last THREE labels,
    - otherwise the PSL default rule -> last TWO labels.
    """
    hc = F.col(host_col) if isinstance(host_col, str) else host_col
    host = F.lower(hc)
    parts = F.split(host, r"\.")
    n = F.size(parts)

    def last(k: int) -> Column:
        return F.array_join(F.slice(parts, n - k + 1, k), ".")

    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    out = last(2)  # PSL default rule
    # build the chain SHORTEST suffix first: later whens override
    # earlier ones, so with nested suffixes (e.g. both 'co.uk' and a
    # hypothetical 'x.co.uk') the LONGEST match wins regardless of the
    # order the caller committed the list in
    for s in sorted(suffixes or PUBLIC_SUFFIXES_2, key=lambda x: x.count(".")):
        k = s.count(".") + 2  # suffix labels + 1 registrable label
        out = F.when(
            host.endswith("." + s) & (n >= k), last(k)
        ).otherwise(out)
    return (
        F.when(is_ip | (n <= 1) | host.isin(*(suffixes or PUBLIC_SUFFIXES_2)), host)
        .otherwise(out)
        .alias("pld")
    )


def pld_budget_counts(
    hosts: DataFrame,
    host_col: str = "host",
    suffixes: list[str] | None = None,
) -> DataFrame:
    """``(pld, n_hosts, n_rows)`` — the IRLbot budget denominator: how
    many distinct hostnames (minted for free) each pay-level domain
    (paid for) is presenting. One groupBy on the in-row PLD; feed the
    result to ``recrawl.domain_crawl_budget``-style allocation keyed
    on pld instead of source."""
    p = hosts.select(
        registered_domain_col(host_col, suffixes), F.col(host_col)
    )
    return p.groupBy("pld").agg(
        F.countDistinct(host_col).cast("long").alias("n_hosts"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
