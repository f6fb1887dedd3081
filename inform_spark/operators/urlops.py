"""Distributed URL canonicalization + variant clustering.

A 100 TB crawl sees the same resource under thousands of surface forms
— tracking parameters, case-variant hosts, default ports, trailing
slashes, fragments, shuffled query order. Canonicalizing BEFORE the
seen-set / dedup keys is what keeps the frontier from re-crawling the
same page under a fresh utm_ tag (the reference normalizes fragments
and resolves relative forms in ``new URL()`` — src/WebCrawler.js:560+
— this operator extends that to the full variant family as a corpus
batch op).

Everything is a chain of in-row string built-ins (regexp_extract /
filter / array_sort / concat), zero shuffle for the canonical form and
ONE groupBy for the clustering — both expressible identically in
DuckDB, which is what the oracle checks.

Semantics (the widely-published safe-normalization subset, RFC 3986
§6 + the tracking-param strip every production crawler ships):
- scheme and host lowercase; fragment dropped;
- default ports stripped (:80 for http, :443 for https);
- trailing slash runs on the path collapsed ('' -> '/');
- tracking params removed (utm_*, gclid, fbclid), remaining params
  byte-sorted so order variants collide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# params stripped by prefix match on 'name=' (or bare 'name')
TRACKING_PREFIXES = ["utm_", "gclid", "fbclid"]


def canonicalize_url(url: Column) -> Column:
    """The canonical form of an absolute http(s) URL as a Column
    expression (see module docstring for the exact rule set)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        host.substr(F.lit(1), F.length(host) - 3),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        host.substr(F.lit(1), F.length(host) - 4),
    ).otherwise(host)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # the '?' must precede any '#': a bare '\?' would match a '?' inside
    # the fragment ('…/p#a?b=1') and leak fragment content into the
    # canonical query instead of dropping it
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    # prefix match covers both 'utm_x=1' and bare 'gclid'
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.startswith("utm_")
        & ~p.startswith("gclid")
        & ~p.startswith("fbclid"),
    )
    qcanon = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def url_canonical_cluster(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canon_url, n_occurrences, n_variants, rep_url): group every
    input URL occurrence by its canonical form. ``n_variants`` counts
    DISTINCT surface forms, ``rep_url`` is the lexicographic minimum
    surface form (a deterministic representative). One shuffle; the
    canonicalization itself is map-side codegen."""
    canon = df.select(
        F.col(url_col).alias("url"), canonicalize_url(F.col(url_col)).alias("canon_url")
    )
    return canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("url").cast("long").alias("n_variants"),
        F.min("url").alias("rep_url"),
    )


# ---------------------------------------------------------------------------
# Declared canonicals (<link rel="canonical">) — the page's OWN dedup vote
# ---------------------------------------------------------------------------


def declared_canonical(html_col: Column) -> Column:
    """The absolute http(s) ``<link rel="canonical" href=...>`` target
    declared in ``html_col``, or NULL. Both attribute orders are
    accepted (``rel`` before ``href`` and the reverse — real pages emit
    both); the regexps live in the Java/RE2/DuckDB common subset so the
    extraction is engine-exact. Relative canonical hrefs are rare and
    spec-discouraged; resolving them needs the full WHATWG resolver
    (``functions.urls.resolve_urls_udf``) — compose it upstream when a
    corpus needs that, this in-row form stays zero-UDF."""
    # (?i) + ["'] alternates: real pages emit <LINK REL=...>, single
    # quotes, and mixed case schemes — all in the RE2/Java common subset
    rel_first = F.regexp_extract(
        html_col,
        "(?i)<link[^>]*rel=[\"']canonical[\"'][^>]*href=[\"']([^\"']+)[\"']",
        1,
    )
    href_first = F.regexp_extract(
        html_col,
        "(?i)<link[^>]*href=[\"']([^\"']+)[\"'][^>]*rel=[\"']canonical[\"']",
        1,
    )
    cand = F.coalesce(
        F.nullif(rel_first, F.lit("")), F.nullif(href_first, F.lit(""))
    )
    return F.when(cand.rlike("(?i)^https?://"), cand)


def declared_canonical_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(url, canonical_url, self_canonical, cluster_size)`` — the
    page-declared consolidation map: every URL points at its declared
    canonical (itself when the page declares none), plus the size of
    each canonical's cluster. The search-engine treatment: ONE hop of
    the declared edge (canonical-of-canonical chains are deliberately
    not followed — feed the (url, canonical_url) edges through
    ``operators.redirects.resolve_redirects`` when chain semantics are
    wanted; the two operators compose on exactly that column pair).

    Scale: extraction is in-row regexp (zero shuffle); the cluster size
    is one groupBy on canonical_url joined back on the same key — the
    join is co-partitioned with the groupBy output, so one shuffle of
    (url, canonical_url) pairs total, never the html."""
    m = pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(declared_canonical(F.col(html_col)), F.col(url_col)).alias(
            "canonical_url"
        ),
    )
    sizes = m.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return m.join(sizes, "canonical_url").select(
        "url",
        "canonical_url",
        (F.col("url") == F.col("canonical_url")).alias("self_canonical"),
        "cluster_size",
    )
