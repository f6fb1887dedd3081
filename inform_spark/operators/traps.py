"""Crawler-trap detection — URL template explosion analysis.

The reference bounds runaway frontiers only by a global queue cap
(src/WebCrawler.js:553-560) and a page limit; a web-scale crawler also
needs STRUCTURAL trap defense: calendar pages, session-id permutations,
faceted-search grids and the like generate unbounded URL families that
are all the same page shape. The standard defense is URL templating —
collapse every digit/hex run in the path to a placeholder and watch for
templates with explosive member counts per host.

Template rule (deterministic, regexp-only, DuckDB-mirrorable):
  - path = everything from the first '/' after the authority up to
    '?'/'#' ('' if none);
  - hex runs of >= 8 chars -> '{H}' (session ids, content hashes),
    THEN digit runs -> '{N}' (ids, dates, pagination) — hex first so
    an all-digit long run reads '{H}', one canonical form.

Scale: one groupBy (host, template) with map-side combine; the output
is a tiny dimension (templates, not URLs) that the crawl engine can
broadcast back against its frontier. The admission-time variant
(plans/crawl.py ``template_cap``) bounds traps structurally without
this extra pass, using the same template expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z]+://([^/?#]+)", 1)


def url_template_from_path(path: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(path, "[0-9a-f]{8,}", "{H}"), "[0-9]+", "{N}"
    )


def url_template(url: Column) -> Column:
    return url_template_from_path(
        F.regexp_extract(url, r"^[a-z]+://[^/?#]+(/[^?#]*)", 1)
    )


def trap_templates(urls: DataFrame, min_count: int = 100) -> DataFrame:
    """(host, template, n_urls, example_url) for every URL-path template
    with at least ``min_count`` members on one host — the trap
    candidates. example_url = min(url): a deterministic representative
    for operator inspection."""
    t = urls.select(
        url_host(F.col("url")).alias("host"),
        url_template(F.col("url")).alias("template"),
        "url",
    )
    return (
        t.groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("url").alias("example_url"),
        )
        .filter(F.col("n_urls") >= min_count)
    )
