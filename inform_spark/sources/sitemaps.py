"""Sitemap ingestion (sitemaps.org XML protocol) — frontier seeding and
recrawl scheduling from site-declared URL inventories.

The reference engine discovers URLs only by following links
(src/crawler.js) — it has no sitemap support, so this is a
beyond-reference crawl capability: sitemaps surface pages with no inbound
links, declare ``lastmod`` for change-driven recrawl (feeding
operators/recrawl.py), and ``priority`` for frontier ordering. Discovery
follows the standard: ``Sitemap:`` lines in robots.txt (a cross-host URL,
outside any user-agent group) -> the sitemap, which is either a
``<urlset>`` of pages or a ``<sitemapindex>`` of child sitemaps
(expanded breadth-first with a depth bound — real site indexes nest once;
a cycle must not hang the crawler).

Scale design: one sitemap XML is one row (bounded at 50k URLs / 50 MB by
the protocol — the spec forces large sites to shard into an index, which
is exactly what makes this distributable: child sitemaps fan out across
executors). Parsing is an Arrow-batched ``mapInPandas`` per sitemap body
— the same shape as the feed scanners (sources/feeds.py); entries come
back as one row per URL, and seeding is a plain union + anti-join into
the existing frontier path (plans/crawl.py J1).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SITEMAP_OUT = StructType(
    [
        StructField("sitemap_url", StringType()),
        StructField("kind", StringType()),  # 'url' | 'sitemap'
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", DoubleType()),
    ]
)


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _child_text(el, name: str) -> str | None:
    for c in el:
        if _strip_ns(c.tag) == name:
            return (c.text or "").strip() or None
    return None


def parse_sitemap_xml(xml: str) -> list[dict]:
    """Parse one sitemap document: ``<urlset>`` -> kind='url' entries,
    ``<sitemapindex>`` -> kind='sitemap' entries pointing at child
    sitemaps. Namespace-agnostic (ElementTree tags stripped, same
    convention as the feed scanners); malformed documents yield zero
    entries rather than failing the batch."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    root_kind = _strip_ns(root.tag)
    if root_kind not in ("urlset", "sitemapindex"):
        return []
    kind = "url" if root_kind == "urlset" else "sitemap"
    out = []
    for el in root:
        if _strip_ns(el.tag) not in ("url", "sitemap"):
            continue
        loc = _child_text(el, "loc")
        if not loc:
            continue
        prio = _child_text(el, "priority")
        try:
            prio_f = float(prio) if prio is not None else None
        except ValueError:
            prio_f = None
        out.append(
            {
                "kind": kind,
                "loc": loc,
                "lastmod": _child_text(el, "lastmod"),
                "changefreq": _child_text(el, "changefreq"),
                "priority": prio_f,
            }
        )
    return out


def sitemap_urls_from_robots(text: str) -> list[str]:
    """``Sitemap:`` lines from robots.txt. Per the protocol these sit
    OUTSIDE user-agent groups (unlike Disallow/Crawl-delay, which
    functions/robots.py scopes to the matched agent), and the value is a
    full URL — it may even point at another host."""
    out = []
    for line in (text or "").split("\n"):
        line = line.split("#")[0].strip()
        directive, _, value = line.partition(":")
        if directive.lower().strip() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def parse_sitemaps(df: DataFrame, url_col: str = "url", body_col: str = "body") -> DataFrame:
    """Explode fetched sitemap bodies (one sitemap per row) into one row
    per entry via an Arrow-batched ``mapInPandas``."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in SITEMAP_OUT.fields}
            for url, body in zip(pdf[url_col], pdf[body_col]):
                for e in parse_sitemap_xml(body or ""):
                    rows["sitemap_url"].append(url)
                    for k in ("kind", "loc", "lastmod", "changefreq", "priority"):
                        rows[k].append(e[k])
            yield pd.DataFrame(rows)

    return df.select(url_col, body_col).mapInPandas(parse, SITEMAP_OUT)


def expand_sitemap_index(
    fetch_bodies,
    seed_urls: list[str],
    max_depth: int = 3,
) -> "DataFrame":
    """Breadth-first index expansion: parse the current level's bodies,
    route kind='sitemap' locs into the next fetch round (deduped against
    everything already fetched — a cyclic index terminates), accumulate
    kind='url' entries. ``fetch_bodies(urls: list[str]) -> DataFrame``
    returns (url, body) for a level — in production the httpfetch
    mapInPandas source, in tests a fixture join. Depth is bounded by
    ``max_depth`` levels past the seeds; the protocol nests once, so 3
    tolerates sloppy real-world nesting without letting a crawler trap
    recurse unboundedly."""
    seen = set(seed_urls)
    level = list(dict.fromkeys(seed_urls))
    url_frames = []
    for _ in range(max_depth + 1):
        if not level:
            break
        # persist BEFORE the children collect: with a live fetcher the
        # frame's lineage re-executes the fetch, so without the pin every
        # sitemap would be fetched twice (once for the child list, again
        # when the caller evaluates the returned union) — and a body that
        # changed between fetches would desync URLs from the expansion
        # actually followed
        parsed = parse_sitemaps(fetch_bodies(level)).persist()
        try:
            # one bounded collect per level: only CHILD SITEMAP locs come
            # to the driver (the next fetch list — same shape as feed
            # fan-out); page URL rows stay distributed
            children = [
                r["loc"]
                for r in parsed.filter("kind = 'sitemap'").select("loc").collect()
            ]
            # localCheckpoint cuts the url rows' lineage (materialized on
            # executors), so the level's cache can be released NOW rather
            # than leaking one pinned frame per level for the session's
            # lifetime; executor loss mid-expansion would re-raise rather
            # than silently re-fetch
            url_frames.append(
                parsed.filter("kind = 'url'").localCheckpoint(eager=True)
            )
        finally:
            parsed.unpersist()
        # dedupe within the level too — two sibling indexes listing the
        # same child must not fetch it twice / duplicate its URLs
        level = [u for u in dict.fromkeys(children) if u not in seen]
        seen.update(level)
    if not url_frames:
        raise ValueError("no sitemap levels fetched")
    out = url_frames[0]
    for f in url_frames[1:]:
        out = out.unionByName(f)
    return out
