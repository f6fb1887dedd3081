"""Plain-Python sequential crawl oracle.

Implements the reference's crawl loop at concurrency=1 — the canonical
deterministic semantics (reference src/WebCrawler.js:244-273; at
concurrency>1 ordering depends on fetch-completion races, so "matching crawl
ordering" is defined against the sequential semantics, SURVEY §2.5 O1).

Used ONLY in tests: the Spark engine's final seen-set, crawl order and
per-document span sequences are asserted equal to this oracle's output on
the deterministic fixture site. Shares every scalar function
(URL resolution, extraction, markdown, robots, globs) with the engine so
the comparison exercises the distributed engine, not two parsers.

Semantics replicated:
- FIFO pop of the insertion-ordered frontier (src/WebCrawler.js:248-249)
- limit counts attempts; failures are 'visited' too (:253-258)
- retry on {429,500,502,503,504} up to maxRetries (:165-202)
- non-HTML content-type => success without output (:325-329)
- per-link admission chain: resolve + fragment-strip (:514-519), same host
  (:522), dedup vs visited∪toVisit (:523-524), base path (:530-533),
  extension skip (:536-537), glob filter (:540-542), robots (:545-549),
  queue cap drop-new (:553-560)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from inform_spark.functions.globs import FileFilter
from inform_spark.functions.html import extract_links, render_page_markdown
from inform_spark.functions.robots import RobotsMatcher
from inform_spark.functions.spans import markdown_to_spans
from inform_spark.functions.urls import (
    derive_base_path,
    generate_filepath,
    in_base_path,
    normalize_url,
    resolve_url,
    should_skip_file,
    url_host,
    url_path,
    url_path_query,
)

RETRYABLE_STATUS = {429, 500, 502, 503, 504}


@dataclass
class OracleResult:
    order: list[str] = field(default_factory=list)  # attempt order
    seen: dict[str, str] = field(default_factory=dict)  # url -> ok|failed
    errors: dict[str, str] = field(default_factory=dict)
    documents: dict[str, dict] = field(default_factory=dict)  # url -> doc
    dropped_by_cap: int = 0


def crawl_sequential(
    pages: list[dict],
    robots: list[dict],
    seed_url: str,
    limit: int = 100,
    max_retries: int = 3,
    max_queue_size: int = 10000,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    ignore_robots: bool = False,
) -> OracleResult:
    page_index = {p["url"]: p for p in pages}
    robots_index = {
        r["host"]: RobotsMatcher(r["disallow_prefixes"]) for r in robots if r["exists"]
    }
    file_filter = FileFilter(include, exclude)

    seed = normalize_url(seed_url)
    seed_host = url_host(seed)
    base_path = derive_base_path(seed)
    res = OracleResult()

    to_visit: dict[str, None] = {seed: None}  # insertion-ordered set
    visited: set[str] = set()

    def fetch(url: str) -> tuple[dict | None, int]:
        """(page_row_or_None, attempts). Mirrors fetchWithRetry: retryable
        statuses retried; in the fixture a page with retries_needed=r
        'succeeds' on attempt r+1 when r <= max_retries."""
        row = page_index.get(url)
        if row is None:
            return None, 1  # 404 — non-retryable
        needed = row.get("retries_needed", 0) or 0
        if needed > 0:
            if needed <= max_retries:
                return row, needed + 1
            return {**row, "status_code": 503}, max_retries + 1
        if row["status_code"] in RETRYABLE_STATUS:
            return row, max_retries + 1
        return row, 1

    def process_found_link(href: str, current_url: str) -> None:
        normalized = resolve_url(href, current_url)
        if normalized is None:
            return
        if url_host(normalized) != seed_host:
            return
        if normalized in visited or normalized in to_visit:
            return
        path = url_path(normalized)
        if not in_base_path(path, base_path):
            return
        if should_skip_file(path.lower()):
            return
        if not file_filter.should_crawl_url(normalized):
            return
        if not ignore_robots:
            matcher = robots_index.get(seed_host)
            if matcher is not None and not matcher.is_allowed(url_path_query(normalized)):
                return
        if len(to_visit) >= max_queue_size:
            res.dropped_by_cap += 1
            return
        to_visit[normalized] = None

    while to_visit and len(visited) < limit:
        url = next(iter(to_visit))
        del to_visit[url]
        if url in visited:
            continue
        res.order.append(url)
        row, _attempts = fetch(url)
        if row is None:
            visited.add(url)
            res.seen[url] = "failed"
            res.errors[url] = "HTTP 404: Not Found"
            continue
        status = row["status_code"]
        if not (200 <= status < 300):
            visited.add(url)
            res.seen[url] = "failed"
            res.errors[url] = f"HTTP {status}"
            continue
        if "text/html" not in (row["content_type"] or ""):
            visited.add(url)
            res.seen[url] = "ok"  # non-HTML: early return, still a success
            continue
        html = row["html"] or ""
        markdown = render_page_markdown(html)
        res.documents[url] = {
            "doc_id": generate_filepath(url),
            "markdown": markdown,
            "spans": markdown_to_spans(markdown),
        }
        visited.add(url)
        res.seen[url] = "ok"
        for link in extract_links(html):
            process_found_link(link, url)

    return res
