"""Live GitHub contents-API source (S8): listing fetcher + big-file fetcher.

The reference recursively GETs the contents API one rate-limited request at
a time (src/GitCrawler.js:229-275; retry+pacing :144-193). Here each BFS
round of :class:`~inform_spark.plans.gitcrawl.GitCrawlEngine` hands the
whole directory level to a ``mapInPandas`` fetcher, so an org-scale mirror
lists a level of a million directories with full executor parallelism while
per-worker min-interval pacing still bounds the request rate against the
API host (A3/T4 semantics, src/GitCrawler.js:147-157).

Auth: ``token`` becomes the reference's Authorization header
(src/GitCrawler.js:40-43, ``GITHUB_TOKEN``). ``api_base`` is pluggable so
tests run against a loopback fixture API — no live network in-sandbox.

Output contract is the LISTING shape the engine's fixture tests use:
``(parent, name, type, size, content, download_url)`` — ``content`` is the
API's inline base64 for files <= 1 MB, larger files carry ``download_url``
and are filled by :func:`fetch_download_urls` after the walk (the
inline-vs-download branch, src/GitCrawler.js:298-325).
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from inform_spark.functions.giturl import GitRepoInfo, github_api_url
from inform_spark.sources.httpfetch import RETRYABLE

LISTING_SCHEMA = StructType(
    [
        StructField("parent", StringType(), False),
        StructField("name", StringType(), False),
        StructField("type", StringType(), False),
        StructField("size", LongType(), True),
        StructField("content", StringType(), True),
        StructField("download_url", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def _github_headers(token: str | None, user_agent: str) -> dict[str, str]:
    """Reference getGitHubHeaders (src/GitCrawler.js:55-66)."""
    headers = {
        "User-Agent": user_agent,
        "Accept": "application/vnd.github.v3+json",
    }
    if token:
        headers["Authorization"] = f"token {token}"
    return headers


def _get_with_retry(
    url: str,
    headers: dict[str, str],
    timeout_s: float,
    max_retries: int,
    base_backoff_s: float,
    pacing: dict[str, float],
    min_interval_ms: int,
) -> tuple[int, bytes | None]:
    """(status, body) with the reference's retry/backoff + min-interval
    pacing (src/GitCrawler.js:144-193). Status 0 = network error."""
    import urllib.error
    import urllib.request

    from urllib.parse import urlsplit

    host = urlsplit(url).netloc
    for attempt in range(max_retries + 1):
        if min_interval_ms > 0:
            since = time.monotonic() - pacing.get(host, 0.0)
            wait = min_interval_ms / 1000.0 - since
            if wait > 0:
                time.sleep(wait)
        pacing[host] = time.monotonic()
        status, body = 0, None
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                status, body = resp.status, resp.read()
        except urllib.error.HTTPError as e:
            status, body = e.code, None
        except Exception:
            status, body = 0, None
        if status and status not in RETRYABLE:
            return status, body
        if attempt < max_retries:
            time.sleep(base_backoff_s * (2 ** attempt))
    return (status or 503), body


def make_listing_fetcher(
    repo: GitRepoInfo,
    token: str | None = None,
    user_agent: str = "Inform/1.0 (inform-spark)",
    timeout_s: float = 10.0,
    max_retries: int = 3,
    base_backoff_s: float = 1.0,
    min_interval_ms: int = 0,
):
    """Returns ``lister(dirs_df) -> listing_df`` for GitCrawlEngine's live
    mode: one contents-API GET per directory row, parsed into LISTING rows.
    A directory that 404s or errors emits one ``type='error'`` row (the
    engine surfaces it in the summary; reference throws and aborts,
    src/GitCrawler.js:236-241 — at fleet scale a poison dir must not kill
    the walk)."""
    headers = _github_headers(token, user_agent)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pacing: dict[str, float] = {}
        cols = [f.name for f in LISTING_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for d in pdf["dir"]:
                # github_api_url prefixes repo.subdirectory itself; the
                # frontier carries FULL repo paths, so strip the prefix back
                rel = d
                sub = repo.subdirectory
                if sub and (rel == sub or rel.startswith(sub + "/")):
                    rel = rel[len(sub):].lstrip("/")
                url = github_api_url(repo, rel)
                status, body = _get_with_retry(
                    url, headers, timeout_s, max_retries, base_backoff_s,
                    pacing, min_interval_ms,
                )
                if status != 200 or body is None:
                    rows.append({
                        "parent": d, "name": "", "type": "error",
                        "size": None, "content": None, "download_url": None,
                        "error": f"HTTP {status}",
                    })
                    continue
                try:
                    contents = json.loads(body.decode("utf-8", "replace"))
                except ValueError as e:
                    rows.append({
                        "parent": d, "name": "", "type": "error",
                        "size": None, "content": None, "download_url": None,
                        "error": f"bad JSON: {e}",
                    })
                    continue
                # single-file response (src/GitCrawler.js:246-252)
                if isinstance(contents, dict):
                    contents = [contents] if contents.get("type") == "file" else []
                for item in contents:
                    rows.append({
                        "parent": d,
                        "name": item.get("name") or "",
                        "type": item.get("type") or "",
                        "size": item.get("size"),
                        "content": item.get("content"),
                        "download_url": item.get("download_url"),
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    def lister(dirs_df: DataFrame) -> DataFrame:
        return dirs_df.select("dir").mapInPandas(fetch, LISTING_SCHEMA)

    return lister


def fetch_download_urls(
    files_df: DataFrame,
    token: str | None = None,
    user_agent: str = "Inform/1.0 (inform-spark)",
    timeout_s: float = 30.0,
    max_retries: int = 3,
    base_backoff_s: float = 1.0,
    min_interval_ms: int = 0,
    max_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Fill ``text``/``data`` for non-inline files by fetching their
    ``download_url`` (src/GitCrawler.js:308-325). Distributed: each
    partition's worker streams its files; binary bytes stay in the binary
    column on the executor. Inline rows pass through untouched.

    The output schema is FILES plus a ``fetch_failed`` boolean: the
    reference tracks per-FILE download failures in ``crawler.failures``
    (src/GitCrawler.js:318-323) and gates the exit code on them
    (src/cli.js:229-231), so failures must survive the distributed fetch
    back to the driver as data, not logs."""
    from pyspark.sql.types import BooleanType, StructField

    from inform_spark.plans.gitcrawl import FILES

    out_schema = StructType(
        list(FILES.fields) + [StructField("fetch_failed", BooleanType(), False)]
    )
    headers = {"User-Agent": user_agent}
    if token:
        headers["Authorization"] = f"token {token}"
    cols = [f.name for f in FILES.fields]

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pacing: dict[str, float] = {}
        for pdf in batches:
            out = {c: [] for c in cols}
            out["fetch_failed"] = []
            for row in pdf.itertuples(index=False):
                text, data = row.text, row.data
                failed = False
                if not row.inline:
                    if row.download_url:
                        status, body = _get_with_retry(
                            row.download_url, headers, timeout_s, max_retries,
                            base_backoff_s, pacing, min_interval_ms,
                        )
                        if status == 200 and body is not None:
                            body = body[:max_bytes]
                            if row.is_binary:
                                data = body
                            else:
                                text = body.decode("utf-8", "replace")
                        else:
                            failed = True
                    else:
                        # listed but not inlined and no download URL:
                        # nothing fetchable — a failure, not an empty file
                        failed = True
                for c in cols:
                    v = {"text": text, "data": data}.get(c, getattr(row, c))
                    out[c].append(v)
                out["fetch_failed"].append(failed)
            yield pd.DataFrame(out, columns=cols + ["fetch_failed"])

    return files_df.mapInPandas(fetch, out_schema)
