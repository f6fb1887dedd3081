"""Deterministic synthetic web fixture (seed 42) — replaces live HTTP.

The sandbox has no crawl targets, so tests and benchmarks "fetch" from a
synthetic ``pages(url, host, status_code, content_type, html, ...)`` table
via a broadcast join (SURVEY §2.1 S1). The site graph mirrors the
reference's integration fixture (tests/integration/test-server.js:15-69) at
parametric scale: per-host home page, three sections, leaf chains, a
``<main>``-less home page (body fallback), ``<pre><code class="language-x">``
blocks, inline code with angle brackets, images (-> media spans), nav /
header / footer boilerplate (-> removed by extraction), entity-encoded and
fragment links, robots-disallowed /admin/ pages, a non-HTML endpoint, dead
links (404) and retryable 5xx pages.

Everything is a pure function of (host_idx, page index) so generation is
distributable (Spark ``mapInPandas`` over a host range) and the plain-Python
oracle regenerates the identical site.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

WORDS = (
    "spark frontier crawl engine schedule batch vector arrow shuffle "
    "partition broadcast bloom filter politeness robots markdown span media "
    "document queue offset lineage snapshot resume retry backoff host depth "
    "link anchor render extract convert pipeline catalyst tungsten codegen "
    "parquet column predicate pushdown salt skew join union window rank"
).split()

SECTIONS = ("docs", "blog", "guide")


def _w(h: int, p: int, i: int) -> str:
    """Deterministic word pick — tiny LCG over (host, page, position)."""
    x = (h * 1_000_003 + p * 10_007 + i * 101 + 42) & 0x7FFFFFFF
    x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return WORDS[x % len(WORDS)]


def _sentence(h: int, p: int, s: int, n: int = 12) -> str:
    ws = [_w(h, p, s * 64 + i) for i in range(n)]
    return ws[0].capitalize() + " " + " ".join(ws[1:]) + "."


def _paragraph(h: int, p: int, pid: int, sentences: int = 4) -> str:
    return " ".join(_sentence(h, p, pid * 8 + k) for k in range(sentences))


def host_name(h: int) -> str:
    return f"site{h}.test"


def host_pages_split(pages_per_host: int) -> tuple[int, int]:
    """(sections, leaves_per_section) for a host page budget."""
    leaves = max(1, (pages_per_host - 1 - len(SECTIONS)) // len(SECTIONS))
    return len(SECTIONS), leaves


def _leaf_url(base: str, sec: str, k: int) -> str:
    return f"{base}/{sec}/item-{k}"


def generate_host_pages(h: int, pages_per_host: int,
                        index_link_cap: int | None = 8,
                        content_scale: int = 1) -> list[dict]:
    """All page rows for one host (pure function, deterministic).
    ``index_link_cap`` bounds how many leaves the section index links
    directly (the reference fixture links a handful — deep chains); None
    links ALL leaves, giving the wide/shallow graph a real web has (bench
    uses this so BFS depth, not fixture shape, is what's measured)."""
    base = f"https://{host_name(h)}"
    _, leaves = host_pages_split(pages_per_host)
    rows: list[dict] = []

    def page(url: str, html: str | None, status: int = 200,
             content_type: str = "text/html", retries_needed: int = 0) -> None:
        rows.append(
            {
                "url": url,
                "host": host_name(h),
                "status_code": status,
                "content_type": content_type,
                "html": html,
                "retries_needed": retries_needed,
            }
        )

    # --- home page: intentionally NO <main> (body-fallback path, like the
    # reference fixture home page) -------------------------------------
    sec_links = "\n".join(
        f'  <a href="/{sec}">{sec.capitalize()}</a>' for sec in SECTIONS
    )
    home = f"""<!DOCTYPE html>
<html>
<head><title>Home {h}</title></head>
<body>
  <h1>Welcome to {host_name(h)}</h1>
  <p>{_paragraph(h, 0, 0)}</p>
{sec_links}
  <a href="/plain.txt">Plain</a>
  <a href="/missing-{h}">Dead link</a>
  <a href="/admin/secret">Admin</a>
  <a href="#top">Top</a>
  <a href="/styles.css">Styles</a>
</body>
</html>"""
    page(f"{base}/", home)

    # --- section index pages: <main> + nav boilerplate ------------------
    for si, sec in enumerate(SECTIONS):
        cap = leaves if index_link_cap is None else min(leaves, index_link_cap)
        leaf_links = "\n".join(
            f'      <a href="/{sec}/item-{k}">Item {k}</a>'
            for k in range(cap)
        )
        html = f"""<!DOCTYPE html>
<html>
<head><title>{sec} index</title></head>
<body>
  <nav><a href="/">Home</a><a href="/{sec}">Section</a></nav>
  <header><p>Site header boilerplate {h}</p></header>
  <main>
    <h1>{sec.capitalize()} index</h1>
    <p>{_paragraph(h, si + 1, 1)}</p>
    <ul>
      <li>{_sentence(h, si + 1, 9)}</li>
      <li>{_sentence(h, si + 1, 10)}</li>
    </ul>
{leaf_links}
    <a href="/{sec}/item-0?page=1&amp;sort=asc">Sorted</a>
  </main>
  <footer><p>Footer {host_name(h)}</p></footer>
</body>
</html>"""
        page(f"{base}/{sec}", html)

    # --- leaf pages: chain k -> k+1 plus cross/back links ----------------
    for si, sec in enumerate(SECTIONS):
        for k in range(leaves):
            p_id = 10 + si * leaves + k
            body_parts = [f"    <h1>{sec} item {k}</h1>"]
            body_parts.append(f"    <p>{_paragraph(h, p_id, 0)}</p>")
            if k % 2 == 0:
                body_parts.append(
                    f'    <img src="/assets/img-{h}-{si}-{k}.png" alt="figure {k}">'
                )
            body_parts.append(f"    <p>{_paragraph(h, p_id, 1)}</p>")
            for extra in range(4 * (content_scale - 1)):
                body_parts.append(
                    f"    <p>{_paragraph(h, p_id, 4 + extra, sentences=8)}</p>"
                )
            if k % 3 == 0:
                code = "\n".join(
                    f"let {_w(h, p_id, 40 + j)} = {j};" for j in range(4)
                )
                body_parts.append(
                    f'    <pre><code class="language-javascript">{code}</code></pre>'
                )
            if k % 5 == 1:
                body_parts.append(
                    f"    <p>Use <code>&lt;{_w(h, p_id, 50)}&gt;</code> tags.</p>"
                )
            if k % 4 == 2:
                body_parts.append(
                    f"    <p><strong>{_w(h, p_id, 60)}</strong> and <em>{_w(h, p_id, 61)}</em>.</p>"
                )
            # navigation links
            links = [f'    <a href="../{sec}">Back</a>', '    <a href="/">Home</a>']
            if k + 1 < leaves:
                links.append(f'    <a href="item-{k + 1}">Next</a>')
            if k % 7 == 3:
                other = SECTIONS[(si + 1) % len(SECTIONS)]
                links.append(f'    <a href="/{other}/item-{k}">Related</a>')
            if k % 11 == 5:
                links.append('    <a href="https://external.example/out">Ext</a>')
                links.append(f'    <a href="/report-{k}.pdf">Report</a>')
            body = "\n".join(body_parts + links)
            html = f"""<!DOCTYPE html>
<html>
<head><title>{sec} item {k}</title></head>
<body>
  <nav><a href="/">Home</a></nav>
  <article>
{body}
  </article>
  <footer><p>Footer</p></footer>
</body>
</html>"""
            page(_leaf_url(base, sec, k), html)

    # --- special endpoints ----------------------------------------------
    page(f"{base}/plain.txt", "plain text body", 200, "text/plain")
    page(f"{base}/admin/secret",
         "<html><body><main><h1>Secret</h1></main></body></html>")
    # retryable page: succeeds after 2 retries when linked (exercises T5)
    page(f"{base}/docs/item-0?page=1&sort=asc",
         f"<html><body><main><h1>Sorted view</h1><p>{_paragraph(h, 99, 0)}</p></main></body></html>",
         retries_needed=2)
    # permanently failing page (5xx after all retries)
    page(f"{base}/blog/item-0?page=1&sort=asc", None, 503)
    page(f"{base}/guide/item-0?page=1&sort=asc", None, 404)
    return rows


def generate_robots(h: int) -> dict:
    """Per-host robots.txt fixture (reference test-server.js:59-62 style)."""
    host = host_name(h)
    if h % 5 == 4:
        return {"host": host, "exists": False, "robots_txt": None,
                "disallow_prefixes": [], "crawl_delay_ms": None}
    lines = [
        "# robots for " + host,
        "User-agent: *",
        "Disallow: /admin/",
        "Disallow: /private/",
    ]
    delay_ms = None
    if h % 3 == 1:
        lines.append("Disallow: /*?*sort=")  # wildcard pattern
    if h % 4 == 2:
        lines.append("Crawl-delay: 2")
        delay_ms = 2000
    txt = "\n".join(lines)
    from inform_spark.functions.robots import parse_robots_txt

    parsed = parse_robots_txt(txt)
    return {
        "host": host,
        "exists": True,
        "robots_txt": txt,
        "disallow_prefixes": parsed.disallowed_paths,
        "crawl_delay_ms": parsed.crawl_delay_ms if parsed.crawl_delay_ms else delay_ms,
    }


def generate_site(n_hosts: int, pages_per_host: int, hot_host_share: float = 0.0,
                  index_link_cap: int | None = 8, content_scale: int = 1
                  ) -> tuple[list[dict], list[dict]]:
    """(pages, robots) for the whole synthetic web. ``hot_host_share`` > 0
    gives host 0 that share of all pages (skew fixture for salting tests)."""
    pages: list[dict] = []
    robots: list[dict] = []
    budgets = host_page_budgets(n_hosts, pages_per_host, hot_host_share)
    for h in range(n_hosts):
        pages.extend(
            generate_host_pages(h, budgets[h], index_link_cap, content_scale)
        )
        robots.append(generate_robots(h))
    return pages, robots


def host_page_budgets(n_hosts: int, pages_per_host: int, hot_host_share: float = 0.0
                      ) -> list[int]:
    total = n_hosts * pages_per_host
    if hot_host_share <= 0 or n_hosts == 1:
        return [pages_per_host] * n_hosts
    hot = int(total * hot_host_share)
    rest = max(4, (total - hot) // (n_hosts - 1))
    return [hot] + [rest] * (n_hosts - 1)


# ---------------------------------------------------------------------------
# Spark-side distributed generation (mapInPandas over the host range)
# ---------------------------------------------------------------------------

PAGES_COLS = ["url", "host", "status_code", "content_type", "html", "retries_needed"]


def pages_dataframe(spark, n_hosts: int, pages_per_host: int,
                    hot_host_share: float = 0.0, partitions: int | None = None,
                    index_link_cap: int | None = 8, content_scale: int = 1):
    """Distributed fixture generation: one task generates one slice of hosts.
    At bench scale this parallelizes HTML synthesis across all cores."""
    from pyspark.sql.types import (IntegerType, StringType, StructField, StructType)

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("host", StringType(), False),
            StructField("status_code", IntegerType(), False),
            StructField("content_type", StringType(), False),
            StructField("html", StringType(), True),
            StructField("retries_needed", IntegerType(), False),
        ]
    )
    budgets = host_page_budgets(n_hosts, pages_per_host, hot_host_share)
    budgets_b = spark.sparkContext.broadcast(budgets)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # yield PER HOST: one giant frame per partition can push a single
        # Arrow string column past the 2 GB chunk limit at high
        # content_scale (pyarrow then hands Spark a ChunkedArray it
        # rejects) — smaller frames keep every record batch well under it
        for pdf in batches:
            for h in pdf["id"]:
                rows = generate_host_pages(
                    int(h), budgets_b.value[int(h)], index_link_cap,
                    content_scale,
                )
                if rows:
                    yield pd.DataFrame(rows, columns=PAGES_COLS)

    n_part = partitions or min(n_hosts, spark.sparkContext.defaultParallelism)
    return (
        spark.range(n_hosts, numPartitions=n_part)
        .mapInPandas(gen, schema=schema)
    )


def robots_dataframe(spark, n_hosts: int):
    from inform_spark.schemas import ROBOTS

    rows = [generate_robots(h) for h in range(n_hosts)]
    data = [
        (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
        for r in rows
    ]
    return spark.createDataFrame(data, schema=ROBOTS)
