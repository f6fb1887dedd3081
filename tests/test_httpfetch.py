"""Live HTTP fetch stage against a loopback fixture server (the reference's
integration-test shape: tests/integration/test-server.js — a local server
with nested pages, robots.txt, a non-HTML endpoint, 404s, and a request log
for behavioral asserts). No external network."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

SITE = {
    "/": """<html><body><main><h1>Home</h1>
        <a href="/docs">docs</a> <a href="/plain.txt">txt</a>
        <a href="/admin/secret">admin</a> <a href="/missing">gone</a>
        <a href="/flaky">flaky</a></main></body></html>""",
    "/docs": """<html><body><main><h2>Docs</h2><p>hello spark</p>
        <img src="/img/logo.png" alt="logo">
        <a href="/docs#frag">self</a> <a href="/">home</a></main></body></html>""",
    "/flaky": "<html><body><main><p>finally up</p></main></body></html>",
    "/admin/secret": "<html><body>forbidden zone</body></html>",
}
ROBOTS_TXT = "User-agent: *\nDisallow: /admin/\n"


class _Handler(BaseHTTPRequestHandler):
    server_version = "Fixture/1.0"

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        log = self.server.request_log
        log.append(self.path)
        if self.path == "/robots.txt":
            body = ROBOTS_TXT.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
        elif self.path == "/plain.txt":
            body = b"just text"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
        elif self.path == "/flaky":
            self.server.flaky_hits += 1
            if self.server.flaky_hits <= 2:
                self.send_response(503)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = SITE["/flaky"].encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
        elif self.path == "/huge":
            body = (
                b"<html><body><main><p>" + b"x" * 100_000
                + b'</p><a href="/docs">tail link</a></main></body></html>'
            )
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
        elif self.path in SITE:
            body = SITE[self.path].encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
        else:
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.request_log = []
    srv.flaky_hits = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _origin(srv):
    return f"http://127.0.0.1:{srv.server_address[1]}"


def test_fetch_robots_df(spark, server):
    from inform_spark.sources.httpfetch import fetch_robots_df

    rows = fetch_robots_df(spark, [_origin(server)]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["host"] == f"127.0.0.1:{server.server_address[1]}"
    assert r["exists"] is True
    assert list(r["disallow_prefixes"]) == ["/admin/"]


def test_live_crawl_end_to_end(spark, server, tmp_path):
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.sources.httpfetch import fetch_robots_df

    origin = _origin(server)
    robots = fetch_robots_df(spark, [origin])
    cfg = CrawlConfig(
        seeds=[origin + "/"],
        limit=20,
        fetch_mode="http",
        http_base_backoff_s=0.01,
        render_partitions=2,
    )
    eng = CrawlEngine(spark, None, robots, cfg, checkpoint_dir=str(tmp_path / "ck"))
    summary = eng.run()
    seen = {r["url"]: r for r in eng.seen().collect()}

    host = f"127.0.0.1:{server.server_address[1]}"
    assert f"http://{host}/" in seen and seen[f"http://{host}/"]["status"] == "ok"
    assert seen[f"http://{host}/docs"]["status"] == "ok"
    # non-HTML fetched ok but produces no document (F1 gate)
    assert seen[f"http://{host}/plain.txt"]["status"] == "ok"
    doc_urls = {r["url"] for r in eng.documents().collect()}
    assert f"http://{host}/plain.txt" not in doc_urls
    # 404 tracked as failure, not exception
    assert seen[f"http://{host}/missing"]["status"] == "failed"
    assert seen[f"http://{host}/missing"]["error"] == "HTTP 404"
    # retry/backoff: flaky 503,503,200 -> ok after retries
    assert seen[f"http://{host}/flaky"]["status"] == "ok"
    assert server.flaky_hits == 3
    # robots: the disallowed link was never enqueued NOR requested
    assert not any(u.endswith("/admin/secret") for u in seen)
    assert "/admin/secret" not in server.request_log
    # media span extracted from live html
    media = (
        eng.documents()
        .selectExpr("explode(spans) s")
        .filter("s.kind = 'media'")
        .collect()
    )
    assert any("logo.png" in r["s"]["media_ref"] for r in media)
    assert summary.failed >= 1 and summary.ok >= 4


def test_truncated_body_flagged(spark, server, tmp_path):
    """A body over http_max_bytes is hard-capped and MARKED (seen.error =
    'truncated', status stays ok) instead of silently clipped (ADVICE r01:
    silent truncation can drop links vs the reference's full-body fetch)."""
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine

    origin = _origin(server)
    cfg = CrawlConfig(
        seeds=[origin + "/huge"], limit=1, fetch_mode="http",
        http_max_bytes=1024, http_base_backoff_s=0.01,
    )
    eng = CrawlEngine(spark, None, None, cfg,
                      checkpoint_dir=str(tmp_path / "trunc-ck"))
    summary = eng.run()
    (row,) = eng.seen().collect()
    assert row["status"] == "ok" and row["error"] == "truncated"
    assert summary.ok == 1


def test_cli_web_mode(spark, server, tmp_path):
    """CLI end-to-end: crawl the fixture server, write markdown files at
    the X5-derived paths. The fixture site links a 404 (/missing), so the
    reference exit-code policy (src/cli.js:241-243: failures>0 and no
    --ignore-errors -> exit 1) yields rc 1 with files still written;
    --ignore-errors flips it to 0."""
    from inform_spark import cli

    out = tmp_path / "out"
    rc = cli.main(
        [
            _origin(server) + "/",
            "--limit", "10",
            "--delay", "0",
            "--output-dir", str(out),
            "--checkpoint-dir", str(tmp_path / "cli-ck"),
        ]
    )
    assert rc == 1  # /missing 404'd; reference exits 1 without --ignore-errors
    assert (out / "index.md").exists()
    assert (out / "docs.md").exists() or (out / "docs" / "index.md").exists()
    assert "# Home" in (out / "index.md").read_text()

    out2 = tmp_path / "out-ie"
    rc = cli.main(
        [
            _origin(server) + "/",
            "--limit", "10",
            "--delay", "0",
            "--ignore-errors",
            "--output-dir", str(out2),
            "--checkpoint-dir", str(tmp_path / "cli-ck-ie"),
        ]
    )
    assert rc == 0
    assert (out2 / "index.md").exists()


def test_cli_web_mode_raw(spark, server, tmp_path):
    """--raw writes extracted HTML at .html paths (reference
    src/WebCrawler.js:336-341; integration test
    web-crawler-integration.test.js:122-139)."""
    from inform_spark import cli

    out = tmp_path / "raw-out"
    rc = cli.main(
        [
            _origin(server) + "/",
            "--limit", "10",
            "--delay", "0",
            "--raw",
            "--ignore-errors",  # fixture site links a 404
            "--output-dir", str(out),
            "--checkpoint-dir", str(tmp_path / "raw-ck"),
        ]
    )
    assert rc == 0
    assert (out / "index.html").exists()
    body = (out / "index.html").read_text()
    # raw mode: original HTML markup survives (no markdown conversion)
    assert "<h1>Home</h1>" in body and "# Home" not in body
    assert not list(out.glob("**/*.md"))


def test_cli_config_file_precedence(spark, server, tmp_path):
    """Config layering (reference src/config.js:140-166): file globals
    apply when the flag is unset; explicit CLI flags win; per-target
    overrides globals. The old argparse defaults silently clobbered file
    globals (ADVICE r01)."""
    import yaml

    from inform_spark import cli

    url = _origin(server) + "/"
    conf = tmp_path / "inform.yaml"
    out = tmp_path / "conf-out"
    conf.write_text(yaml.safe_dump({
        "globals": {"delay": 0, "limit": 3},
        "targets": [{"url": url, "output_dir": str(out)}],
    }))
    rc = cli.main(
        [url, "--config", str(conf),
         "--checkpoint-dir", str(tmp_path / "conf-ck")]
    )
    assert rc == 0
    # file limit=3 honored (argparse default no longer overrides): the
    # fixture site has >3 reachable pages, so exactly 3 were attempted
    files = list(out.glob("**/*.md"))
    assert 0 < len(files) <= 3


def test_cli_mode_dispatch_order():
    """Driver-side routing (src/cli.js:206-248): git wins over feed over
    web. Pure dispatch check — the modes themselves are e2e-tested against
    loopback fixture servers in test_cli_modes.py."""
    from inform_spark.functions.giturl import is_git_url
    from inform_spark.sources.feeds import should_use_feed_mode

    assert is_git_url("https://github.com/octo/repo")
    assert not is_git_url("https://example.com/feed.xml")
    assert should_use_feed_mode("https://example.com/feed.xml")
    assert not should_use_feed_mode("https://example.com/docs/")
