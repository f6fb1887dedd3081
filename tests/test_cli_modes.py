"""CLI git + feed modes end-to-end against loopback fixture servers — the
shape of the reference's integration suite (tests/integration/
git-crawler-integration.test.js, tests/feed-crawler.test.js): real engine,
real HTTP, files asserted on disk, exit-code policy checked. No external
network."""

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

import pytest


def b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


PNG_BYTES = b"\x89PNG\r\n\x1a\nfakepng"

# GitHub contents API fixture: repo o/r on branch main
GIT_LISTING = {
    "": [
        {"name": "README.md", "type": "file", "size": 14,
         "content": b64("# Readme\nhello"), "download_url": None},
        {"name": "logo.png", "type": "file", "size": len(PNG_BYTES),
         "content": base64.b64encode(PNG_BYTES).decode(), "download_url": None},
        {"name": "big.md", "type": "file", "size": 2_000_000,
         "content": None, "download_url": "__ORIGIN__/raw/big.md"},
        {"name": "docs", "type": "dir", "size": 0,
         "content": None, "download_url": None},
    ],
    "docs": [
        {"name": "intro.md", "type": "file", "size": 5,
         "content": b64("intro"), "download_url": None},
    ],
}

RSS2 = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>Blog</title>
<item><title>First Post</title><link>https://blog.test/p1</link>
<guid>p1</guid><pubDate>Mon, 06 Sep 2021 10:00:00 GMT</pubDate>
<description>Hello &lt;b&gt;world&lt;/b&gt;</description></item>
<item><title>Second Post</title><link>https://blog.test/p2</link>
<guid>p2</guid><pubDate>Tue, 07 Sep 2021 10:00:00 GMT</pubDate>
<description>More text</description></item>
</channel></rss>"""

YT_FEED = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<entry><id>yt:video:vid00001</id><title>Video One</title>
<link rel="alternate" href="https://www.youtube.com/watch?v=vid00001"/>
<published>2024-03-01T00:00:00Z</published>
<author><name>Creator</name></author></entry>
</feed>"""

YT_TRANSCRIPT = """<transcript>
<text start="0.0" dur="1.0">hello there .</text>
<text start="1.0" dur="1.0">this is the &amp;amp; transcript</text>
</transcript>"""

BSKY_FEED = {
    "feed": [
        {"post": {
            "uri": "at://did:plc:xyz/app.bsky.feed.post/rk1",
            "author": {"handle": "user.test"},
            "record": {"text": "Hello sky\nmore", "createdAt": "2024-01-02T03:04:05Z"},
        }},
    ]
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, body: bytes, ctype: str, status: int = 200):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self.server.request_log.append(self.path)
        origin = f"http://127.0.0.1:{self.server.server_address[1]}"
        u = urlsplit(self.path)
        q = parse_qs(u.query)
        path = u.path
        # --- GitHub contents API ---
        if path.startswith("/repos/o/r/contents"):
            sub = path[len("/repos/o/r/contents"):].lstrip("/")
            if q.get("ref") != ["main"] or sub not in GIT_LISTING:
                self._send(b"{}", "application/json", 404)
                return
            items = []
            for it in GIT_LISTING[sub]:
                it = dict(it)
                if it["download_url"]:
                    it["download_url"] = it["download_url"].replace(
                        "__ORIGIN__", origin
                    )
                items.append(it)
            self._send(json.dumps(items).encode(), "application/json")
        # repo with one file whose download URL 404s (exit-code policy)
        elif path.startswith("/repos/o/rbad/contents"):
            items = [{
                "name": "gone.md", "type": "file", "size": 2_000_000,
                "content": None, "download_url": f"{origin}/raw/gone.md",
            }]
            self._send(json.dumps(items).encode(), "application/json")
        # error-free repo with zero files (exit-code policy)
        elif path.startswith("/repos/o/rempty/contents"):
            self._send(b"[]", "application/json")
        elif path == "/raw/big.md":
            self._send(b"# Big file body", "text/plain")
        # --- feeds ---
        elif path == "/feed.xml":
            self._send(RSS2.encode(), "application/rss+xml")
        # --- YouTube ---
        elif path == "/@somehandle":
            page = '<html>"channelId":"UCabcdefghijklmnopqrst"</html>'
            self._send(page.encode(), "text/html")
        elif path == "/feeds/videos.xml":
            self._send(YT_FEED.encode(), "application/atom+xml")
        elif path == "/watch":
            self._send(b"<html>no captions config</html>", "text/html")
        elif path == "/api/timedtext":
            self._send(YT_TRANSCRIPT.encode(), "text/xml")
        # --- Bluesky XRPC ---
        elif path == "/xrpc/com.atproto.identity.resolveHandle":
            self._send(
                json.dumps({"did": "did:plc:xyz"}).encode(), "application/json"
            )
        elif path == "/xrpc/app.bsky.feed.getAuthorFeed":
            assert q.get("actor") == ["did:plc:xyz"]
            self._send(json.dumps(BSKY_FEED).encode(), "application/json")
        # --- X RSS fallback (nitter-style) ---
        elif path == "/nitter/someone/rss":
            self._send(RSS2.encode(), "application/rss+xml")
        else:
            self._send(b"", "text/plain", 404)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.request_log = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _origin(srv):
    return f"http://127.0.0.1:{srv.server_address[1]}"


# ---------------------------------------------------------------------------
# git mode
# ---------------------------------------------------------------------------


def test_cli_git_mode(spark, server, tmp_path, monkeypatch):
    from inform_spark import cli

    monkeypatch.setenv("GITHUB_API_BASE", _origin(server))
    out = tmp_path / "repo-out"
    rc = cli.main(["https://github.com/o/r", "--output-dir", str(out)])
    assert rc == 0
    assert (out / "README.md").read_text() == "# Readme\nhello"
    assert (out / "docs" / "intro.md").read_text() == "intro"
    # binary inline base64 -> bytes on disk
    assert (out / "logo.png").read_bytes() == PNG_BYTES
    # >1MB file fetched via download_url
    assert (out / "big.md").read_text() == "# Big file body"
    # recursion happened through the API, not a pre-built listing
    assert any(p.startswith("/repos/o/r/contents/docs") for p in server.request_log)


def test_cli_git_mode_file_failure_exit_code(spark, server, tmp_path, monkeypatch):
    """Reference exit-code policy (src/cli.js:229-231): a failed FILE
    download lands in crawler.failures -> rc 1, unless --ignore-errors."""
    from inform_spark import cli

    monkeypatch.setenv("GITHUB_API_BASE", _origin(server))
    out = tmp_path / "repo-bad"
    rc = cli.main(["https://github.com/o/rbad", "--output-dir", str(out)])
    assert rc == 1
    assert not (out / "gone.md").exists()  # failed files never hit disk
    rc2 = cli.main([
        "https://github.com/o/rbad",
        "--output-dir", str(tmp_path / "repo-bad2"), "--ignore-errors",
    ])
    assert rc2 == 0


def test_cli_git_mode_empty_repo_exit_zero(spark, server, tmp_path, monkeypatch):
    """An empty-but-error-free repo exits 0 (reference: failures map is
    empty, so cli.js:229 gate does not fire)."""
    from inform_spark import cli

    monkeypatch.setenv("GITHUB_API_BASE", _origin(server))
    rc = cli.main([
        "https://github.com/o/rempty",
        "--output-dir", str(tmp_path / "repo-empty"),
    ])
    assert rc == 0


def test_cli_git_mode_include_prunes(spark, server, tmp_path, monkeypatch):
    from inform_spark import cli

    monkeypatch.setenv("GITHUB_API_BASE", _origin(server))
    out = tmp_path / "repo-inc"
    rc = cli.main([
        "https://github.com/o/r", "--output-dir", str(out),
        "--include", "*.md",
    ])
    assert rc == 0
    assert (out / "README.md").exists()
    assert not (out / "logo.png").exists()


# ---------------------------------------------------------------------------
# feed mode
# ---------------------------------------------------------------------------


def test_cli_feed_mode_rss(spark, server, tmp_path):
    from inform_spark import cli

    out = tmp_path / "feed-out"
    rc = cli.main([_origin(server) + "/feed.xml", "--output-dir", str(out)])
    assert rc == 0
    files = sorted((out / "feeds" / "rss").glob("*.md"))
    assert [f.name for f in files] == [
        "2021-09-06-first-post.md",
        "2021-09-07-second-post.md",
    ]
    body = files[0].read_text()
    assert "# First Post" in body and "Hello world" in body


def test_cli_feed_mode_digest(spark, server, tmp_path):
    from inform_spark import cli

    out = tmp_path / "digest-out"
    rc = cli.main(
        [_origin(server) + "/feed.xml", "--digest", "--output-dir", str(out)]
    )
    assert rc == 0
    md = (out / "feeds" / "rss" / "digest.md").read_text()
    # TOC with anchor links, then anchored sections (render.js:192-266)
    assert "## Contents" in md
    assert "1. [First Post](#item-1)" in md
    assert "2. [Second Post](#item-2)" in md
    assert '<a id="item-1"></a>' in md
    assert "## 1. First Post" in md
    assert "_Items: 2_" in md


def test_cli_feed_youtube_transcript(spark, server, tmp_path, monkeypatch):
    """Handle URL -> page-scrape channel resolve -> feed -> per-video
    timedtext transcript (src/sources/youtube.js:25-53,180-276)."""
    from inform_spark import cli

    origin = _origin(server)
    monkeypatch.setenv("YT_PAGE_BASE", origin)
    monkeypatch.setenv("YT_FEED_BASE", origin)
    monkeypatch.setenv("YT_TIMEDTEXT_BASE", origin)
    out = tmp_path / "yt-out"
    rc = cli.main(
        ["https://www.youtube.com/@somehandle", "--output-dir", str(out)]
    )
    assert rc == 0
    # channel id came from the page scrape
    assert any("/feeds/videos.xml" in p and "UCabcdefghijklmnopqrst" in p
               for p in server.request_log)
    files = list((out / "feeds" / "youtube").glob("*.md"))
    assert len(files) == 1
    body = files[0].read_text()
    # transcript fetched, entities decoded, space-before-punct tightened
    assert "hello there. this is the & transcript" in body


def test_cli_feed_bluesky_resolve(spark, server, tmp_path, monkeypatch):
    from inform_spark import cli

    monkeypatch.setenv("BSKY_API_BASE", _origin(server))
    out = tmp_path / "bsky-out"
    rc = cli.main(
        ["https://bsky.app/profile/user.test", "--output-dir", str(out)]
    )
    assert rc == 0
    # resolveHandle XRPC was used to get the DID before the feed call
    assert any("resolveHandle" in p for p in server.request_log)
    files = list((out / "feeds" / "bluesky").glob("*.md"))
    assert len(files) == 1
    assert "Hello sky" in files[0].read_text()


def test_cli_feed_x_rss_fallback(spark, server, tmp_path, monkeypatch):
    from inform_spark import cli

    monkeypatch.setenv("X_RSS_TEMPLATE", _origin(server) + "/nitter/{user}/rss")
    monkeypatch.delenv("X_BEARER_TOKEN", raising=False)
    out = tmp_path / "x-out"
    rc = cli.main(["@someone", "--feed", "--output-dir", str(out)])
    assert rc == 0
    assert any(p == "/nitter/someone/rss" for p in server.request_log)
    files = sorted((out / "feeds" / "x").glob("*.md"))
    assert len(files) == 2
    body = files[0].read_text()
    # re-tagged as X source (src/sources/x.js:196-205)
    assert "- **Source**: X (Twitter)" in body
    assert "x" in body.split("**Tags**:")[1].splitlines()[0]


def test_cli_feed_error_exit_code(spark, server, tmp_path):
    """A dead feed produces rc=1 (nothing succeeded), not an exception."""
    from inform_spark import cli

    rc = cli.main(
        [_origin(server) + "/nope/feed.xml", "--output-dir",
         str(tmp_path / "dead")]
    )
    assert rc == 1


def test_cli_ignore_errors_exit_code(spark, server, tmp_path):
    """--ignore-errors: failures no longer force rc=1 (src/cli.js:214)."""
    from inform_spark import cli

    rc = cli.main(
        [_origin(server) + "/nope/feed.xml", "--ignore-errors",
         "--output-dir", str(tmp_path / "dead-ok")]
    )
    assert rc == 0


# ---------------------------------------------------------------------------
# flag surface parity (reference src/cli.js:256-449 parseArgs + tests/cli.test.js)
# ---------------------------------------------------------------------------


def test_cli_version_flag(capsys, monkeypatch):
    from importlib import reload

    from inform_spark import cli

    monkeypatch.setenv("INFORM_VERSION", "9.9.9-test")
    reload(cli)
    with pytest.raises(SystemExit) as e:
        cli.main(["--version"])
    assert e.value.code == 0
    assert "9.9.9-test" in capsys.readouterr().out
    monkeypatch.delenv("INFORM_VERSION")
    reload(cli)
    with pytest.raises(SystemExit) as e:
        cli.main(["-v"])
    assert e.value.code == 0
    assert "0.1.0" in capsys.readouterr().out


@pytest.mark.parametrize(
    "argv",
    [
        ["https://x.test/", "--limit", "0"],
        ["https://x.test/", "--limit", "abc"],
        ["https://x.test/", "--delay", "-1"],
        ["https://x.test/", "--concurrency", "0"],
        ["https://x.test/", "--max-retries", "-2"],
        ["https://x.test/", "--max-queue-size", "0"],
        ["https://x.test/", "--unknown-option"],
    ],
)
def test_cli_invalid_values_exit_1(argv, capsys):
    """Invalid/unknown flags exit with code 1 and an Error: line on stderr
    (reference parseArgs behavior — NOT argparse's default exit 2)."""
    from inform_spark import cli

    with pytest.raises(SystemExit) as e:
        cli.main(argv)
    assert e.value.code == 1
    assert capsys.readouterr().err.startswith("Error:")


def test_cli_verbose_quiet_conflict(capsys):
    from inform_spark import cli

    rc = cli.main(["https://x.test/", "--verbose", "--quiet"])
    assert rc == 1
    assert "Cannot use both --verbose and --quiet" in capsys.readouterr().err


def test_cli_no_url(capsys):
    from inform_spark import cli

    rc = cli.main([])
    assert rc == 1
    assert "No URL provided" in capsys.readouterr().err


def test_cli_yaml_shortcut_and_short_flags(spark, server, tmp_path):
    """`inform-spark targets.yaml` shortcut (url from first target) plus the
    -o/-c short flags (src/cli.js:140-145,274-291)."""
    import yaml

    from inform_spark import cli

    url = _origin(server) + "/feed.xml"
    out = tmp_path / "yaml-out"
    conf = tmp_path / "targets.yaml"
    conf.write_text(yaml.safe_dump({"targets": [{"url": url}]}))
    rc = cli.main([str(conf), "-o", str(out)])
    assert rc == 0
    assert list((out / "feeds" / "rss").glob("*.md"))

    out2 = tmp_path / "cflag-out"
    rc = cli.main([url, "-c", str(conf), "-o", str(out2)])
    assert rc == 0
    assert list((out2 / "feeds" / "rss").glob("*.md"))


def test_cli_feed_source_flags_reach_fetcher(spark, server, tmp_path, monkeypatch):
    """--x-rss-template / --no-yt-transcript flow through the config layers
    to the source fetchers (previously env/config-file only)."""
    from inform_spark import cli

    monkeypatch.delenv("X_RSS_TEMPLATE", raising=False)
    monkeypatch.delenv("X_BEARER_TOKEN", raising=False)
    out = tmp_path / "xflag-out"
    rc = cli.main([
        "@flagged", "--feed", "--output-dir", str(out),
        "--x-rss-template", _origin(server) + "/nitter/{user}/rss",
    ])
    # the template routed the fetch to /nitter/flagged/rss (404 on this
    # fixture -> rc 1), proving the flag reached the fetcher
    assert any(p == "/nitter/flagged/rss" for p in server.request_log)
    assert rc == 1

    # --no-yt-transcript: no timedtext request is made
    origin = _origin(server)
    monkeypatch.setenv("YT_PAGE_BASE", origin)
    monkeypatch.setenv("YT_FEED_BASE", origin)
    monkeypatch.setenv("YT_TIMEDTEXT_BASE", origin)
    server.request_log.clear()
    rc = cli.main([
        "https://www.youtube.com/@somehandle", "--no-yt-transcript",
        "--output-dir", str(tmp_path / "noyt-out"),
    ])
    assert rc == 0
    assert not any("timedtext" in p for p in server.request_log)
