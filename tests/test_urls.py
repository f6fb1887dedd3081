"""URL function goldens lifted from the reference's unit tests."""

from inform_spark.functions.urls import (
    derive_base_path,
    generate_filepath,
    in_base_path,
    normalize_url,
    resolve_url,
    should_skip_file,
    url_host,
    url_path_query,
)


# reference tests/web-crawler.test.js:75-90
def test_generate_filepath_markdown():
    assert generate_filepath("https://example.com/") == "index.md"
    assert generate_filepath("https://example.com/docs") == "docs.md"
    assert generate_filepath("https://example.com/docs/api") == "docs/api.md"
    assert generate_filepath("https://example.com/docs/api/") == "docs/api.md"


def test_generate_filepath_raw():
    assert generate_filepath("https://example.com/", raw=True) == "index.html"
    assert generate_filepath("https://example.com/docs", raw=True) == "docs.html"
    assert generate_filepath("https://example.com/docs/api", raw=True) == "docs/api.html"


def test_generate_filepath_query_params():
    # query params become _a_1_b_2 suffix (reference src/WebCrawler.js:626-628)
    assert (
        generate_filepath("https://example.com/search?a=1&b=2") == "search_a_1_b_2.md"
    )


def test_generate_filepath_illegal_chars():
    assert generate_filepath("https://example.com/docs/a:b") == "docs/a_b.md"


# reference tests/web-crawler.test.js:273-289
def test_base_path_derivation():
    assert derive_base_path("https://example.com/docs/en/sub-agents") == "/docs/en"
    assert derive_base_path("https://example.com/docs/en/") == "/docs/en"
    assert derive_base_path("https://example.com/") == "/"
    assert derive_base_path("https://example.com/docs") == "/docs"


# reference tests/web-crawler.test.js:147-170 semantics
def test_base_path_containment():
    assert in_base_path("/docs/getting-started", "/docs")
    assert in_base_path("/docs", "/docs")
    assert not in_base_path("/documentation", "/docs")
    assert not in_base_path("/blog/article", "/docs")
    assert in_base_path("/anything", "/")


# reference tests/web-crawler.test.js:116-125
def test_should_skip_file():
    assert should_skip_file("/document.pdf")
    assert should_skip_file("/image.jpg")
    assert should_skip_file("/script.js")
    assert should_skip_file("/styles.css")
    assert not should_skip_file("/page.html")
    assert not should_skip_file("/docs/api")


# reference tests/web-crawler.test.js:172-195 (new URL resolution)
def test_resolve_relative():
    base = "https://example.com/docs/api/"
    assert resolve_url("functions", base) == "https://example.com/docs/api/functions"
    assert resolve_url("../guides", base) == "https://example.com/docs/guides"
    assert (
        resolve_url("/docs/api/reference", base)
        == "https://example.com/docs/api/reference"
    )


# reference tests/web-crawler.test.js:197-217 (hash fragments stripped)
def test_resolve_strips_fragment():
    assert (
        resolve_url("/docs/agents#section-1", "https://example.com/")
        == "https://example.com/docs/agents"
    )
    assert (
        resolve_url("/docs/agents#section-2", "https://example.com/")
        == "https://example.com/docs/agents"
    )
    assert (
        resolve_url("/docs/agents", "https://example.com/")
        == "https://example.com/docs/agents"
    )


def test_resolve_invalid():
    assert resolve_url("mailto:x@y.z", "https://example.com/") is None
    assert resolve_url("javascript:void(0)", "https://example.com/") is None


def test_normalize():
    assert normalize_url("HTTPS://Example.COM") == "https://example.com/"
    assert normalize_url("https://example.com:443/x") == "https://example.com/x"
    assert normalize_url("http://example.com:8080/x") == "http://example.com:8080/x"


def test_host_and_path_query():
    assert url_host("https://Example.com/a") == "example.com"
    assert url_path_query("https://example.com/a?b=1") == "/a?b=1"
    assert url_path_query("https://example.com") == "/"


def test_dot_segments_removed_and_traversal_safe():
    from inform_spark.functions.urls import generate_filepath, normalize_url, resolve_url

    assert (
        normalize_url("http://site.com/docs/../admin/secret")
        == "http://site.com/admin/secret"
    )
    assert normalize_url("http://s/a/./b/") == "http://s/a/b/"
    assert normalize_url("http://s/..") == "http://s/"
    # absolute hrefs with dot segments canonicalize through resolve too
    assert (
        resolve_url("http://s/docs/../x", "http://s/docs/") == "http://s/x"
    )
    # doc_ids can never traverse out of the output dir
    assert ".." not in generate_filepath("http://s/a/../../../tmp/evil")
    # a path starting '//' must NOT be re-read as a network-path
    # reference during removal (hypothesis-found: http://0.0//0/. came
    # back as http://0.0/. — dot kept, host nearly swallowed)
    assert normalize_url("http://h//0/.") == "http://h//0/"
    assert normalize_url("http://h//a/../b") == "http://h//b"
    assert resolve_url("http://0.0//0/.", "http://0.0") == "http://0.0//0/"


def test_backslash_hrefs_whatwg():
    from inform_spark.functions.urls import resolve_url

    assert (
        resolve_url("..\\admin", "http://site.com/docs/a/")
        == "http://site.com/docs/admin"
    )
    assert resolve_url("foo\\bar.html", "http://s/d/") == "http://s/d/foo/bar.html"
