"""Span-model invariants + sequential-oracle behavior on the fixture site."""

from inform_spark.functions.spans import (
    markdown_to_spans,
    spans_to_markdown,
    text_stream,
)
from inform_spark.reference_impl import crawl_sequential
from inform_spark.sources.pages import generate_robots, generate_site


def test_span_roundtrip():
    md = "# Title\n\ntext before ![fig](/img/a.png) text after\n\n![b](/img/b.png)"
    spans = markdown_to_spans(md)
    assert spans_to_markdown(spans) == md
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text", "media"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]
    assert spans[1]["media_ref"] == "/img/a.png"
    assert spans[1]["text"] == "fig"


def test_span_text_stream():
    md = "a ![x](u) b"
    assert text_stream(markdown_to_spans(md)) == "a  b"


def test_span_no_media():
    md = "# Just text"
    spans = markdown_to_spans(md)
    assert len(spans) == 1 and spans[0]["kind"] == "text"
    assert spans_to_markdown(spans) == md


def _site(n_hosts=2, pages_per_host=16):
    return generate_site(n_hosts, pages_per_host)


def test_oracle_basic_crawl():
    pages, robots = _site()
    res = crawl_sequential(pages, robots, "https://site0.test/", limit=100)
    # seed attempted first
    assert res.order[0] == "https://site0.test/"
    # only same-host urls
    assert all(u.startswith("https://site0.test/") for u in res.order)
    # admin pages blocked by robots (host 0 has robots)
    assert not any("/admin/" in u for u in res.order)
    # dead link attempted and failed
    dead = f"https://site0.test/missing-0"
    assert res.seen.get(dead) == "failed"
    # non-html endpoint attempted, ok, no document
    plain = "https://site0.test/plain.txt"
    assert res.seen.get(plain) == "ok"
    assert plain not in res.documents
    # documents rendered for ok html pages
    assert "https://site0.test/" in res.documents
    assert res.documents["https://site0.test/"]["doc_id"] == "index.md"


def test_oracle_respects_limit():
    pages, robots = _site()
    res = crawl_sequential(pages, robots, "https://site0.test/", limit=5)
    assert len(res.order) == 5
    assert len(res.seen) == 5


def test_oracle_no_robots_host_allows_admin():
    # host 4 (h % 5 == 4) has no robots.txt -> admin allowed
    pages, robots = _site(n_hosts=5)
    res = crawl_sequential(pages, robots, "https://site4.test/", limit=200)
    assert any("/admin/" in u for u in res.order)


def test_oracle_queue_cap():
    pages, robots = _site()
    res = crawl_sequential(
        pages, robots, "https://site0.test/", limit=100, max_queue_size=3
    )
    assert res.dropped_by_cap > 0
    assert len(res.order) <= 100


def test_oracle_base_path_scoping():
    pages, robots = _site()
    res = crawl_sequential(pages, robots, "https://site0.test/docs/item-0", limit=50)
    # base path is /docs -> only /docs/* urls crawled (after the seed)
    assert all(u.startswith("https://site0.test/docs") for u in res.order)


def test_oracle_include_exclude():
    pages, robots = _site()
    res = crawl_sequential(
        pages,
        robots,
        "https://site0.test/",
        limit=100,
        exclude=["blog/**"],
    )
    assert not any("/blog/" in u for u in res.order[1:])


def test_oracle_retry_semantics():
    pages, robots = _site()
    res = crawl_sequential(pages, robots, "https://site0.test/", limit=200)
    # docs sorted-view page succeeds after retries (retries_needed=2 <= 3)
    docs_sorted = "https://site0.test/docs/item-0?page=1&sort=asc"
    blog_sorted = "https://site0.test/blog/item-0?page=1&sort=asc"
    # host 0: h%3==1 is false -> no wildcard sort disallow; both links reachable
    if docs_sorted in res.seen:
        assert res.seen[docs_sorted] == "ok"
    if blog_sorted in res.seen:
        assert res.seen[blog_sorted] == "failed"  # 503 after retries


def test_oracle_media_spans_present():
    pages, robots = _site()
    res = crawl_sequential(pages, robots, "https://site0.test/", limit=200)
    all_spans = [s for d in res.documents.values() for s in d["spans"]]
    media = [s for s in all_spans if s["kind"] == "media"]
    assert media, "fixture must produce media spans"
    assert all(s["media_ref"].endswith(".png") for s in media)
