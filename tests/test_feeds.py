"""Feed sources: dialect parsing, detection tables, render, Spark adapter.

Mirrors the reference test coverage (tests/feed-crawler.test.js detection
tables, sources-render.test.js shapes) against our reimplementation."""

import pyspark.sql.functions as F
import pytest

from inform_spark.sources import feeds

RSS2 = """<?xml version="1.0"?>
<rss version="2.0" xmlns:content="http://purl.org/rss/1.0/modules/content/"
     xmlns:dc="http://purl.org/dc/elements/1.1/">
<channel>
  <title>Example Blog</title>
  <item>
    <title><![CDATA[First <b>Post</b>]]></title>
    <link>https://blog.test/first</link>
    <guid>post-1</guid>
    <pubDate>Mon, 06 Sep 2021 12:00:00 GMT</pubDate>
    <dc:creator>Alice</dc:creator>
    <content:encoded><![CDATA[<p>Hello &amp; welcome</p>]]></content:encoded>
    <category>news</category>
    <category>tech</category>
  </item>
  <item>
    <title>Second</title>
    <link>https://blog.test/second</link>
    <description>Plain description</description>
  </item>
</channel>
</rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Feed</title>
  <entry>
    <title>Entry One</title>
    <id>urn:e1</id>
    <link rel="self" href="https://a.test/self"/>
    <link rel="alternate" href="https://a.test/e1"/>
    <published>2023-05-01T10:00:00Z</published>
    <author><name>Bob</name></author>
    <content type="html">&lt;p&gt;Body&lt;/p&gt;</content>
    <category term="spark"/>
  </entry>
</feed>"""

RDF = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns="http://purl.org/rss/1.0/"
         xmlns:dc="http://purl.org/dc/elements/1.1/">
  <channel rdf:about="https://r.test/"><title>R</title></channel>
  <item rdf:about="https://r.test/i1">
    <title>RDF Item</title>
    <link>https://r.test/i1</link>
    <description>Desc</description>
    <dc:date>2022-02-02T00:00:00Z</dc:date>
    <dc:creator>Carol</dc:creator>
  </item>
</rdf:RDF>"""

BSKY = """{"feed":[{"post":{"uri":"at://did:plc:x/app.bsky.feed.post/abc123",
"author":{"handle":"user.bsky.social"},
"record":{"text":"Hello sky\\nmore","createdAt":"2024-03-01T08:00:00Z"},
"embed":{"images":[{"alt":"a photo"}]}}}]}"""

XJSON = """{"data":[{"id":"99001","text":"Check https://x.test/page out",
"created_at":"2024-04-01T00:00:00Z",
"public_metrics":{"like_count":3,"retweet_count":1,"reply_count":0}}]}"""


# --- dialect parsing ------------------------------------------------------

def test_rss2_fields():
    items = feeds.parse_feed_xml(RSS2, "https://blog.test/feed")
    assert len(items) == 2
    a = items[0]
    assert a["id"] == "post-1"
    assert a["title"] == "First Post"            # CDATA + tags stripped
    assert a["author"] == "Alice"                 # dc:creator fallback
    assert a["content_html"] == "<p>Hello &amp; welcome</p>"
    assert a["content_text"] == "Hello & welcome"
    assert a["tags"] == ["news", "tech"]
    assert a["published_at"].startswith("2021-09-06T12:00:00")
    b = items[1]
    assert b["id"] == "https://blog.test/second"  # guid falls back to link
    assert b["content_html"] == "Plain description"


def test_atom_fields():
    (e,) = feeds.parse_feed_xml(ATOM, "https://a.test/feed")
    assert e["id"] == "urn:e1"
    assert e["url"] == "https://a.test/e1"       # alternate link preferred
    assert e["author"] == "Bob"
    assert e["tags"] == ["spark"]                 # term attribute
    assert e["content_text"] == "Body"


def test_rdf_fields():
    (i,) = feeds.parse_feed_xml(RDF, "https://r.test/feed")
    assert i["id"] == "https://r.test/i1"
    assert i["author"] == "Carol"
    assert i["published_at"].startswith("2022-02-02")


def test_unknown_format_raises():
    with pytest.raises(ValueError, match="Unknown feed format"):
        feeds.parse_feed_xml("<html></html>", "https://x.test")


def test_limit_slices_items():
    items = feeds.parse_feed_xml(RSS2, "u", limit=1)
    assert len(items) == 1


# --- detection tables (reference tests/feed-crawler.test.js) --------------

@pytest.mark.parametrize(
    "inp,kind",
    [
        ("https://www.youtube.com/channel/UCabc", "youtube"),
        ("https://youtu.be/xyz", "youtube"),
        ("https://x.com/someone", "x"),
        ("https://twitter.com/someone", "x"),
        ("@handle", "x"),
        ("user.bsky.social", "bluesky"),
        ("@user.bsky.social", "bluesky"),
        ("https://bsky.app/profile/user", "bluesky"),
        ("https://blog.test/feed.xml", "rss"),
        ("https://blog.test/rss", "rss"),
        ("https://blog.test/atom.xml", "rss"),
        ("https://plain.test/page", None),
        ("not a url", None),
    ],
)
def test_detect_source_kind(inp, kind):
    assert feeds.detect_source_kind(inp) == kind


def test_feed_mode_lenient():
    assert feeds.should_use_feed_mode("https://site.test/blog/feed")
    assert not feeds.should_use_feed_mode("https://site.test/docs")


# --- youtube url rewrite (reference src/sources/youtube.js:60-105) --------

def test_youtube_feed_url_rewrites():
    assert (
        feeds.youtube_feed_url("https://www.youtube.com/channel/UCabc")
        == "https://www.youtube.com/feeds/videos.xml?channel_id=UCabc"
    )
    assert (
        feeds.youtube_feed_url("https://www.youtube.com/playlist?list=PL9")
        == "https://www.youtube.com/feeds/videos.xml?playlist_id=PL9"
    )
    existing = "https://www.youtube.com/feeds/videos.xml?channel_id=U1"
    assert feeds.youtube_feed_url(existing) == existing
    with pytest.raises(NotImplementedError):
        feeds.youtube_feed_url("https://www.youtube.com/@somehandle")
    with pytest.raises(ValueError):
        feeds.youtube_feed_url("https://www.youtube.com/playlist")


# --- render + filename (X10 / S9) -----------------------------------------

def test_render_markdown_shape():
    items = feeds.parse_feed_xml(RSS2, "https://blog.test/feed")
    md = feeds.render_item_markdown(items[0])
    lines = md.split("\n")
    assert lines[0] == "# First Post"
    assert "- **Source**: RSS/Atom Feed" in lines
    assert "- **Author**: Alice" in lines
    assert "- **Tags**: news, tech" in lines
    assert "---" in lines
    assert "Hello & welcome" in md


def test_render_social_brackets_urls():
    (tw,) = feeds.parse_x_feed(XJSON, "someone")
    md = feeds.render_item_markdown(tw)
    assert "<https://x.test/page>" in md
    # reference item mapping (x.js:110-182): metrics footer, 'x' tag,
    # @username author
    assert "Likes: 3 | Retweets: 1 | Replies: 0" in tw["content_text"]
    assert tw["tags"] == ["x"]
    assert tw["author"] == "@someone"


def test_parse_x_feed_ref_prefixes_and_links():
    body = (
        '{"data":[{"id":"1","text":"quoting this","referenced_tweets":'
        '[{"type":"quoted","id":"9"}],"entities":{"urls":[{"expanded_url":'
        '"https://ex.test/a"}],"hashtags":[{"tag":"spark"}]},'
        '"public_metrics":{"like_count":1,"retweet_count":0,"reply_count":2}}]}'
    )
    (tw,) = feeds.parse_x_feed(body, "someone")
    assert tw["content_text"].startswith("[QT] quoting this")
    assert "Links:\n- https://ex.test/a" in tw["content_text"]
    assert tw["tags"] == ["x", "spark"]


def test_transcript_paragraphing():
    text = " ".join(f"Sentence {i}." for i in range(7))
    out = feeds.format_transcript(text)
    paras = out.split("\n\n")
    assert len(paras) == 2 and paras[0].count(".") == 5


def test_generate_item_filename():
    items = feeds.parse_feed_xml(RSS2, "u")
    assert feeds.generate_item_filename(items[0]) == "2021-09-06-first-post.md"
    assert feeds.generate_item_filename(items[1]) == "second.md"


def test_bluesky_parse():
    (p,) = feeds.parse_bluesky_feed(BSKY, "user.bsky.social")
    assert p["url"] == "https://bsky.app/profile/user.bsky.social/post/abc123"
    assert p["tags"] == ["a photo"]
    assert p["title"] == "Hello sky"


# --- the Spark adapter -----------------------------------------------------

def test_ingest_feeds_spark(spark):
    rows = [
        ("https://blog.test/feed", "rss", RSS2),
        ("https://a.test/feed", "rss", ATOM),
        ("user.bsky.social", "bluesky", BSKY),
        ("someone", "x", XJSON),
        ("https://bad.test/feed", "rss", "<html>nope</html>"),
    ]
    feeds_df = spark.createDataFrame(rows, "feed_url string, kind string, body string")
    items = feeds.ingest_feeds(feeds_df).cache()
    assert items.schema == feeds.ITEM
    by_kind = {r["kind"]: r["n"] for r in items.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert by_kind == {"rss": 3, "bluesky": 1, "x": 1, "error": 1}

    rendered = feeds.render_items(items.filter("kind <> 'error'"))
    r = {x["id"]: x for x in rendered.collect()}
    assert r["post-1"]["doc_path"] == "feeds/rss/2021-09-06-first-post.md"
    assert r["post-1"]["markdown"].startswith("# First Post")
    assert all(len(x["spans"]) >= 1 for x in r.values())

    # S10 dedup sink: in-batch dupes + already-seen ids
    dup = items.unionByName(items.limit(2))
    seen = spark.createDataFrame([("post-1",)], "id string")
    deduped = feeds.dedup_items(dup, seen)
    assert deduped.count() == items.count() - 1
    assert deduped.filter("id = 'post-1'").count() == 0


def test_content_encoded_beats_earlier_description():
    """Reference rss.js:95-97 is a PRIORITY chain, not document order:
    a <description> appearing before <content:encoded> must lose."""
    from inform_spark.sources.feeds import parse_feed_xml

    xml = (
        '<?xml version="1.0"?>'
        '<rss version="2.0" xmlns:content="http://purl.org/rss/1.0/modules/content/">'
        "<channel><title>t</title>"
        "<item><title>a</title><link>http://e/a</link>"
        "<description>short summary</description>"
        "<content:encoded><![CDATA[<p>full article body</p>]]></content:encoded>"
        "</item></channel></rss>"
    )
    items = parse_feed_xml(xml, "http://e/feed")
    assert "full article body" in (items[0]["content_html"] or "")


def test_feed_limit_provenance():
    """The merged web-crawler default (limit=100) must NOT leak into feed
    mode: only an explicitly-set limit counts; otherwise feeds use the
    reference's 50."""
    from inform_spark.functions.config import options_for_target

    merged = options_for_target({}, "http://e/feed.xml", cli={})
    assert merged["limit"] == 100 and merged["_limit_explicit"] is False
    merged2 = options_for_target({}, "http://e/feed.xml", cli={"limit": 7})
    assert merged2["limit"] == 7 and merged2["_limit_explicit"] is True
    merged3 = options_for_target(
        {"globals": {"limit": 20}}, "http://e/feed.xml", cli={}
    )
    assert merged3["limit"] == 20 and merged3["_limit_explicit"] is True
