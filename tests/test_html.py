"""HTML extraction + markdown conversion goldens (reference test fixtures)."""

from inform_spark.functions.html import (
    cleanup_markdown,
    extract_content,
    extract_links,
    html_to_markdown,
    render_page_markdown,
    strip_html,
)


# reference tests/web-crawler.test.js:219-253
def test_extract_links_quotes_and_hash():
    html = """
      <html>
        <head><link rel="stylesheet" href="/styles.css"></head>
        <body>
          <nav><a href="/home">Home</a><a href="/about">About</a></nav>
          <main>
            <a href="/docs/getting-started">Getting Started</a>
            <a href="https://example.com/docs/api">API Docs</a>
            <a href='https://example.com/docs/guide'>Guide</a>
            <a href="/external?url=https://other.com">External</a>
            <a href="#section">Hash Link</a>
          </main>
        </body>
      </html>
    """
    links = extract_links(html)
    assert "/home" in links
    assert "/about" in links
    assert "/docs/getting-started" in links
    assert "https://example.com/docs/api" in links
    assert "https://example.com/docs/guide" in links
    assert "/external?url=https://other.com" in links
    assert "#section" not in links
    # <link href> is not an anchor
    assert "/styles.css" not in links


# reference tests/web-crawler.test.js:255-271
def test_extract_links_decodes_entities():
    html = """
      <a href="/page?param1=value&amp;param2=value2">Link with entities</a>
      <a href="/search?q=&quot;test&quot;">Search link</a>
    """
    links = extract_links(html)
    assert "/page?param1=value&param2=value2" in links
    assert '/search?q="test"' in links


def test_extract_content_main_found_removes_unwanted():
    html = (
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<main><h1>Doc</h1><p>Text</p></main>"
        "<footer>foot</footer></body></html>"
    )
    root, found = extract_content(html)
    assert found
    md = render_page_markdown(html)
    assert "# Doc" in md
    assert "Home" not in md  # nav removed
    assert "foot" not in md  # footer removed


def test_extract_content_no_main_keeps_everything():
    html = (
        "<html><body><nav><a href='/x'>NavLink</a></nav>"
        "<h1>Title</h1><p>Body text</p></body></html>"
    )
    root, found = extract_content(html)
    assert not found
    md = render_page_markdown(html)
    # no main selector -> raw html through turndown, nav content KEPT
    assert "NavLink" in md
    assert "# Title" in md


def test_class_selector_counts_as_main():
    html = "<html><body><div class='content'><h1>C</h1></div><nav>n</nav></body></html>"
    _, found = extract_content(html)
    assert found


def test_unwanted_with_code_class_preserved():
    html = (
        "<html><body><main><h1>T</h1>"
        "<nav class='code-nav'>kept</nav><nav>dropped</nav></main></body></html>"
    )
    md = render_page_markdown(html)
    assert "kept" in md
    assert "dropped" not in md


# integration golden (web-crawler-integration.test.js:104-120): the home
# fixture page (no <main>) converts with '# Home Page' and '[Page 1]'
def test_reference_home_page_golden():
    html = """<!DOCTYPE html>
<html>
<head><title>Home Page</title></head>
<body>
  <h1>Home Page</h1>
  <p>Welcome to the test site.</p>
  <a href="/page1">Page 1</a>
  <a href="/page2">Page 2</a>
  <a href="/docs/intro">Documentation</a>
</body>
</html>"""
    md = render_page_markdown(html)
    assert "# Home Page" in md
    assert "[Page 1](/page1)" in md
    assert "Welcome to the test site." in md


def test_reference_docs_intro_golden():
    html = """<!DOCTYPE html>
<html>
<head><title>Documentation</title></head>
<body>
  <main>
    <h1>Documentation</h1>
    <p>Getting started guide.</p>
    <pre><code class="language-javascript">console.log('Hello');</code></pre>
  </main>
  <nav><a href="/">Home</a></nav>
</body>
</html>"""
    md = render_page_markdown(html)
    assert "# Documentation" in md
    assert "Getting started guide." in md
    assert "```javascript\nconsole.log('Hello');\n```" in md
    assert "[Home]" not in md  # nav removed (main found)


def test_pre_code_language_quirk():
    # JS String.replace returns input when regex does not match
    # (src/WebCrawler.js:90): class 'foo' -> language 'foo'
    md = html_to_markdown("<pre><code class='foo'>x = 1</code></pre>")
    assert "```foo\nx = 1\n```" in md
    md2 = html_to_markdown("<pre><code>x = 1</code></pre>")
    assert "```\nx = 1\n```" in md2


def test_inline_code_rules():
    # short inline code with angle brackets stays inline (custom rule)
    md = html_to_markdown("<p>Use <code>&lt;div&gt;</code> tags.</p>")
    assert "`<div>`" in md
    # long html-ish code becomes fenced html block
    long_code = "&lt;div&gt;" + "x" * 60
    md2 = html_to_markdown(f"<p><code>{long_code}</code></p>")
    assert "```html" in md2


def test_empty_link_rule():
    md = html_to_markdown('<p><a href="#"></a>keep</p>')
    assert "[]" not in md
    assert "keep" in md


def test_images_become_markdown():
    md = html_to_markdown('<p><img src="/a.png" alt="pic"> tail</p>')
    assert "![pic](/a.png)" in md


def test_emphasis_delimiters():
    md = html_to_markdown("<p><strong>bold</strong> and <em>ital</em></p>")
    assert "**bold**" in md
    assert "_ital_" in md


def test_lists():
    md = html_to_markdown("<ul><li>one</li><li>two</li></ul>")
    assert "*   one" in md
    assert "*   two" in md
    md2 = html_to_markdown("<ol><li>one</li><li>two</li></ol>")
    assert "1.  one" in md2
    assert "2.  two" in md2


# reference tests/web-crawler.test.js:92-114
def test_cleanup_markdown():
    messy = "\n# Title\n\n\nSome text with empty links []()\n\n\n\nMore text\n    \n    \n# Another Title\n    "
    cleaned = cleanup_markdown(messy)
    assert "[]()" not in cleaned
    assert cleaned.strip()
    # NOTE: like the reference ("Our cleanup might not remove all triple
    # newlines in this specific case", tests/web-crawler.test.js:112), the
    # heading-padding pass can reintroduce a \n\n\n after a heading — the
    # port keeps that quirk for byte-parity.


def test_cleanup_heading_padding():
    out = cleanup_markdown("text\n# H\nmore")
    assert "text\n\n# H\n\nmore" == out


# reference src/sources/util.js:95-121 semantics
def test_strip_html():
    assert strip_html("<p>Hello <b>world</b></p>") == "Hello world"
    assert strip_html("<![CDATA[<p>Inner</p>]]>") == "Inner"
    assert strip_html("<script>var x;</script>text") == "text"
    assert strip_html("a &amp; b &lt;c&gt;") == "a & b <c>"


def test_inline_code_backtick_padding():
    from inform_spark.functions.html import render_page_markdown

    assert (
        render_page_markdown("<main><p>use <code>a`b</code> now</p></main>")
        == "use ``a`b`` now"
    )
    assert (
        render_page_markdown("<main><p>x <code>plain</code></p></main>")
        == "x `plain`"
    )


def test_ordered_list_start_attribute():
    from inform_spark.functions.html import render_page_markdown

    assert (
        render_page_markdown('<main><ol start="5"><li>a</li><li>b</li></ol></main>')
        == "5.  a\n6.  b"
    )


def test_deeply_nested_page_degrades_not_crashes():
    from inform_spark.operators.render import render_one

    html = "<main>" + "<div>" * 3000 + "<a href='/x'>t</a>deep" + "</div>" * 3000 + "</main>"
    for raw in (False, True):
        r = render_one("http://h/deep", html, raw=raw)
        assert r["spans"] and r["links"] == ["http://h/x"]
        assert "deep" in r["spans"][0]["text"]
