"""HTML parsing, main-content extraction and HTML->Markdown conversion.

Pure-Python core replicating the reference's behavior:

- link extraction regex  — reference src/WebCrawler.js:481-503 (exact port)
- main-content selector machine — reference src/WebCrawler.js:363-479:
  if any *main* selector matches anywhere, the output is the FULL document
  with the unwanted-element list removed (unless class contains 'code');
  otherwise the original HTML is returned untouched
- Turndown-equivalent markdown (atx headings, fenced code, '_' emphasis)
  with the reference's 4 custom rules — reference src/WebCrawler.js:75-118
- markdown cleanup (7 regex passes) — reference src/WebCrawler.js:579-588
- stripHtml — reference src/sources/util.js:95-121

These run inside vectorized pandas UDF batches on executors (see
:func:`make_extract_render_udf`) and inside the plain-Python sequential
oracle, so both sides share one implementation.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# ---------------------------------------------------------------------------
# Minimal DOM
# ---------------------------------------------------------------------------

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | Text] = []
        self.parent: Node | None = None

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def class_string(self) -> str:
        return self.attrs.get("class") or ""

    def text_content(self) -> str:
        out = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, Text):
                out.append(n.data)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]


class Text:
    __slots__ = ("data", "parent")

    def __init__(self, data: str):
        self.data = data
        self.parent: Node | None = None


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        t = Text(data)
        t.parent = self.stack[-1]
        self.stack[-1].children.append(t)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


def serialize(node: Node | Text) -> str:
    """Re-serialize a (pruned) DOM subtree back to HTML (raw mode output)."""
    from html import escape

    if isinstance(node, Text):
        return escape(node.data, quote=False)
    parts = []
    if node.tag != "#root":
        attrs = "".join(f' {k}="{escape(v or "")}"' for k, v in node.attrs.items())
        parts.append(f"<{node.tag}{attrs}>")
    for c in node.children:
        parts.append(serialize(c))
    if node.tag != "#root" and node.tag not in VOID_ELEMENTS:
        parts.append(f"</{node.tag}>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Link extraction (exact regex port, reference src/WebCrawler.js:481-503)
# ---------------------------------------------------------------------------

_HREF_RE = re.compile(r"""<a\s+[^>]*href=["']([^"']+)["'][^>]*>""", re.IGNORECASE)

_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))


def decode_entities(href: str) -> str:
    for ent, ch in _ENTITIES:
        href = href.replace(ent, ch)
    return href


def extract_links(html: str) -> list[str]:
    """All <a href> values, '#...' skipped, 5 HTML entities decoded."""
    links = []
    for m in _HREF_RE.finditer(html or ""):
        href = m.group(1)
        if href and not href.startswith("#"):
            links.append(decode_entities(href))
    return links


# ---------------------------------------------------------------------------
# Main-content extraction (reference src/WebCrawler.js:363-479)
# ---------------------------------------------------------------------------

MAIN_TAGS = frozenset({"main", "article"})
MAIN_CLASSES = frozenset(
    {
        "main-content",
        "content",
        "post-content",
        "entry-content",
        "article-content",
        "documentation",
        "docs-content",
    }
)
UNWANTED_TAGS = frozenset({"nav", "header", "footer", "script", "style", "noscript"})
UNWANTED_CLASSES = frozenset(
    {
        "nav",
        "navigation",
        "menu",
        "sidebar",
        "advertisement",
        "ad",
        "social",
        "share",
        "comments",
        "related",
        "breadcrumb",
        "cookie-notice",
        "popup",
        "modal",
        "overlay",
    }
)


def _is_main(node: Node) -> bool:
    if node.tag in MAIN_TAGS:
        return True
    if node.attrs.get("role") == "main":
        return True
    return any(c in MAIN_CLASSES for c in node.classes())


def _is_unwanted(node: Node) -> bool:
    if "code" in node.class_string():
        # reference guard: class containing 'code' is never removed
        # (src/WebCrawler.js:429)
        return False
    if node.tag in UNWANTED_TAGS:
        return True
    return any(c in UNWANTED_CLASSES for c in node.classes())


def _has_main_selector(root: Node) -> bool:
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, Node):
            if n.tag != "#root" and _is_main(n):
                return True
            stack.extend(n.element_children())
    return False


def _prune_unwanted(node: Node) -> None:
    node.children = [
        c
        for c in node.children
        if not (isinstance(c, Node) and _is_unwanted(c))
    ]
    for c in node.children:
        if isinstance(c, Node):
            _prune_unwanted(c)


def extract_content(html: str) -> tuple[Node, bool]:
    """Return (dom, found_main). When a main selector matched anywhere, the
    dom is the full document with unwanted elements pruned; otherwise the
    untouched dom (the reference returns the raw html string in that case,
    src/WebCrawler.js:476)."""
    root = parse_html(html)
    found = _has_main_selector(root)
    if found:
        _prune_unwanted(root)
    return root, found


def extract_content_html(html: str) -> str:
    """String-level variant mirroring extractContentWithHTMLRewriter's
    return value (used for raw mode)."""
    root, found = extract_content(html)
    return serialize(root) if found else html


# ---------------------------------------------------------------------------
# Turndown-equivalent markdown conversion
# (options: headingStyle=atx, codeBlockStyle=fenced, emDelimiter='_',
#  bulletListMarker default '*'; custom rules from src/WebCrawler.js:80-118)
# ---------------------------------------------------------------------------

_H_RE = re.compile(r"^h([1-6])$")


def _inline_code(content: str) -> str:
    r"""Turndown's inline-code rule: the delimiter grows to one more
    backtick than any run inside the content, with a pad space when the
    content starts/ends with a backtick (turndown.js `code` rule) — a
    bare ``\`content\``` would terminate early on inner backticks."""
    if not content:
        return "``"
    content = re.sub(r"\r?\n|\r", " ", content)
    extra = (
        " "
        if re.search(r"^`|^ .*?[^ ].* $|`$", content)
        else ""
    )
    delimiter = "`"
    runs = set(re.findall(r"`+", content))
    while delimiter in runs:
        delimiter += "`"
    return f"{delimiter}{extra}{content}{extra}{delimiter}"
_WS_RE = re.compile(r"\s+")
_LANG_RE = re.compile(r".*language-(\w+).*")

# Turndown's escape table (turndown.js COMMONMARK escapes).
_ESCAPES = [
    (re.compile(r"\\"), r"\\\\"),
    (re.compile(r"\*"), r"\\*"),
    (re.compile(r"^-", re.M), r"\\-"),
    (re.compile(r"^\+ ", re.M), r"\\+ "),
    (re.compile(r"^(=+)", re.M), r"\\\1"),
    (re.compile(r"^(#{1,6}) ", re.M), r"\\\1 "),
    (re.compile(r"`"), r"\\`"),
    (re.compile(r"^~~~", re.M), r"\\~~~"),
    (re.compile(r"\["), r"\\["),
    (re.compile(r"\]"), r"\\]"),
    (re.compile(r"^>", re.M), r"\\>"),
    (re.compile(r"_"), r"\\_"),
    (re.compile(r"^(\d+)\. ", re.M), r"\1\\. "),
]

_SKIP_TAGS = frozenset({"script", "style", "noscript", "head", "title", "meta", "link", "template"})


def _escape_md(text: str) -> str:
    for rx, repl in _ESCAPES:
        text = rx.sub(repl, text)
    return text


def _md_children(node: Node) -> str:
    return "".join(_md_node(c) for c in node.children)


def _code_language(code: Node) -> str:
    cls = code.class_string()
    if not cls:
        return ""
    m = _LANG_RE.match(cls)
    # JS String.replace returns the original string when the regex does not
    # match (src/WebCrawler.js:90) — replicate that quirk.
    return m.group(1) if m else cls


def _md_node(node: Node | Text) -> str:
    if isinstance(node, Text):
        parent = node.parent
        if parent is not None and parent.tag in ("pre", "code"):
            return node.data
        collapsed = _WS_RE.sub(" ", node.data)
        if not collapsed.strip():
            return "" if "\n" in node.data else collapsed
        return _escape_md(collapsed)

    tag = node.tag
    if tag in _SKIP_TAGS:
        return ""

    m = _H_RE.match(tag)
    if m:
        level = int(m.group(1))
        return f"\n\n{'#' * level} {_md_children(node).strip()}\n\n"

    if tag == "p":
        return f"\n\n{_md_children(node).strip()}\n\n"
    if tag == "br":
        return "  \n"
    if tag == "hr":
        return "\n\n* * *\n\n"

    if tag == "a":
        href = node.attrs.get("href") or ""
        content = _md_children(node).strip()
        # custom emptyLinks rule (src/WebCrawler.js:109-118)
        if not content and (not href or href == "#"):
            return ""
        return f"[{content}]({href})"

    if tag == "img":
        src = node.attrs.get("src") or ""
        alt = node.attrs.get("alt") or ""
        if not src:
            return ""
        return f"![{alt}]({src})"

    if tag == "pre":
        kids = node.element_children()
        if kids and kids[0].tag == "code":
            code = kids[0]
            lang = _code_language(code)
            return f"\n\n```{lang}\n{code.text_content()}\n```\n\n"
        return f"\n\n```\n{node.text_content()}\n```\n\n"

    if tag == "code":  # inline code (pre>code handled above)
        content = node.text_content()
        if "<" in content or ">" in content:
            # custom codeElements rule (src/WebCrawler.js:95-108)
            if "\n" in content or len(content) > 50:
                return f"\n\n```html\n{content}\n```\n\n"
        return _inline_code(content)

    if tag in ("strong", "b"):
        content = _md_children(node).strip()
        return f"**{content}**" if content else ""
    if tag in ("em", "i"):
        content = _md_children(node).strip()
        return f"_{content}_" if content else ""

    if tag in ("ul", "ol"):
        items = []
        index = 0
        # turndown's listItem rule honors <ol start="N">
        # (turndown.js commonmark listItem: parent.getAttribute('start'))
        start_attr = node.attrs.get("start") or ""
        start = int(start_attr) if start_attr.lstrip("-").isdigit() else 1
        for li in node.element_children():
            if li.tag != "li":
                continue
            index += 1
            content = _md_children(li).strip()
            content = content.replace("\n", "\n    ")
            prefix = f"{start + index - 1}.  " if tag == "ol" else "*   "
            items.append(prefix + content)
        body = "\n".join(items)
        parent = node.parent
        if parent is not None and parent.tag == "li":
            return "\n" + body
        return f"\n\n{body}\n\n"

    if tag == "blockquote":
        content = _md_children(node).strip()
        quoted = "\n".join("> " + line for line in content.split("\n"))
        return f"\n\n{quoted}\n\n"

    if tag in ("tr",):
        return _md_children(node) + "\n"
    if tag in ("td", "th"):
        return _md_children(node).strip() + " "

    if tag in ("div", "section", "aside", "figure", "figcaption", "body", "html",
               "main", "article", "table", "thead", "tbody", "form", "fieldset"):
        return f"\n\n{_md_children(node).strip()}\n\n"

    # inline/default: pass content through
    return _md_children(node)


def dom_to_markdown(root: Node) -> str:
    md = _md_node(root) if isinstance(root, Text) else _md_children(root)
    md = re.sub(r"\n{3,}", "\n\n", md)  # turndown joins blocks with max 2 \n
    return md.strip()


def html_to_markdown(html: str) -> str:
    """turndown(html) equivalent (no cleanup pass)."""
    return dom_to_markdown(parse_html(html))


# ---------------------------------------------------------------------------
# Markdown cleanup — exact port of the 7 regex passes
# (reference src/WebCrawler.js:579-588)
# ---------------------------------------------------------------------------

_CLEANUP = [
    (re.compile(r"\[\]\([^)]*\)"), ""),
    (re.compile(r"\n\s*\n\s*\n"), "\n\n"),
    (re.compile(r"\n\n```"), "\n```"),
    (re.compile(r"```\n\n"), "```\n"),
    (re.compile(r"[ \t]+$", re.M), ""),
    (re.compile(r"^(#+\s+.+)$", re.M), r"\n\1\n"),
    (re.compile(r"\n\n\n(#+\s+)"), r"\n\n\1"),
]


def cleanup_markdown(markdown: str) -> str:
    for rx, repl in _CLEANUP:
        markdown = rx.sub(repl, markdown)
    return markdown.strip()


def render_page_markdown(html: str) -> str:
    """Full render path: extract -> turndown-equivalent -> cleanup
    (reference src/WebCrawler.js:333-341)."""
    root, found = extract_content(html)
    if not found:
        root = parse_html(html)
    return cleanup_markdown(dom_to_markdown(root))


# ---------------------------------------------------------------------------
# stripHtml (reference src/sources/util.js:95-121, exact port)
# ---------------------------------------------------------------------------

_CDATA_RE = re.compile(r"<!\[CDATA\[([\s\S]*?)\]\]>")
_SCRIPT_RE = re.compile(r"<script[\s\S]*?</script>", re.I)
_STYLE_RE = re.compile(r"<style[\s\S]*?</style>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def strip_html(html: str) -> str:
    content = html
    m = _CDATA_RE.search(content)
    if m:
        content = m.group(1)
    text = _SCRIPT_RE.sub("", content)
    text = _STYLE_RE.sub("", text)
    text = _TAG_RE.sub(" ", text)
    for pat, repl in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
        ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ):
        text = re.sub(re.escape(pat), repl, text, flags=re.I)
    return _WS_RE.sub(" ", text).strip()
