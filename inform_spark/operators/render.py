"""The extract+render stage: html -> (doc_id, spans, resolved links).

One vectorized pandas UDF does the whole per-page pipeline in a single
JVM<->Python Arrow crossing (reference equivalents: extractLinks
src/WebCrawler.js:481-503, extractContentWithHTMLRewriter :363-479,
turndown+cleanup :75-118,:579-588, generateFilepath :611-635, link
resolution :514-519):

    html --extract links--> [href...] --resolve vs page url--> links
    html --main-content extraction--> dom --markdown--> cleanup --> spans

Keeping extraction, conversion and link resolution in ONE UDF matters at
scale: html strings are the fat column, and every extra UDF boundary
re-ships them through Arrow.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from inform_spark.functions.html import (
    cleanup_markdown,
    dom_to_markdown,
    extract_content,
    extract_links,
    parse_html,
)
from inform_spark.functions.spans import markdown_to_spans
from inform_spark.functions.urls import generate_filepath, resolve_url
from inform_spark.schemas import SPAN

# NB: no `markdown` column — the spans reserialize to the markdown exactly
# (span-sequence invariant), so shipping both would double the Arrow payload
# of the fattest stage. render_one still returns it for the sequential
# oracle and unit tests.
RENDER_RESULT = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
        StructField("links", ArrayType(StringType()), False),
    ]
)


def render_one(url: str, html: str, raw: bool = False) -> dict:
    """Pure-Python page render (shared with the sequential oracle path).

    ``raw=True`` is the reference's --raw mode (src/WebCrawler.js:336-341):
    the output is the *extracted content HTML* (selector machine applied,
    no markdown conversion), written to an ``.html`` path — links are still
    extracted and followed identically."""
    raw_links = extract_links(html)
    resolved = []
    for href in raw_links:
        r = resolve_url(href, url)
        if r is not None:
            resolved.append(r)
    if raw:
        from inform_spark.functions.html import extract_content_html, strip_html

        try:
            content = extract_content_html(html)
        except RecursionError:
            # failures are rows, never task-killing exceptions: degrade a
            # pathologically-nested page to its iterative tag-strip text
            content = strip_html(html)
        return {
            "doc_id": generate_filepath(url, raw=True),
            "markdown": content,
            # raw HTML is one opaque text span (no markdown media syntax
            # to interleave); spans_to_markdown round-trips it byte-exactly
            "spans": [
                {"kind": "text", "text": content, "media_ref": None, "offset": 0}
            ],
            "links": resolved,
        }
    # extract_content returns the untouched dom when no main selector
    # matched — re-parsing here would double the parse cost for every
    # page without <main>/<article>
    try:
        root, _found = extract_content(html)
        markdown = cleanup_markdown(dom_to_markdown(root))
    except RecursionError:
        # pathological nesting blows Python's frame limit inside the
        # recursive DOM walkers; the engine's contract is failures as
        # ROWS, never task-killing exceptions — degrade to the iterative
        # tag-strip text (links already extracted by regex above)
        from inform_spark.functions.html import strip_html

        markdown = strip_html(html)
    return {
        "doc_id": generate_filepath(url),
        "markdown": markdown,
        "spans": markdown_to_spans(markdown),
        "links": resolved,
    }


def make_extract_render_udf(raw: bool = False):
    """Factory: the fused extract+render pandas UDF, markdown or raw mode."""

    @pandas_udf(RENDER_RESULT)
    def extract_render(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        out = {"doc_id": [], "spans": [], "links": []}
        for u, h in zip(url, html):
            r = render_one(u, h or "", raw=raw)
            out["doc_id"].append(r["doc_id"])
            out["spans"].append(r["spans"])
            out["links"].append(r["links"])
        return pd.DataFrame(out)

    return extract_render


# default (markdown-mode) instance, the common path
extract_render_udf = make_extract_render_udf(raw=False)
