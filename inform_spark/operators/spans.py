"""Interleaved text+media span operators — the payload axis of the engine.

The engine's document model (BASELINE input_hint; produced by the crawl
render stage, plans/crawl.py) is an Iceberg-shaped table

    (doc_id: string, spans: array<struct<kind:string, text:string,
                                         media_ref:string, offset:int32>>)

i.e. a training corpus of documents whose text runs and media references
are INTERLEAVED in reading order (the reference emits exactly this
interleaving when rendering HTML with inline images,
/root/reference/src/WebCrawler.js:336-346 + the <img> Turndown rule).
This module gives that column first-class corpus operators:

- :func:`synthesize_interleaved` — deterministic span-table synthesis
  from any plain-text corpus (the sandbox stand-in for a real crawl at
  sf scale; byte-reproducible in DuckDB, so every downstream operator is
  oracle-checkable end to end).
- :func:`span_stats` — per-document interleaving statistics.
- :func:`span_rechunk` — split documents into fixed-cost training
  windows at SPAN boundaries, preserving the text/media interleave (the
  "context-window chunking" step of a multimodal training pipeline).
- :func:`span_render` — re-serialize spans in offset order to markdown
  (the per-row invariant vs the reference: span-sequence → text).
- :func:`media_manifest` — (media_ref, caption) pair extraction: each
  media span with its preceding text span as the caption candidate —
  the image-caption mining step of a multimodal data pipeline.

Scale design: every operator here is NARROW — all work happens inside
the row's own array via higher-order functions (transform / filter /
aggregate / flatten), in the JVM, with zero shuffles and zero Python.
A 1000-executor scan parallelizes perfectly; there is no skew surface
because no keys ever meet. The only explode()s emit result rows (narrow).
Per-row cost is O(n_spans) per pass (the prefix-sum accumulator appends
to a JVM array — cheap memcpy; documents are page-bounded so n_spans is
small; a multi-GB pathological document would use the explode +
per-doc-window formulation instead, one bounded-skew shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60

#: words per synthesized text span
SPAN_WORDS = 12
#: a media span follows text span i iff H60(salt‖doc_id‖-‖i) % MEDIA_MOD == 0
MEDIA_MOD = 5


def synthesize_interleaved(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    words_per_span: int = SPAN_WORDS,
    media_mod: int = MEDIA_MOD,
    salt: str = "spans",
) -> DataFrame:
    """Deterministic interleaved span table from a plain-text corpus.

    Text is cut into ``words_per_span``-word text spans; after text span
    i a media span ``media://<doc_id>/<i>`` is inserted iff
    ``H60(salt‖doc_id‖-‖i) % media_mod == 0`` (the cross-engine 60-bit
    md5 hash, so DuckDB reproduces the table exactly). Offsets number
    the final interleaved sequence 0..n-1. Pure built-ins, narrow.
    """
    w = words_per_span
    did = F.col(doc_id_col).cast("string")
    words = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.lit(1), F.ceil(F.size(words) / F.lit(w)).cast("int")
    )

    def text_span(i: Column) -> Column:
        return F.struct(
            F.lit("text").alias("kind"),
            F.array_join(F.slice(words, i * w + 1, w), " ").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        )

    def media_span(i: Column) -> Column:
        return F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(
                F.lit("media://"), did, F.lit("/"), i.cast("string")
            ).alias("media_ref"),
        )

    def with_media(i: Column) -> Column:
        key = F.concat(F.lit(salt), did, F.lit("-"), i.cast("string"))
        return F.pmod(_h60(key), F.lit(media_mod)) == 0

    nested = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.when(
            with_media(i), F.array(text_span(i), media_span(i))
        ).otherwise(F.array(text_span(i))),
    )
    spans = F.transform(
        F.flatten(nested),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return docs.select(did.alias("doc_id"), spans.alias("spans"))


def span_stats(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-document interleaving statistics — narrow, zero shuffle."""
    s = F.col(spans_col)
    n = F.size(s)
    n_media = F.size(F.filter(s, lambda x: x["kind"] == F.lit("media")))
    text_chars = F.aggregate(
        F.filter(s, lambda x: x["kind"] == F.lit("text")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x["text"]),
    )
    return df.select(
        "doc_id",
        n.cast("long").alias("n_spans"),
        (n - n_media).cast("long").alias("n_text"),
        n_media.cast("long").alias("n_media"),
        text_chars.alias("text_chars"),
        F.round(n_media / n, 6).alias("media_ratio"),
    )


def _cum_before(spans_col: str, media_cost: int) -> Column:
    """Exclusive per-row prefix sum of span costs (text = char length,
    media = ``media_cost``) as array<long> — one in-row aggregate pass."""

    def cost(x: Column) -> Column:
        return (
            F.when(x["kind"] == F.lit("text"), F.length(x["text"]))
            .otherwise(F.lit(media_cost))
            .cast("long")
        )

    acc0 = F.struct(
        F.lit(0).cast("long").alias("run"),
        F.array().cast("array<long>").alias("pre"),
    )
    return F.aggregate(
        F.col(spans_col),
        acc0,
        lambda acc, x: F.struct(
            (acc["run"] + cost(x)).alias("run"),
            F.concat(acc["pre"], F.array(acc["run"])).alias("pre"),
        ),
        lambda acc: acc["pre"],
    )


def span_rechunk(
    df: DataFrame,
    max_chars: int = 2048,
    media_cost: int = 0,
    spans_col: str = "spans",
) -> DataFrame:
    """Assign each span to a fixed-cost training window, splitting ONLY
    at span boundaries (media refs are never torn from their position in
    the interleave): span i belongs to window ``chunk_id =
    cum_cost_before(i) // max_chars`` and starts at ``char_start =
    cum_cost_before(i) % max_chars`` within it. Text spans cost their
    char length; media spans cost ``media_cost`` (e.g. the token budget
    of an image placeholder).

    Narrow — the prefix sum is computed inside each row; the explode
    only emits result rows. Returns one row per span:
    (doc_id, offset, kind, media_ref, chunk_id, char_start).
    """
    z = df.withColumn("__pre", _cum_before(spans_col, media_cost))
    combined = F.transform(
        F.col(spans_col),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
            F.element_at(F.col("__pre"), i + 1).alias("cum"),
        ),
    )
    sp = z.select("doc_id", F.explode(combined).alias("s"))
    return sp.select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
        F.floor(F.col("s.cum") / F.lit(max_chars)).cast("long").alias("chunk_id"),
        F.pmod(F.col("s.cum"), F.lit(max_chars)).cast("long").alias("char_start"),
    )


def span_render(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Re-serialize spans in offset order to a markdown string — text
    runs joined by blank lines, media as ``![media](ref)`` (the
    reference's inline-image markdown). This is the engine's per-row
    invariant made queryable: render(spans) must equal the reference's
    markdown stream. Narrow, zero shuffle."""
    md = F.array_join(
        F.transform(
            F.col(spans_col),
            lambda s: F.when(s["kind"] == F.lit("text"), s["text"]).otherwise(
                F.concat(F.lit("!["), F.lit("media"), F.lit("]("),
                         s["media_ref"], F.lit(")"))
            ),
        ),
        "\n\n",
    )
    return df.select("doc_id", md.alias("md"))


def media_manifest(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(media_ref, caption) extraction: every media span paired with the
    text of the span immediately before it in the interleave (the
    caption candidate a multimodal pipeline trains on). Narrow."""
    s = F.col(spans_col)
    # document-initial media (i == 0) still emits a row — with a NULL
    # caption, matching the oracle's lag() semantics; dropping it would
    # silently lose the training pair
    cand = F.transform(
        s,
        lambda x, i: F.when(
            x["kind"] == F.lit("media"),
            F.struct(
                x["media_ref"].alias("media_ref"),
                x["offset"].alias("offset"),
                F.when(i > 0, F.element_at(s, i)).alias("prev"),
            ),
        ),
    )
    rows = df.select(
        "doc_id",
        F.explode(F.filter(cand, lambda x: x.isNotNull())).alias("m"),
    )
    return rows.select(
        "doc_id",
        F.col("m.media_ref").alias("media_ref"),
        F.col("m.offset").cast("long").alias("offset"),
        F.when(
            F.col("m.prev.kind") == "text", F.col("m.prev.text")
        ).alias("caption"),
    )


def span_pii_redact(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Interleave-preserving PII scrub: redact emails / IPv4s / phones
    INSIDE each text span (operators/pii patterns and pass order),
    leaving media spans, span structure and offsets untouched — the form
    a multimodal training pipeline needs, where redaction must never
    disturb text↔media alignment. Returns
    (doc_id, spans, n_emails, n_ipv4, n_phones, n_pii) with the counts
    summed over text spans (each category counted on the text the
    replacement chain sees at that stage, like ``pii.pii_redact``).

    Scale: narrow like every span op — per-span regexp chains inside
    in-row higher-order functions, zero shuffle, zero Python. Redaction
    is span-local by design (a PII string split across a span boundary
    is not a reconstructible PII string in the training sample either)."""
    from inform_spark.operators.pii import (
        EMAIL_RE, EMAIL_TOKEN, IPV4_RE, IPV4_TOKEN, PHONE_RE, PHONE_TOKEN,
    )

    s = F.col(spans_col)

    def after_email(t: Column) -> Column:
        return F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)

    def after_ip(t: Column) -> Column:
        return F.regexp_replace(after_email(t), IPV4_RE, IPV4_TOKEN)

    def clean(t: Column) -> Column:
        return F.regexp_replace(after_ip(t), PHONE_RE, PHONE_TOKEN)

    # ONE fold over the array computes all three counts (a per-category
    # aggregate would walk the spans — and re-run the cumulative regexp
    # chain — once per category, and n_pii would re-embed all three)
    def one_count(x, stage_text, pattern) -> Column:
        return (
            F.when(
                x["kind"] == F.lit("text"),
                F.regexp_count(stage_text, F.lit(pattern)),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    zero = F.struct(
        F.lit(0).cast("long").alias("e"),
        F.lit(0).cast("long").alias("i"),
        F.lit(0).cast("long").alias("p"),
    )
    counts = F.aggregate(
        s,
        zero,
        lambda acc, x: F.struct(
            (acc["e"] + one_count(x, x["text"], EMAIL_RE)).alias("e"),
            (acc["i"] + one_count(x, after_email(x["text"]), IPV4_RE)).alias("i"),
            (acc["p"] + one_count(x, after_ip(x["text"]), PHONE_RE)).alias("p"),
        ),
    )
    new_spans = F.transform(
        s,
        lambda x: F.struct(
            x["kind"].alias("kind"),
            F.when(x["kind"] == F.lit("text"), clean(x["text"]))
            .otherwise(x["text"])
            .alias("text"),
            x["media_ref"].alias("media_ref"),
            x["offset"].alias("offset"),
        ),
    )
    # two-step select: the counts struct materializes once in the first
    # projection; the second only extracts fields (CollapseProject keeps
    # non-cheap expressions referenced more than once in their own step)
    mid = df.select("doc_id", new_spans.alias(spans_col), counts.alias("__c"))
    return mid.select(
        "doc_id",
        spans_col,
        F.col("__c.e").alias("n_emails"),
        F.col("__c.i").alias("n_ipv4"),
        F.col("__c.p").alias("n_phones"),
        (F.col("__c.e") + F.col("__c.i") + F.col("__c.p")).alias("n_pii"),
    )
