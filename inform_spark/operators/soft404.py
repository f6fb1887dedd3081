"""Soft-404 detection — error pages served with HTTP 200.

A large fraction of "successful" fetches on the open web are error
pages the origin serves with status 200 (custom not-found templates,
parked-domain placeholders, paywall interstitials). The reference
trusts the status code alone (src/WebCrawler.js response handling);
at crawl scale that poisons the corpus with millions of identical
"Page Not Found" documents. The standard two-signal defense
(Bar-Yossef et al., WWW'04 "Sic transit gloria telae"):

1. **phrase signal** (in-row, zero shuffle): the body matches an
   error-template phrase list — high precision, limited recall;
2. **template signal** (one tiny groupBy): within a host, MANY distinct
   URLs serving byte-identical content is the signature of a
   catch-all error route — whatever the wording. Group by
   (host, content-hash), flag groups with >= ``min_template_urls``
   members, broadcast the surviving (tiny) dimension back.

Scale design: the corpus side never shuffles — the (host, fp) rollup
shuffles only two small columns, the HAVING keeps a handful of
template groups per host, and the verdict join broadcasts that
dimension. Verdicts only apply to status==200 rows (a real 404 is
already handled by the status gate upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60
from inform_spark.operators.traps import url_host

# lowercase regexp alternation in the Java/RE2/DuckDB common subset
SOFT404_PHRASES = (
    "page not found",
    "404 error",
    "does not exist",
    "no longer available",
    "temporarily unavailable",
)


def soft404_detect(
    pages: DataFrame,
    min_template_urls: int = 20,
    url_col: str = "url",
    status_col: str = "status",
    text_col: str = "text",
) -> DataFrame:
    """``(url, status, phrase_hit, template_hit, is_soft404)`` — one row
    per input page; ``is_soft404`` is true only for status-200 pages
    that trip either signal."""
    phrase_re = "(" + "|".join(SOFT404_PHRASES) + ")"
    base = pages.select(
        F.col(url_col).alias("url"),
        F.col(status_col).cast("int").alias("status"),
        url_host(F.col(url_col)).alias("__host"),
        _h60(F.col(text_col)).alias("__fp"),
        F.lower(F.col(text_col)).rlike(phrase_re).alias("phrase_hit"),
    )
    templates = (
        base.filter(F.col("status") == 200)
        .groupBy("__host", "__fp")
        # DISTINCT urls: a fetch log carrying one row per attempt must
        # not let a single much-retried URL impersonate a template
        .agg(F.countDistinct("url").alias("__n"))
        .filter(F.col("__n") >= min_template_urls)
        .select("__host", "__fp", F.lit(True).alias("__tpl"))
    )
    out = base.join(F.broadcast(templates), ["__host", "__fp"], "left")
    return out.select(
        "url",
        "status",
        "phrase_hit",
        F.coalesce("__tpl", F.lit(False)).alias("template_hit"),
        (
            (F.col("status") == 200)
            & (F.col("phrase_hit") | F.coalesce("__tpl", F.lit(False)))
        ).alias("is_soft404"),
    )
