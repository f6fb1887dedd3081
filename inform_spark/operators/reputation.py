"""Host/domain-level reputation gating — RefinedWeb/FineWeb-style.

Large crawls gate on the DOMAIN as well as the document: a host whose
documents are mostly low-quality, near-empty, or self-duplicating is a
spam farm / template mill, and every one of its documents is suspect —
including the few that would pass a per-document filter (Penedo et al.,
"The RefinedWeb Dataset", 2023 §3.1 URL/host filtering; the public UT1
blocklist is the static form of the same idea). The reference crawler
has no analog (it crawls one site at a time, src/WebCrawler.js); at
100 TB the host rollup IS the cheap high-leverage filter: #hosts is
orders of magnitude smaller than #docs.

Design for scale:
- per-document signals are narrow in-row arithmetic (zero shuffle);
- the host rollup is ONE groupBy(source) with map-side combine —
  count/sum/countDistinct over longs only;
- the verdict fans back with a host-dimension join (#hosts rows —
  broadcastable in any real corpus, and Spark's AQE converts it when
  the dim is small; at sf the optimizer picks the same plan shape).

Everything is integer fixed-point (milli / ppm), so results are exact
and engine-identical — no float sums whose value depends on partition
order (the module-family contract, see operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import STOPWORDS, _h60, words_col

PPM = 1_000_000


def quality_milli_col(text_col: str = "text") -> Column:
    """Integer-exact document quality in [0, 1000] — the fixed-point
    analog of ``textops.quality_score`` (same three signals: length
    credit, mean-word-length band, stopword ratio) with every term
    integer arithmetic, so host-level SUMs are exact longs instead of
    partition-order-dependent double sums:

    - length credit  = least(500, n_words * 5)            (0..500)
    - mean-word-len  = 300 iff 3*n_words <= n_chars_nosp <= 10*n_words
      where n_chars_nosp = length(text) - (n_words - 1)    (0 or 300)
    - stopword credit = least(200, 2000 * n_stops div n_words) (0..200)
    """
    words = words_col(text_col)
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_words = F.size(words).cast("long")
    n_chars_nosp = F.length(text_col).cast("long") - (n_words - 1)
    n_stops = F.size(
        F.filter(words, lambda w: F.array_contains(en_stops, w))
    ).cast("long")
    length_credit = F.least(F.lit(500).cast("long"), n_words * 5)
    mwl_credit = F.when(
        (n_chars_nosp >= 3 * n_words) & (n_chars_nosp <= 10 * n_words),
        F.lit(300),
    ).otherwise(F.lit(0)).cast("long")
    # floor((2000*n_stops)/n_words) is exact here: the double division's
    # rounding error can only cross an integer boundary when
    # n_words * quotient approaches 2^53, and quotient <= 2000 with
    # realistic n_words keeps the product far below it — matching the
    # DuckDB oracle's integer `//` bit-for-bit
    stop_credit = F.least(
        F.lit(200).cast("long"),
        F.floor((2000 * n_stops) / n_words).cast("long"),
    )
    return (length_credit + mwl_credit + stop_credit).alias("quality_milli")


def host_reputation(
    docs: DataFrame,
    min_mean_quality_milli: int = 350,
    max_low_frac_ppm: int = 600_000,
    min_distinct_ppm: int = 500_000,
    low_quality_milli: int = 300,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-document verdict carrying its host's aggregate reputation.

    A host is BLOCKED when any of:
    - mean document quality below ``min_mean_quality_milli``;
    - more than ``max_low_frac_ppm`` of its docs score below
      ``low_quality_milli`` (a mostly-junk host);
    - fewer than ``min_distinct_ppm`` of its docs have distinct text
      (a self-duplicating template mill).

    Returns one row per input document:
    ``(doc_id, source, quality_milli, host_docs,
    host_mean_quality_milli, host_low_frac_ppm, host_distinct_ppm,
    host_blocked, kept)`` where ``kept = NOT host_blocked`` — the
    verdict is host-scoped by design: a good doc on a blocked host is
    dropped (that is the point of domain gating).
    """
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(source_col).alias("source"),
        quality_milli_col(text_col),
        _h60(F.col(text_col)).alias("__th"),
    )
    dim = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("host_docs"),
        F.sum("quality_milli").cast("long").alias("__qsum"),
        F.sum(
            (F.col("quality_milli") < low_quality_milli).cast("long")
        ).alias("__nlow"),
        F.countDistinct("__th").cast("long").alias("__ndist"),
    )
    dim = dim.select(
        "source",
        "host_docs",
        F.expr("__qsum div host_docs").alias("host_mean_quality_milli"),
        F.expr(f"(__nlow * {PPM}) div host_docs").alias("host_low_frac_ppm"),
        F.expr(f"(__ndist * {PPM}) div host_docs").alias("host_distinct_ppm"),
    )
    dim = dim.withColumn(
        "host_blocked",
        (F.col("host_mean_quality_milli") < min_mean_quality_milli)
        | (F.col("host_low_frac_ppm") > max_low_frac_ppm)
        | (F.col("host_distinct_ppm") < min_distinct_ppm),
    )
    return (
        base.drop("__th")
        .join(F.broadcast(dim), "source")
        .select(
            "doc_id",
            "source",
            "quality_milli",
            "host_docs",
            "host_mean_quality_milli",
            "host_low_frac_ppm",
            "host_distinct_ppm",
            "host_blocked",
            (~F.col("host_blocked")).alias("kept"),
        )
    )
