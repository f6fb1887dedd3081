"""DSIR-style data-selection importance weights, fixed-point.

Data Selection with Importance Resampling (Xie et al., 2023, public
paper) scores every raw document by how much its hashed n-gram feature
distribution resembles a small TARGET corpus versus the raw corpus, then
samples by that weight — the standard way to tilt a 100 TB crawl toward
a quality/domain target without training a classifier.

This implementation keeps the hashed-feature structure but replaces the
log-likelihood-ratio accumulation with an integer ratio score: each
hash bucket b gets ``w(b) = ((tgt(b)+1) * SCALE) div (raw(b)+1)``
(add-one smoothing), and a document scores the count-weighted mean of
its buckets' weights. Rationale for the deviation (documented, like
linkgraph's fixed-point PageRank): float log-sums are
shuffle-order-dependent, so two runs — or two engines — can disagree in
the last ulps and a DuckDB oracle could never hash-match; integer sums
are exactly associative, making the result independent of
partitioning, execution order, and engine. Monotonicity in the
target-vs-raw ratio (what resampling needs) is preserved bucket-wise.

Scale design (100 TB):
- tokenize/bucket is narrow (split + md5-based H60, all JVM built-ins);
- (doc, bucket) counts: ONE shuffle with map-side combine — Zipf-heavy
  buckets reduce inside each map task;
- bucket stats: groupBy over the FIXED bucket key space (default 4096
  rows regardless of corpus size) — the shuffle carries per-partition
  partials only;
- bucket weights broadcast back (a few KB), per-doc rollup is the only
  other shuffle. No window, no cartesian, nothing O(corpus²).

Reference scope note: the reference engine (fwdslsh/inform) has no
corpus-selection stage; this operator belongs to the training-data
pipeline family built on top of the crawl (SURVEY §2 extension), same
as dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60, words_col

SCALE = 1_000_000


def dsir_weights(
    docs: DataFrame,
    is_target,
    buckets: int = 4096,
    scale: int = SCALE,
) -> DataFrame:
    """(doc_id, is_target, n_tokens, importance) — importance is a LONG:
    the count-weighted mean over the doc's tokens of the token-bucket's
    smoothed target/raw ratio, in units of ``1/scale``. ``is_target`` is
    a boolean Column over ``docs`` designating the target corpus.

    EVERY input doc appears in the output: a zero-token doc (empty /
    whitespace-only text) has no feature evidence, so it carries
    ``n_tokens = 0`` and ``importance = NULL`` — explicit "unknown", not
    a silent omission a downstream weight-join would drop."""
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        is_target.alias("is_target"),
    )
    toks = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            is_target.alias("is_target"),
            F.explode(words_col()).alias("token"),
        )
        .filter(F.length("token") > 0)
        .select(
            "doc_id",
            "is_target",
            F.pmod(
                _h60(F.concat(F.lit("dsir"), F.col("token"))), F.lit(buckets)
            ).cast("long").alias("bucket"),
        )
    )
    per_doc_bucket = toks.groupBy("doc_id", "is_target", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bucket_w = (
        per_doc_bucket.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("raw"),
            F.coalesce(
                F.sum(F.when(F.col("is_target"), F.col("cnt"))), F.lit(0)
            ).alias("tgt"),
        )
        .select(
            "bucket",
            F.expr(f"((tgt + 1) * {scale}) div (raw + 1)").alias("w"),
        )
    )
    scored = (
        per_doc_bucket.join(F.broadcast(bucket_w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.expr("sum(cnt * w) div sum(cnt)").cast("long").alias("importance"),
        )
    )
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        "is_target",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        "importance",
    )
