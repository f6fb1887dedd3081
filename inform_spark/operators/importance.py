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

from inform_spark.operators.textops import _h60, floor_log2, words_col

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


def unigram_surprisal(
    docs: DataFrame,
    min_bits_milli: int = 1_000,
    max_bits_milli: int = 14_000,
) -> DataFrame:
    """CCNet-style language-model quality scoring, integer-exact:
    (doc_id, n_tokens, surprisal_bits, mean_bits_milli, keep).

    CCNet (Wenzek et al. 2020 §3.3) ranks documents by LM perplexity and
    keeps the middle of the distribution (both tails are junk: the low
    tail is boilerplate/degenerate repetition, the high tail is noise /
    wrong-language). This is the same filter driven by the corpus's OWN
    unigram statistics — each token t costs
    ``floor(log2(N div c(t)))`` whole bits (N = corpus token count,
    c(t) = token count), a per-token surprisal under the empirical
    unigram model. The floor-log2 is computed EXACTLY as
    ``length(binary(N div c)) - 1`` — pure integer arithmetic, so sums
    are associative and the score is independent of partitioning,
    execution order, and engine (the same fixed-point rationale as
    ``dsir_weights``; float log-sums could never hash-match an oracle).

    ``mean_bits_milli`` = 1000 * surprisal_bits div n_tokens; ``keep``
    brackets it in [min_bits_milli, max_bits_milli] — the middle-band
    selection (defaults: drop docs averaging under 1.0 or over 14.0
    bits/token).

    Scale (100 TB): (doc, token) counts are ONE shuffle with map-side
    combine (Zipf heads reduce in the map task); the vocabulary table is
    tiny next to the corpus and joins token→count with AQE handling the
    stop-word skew; the per-doc rollup is the only other shuffle.
    Nothing O(corpus²), no window, no Python."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(words_col()).alias("token"),
    ).filter(F.length("token") > 0)
    per_doc_tok = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    vocab = per_doc_tok.groupBy("token").agg(F.sum("cnt").alias("c"))
    # total corpus tokens as a 1-row dim, crossed in by broadcast (a
    # scalar, never a shuffle)
    total = vocab.agg(F.sum("c").alias("N"))
    scored = (
        per_doc_tok.join(vocab, "token")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            "cnt",
            floor_log2(F.expr("N div c")).alias("bits"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("bits")).cast("long").alias("surprisal_bits"),
        )
    )
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    mean_milli = F.expr("1000 * surprisal_bits div n_tokens")
    # every input doc appears: a zero-token doc carries n_tokens = 0,
    # NULL scores and keep = false (no evidence ≠ keepable) — same
    # explicit-unknown contract as dsir_weights
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        "surprisal_bits",
        mean_milli.alias("mean_bits_milli"),
        F.coalesce(
            (mean_milli >= min_bits_milli) & (mean_milli <= max_bits_milli),
            F.lit(False),
        ).alias("keep"),
    )


def bigram_surprisal(
    docs: DataFrame,
    min_bits_milli: int = 500,
    max_bits_milli: int = 12_000,
) -> DataFrame:
    """Bigram-LM quality band — :func:`unigram_surprisal` upgraded to the
    corpus's own bigram model (one step closer to CCNet's real 5-gram
    LM): the first token of a document costs its unigram surprisal
    ``floor(log2(N div c(w1)))`` and every following token costs its
    CONDITIONAL surprisal ``floor(log2(c(w1) div c(w1 w2)))`` — the
    integer-exact MLE bigram perplexity (floor-log2 as binary-string
    length, so sums are associative and the score is independent of
    partitioning, execution order, and engine; the module's fixed-point
    contract). Against the corpus-own model every document bigram is
    observed (it counts itself), so no backoff branch is needed; scoring
    a frozen EXTERNAL model would add one (streaming/curation.py shows
    the frozen-stats pattern).

    Returns (doc_id, n_tokens, surprisal_bits, mean_bits_milli, keep) —
    keep brackets mean bits/token in [min, max]/1000, the middle-band
    rule. Zero-token docs carry explicit NULL scores and keep = false.

    Scale (100 TB): (doc, bigram) counts are ONE shuffle with map-side
    combine (Zipf-heavy bigrams reduce in the map task); the bigram and
    unigram vocab tables join back by key with AQE absorbing stop-pair
    skew; the per-doc rollup is the only other shuffle. No window, no
    cartesian, no Python."""
    ws = F.filter(words_col(), lambda w: w != "")
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), ws.alias("__w")
    )
    base = staged.select(
        "doc_id", F.size("__w").cast("long").alias("n_tokens")
    )
    toks = staged.select("doc_id", F.explode("__w").alias("token"))
    ug = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    total = ug.agg(F.sum("c1").alias("N"))
    first_bits = (
        staged.filter(F.size("__w") >= 1)
        .select("doc_id", F.element_at("__w", 1).alias("token"))
        .join(ug, "token")
        .join(F.broadcast(total))
        .select("doc_id", floor_log2(F.expr("N div c1")).alias("bits"))
    )
    per_doc_bg = (
        staged.filter(F.size("__w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("__w"), i.cast("int")).alias("w1"),
                        F.element_at(
                            F.col("__w"), (i + 1).cast("int")
                        ).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bg_vocab = per_doc_bg.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    cond_bits = (
        per_doc_bg.join(bg_vocab, ["w1", "w2"])
        .join(ug.select(F.col("token").alias("w1"), "c1"), "w1")
        .select(
            "doc_id",
            (F.col("cnt") * floor_log2(F.expr("c1 div c12"))).alias("bits"),
        )
    )
    scored = (
        first_bits.unionByName(cond_bits)
        .groupBy("doc_id")
        .agg(F.sum("bits").cast("long").alias("surprisal_bits"))
    )
    mean_milli = F.expr("1000 * surprisal_bits div n_tokens")
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "surprisal_bits",
        F.when(F.col("n_tokens") > 0, mean_milli).alias("mean_bits_milli"),
        F.coalesce(
            (mean_milli >= min_bits_milli) & (mean_milli <= max_bits_milli),
            F.lit(False),
        ).alias("keep"),
    )
