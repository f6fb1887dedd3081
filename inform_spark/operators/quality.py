"""Document-level quality gates for training-data curation.

operators/textops.quality_score emits a continuous score; this module
implements the published RULE-GATE form — the Gopher document filters
(Rae et al., "Scaling Language Models: ... Gopher", 2021, Appendix A1.1)
adapted to the corpus schema: each document gets one boolean per rule
plus the overall pass, so a pipeline can either filter on ``pass_all``
or audit per-rule rejection rates (the rollup a curation run reports).

Rules (thresholds are the paper's):
- word count in [min_words, max_words] (50..100k)
- mean word length in [3, 10]
- symbol-to-word ratio (# and ellipsis) <= 0.1
- fraction of words with >=1 alphabetic char >= 0.80
- >= 2 distinct stop words present (the, be, to, of, and, that, have, with)
- line-shape gates: <=90% of lines start with a bullet, <=30% end with
  an ellipsis

Scale: entirely narrow in-row array arithmetic (split / filter /
aggregate / higher-order functions) — zero shuffle, zero Python, fully
codegen'd; a quality pass over 100 TB is a pure map with column-pruned
scans. Rejection-rate rollups are one groupBy on booleans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _count_occurrences(text: Column, token: str) -> Column:
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(token), F.lit(""))))
        / len(token)
    ).cast("long")


def gopher_gates(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-document Gopher rule gates. Returns doc_id + one boolean per
    rule + ``pass_all``, plus the measured values the gates derive from
    (word_count, mean_word_len, symbol_ratio, alpha_ratio, stop_hits)."""
    text = F.col(text_col)
    words = F.split(text, " ")
    wc = F.size(words).cast("long")
    char_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    mean_wl = F.round(char_sum / wc, 6)
    symbols = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    symbol_ratio = F.round(symbols / wc, 6)
    alpha = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    ).cast("long")
    alpha_ratio = F.round(alpha / wc, 6)
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in STOP_WORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    ).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    bullets = F.size(
        F.filter(lines, lambda ln: ln.rlike("^\\s*[-*•]"))
    ).cast("long")
    ellipsis_ends = F.size(
        F.filter(lines, lambda ln: ln.rlike("(\\.\\.\\.|…)\\s*$"))
    ).cast("long")

    g_words = (wc >= min_words) & (wc <= max_words)
    g_mean = (mean_wl >= 3) & (mean_wl <= 10)
    g_symbol = symbol_ratio <= 0.1
    g_alpha = alpha_ratio >= 0.80
    g_stop = stop_hits >= 2
    g_bullet = bullets <= 0.9 * n_lines
    g_ellipsis = ellipsis_ends <= 0.3 * n_lines

    return docs.select(
        "doc_id",
        wc.alias("word_count"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        g_words.alias("gate_word_count"),
        g_mean.alias("gate_mean_word_len"),
        g_symbol.alias("gate_symbol_ratio"),
        g_alpha.alias("gate_alpha_ratio"),
        g_stop.alias("gate_stop_words"),
        g_bullet.alias("gate_bullets"),
        g_ellipsis.alias("gate_ellipsis"),
        (
            g_words & g_mean & g_symbol & g_alpha & g_stop & g_bullet
            & g_ellipsis
        ).alias("pass_all"),
    )


def gate_rejection_rollup(gates: DataFrame) -> DataFrame:
    """Curation audit: how many documents each rule rejects, and the
    overall pass count — one aggregation with map-side combine."""
    gate_cols = [c for c in gates.columns if c.startswith("gate_")] + [
        "pass_all"
    ]
    return gates.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum((~F.col(c)).cast("long")).alias(f"rejected_{c[5:]}")
            if c != "pass_all"
            else F.sum(F.col(c).cast("long")).alias("passed")
            for c in gate_cols
        ],
    )


# ---------------------------------------------------------------------------
# Line-level boilerplate filtering (CCNet/RefinedWeb line rules)
# ---------------------------------------------------------------------------

BOILERPLATE_PATTERNS = (
    "javascript",
    "cookie",
    "all rights reserved",
    "terms of service",
    "subscribe",
    "click here",
    "sign in",
)


def boilerplate_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = 10,
    patterns: tuple = BOILERPLATE_PATTERNS,
    out_col: str = "clean_text",
) -> DataFrame:
    """Line-level cleanup (the CCNet/RefinedWeb step between crawl and
    dedup): drop lines that are too short, contain no letters, or match a
    boilerplate pattern (case-insensitive substring); re-join survivors.
    Adds kept_lines / total_lines / kept_char_ratio for the curation
    audit. NARROW — ``F.filter`` over the split array, no UDF, no
    shuffle; composes with the scan."""
    lines = F.split(F.col(text_col), "\n")

    def keep(ln: Column) -> Column:
        cond = (F.length(ln) >= min_chars) & ln.rlike("[A-Za-z]")
        low = F.lower(ln)
        for p in patterns:
            cond = cond & ~low.contains(p)
        return cond

    kept = F.filter(lines, keep)

    def char_sum(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )

    return docs.select(
        "*",
        F.concat_ws("\n", kept).alias(out_col),
        F.size(kept).cast("long").alias("kept_lines"),
        F.size(lines).cast("long").alias("total_lines"),
        F.round(
            char_sum(kept) / F.greatest(char_sum(lines), F.lit(1)), 6
        ).alias("kept_char_ratio"),
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering (fastText/DCLM-style linear scorer)
# ---------------------------------------------------------------------------


def model_quality_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    dim: int = 1 << 18,
    threshold_milli: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality filter — the "classifier" stage every modern
    curation pipeline runs after the rule gates (CCNet/DCLM use a fastText
    linear model over hashed bag-of-ngrams; the reference has no analog).
    Features are word unigrams + bigrams hashed to ``dim`` buckets; the
    document score is the sum of the buckets' integer milli-weights:

        score_milli = sum over features f of w_milli[H60(f) % dim]
        keep        = score_milli > threshold_milli * n_feats
                      (i.e. mean feature weight above the threshold)

    Integer milli-weights deliberately: float summation order and libm
    ``exp`` differ across engines, integers hash-match the DuckDB oracle
    exactly. The sigmoid is monotone, so thresholding the linear score is
    equivalent to thresholding the probability.

    Weight sources:

    - ``weights=None`` (default; the oracle-checked shape): deterministic
      synthetic weights DERIVED IN-ROW from the bucket id,
      ``w_milli(b) = H60('qw' || b) % 2001 - 1000`` (uniform in
      [-1000, 1000]). This stand-in has the exact computational shape of
      a trained model while keeping the operator zero-shuffle and fully
      whole-stage-codegen'd — a production run swaps in trained weights
      via the second path.
    - ``weights`` = DataFrame(bucket long, w_milli long): the trained-
      model path — explode features, join the weights (Spark broadcasts
      the ~4 MB table at dim 2^18; at 2^25+ leave it partitioned by
      bucket), sum per doc. Missing buckets weigh 0. One shuffle
      (the groupBy back to documents).
    """
    from inform_spark.operators.textops import _h60

    words = F.split(F.lower(F.col(text_col)), " ")
    staged = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                         words.alias("__w"))
    w = F.col("__w")
    bigrams = F.transform(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda x, i: F.concat(x, F.lit("_"), F.element_at(w, i + 2)),
    )
    feats = F.concat(w, bigrams)
    buckets = F.transform(feats, lambda s: F.pmod(_h60(s), F.lit(dim)))
    # staged select: alias the bucket array once so CollapseProject cannot
    # inline the split+md5 pipeline per consumer (same reason as
    # textops.minhash_signatures)
    staged = staged.select("doc_id", buckets.alias("__b")).select(
        "doc_id", "__b", F.size("__b").cast("long").alias("n_feats")
    )

    if weights is None:
        def w_milli(b):
            return (
                F.pmod(
                    _h60(F.concat(F.lit("qw"), b.cast("string"))), F.lit(2001)
                ) - 1000
            )

        scored = staged.select(
            "doc_id",
            "n_feats",
            F.aggregate(
                "__b", F.lit(0).cast("long"), lambda acc, b: acc + w_milli(b)
            ).alias("score_milli"),
        )
    else:
        wt = weights.select(
            F.col("bucket").cast("long").alias("__bk"),
            F.col("w_milli").cast("long").alias("__wm"),
        )
        exploded = staged.select(
            "doc_id", "n_feats", F.explode("__b").alias("__bk")
        )
        scored = (
            exploded.join(wt, "__bk", "left")
            .groupBy("doc_id", "n_feats")
            .agg(F.sum(F.coalesce("__wm", F.lit(0))).alias("score_milli"))
        )
    return scored.select(
        "doc_id",
        "n_feats",
        "score_milli",
        (F.col("score_milli") > F.col("n_feats") * F.lit(threshold_milli))
        .alias("keep"),
    )


BAD_WORD_PLACEHOLDER = [
    # stand-in list: production swaps in the LDNOOBW blocklist C4 used
    # (Raffel et al. 2020 §2.2 — drop any page containing a listed word).
    # Matching is whole-token on the lowercased whitespace split, the
    # C4 semantics; substrings never match.
    "badword", "slur0", "slur1", "nsfw",
]


def badword_filter(
    docs: DataFrame,
    words: list[str] | None = None,
    text_col: str = "text",
    blocked_sources: DataFrame | None = None,
    source_col: str = "source",
) -> DataFrame:
    """C4-style blocklist gate: (doc_id, n_bad_words, source_blocked,
    keep). A document is dropped when any lowercased token is on the
    word blocklist (Raffel et al. 2020 §2.2) or — when a
    ``blocked_sources`` dimension (one ``source`` column) is given —
    when its source/domain is on the UT1-style domain blocklist
    (Penedo et al. 2024 §3.1 use the same two-level scheme).

    Scale: the word check is in-row ``array_intersect`` against a
    literal array (zero shuffle, codegen); the domain check is a
    broadcast LEFT join against the tiny blocklist dim — no shuffle of
    the corpus side. Counts (not just booleans) come out so the
    curation audit can rank offending sources."""
    words = BAD_WORD_PLACEHOLDER if words is None else words
    toks = F.split(F.lower(F.col(text_col)), " ")
    n_bad = F.size(
        F.filter(toks, lambda t: t.isin([w.lower() for w in words]))
    ).cast("long")
    if blocked_sources is not None:
        # Only the domain-gated form touches the source column; the
        # word-only gate must work on frames that don't carry one.
        out = docs.select(
            "doc_id",
            F.col(source_col).alias("__src"),
            n_bad.alias("n_bad_words"),
        )
        dim = F.broadcast(
            blocked_sources.select(
                F.col("source").alias("__src"), F.lit(True).alias("__blk")
            ).distinct()
        )
        out = out.join(dim, "__src", "left").withColumn(
            "source_blocked", F.coalesce("__blk", F.lit(False))
        ).drop("__blk")
    else:
        out = docs.select("doc_id", n_bad.alias("n_bad_words")).withColumn(
            "source_blocked", F.lit(False)
        )
    return out.select(
        "doc_id",
        "n_bad_words",
        "source_blocked",
        ((F.col("n_bad_words") == 0) & ~F.col("source_blocked")).alias("keep"),
    )
