"""Positional inverted-index build — the serving-side companion to
``operators/relevance.bm25_relevance``.

A curated corpus is usually consumed twice: once by training, once by
retrieval (decontamination audits, RAG serving, quality debugging all
query "which documents contain X, where?"). This module builds the
classic positional postings table: per term, the document frequency,
collection frequency, and an ordered postings list of
``doc_id:tf:pos.pos...`` entries. BM25 (relevance.py) scores a fixed
query online; this materializes the reusable index those scores —
and phrase queries, via the positions — are computed from.

Postings are rendered as a CANONICAL STRING (entries ';'-joined in
ascending doc_id order, positions '.'-joined ascending) rather than
nested structs: the string is engine-portable (the DuckDB oracle
rebuilds it byte-for-byte with ``string_agg(... order by ...)``),
stable under the repo's order-insensitive row hashing, and is exactly
the delta-encodable flat form a real index shard stores.

Scale design:
- ONE posexplode of the corpus (narrow; text itself never shuffles —
  only (term, doc_id, idx) triples);
- groupBy (term, doc_id) with map-side combine collapses each
  document's repeated terms before the shuffle;
- groupBy (term) assembles postings with an associative
  min/collect+array_sort — no window, no global sort;
- STOPWORD HEAVY HITTERS are the known skew: ``max_docs_per_term``
  caps each posting list to the lowest-doc_id entries via a per-term
  window rank (per-bucket sort only — spillable, same shape as
  ``textops.pairs_from_bands_capped``) and the truncation is NEVER
  silent: dropped doc-counts surface in the ``n_dropped_docs`` audit
  column, following the repo's capped+audited discipline. df/cf remain
  EXACT under the cap (counted before truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inform_spark.operators.textops import floor_log2, words_col


def _term_doc_postings(docs: DataFrame, text_col: str) -> DataFrame:
    """(term, doc_id, tf, poss) — poss is '.'-joined ascending 0-based
    token positions within the document."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(words_col(text_col)).alias("idx", "term"),
    ).filter(F.length("term") > 0)
    return toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.concat_ws(
            ".",
            F.transform(
                F.array_sort(F.collect_list("idx")),
                lambda i: i.cast("string"),
            ),
        ).alias("poss"),
    )


def inverted_postings(
    docs: DataFrame,
    text_col: str = "text",
    max_docs_per_term: int | None = None,
) -> DataFrame:
    """(term, df, cf, n_dropped_docs, postings): document frequency,
    collection frequency (both EXACT, computed before any cap), the
    count of doc entries truncated from the postings string by
    ``max_docs_per_term`` (0 when uncapped), and the canonical postings
    string ``doc:tf:p.p.p;doc:tf:p...`` ascending by doc_id (capped
    lists keep the LOWEST doc_ids — deterministic, and in a
    monotonically-assigned id space the oldest/first-crawled docs)."""
    per_doc = _term_doc_postings(docs, text_col)
    entry = F.concat_ws(
        ":", F.col("doc_id").cast("string"), F.col("tf").cast("string"), F.col("poss")
    )
    if max_docs_per_term is not None:
        # the rank only gates which entries reach the postings string;
        # df/cf are aggregated over the uncapped relation either way
        per_doc = per_doc.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("term").orderBy(F.col("doc_id").asc())
            ),
        )
        kept_pred = F.col("__rn") <= max_docs_per_term
        dropped = (
            F.col("df") - F.least(F.col("df"), F.lit(max_docs_per_term))
        ).cast("long")
    else:
        kept_pred = F.lit(True)
        dropped = F.lit(0).cast("long")
    # ONE agg shape for both paths: collect_list skips the NULL the
    # un-kept rows' when() yields, array_sort orders by (d, e) = doc_id
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
            F.concat_ws(
                ";",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                kept_pred,
                                F.struct(
                                    F.col("doc_id").alias("d"),
                                    entry.alias("e"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["e"],
                ),
            ).alias("postings"),
        )
        .select("term", "df", "cf", dropped.alias("n_dropped_docs"), "postings")
    )


def tfidf_cosine_topk(
    docs: DataFrame, topk: int = 20, text_col: str = "text", w: int = 3
) -> DataFrame:
    """Top-k most similar document pairs by tf-idf cosine over w-word
    shingle terms, computed as a sparse set-similarity join over the
    inverted index (the Bayardo et al. WWW'07 all-pairs shape): explode
    (term, doc, tf), weight by idf, equi-join on the term, and
    accumulate the dot product per pair — a pair is materialized ONLY
    if it shares a surviving term. Shingles (``w=3``) rather than
    unigrams are the term unit for the same reason the minhash family
    uses them: unigram df saturates (every doc contains "the"), while
    shingle df spreads, which BOTH discriminates near-dups and keeps
    the self-join sparse. ``w=1`` degrades to classic unigram tf-idf.

    Fixed-point idf keeps every sum an exact long (engine- and
    partition-order-independent, the repo's float-sum rule):
    ``idf_hb = floor(2 * log2(N / df)) = floor_log2(N^2 div df^2)``
    via the shared binary-string idiom (textops.floor_log2) — half-bit
    log resolution in pure integer arithmetic (exact because
    floor(log2(floor(y))) = floor(log2(y)) for y >= 1; N^2 stays in
    int64 for corpora to ~3e9 docs — beyond that, compute in
    decimal(38,0)). Per-term weight ``w = tf * idf_hb``. Terms with
    ``df = 1`` cannot form a pair and terms with ``df > N/sqrt(2)``
    have idf_hb = 0 (zero weight) — BOTH are pruned before the
    self-join, which is what bounds it: the quadratic blowup of
    stop-terms is eliminated by the weighting scheme itself rather
    than by a tuning knob. Remaining work is sum(df^2) over
    mid-frequency terms.

    Only the final cosine divides: ``cos = dot / sqrt(na2 * nb2)`` with
    exact-long inputs and one correctly-rounded double op per pair,
    rounded to 6 — cross-engine identical. Deterministic tie-break
    (cos desc, a, b); top-k is a TakeOrdered, never a global sort.

    Returns ``(a, b, dot, cos6)``."""
    words = words_col(text_col)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - w, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, w)),
    )
    # pin the postings: tdf feeds BOTH the idf aggregate and the weighted
    # join, and weighted feeds the norms aggregate plus BOTH sides of the
    # pair self-join — unpinned, the shingle explode + first groupBy
    # lineage re-executes 4-6x (measured: 94 exchanges / 24 scans in the
    # unpinned plan). localCheckpoint is the module family's pinning
    # idiom (components.minhash_survivors); at 100 TB the production
    # shape is materializing `weighted` to a term-bucketed table instead.
    tdf = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(shingles).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    n_docs = docs.select(
        F.countDistinct(F.col("doc_id")).cast("long").alias("__n")
    )
    idf = (
        tdf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .join(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            floor_log2(F.expr("(__n * __n) div (df * df)")).alias(
                "idf_bits"
            ),
        )
        .filter(F.col("idf_bits") >= 1)
    )
    weighted = (
        tdf.join(idf, "term")
        .select(
            "term",
            "doc_id",
            "df",
            (F.col("tf") * F.col("idf_bits")).alias("w"),
        )
        .localCheckpoint()
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    # norms cover EVERY surviving term (they are the vector length), but
    # a df=1 term can only ever self-pair — prune it from BOTH join
    # sides: at corpus scale most shingles are singletons, and shuffling
    # them twice to discard every row at the l.doc_id < r.doc_id filter
    # would dominate the join input for zero output
    ex = weighted.filter(F.col("df") >= 2).drop("df").join(norms, "doc_id")
    l, r = ex.alias("l"), ex.alias("r")
    pairs = (
        l.hint("shuffle_hash")
        .join(r.hint("shuffle_hash"), "term")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(
            F.sum(F.col("l.w") * F.col("r.w")).cast("long").alias("dot"),
            # every row of a pair group carries the same norms: first() is exact
            F.first("l.n2").alias("na2"),
            F.first("r.n2").alias("nb2"),
        )
    )
    scored = pairs.select(
        "a",
        "b",
        "dot",
        # cast EACH norm to double before multiplying: the int64 product
        # na2*nb2 wraps once each norm passes ~3e9 (long documents),
        # turning sqrt into NaN which would float to the top-k; the
        # double product is the same correctly-rounded op in DuckDB
        F.round(
            F.col("dot")
            / F.sqrt(
                F.col("na2").cast("double") * F.col("nb2").cast("double")
            ),
            6,
        ).alias("cos6"),
    )
    return scored.orderBy(F.desc("cos6"), "a", "b").limit(topk)
