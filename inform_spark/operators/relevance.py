"""Query-relevance scoring for targeted corpus selection — integer-exact BM25.

A large-scale training-data pipeline selects domain-targeted subsets by
scoring every document against a small set of query terms (the retrieval
step of retrieval-augmented curation; same role the reference's
`--include` content filters play for crawls, generalized to ranked
relevance). This module implements Robertson/Spärck-Jones BM25 in pure
integer (milli-unit) arithmetic, for the same reason every scorer in this
repo is fixed-point (`importance.dsir_weights`, `unigram_surprisal`):
float log-sums depend on partitioning/execution order and can never
hash-match a cross-engine oracle, while integer sums are associative and
engine-independent.

Formulation (k1 = K/1000, b = B/1000, defaults K=1200 B=750), the
classic ``idf * tf*(k1+1) / (k1*((1-b) + b*dl/avgdl) + tf)`` carried
out in milli-units with deterministic truncation at three points (each
loses < 1 milli and is reproduced bit-for-bit by the oracle):

    rel_dl_milli = 10^6 * dl div avgdl_milli          # 1000 * dl/avgdl
    denom_milli  = K*(1000-B) div 1000
                   + ((K*B div 1000) * rel_dl_milli) div 1000
                   + 1000 * tf
    term_milli   = idf_bits * tf * (K+1000) * 1000 div denom_milli

with

    idf_bits(t) = floor(log2(2 + (2*(N-df)+1) div (2*df+1)))

an integer-exact, always->=1 analog of the BM25+ idf
``log(1 + (N-df+0.5)/(df+0.5))`` (Lucene clamps idf >= 0 the same way;
the +2 keeps common-but-present terms contributing — whole-bit floor
would zero any term with df > ~N/3, losing tf/length ranking entirely
for the head of the query vocabulary);
the floor-log2 is computed as binary-string length like
``unigram_surprisal``. avgdl_milli = 1000*T div N (T corpus tokens,
N corpus docs). Every intermediate is bounded far inside int64 at web
scale: rel_dl_milli <= 10^9 for million-token documents, the numerator
<= idf(~35 at 10^10 docs) * tf * 2.2e6 — a naive single-fraction
scaling (multiplying through by 10^6*avgdl_milli) would overflow.

Scale (100 TB): tokens matching the (broadcast, tiny) query-term dim are
the ONLY rows that shuffle — one (doc_id, term) groupBy with map-side
combine; df/N/T/avgdl are |q|-row and 1-row aggregates broadcast back.
No window, no sort, no Python, nothing O(corpus x vocab).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inform_spark.operators.textops import floor_log2, words_col


def bm25_relevance(
    docs: DataFrame,
    query_terms: list[str],
    k1_milli: int = 1200,
    b_milli: int = 750,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dl, n_matched, score_milli) for every input document.

    ``dl`` is the document token count, ``n_matched`` the number of
    DISTINCT query terms present, ``score_milli`` the integer BM25 score
    (0 for documents matching no term — every input doc appears).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    K, B = int(k1_milli), int(b_milli)
    spark = SparkSession.getActiveSession() or docs.sparkSession

    # tokenization lowercases (words_col), so query terms must too —
    # an uppercase term would silently match nothing
    qdim = spark.createDataFrame(
        [(t,) for t in sorted({t.lower() for t in query_terms})],
        "term: string",
    )

    base = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.size(
            F.filter(words_col(text_col), lambda t: F.length(t) > 0)
        ).cast("long").alias("dl"),
    )

    toks = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.explode(words_col(text_col)).alias("term"),
    ).filter(F.length("term") > 0)

    # only query-term tokens survive past this broadcast join — the one
    # data shuffle below moves O(matches), not O(corpus tokens)
    tf = (
        toks.join(F.broadcast(qdim), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )

    # per-term document frequency: |q| rows
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    # corpus scalars: N docs, T tokens -> avgdl_milli (1-row dim)
    scalars = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("1000 * sum(dl) div count(1)").cast("long").alias("avgdl_milli"),
    )

    # idf_bits = floor(log2(2 + (2(N-df)+1) div (2df+1))), >= 1, exact
    idf_bits = floor_log2(
        F.lit(2) + F.expr("(2 * (n_docs - df) + 1) div (2 * df + 1)")
    )

    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(scalars))
        .join(base, "doc_id")
        .select("doc_id", "tf", "dl", "avgdl_milli", idf_bits.alias("idf_bits"))
        .select(
            "doc_id",
            F.expr("1000000 * dl div avgdl_milli").alias("rel_dl_milli"),
            "tf",
            "idf_bits",
        )
        .select(
            "doc_id",
            F.expr(
                f"idf_bits * tf * ({K} + 1000) * 1000 div "
                f"({K} * (1000 - {B}) div 1000 "
                f"+ (({K} * {B} div 1000) * rel_dl_milli) div 1000 "
                f"+ 1000 * tf)"
            ).cast("long").alias("term_score_milli"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("term_score_milli").cast("long").alias("score_milli"),
    )
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        "dl",
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        F.coalesce("score_milli", F.lit(0)).cast("long").alias("score_milli"),
    )
