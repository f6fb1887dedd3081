"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``      — flagship query: run the URL-frontier crawl engine on
                        the deterministic synthetic site (seed 42) and return
                        the interleaved-span documents table (input_hint
                        shape), plus a corpus-hygiene smoke over sf0.001.
``queries()``         — one callable per implemented operator from
                        SURVEY.md §2 + the training-data pipeline ops, each
                        phrased over the driver's testdata tables so DuckDB
                        can oracle-check them.
``oracle_sql()``      — the DuckDB-equivalent ANSI SQL for every
                        SQL-expressible query. The crawl-engine queries
                        (iterative, self-referential dataflow) are
                        non-SQL-expressible → rows-only check; their strong
                        oracle (plain-Python sequential reference semantics,
                        inform src/WebCrawler.js:244-273) runs in pytest
                        (tests/test_crawl_e2e.py).

Cross-engine determinism notes:
- 60-bit hash ``H60(s)``: Spark ``conv(substr(md5(s),1,15),16,10)`` ==
  DuckDB ``cast('0x'||substr(md5(s),1,15) as bigint)`` — exact, not
  statistical.
- dot products cast float→double before multiplying on both engines so
  sums are bit-identical in the same fold order.
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inform_spark.operators import components, similarity, textops

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Caches returned by the two-phase rank/cumsum operators (their contract:
# caller unpersists AFTER the output materializes — unpersisting earlier
# would let the range partitioner re-sample and drift the collected
# partition bases). Queries that use those operators park the caches
# here; bench.py and tests/verify/check_oracle.py call release_caches()
# after each query's result is collected, so persisted inputs never pin
# executor storage past the query that needed them.
_PINNED_CACHES: list[DataFrame] = []


def _pin_caches(caches: list[DataFrame]) -> None:
    _PINNED_CACHES.extend(caches)


def release_caches() -> None:
    """Unpersist every cache parked by queries since the last call.
    Safe once the corresponding results are materialized; idempotent."""
    while _PINNED_CACHES:
        c = _PINNED_CACHES.pop()
        try:
            c.unpersist()
        except Exception:
            pass


def _docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents")


_H60_SQL = "cast('0x'||substr(md5({s}),1,15) as bigint)"

# DuckDB mirror of operators/spans.synthesize_interleaved: 12-word text
# spans, media span after text span i iff H60('spans'||doc_id||'-'||i)%5==0,
# offsets numbering the interleaved sequence. Composed into every span-op
# oracle below so the whole pipeline is checked end to end.
_SPANS_CTE = (
    "with w as (select cast(doc_id as varchar) as doc_id, "
    "string_split(text, ' ') as words from documents), "
    "n as (select doc_id, words, "
    "greatest(cast(ceil(len(words)/12.0) as bigint), 1) as nc from w), "
    "c as (select doc_id, i, "
    "array_to_string(words[i*12+1:(i+1)*12], ' ') as chunk_text, "
    "(cast('0x'||substr(md5('spans'||doc_id||'-'||cast(i as varchar)),1,15) "
    "as bigint)) % 5 = 0 as add_media "
    "from n, unnest(range(nc)) as t(i)), "
    "u as (select doc_id, i, 0 as sub, 'text' as kind, "
    "chunk_text as text, cast(null as varchar) as media_ref from c "
    "union all "
    "select doc_id, i, 1 as sub, 'media' as kind, "
    "cast(null as varchar) as text, "
    "'media://'||doc_id||'/'||cast(i as varchar) as media_ref "
    "from c where add_media), "
    "spans as (select doc_id, kind, text, media_ref, "
    "cast(row_number() over (partition by doc_id order by i, sub) - 1 "
    'as int) as "offset" from u)'
)

# shingle list (3-word) over lower(text), DuckDB side; mirrors
# textops.shingles_col exactly (sequence bounds, slice width, dedup)
_SHINGLES_SQL = (
    "list_distinct(list_transform("
    "range(0, greatest(len(string_split(lower(text),' '))-3,0)+1), "
    "i -> array_to_string((string_split(lower(text),' '))[i+1:i+3], ' ')))"
)


# ---------------------------------------------------------------------------
# Crawl-engine operator analogs over the testdata tables (SURVEY §7 phase 6)
# ---------------------------------------------------------------------------


def q_a1_status_rollup(spark, sf_dir):
    """A1/S11 summary sink: groupBy(status).count() (src/WebCrawler.js:285-307)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_j1_anti_join_seen(spark, sf_dir):
    """J1 seen-dedup anti-join (src/WebCrawler.js:523-524): customers that
    never appear in orders == candidate URLs not in the seen set."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("never_seen_key"))
    )


def q_j2_broadcast_lookup(spark, sf_dir):
    """J2 robots-cache lookup as a broadcast hash join
    (src/RobotsParser.js:137-141): tiny dim table joined to a fact."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").cast("long").alias("n_nations"))
    )


def q_o3_rank_cap(spark, sf_dir):
    """O3 queue-cap admission (src/WebCrawler.js:553-560): global admission
    rank over the merged frontier, keep first 100. The top-100 prefix is a
    TakeOrderedAndProject (top-k per partition, one 100-row merge) and the
    contiguous rank is assigned by the distributed two-phase rank operator
    — no single-partition window anywhere in the plan."""
    from inform_spark.operators.rank import distributed_row_number

    ev = _t(spark, sf_dir, "events")
    top = ev.orderBy("ts", "event_id").limit(100)
    ranked, caches = distributed_row_number(
        top, [F.col("ts").asc(), F.col("event_id").asc()], out_col="rk"
    )
    _pin_caches(caches)
    return ranked.select("event_id", "rk")


def q_t2_window_budget(spark, sf_dir):
    """T2 per-host politeness token bucket (src/WebCrawler.js:265-267):
    row_number() OVER (PARTITION BY host ORDER BY ...) <= budget."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "rk")
    )


def q_corpus_hash_sample(spark, sf_dir):
    """Deterministic Bernoulli sample keyed on a cross-engine content hash
    (operators/sampling.hash_sample): reproducible across engines,
    partitionings and reruns — ``df.sample()`` is none of those."""
    from inform_spark.operators.sampling import hash_sample

    return hash_sample(_docs(spark, sf_dir), "doc_id", 0.25, salt="bench").select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


def q_corpus_split_assign(spark, sf_dir):
    """Named train/val/test split by hash bucket — a key's split never
    changes when the corpus grows (operators/sampling.split_assign)."""
    from inform_spark.operators.sampling import split_assign

    return split_assign(
        _docs(spark, sf_dir),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="s1",
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "split")


def q_corpus_stratified_sample(spark, sf_dir):
    """Exactly-n-per-stratum deterministic sample: rank by content hash
    within each stratum (operators/sampling.stratified_sample_exact) —
    per-stratum windows, one shuffle, no global sort."""
    from inform_spark.operators.sampling import stratified_sample_exact

    return stratified_sample_exact(
        _docs(spark, sf_dir), "source", 20, "doc_id", salt="s2"
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "source")


def q_pack_sequences(spark, sf_dir):
    """Training-sequence packing (concat-then-chunk at seq_len=2048):
    per-document window placement from a DISTRIBUTED exclusive prefix sum
    (operators/packing.pack_sequences over rank.distributed_cumsum — the
    two-phase range-partition formulation, no single-partition window)."""
    from inform_spark.operators.packing import pack_sequences

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("tok"),
    )
    out, caches = pack_sequences(
        docs, "tok", [F.col("doc_id").asc()], seq_len=2048
    )
    _pin_caches(caches)
    return out.select(
        "doc_id", "tok", "cum_before", "seq_first", "seq_last",
        "offset_in_seq", "n_seqs",
    )


def _spans_df(spark, sf_dir):
    from inform_spark.operators.spans import synthesize_interleaved

    return synthesize_interleaved(_docs(spark, sf_dir))


def q_spans_synthesize(spark, sf_dir):
    """Deterministic interleaved text+media span table (the engine's
    input_hint document shape) synthesized from the plain-text corpus —
    operators/spans.synthesize_interleaved, narrow built-ins only. The
    oracle rebuilds the identical table in DuckDB, proving the
    construction cross-engine byte-exact."""
    df = _spans_df(spark, sf_dir)
    s = df.select("doc_id", F.explode("spans").alias("s"))
    return s.select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def q_span_stats(spark, sf_dir):
    """Per-document interleaving statistics (operators/spans.span_stats):
    all in-row higher-order functions, zero shuffle."""
    from inform_spark.operators.spans import span_stats

    return span_stats(_spans_df(spark, sf_dir))


def q_span_rechunk(spark, sf_dir):
    """Fixed-cost training-window assignment at span boundaries
    (operators/spans.span_rechunk, max 512 chars, media cost 32): the
    prefix sum runs inside each row's array — narrow, no window, no
    shuffle."""
    from inform_spark.operators.spans import span_rechunk

    return span_rechunk(_spans_df(spark, sf_dir), max_chars=512, media_cost=32)


def q_span_render(spark, sf_dir):
    """Offset-order re-serialization of spans to markdown
    (operators/spans.span_render) — the engine's per-row invariant
    (span sequence ↔ rendered text) made queryable."""
    from inform_spark.operators.spans import span_render

    return span_render(_spans_df(spark, sf_dir))


def q_media_manifest(spark, sf_dir):
    """(media_ref, caption) pair mining: each media span with its
    preceding text span (operators/spans.media_manifest) — the
    image-caption extraction step of a multimodal pipeline, narrow."""
    from inform_spark.operators.spans import media_manifest

    return media_manifest(_spans_df(spark, sf_dir))


def q_link_pagerank(spark, sf_dir):
    """Crawl-prioritization PageRank over a deterministic synthetic link
    graph (operators/linkgraph.pagerank, 3 iterations): FIXED-POINT long
    arithmetic throughout, so the result is independent of partitioning
    and execution order — which is what lets DuckDB hash-match it (float
    PageRank never would). Two shuffles per iteration, map-side combine
    on the skewed in-degree hubs."""
    from inform_spark.operators.linkgraph import pagerank, synthetic_edges

    nodes = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id")
    )
    return pagerank(synthetic_edges(nodes), nodes, iterations=3).select(
        F.col("id").alias("doc_id"), "rank"
    )


def q_anchor_text_agg(spark, sf_dir):
    """Anchor-text aggregation per link target over the same synthetic
    link graph as link_pagerank (operators/linkgraph.anchor_text_agg):
    in-degree, distinct-anchor count, and the modal anchor with a
    deterministic (count DESC, anchor ASC) tie-break. Two-phase agg —
    map-side combine on (dst, anchor), then an associative min(struct)
    modal pick; no window, no sort, hub-skew-safe."""
    from inform_spark.operators.linkgraph import (
        anchor_text_agg,
        synthetic_edges,
        with_synthetic_anchors,
    )

    nodes = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id")
    )
    edges = with_synthetic_anchors(synthetic_edges(nodes))
    return anchor_text_agg(edges)


def q_dsir_importance(spark, sf_dir):
    """DSIR-style data-selection importance weights
    (operators/importance.dsir_weights): hash-designated ~10% of docs
    are the target corpus; every doc scores the count-weighted mean of
    its token-buckets' smoothed target/raw ratios, in FIXED-POINT long
    arithmetic (associative sums — partitioning/engine independent, so
    DuckDB hash-matches exactly). Two data shuffles + one fixed-size
    (4096-bucket) stats shuffle broadcast back — nothing O(corpus²)."""
    from inform_spark.operators.importance import dsir_weights
    from inform_spark.operators.textops import _h60

    d = _docs(spark, sf_dir)
    is_target = (
        F.pmod(
            _h60(F.concat(F.lit("dsir-t"), F.col("doc_id").cast("string"))),
            F.lit(10),
        )
        == 0
    )
    return dsir_weights(d, is_target)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/textops.ngram_contamination):
    training docs sharing any 8-gram with the hash-designated 5%
    benchmark partition. Broadcast semi-join on shingle hashes — no
    pair materialization, 100 TB-safe."""
    from inform_spark.operators.textops import _h60, ngram_contamination

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    is_bench = (
        F.pmod(
            _h60(F.concat(F.lit("bench"), F.col("doc_id").cast("string"))),
            F.lit(20),
        )
        == 0
    )
    return ngram_contamination(d, is_bench, w=8)


def q_gopher_gates(spark, sf_dir):
    """Gopher document-quality rule gates (operators/quality.gopher_gates,
    Rae et al. 2021 A1.1 thresholds): per-rule booleans + overall pass,
    all narrow in-row array arithmetic. Booleans cast to int for the
    cross-engine hash."""
    from inform_spark.operators.quality import gopher_gates

    g = gopher_gates(
        _docs(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )
    keep = ["doc_id", "word_count", "mean_word_len", "symbol_ratio",
            "alpha_ratio", "stop_hits"]
    flags = [c for c in g.columns if c.startswith("gate_")] + ["pass_all"]
    return g.select(
        *keep, *[F.col(c).cast("int").alias(c) for c in flags]
    )


def q_model_quality_score(spark, sf_dir):
    """Model-based quality filter (operators/quality.model_quality_score,
    fastText/DCLM-style): hashed bag of word unigrams+bigrams -> linear
    integer milli-score + keep gate. Zero-shuffle, whole-stage codegen;
    deterministic synthetic weights keep it engine-exact (a production
    run swaps in trained weights via the broadcast-join path)."""
    from inform_spark.operators.quality import model_quality_score

    return model_quality_score(
        _docs(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    ).select("doc_id", "n_feats", "score_milli",
             F.col("keep").cast("int").alias("keep"))


def q_exact_substring_dedup(spark, sf_dir):
    """Exact-substring dedup (operators/textops.exact_substring_dedup,
    Lee et al. 2022): remove every 8-token span occurring >= 2 times in
    the corpus, keep the rest of each document. Linear + join-based —
    no suffix array, no per-doc quadratic scan."""
    return textops.exact_substring_dedup(_docs(spark, sf_dir), w=8)


def q_pii_redact(spark, sf_dir):
    """PII scrub (operators/pii.pii_redact, FineWeb/Dolma-style): count +
    redact emails, IPv4s, E.164 phones with typed tokens. Pure narrow
    regexp chain in whole-stage codegen (zero shuffle). PII is injected
    deterministically per doc_id (the synthetic corpus has none), so the
    oracle checks real match+replace behavior, not all-zeros."""
    from inform_spark.operators.pii import pii_redact

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(
            "text || ' contact u' || cast(doc_id as string) || "
            "'@example.org or 10.2.' || cast(doc_id % 250 as string) || "
            "'.9 tel +1 415 550 ' || "
            "lpad(cast(doc_id % 10000 as string), 4, '0') || ' end'"
        ).alias("text"),
    )
    return pii_redact(d)


def q_span_pii_redact(spark, sf_dir):
    """Interleave-preserving PII scrub (operators/spans.span_pii_redact):
    the same regexp chain as pii_redact applied INSIDE each text span via
    in-row higher-order functions — media spans, span structure, and
    offsets untouched, so text↔media alignment survives redaction. PII is
    injected into each document's first (always-text) span; the result is
    exploded so DuckDB can hash-match spans and per-doc counts together.
    Narrow, zero shuffle."""
    from inform_spark.operators.spans import span_pii_redact

    df = _spans_df(spark, sf_dir)
    did_num = F.col("doc_id").cast("long")
    suffix = F.concat(
        F.lit(" contact u"),
        F.col("doc_id"),
        F.lit("@example.org or 10.2."),
        (did_num % 250).cast("string"),
        F.lit(".9 tel +1 415 550 "),
        F.lpad((did_num % 10000).cast("string"), 4, "0"),
        F.lit(" end"),
    )
    injected = df.select(
        "doc_id",
        F.transform(
            F.col("spans"),
            lambda x: F.struct(
                x["kind"].alias("kind"),
                F.when(x["offset"] == 0, F.concat(x["text"], suffix))
                .otherwise(x["text"])
                .alias("text"),
                x["media_ref"].alias("media_ref"),
                x["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
    out = span_pii_redact(injected)
    s = out.select(
        "doc_id", "n_emails", "n_ipv4", "n_phones", "n_pii",
        F.explode("spans").alias("s"),
    )
    return s.select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset",
        "n_emails", "n_ipv4", "n_phones", "n_pii",
    )


def q_bm25_relevance(spark, sf_dir):
    """Integer-exact BM25 query-relevance scoring
    (operators/relevance.bm25_relevance): domain-targeted corpus
    selection by ranked relevance to a fixed term set. All milli-unit
    integer arithmetic (associative, partitioning/engine independent —
    the fixed-point rationale of dsir/surprisal), so DuckDB hash-matches
    the scores exactly. Only query-term tokens shuffle."""
    from inform_spark.operators.relevance import bm25_relevance

    return bm25_relevance(
        _docs(spark, sf_dir), ["hash", "scan", "spark", "window"]
    )


def q_simhash_neardup_pairs(spark, sf_dir):
    """Simhash hamming near-dup pairs (textops.simhash_neardup_pairs):
    band-bucketed 32-bit fingerprint pairing with pigeonhole-exact
    recall for hamming <= 3 over 4 bands — the text analog of the pHash
    image path, upgrading simhash from a per-doc signal to a pairing
    operator. Near-dups are injected deterministically (every 10th doc
    re-appears with one extra token, flipping only a few majority-vote
    bits)."""
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    nd = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extratoken")).alias("text"),
    )
    return textops.simhash_neardup_pairs(d.unionByName(nd), bits=32)


def q_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (operators/similarity.semdedup, Abbas et
    al. 2023): cell assignment via broadcast centroids, within-cell
    tau-pair graph, connected components, survivor = farthest from
    centroid. Exact-duplicate vectors are injected deterministically
    (every 10th vec twice, every 20th three times — the synthetic
    embeddings have no natural near-dups), so real multi-member families
    form and the keep/drop logic is exercised end to end."""
    from inform_spark.operators.similarity import semdedup

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d1 = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    d2 = e.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 20000).alias("vec_id"), "embedding"
    )
    return semdedup(e.unionByName(d1).unionByName(d2), n_cells=8, tau=0.95)


def _curation_verdicts_over(spark, docs):
    """The curation-verdict composition parameterized by its input frame
    (``docs`` = (doc_id long, text, source)): shared verbatim by
    q_curation_verdicts (reads the parquet table) and
    q_warc_replay_curation (reads documents REPLAYED through the WARC
    serialize→shard→parse round trip) — one implementation, so the
    replay path cannot drift from the driver-checked composition."""
    from inform_spark.operators.importance import unigram_surprisal
    from inform_spark.operators.quality import (
        badword_filter,
        gopher_gates,
        model_quality_score,
    )

    dt = docs.select("doc_id", "text")
    g = gopher_gates(dt).select(
        "doc_id", F.col("pass_all").cast("int").alias("pass_gopher")
    )
    q = model_quality_score(dt).select(
        "doc_id", F.col("keep").cast("int").alias("pass_model")
    )
    injected = docs.select(
        "doc_id",
        F.expr(
            "text || case when doc_id % 5 = 0 then ' badword' else '' end"
            " || case when doc_id % 11 = 0 then ' nsfw nsfw' else '' end"
        ).alias("text"),
        "source",
    )
    blocked = spark.createDataFrame(
        [("src3",), ("src7",), ("src11",)], "source: string"
    )
    b = badword_filter(injected, blocked_sources=blocked).select(
        "doc_id", F.col("keep").cast("int").alias("pass_badword")
    )
    u = unigram_surprisal(dt).select(
        "doc_id", F.col("keep").cast("int").alias("pass_lm")
    )
    d = dt
    m = d.groupBy("text").agg(F.min("doc_id").alias("__mn"))
    c = d.join(m, "text").select(
        "doc_id",
        (F.col("doc_id") == F.col("__mn")).cast("int").alias("is_canonical"),
    )
    out = (
        g.join(q, "doc_id").join(b, "doc_id").join(u, "doc_id")
        .join(c, "doc_id")
    )
    # pass_gopher is reported but not gated: the synthetic word-salad
    # corpus fails the stop-word gate globally (a corpus property), and
    # an all-zero keep_final would let a broken AND hash-match
    keep_final = (
        F.col("pass_model").cast("boolean")
        & F.col("pass_badword").cast("boolean")
        & F.col("pass_lm").cast("boolean")
        & F.col("is_canonical").cast("boolean")
    )
    return out.select(
        "doc_id", "pass_gopher", "pass_model", "pass_badword", "pass_lm",
        "is_canonical", keep_final.cast("int").alias("keep_final"),
    )


def q_curation_verdicts(spark, sf_dir):
    """End-to-end corpus-curation verdict table — the operators composed
    as a real pipeline would chain them (FineWeb/Dolma shape): Gopher
    rule gates (reported), model quality AND C4 blocklist AND CCNet LM
    band AND exact-dedup canonical pick, one row per document with
    per-stage verdicts and the final keep. The oracle composes the
    stage ORACLES as subqueries — so the composition itself is what
    gets cross-checked. Each stage is narrow or broadcast; the only
    added shuffle is the canonical-text groupBy."""
    return _curation_verdicts_over(
        spark,
        _docs(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
        ),
    )


def q_badword_filter(spark, sf_dir):
    """C4-style blocklist gate (operators/quality.badword_filter):
    whole-token bad-word hits (in-row array filter, zero shuffle) plus a
    UT1-style blocked-domain broadcast lookup. Hits are injected
    deterministically (every 5th doc gets one bad token, every 11th two
    more) so both branches of the gate are exercised."""
    from inform_spark.operators.quality import badword_filter

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(
            "text || case when doc_id % 5 = 0 then ' badword' else '' end"
            " || case when doc_id % 11 = 0 then ' nsfw nsfw' else '' end"
        ).alias("text"),
        "source",
    )
    blocked = spark.createDataFrame(
        [("src3",), ("src7",), ("src11",)], "source: string"
    )
    out = badword_filter(d, blocked_sources=blocked)
    return out.select(
        "doc_id",
        "n_bad_words",
        F.col("source_blocked").cast("int").alias("source_blocked"),
        F.col("keep").cast("int").alias("keep"),
    )


def q_unigram_surprisal(spark, sf_dir):
    """CCNet-style LM quality band (operators/importance.unigram_surprisal):
    per-doc surprisal under the corpus's own unigram model, floor-log2 in
    exact integer arithmetic (length of the binary string — associative,
    partitioning/engine independent). Middle-band keep gate."""
    from inform_spark.operators.importance import unigram_surprisal

    return unigram_surprisal(
        _docs(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    ).select(
        "doc_id", "n_tokens", "surprisal_bits", "mean_bits_milli",
        F.col("keep").cast("int").alias("keep"),
    )


def q_repetition_gates(spark, sf_dir):
    """Gopher A1.1 repetition gates (operators/repetition.repetition_gates):
    top-n-gram / duplicate-n-gram / duplicate-line character fractions +
    threshold booleans. ZERO-shuffle: per-doc sorted-array fold
    (array_sort + F.aggregate), semantics identical to the relational
    groupBy the oracle runs."""
    from inform_spark.operators.repetition import repetition_gates

    g = repetition_gates(
        _docs(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )
    flags = [c for c in g.columns if c.startswith("gate_")] + ["pass_all"]
    return g.select(
        *[c for c in g.columns if c not in flags],
        *[F.col(c).cast("int").alias(c) for c in flags],
    )


def q_source_cap(spark, sf_dir):
    """Per-source document cap (operators/sampling.per_source_cap,
    RefinedWeb-style domain caps): at most k docs per source in
    deterministic content-hash order. One shuffle on source; hot-source
    hash prefilter available for skewed domains."""
    from inform_spark.operators.sampling import per_source_cap

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )
    return per_source_cap(d, "source", 25, "doc_id").select(
        "doc_id", "source", F.col("cap_rank").cast("long").alias("cap_rank")
    )


def q_boilerplate_filter(spark, sf_dir):
    """CCNet-style line-level boilerplate filtering
    (operators/quality.boilerplate_line_filter) over deterministically
    8-word-chunked lines: drop short / letterless / pattern-matching
    lines, re-join, report retention. Narrow end-to-end."""
    from inform_spark.operators.quality import boilerplate_line_filter

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    words = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(words) / F.lit(8.0)).cast("int")
    chunked = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), nlines - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i * 8 + 1, 8)),
            ),
        ).alias("text"),
    )
    out = boilerplate_line_filter(
        chunked, min_chars=35, patterns=("table",)
    )
    return out.select(
        "doc_id", "clean_text", "kept_lines", "total_lines",
        "kept_char_ratio",
    )


def q_snapshot_diff(spark, sf_dir):
    """Incremental-crawl snapshot diff (operators/recrawl.snapshot_diff):
    added/removed/changed/unchanged per URL across two deterministic
    synthetic snapshots (deletions H%10, edits H%7, additions H%13 of
    the corpus). One full-outer join; bucketed co-location at 10^10."""
    from inform_spark.operators.recrawl import snapshot_diff
    from inform_spark.operators.textops import _h60

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )

    def hmod(salt, m):
        return F.pmod(_h60(F.concat(F.lit(salt), F.col("url"))), F.lit(m))

    old = d.select("url", F.md5("text").alias("fingerprint"))
    new_text = F.when(
        hmod("mod", 7) == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    survived = d.filter(hmod("del", 10) != 0).select(
        "url", F.md5(new_text).alias("fingerprint")
    )
    added = d.filter(hmod("add", 13) == 0).select(
        F.concat(F.lit("n"), F.col("url")).alias("url"),
        F.md5(F.concat(F.lit("new "), F.col("url"))).alias("fingerprint"),
    )
    return snapshot_diff(old, survived.unionByName(added))


def q_recrawl_schedule(spark, sf_dir):
    """Adaptive revisit scheduling (operators/recrawl.recrawl_schedule):
    per-URL change-rate stats from a revisit log, then the clamped
    base*(checks+1)/(changes+1) interval — all deterministic integer
    arithmetic (epoch millis), one aggregation."""
    from inform_spark.operators.recrawl import (
        change_history_stats,
        recrawl_schedule,
    )

    ev = _t(spark, sf_dir, "events")
    hist = ev.select(
        F.concat(
            F.lit("u"), F.pmod(F.col("event_id"), F.lit(2000)).cast("string")
        ).alias("url"),
        F.col("ts").alias("checked_at"),
        (F.col("event_type") == "click").alias("changed"),
    )
    return recrawl_schedule(change_history_stats(hist)).select(
        "url", "checks", "changes", "last_ms", "interval_ms", "next_due_ms"
    )


def q_t3_paced_admissions(spark, sf_dir):
    """T3-family politeness admission as a continuous operator (batch
    formulation of streaming/stateful.paced_admissions_stream — the
    applyInPandasWithState form is stream-only; equality of the two is
    pinned by tests/test_stateful.py). Budget 3 per user per minute."""
    from inform_spark.streaming.stateful import paced_admissions_batch

    ev = _t(spark, sf_dir, "events")
    cand = ev.select(
        F.col("user_id").cast("string").alias("host"),
        F.col("event_id").cast("string").alias("url"),
        "ts",
    )
    return paced_admissions_batch(cand, budget=3, window_ms=60_000)


def q_f4_regex_filter(spark, sf_dir):
    """F4 binary-extension skip (src/WebCrawler.js:595-600): one vectorized
    rlike predicate, counted per group."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("text").rlike("(spark|shuffle|join)"))
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_x7_content_hash(spark, sf_dir):
    """X7 content id hashing (src/sources/util.js:9-11; sha1 there, md5 here
    for cross-engine checkability)."""
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("text").alias("content_md5"),
    )


def q_o4_limit_union(spark, sf_dir):
    """O4+O5 per-source item limit then union (src/sources/rss.js:81,
    src/sources/index.js:24-43)."""
    docs = _docs(spark, sf_dir)
    a = docs.filter(F.col("source") == "src0").orderBy("doc_id").limit(5)
    b = docs.filter(F.col("source") == "src1").orderBy("doc_id").limit(5)
    return a.unionByName(b).select("doc_id", "source")


def q_s10_feed_dedup(spark, sf_dir):
    """S10 feed dedup sink (src/sources/write.js:155-177): distinct ids."""
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )


def q_a1b_pricing_rollup(spark, sf_dir):
    """A1-family metrics rollup at fact-table scale (map-side partial agg →
    one shuffle; the summary-sink shape the engine emits per batch)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_x8_slugify(spark, sf_dir):
    """X8 slugify (src/sources/util.js:18-26), all-native regexp chain."""
    slug = F.substring(F.lower("text"), 1, 50)
    slug = F.regexp_replace(slug, "['\"]", "")
    slug = F.regexp_replace(slug, "[^a-z0-9]+", "-")
    slug = F.regexp_replace(slug, "^-|-$", "")
    slug = F.substring(slug, 1, 120)
    slug = F.when(slug == "", F.lit("item")).otherwise(slug)
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), slug.alias("slug")
    )


def q_x9_date_normalize(spark, sf_dir):
    """X9 ISO date normalize (src/sources/util.js:42-46): parseable ->
    normalized string, unparseable -> null (to_timestamp null-on-fail)."""
    ev = _t(spark, sf_dir, "events")
    dstr = F.when(
        F.col("event_id") % 7 == 0, F.lit("not-a-date")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    parsed = F.try_to_timestamp(dstr, F.lit("yyyy-MM-dd HH:mm:ss"))
    return ev.select(
        "event_id",
        F.date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss").alias("iso"),
    )


def q_x5_url_filepath(spark, sf_dir):
    """X5 URL->filepath (src/WebCrawler.js:611-635): query-string mangling
    '?a=1&b=2' -> '_a_1_b_2', .md suffix — native string exprs over
    synthesized urls."""
    docs = _docs(spark, sf_dir)
    query = F.when(
        F.col("doc_id") % 3 == 0, F.lit("?page=1&sort=asc")
    ).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".test/docs/item-"),
        F.col("doc_id").cast("string"), query,
    )
    path = F.concat(
        F.lit("docs/item-"), F.col("doc_id").cast("string"),
        F.regexp_replace(query, "[?&=]", "_"), F.lit(".md"),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        url.alias("url"),
        path.alias("doc_path"),
    )


def q_f1_content_type_gate(spark, sf_dir):
    """F1 content-type gate (src/WebCrawler.js:325-329): contains-match on
    'text/html' (NOT equality — charsets ride along), counted per source."""
    docs = _docs(spark, sf_dir)
    ct = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("text/html; charset=utf-8"))
        .when(F.col("doc_id") % 4 == 1, F.lit("text/html"))
        .when(F.col("doc_id") % 4 == 2, F.lit("application/pdf"))
        .otherwise(F.lit("image/png"))
    )
    return (
        docs.withColumn("ct", ct)
        .filter(F.col("ct").contains("text/html"))
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_html"))
    )


def q_f5_glob_filter(spark, sf_dir):
    """F5 minimatch include/exclude (src/FileFilter.js:25-50): include
    *.md|*.html (matchBase => basename suffix), exclude private/** —
    exclude-first, compiled to two vectorized regexes."""
    docs = _docs(spark, sf_dir)
    ext = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("md"))
        .when(F.col("doc_id") % 5 == 1, F.lit("html"))
        .when(F.col("doc_id") % 5 == 2, F.lit("txt"))
        .when(F.col("doc_id") % 5 == 3, F.lit("pdf"))
        .otherwise(F.lit("md"))
    )
    prefix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("docs/"))
        .when(F.col("doc_id") % 3 == 1, F.lit("guide/"))
        .otherwise(F.lit("private/"))
    )
    path = F.concat(prefix, F.lit("item-"), F.col("doc_id").cast("string"), F.lit("."), ext)
    return (
        docs.withColumn("path", path)
        .filter(~F.col("path").rlike("^private/"))
        .filter(F.col("path").rlike("\\.(md|html)$"))
        .select(F.col("doc_id").cast("long").alias("doc_id"), "path")
    )


def q_f6_robots_match(spark, sf_dir):
    """F6 robots disallow matching (src/RobotsParser.js:132-182): plain
    prefix, '*' wildcard, '$' end-anchor — three compiled predicates over
    synthesized paths; allowed = no rule matches."""
    docs = _docs(spark, sf_dir)
    path = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("/admin/panel"))
        .when(F.col("doc_id") % 6 == 1, F.lit("/adminx"))
        .when(F.col("doc_id") % 6 == 2, F.lit("/files/a.zip"))
        .when(F.col("doc_id") % 6 == 3, F.lit("/files/a.txt"))
        .when(F.col("doc_id") % 6 == 4, F.lit("/exact"))
        .otherwise(F.lit("/exact/more"))
    )
    d = docs.withColumn("path", path)
    disallowed = (
        F.col("path").startswith("/admin")            # plain prefix rule
        | F.col("path").rlike("^/files/.*\\.zip")      # '*' wildcard rule
        | F.col("path").rlike("^/exact$")              # '$' end-anchor rule
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "path",
        (~disallowed).alias("allowed"),
    )


def q_x6_strip_html(spark, sf_dir):
    """X6 stripHtml (src/sources/util.js:95-121): drop script blocks, strip
    tags, decode entities, collapse whitespace — regexp_replace chain."""
    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<p>"), F.col("text"),
        F.lit('</p><script>var x = 1;</script><b>bold &amp; &lt;tagged&gt;</b>'),
    )
    s = F.regexp_replace(html, "<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, "<[^>]+>", " ")
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.trim(F.regexp_replace(s, "\\s+", " "))
    return docs.select(F.col("doc_id").cast("long").alias("doc_id"), s.alias("plain"))


def q_s8_inline_vs_download(spark, sf_dir):
    """S8 GitHub contents branch (src/GitCrawler.js:298-325): <=1MB inline
    base64 vs download_url — the size predicate at corpus scale (256-char
    stand-in), with A4 download counters per branch."""
    docs = _docs(spark, sf_dir)
    branch = F.when(F.col("n_chars") <= 256, F.lit("inline")).otherwise(
        F.lit("download")
    )
    return (
        docs.groupBy(branch.alias("branch"))
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("total_bytes"),
        )
    )


def q_t5_retry_backoff(spark, sf_dir):
    """T5 retry/backoff schedule (src/WebCrawler.js:165-202): exponential
    1s/2s/4s; total sleep for k retries = (2^min(k,3)-1)*1000 ms."""
    ev = _t(spark, sf_dir, "events")
    retries = (F.col("event_id") % 5).cast("int")
    capped = F.least(retries, F.lit(3))
    return ev.select(
        "event_id",
        retries.alias("retries"),
        (retries <= 3).alias("retryable"),
        ((F.pow(F.lit(2.0), capped) - 1) * 1000).cast("long").alias("backoff_ms"),
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup candidates: top-3 closest pairs per label
    bucket (LSH/IVF cell analog)."""
    return similarity.embedding_neardup_topk(_t(spark, sf_dir, "embeddings"))


def q_multimodal_image_meta(spark, sf_dir):
    """Multimodal decode plumbing end-to-end: synthesize deterministic fake
    image bytes per doc, decode via the mapInPandas feature extractor
    (binary column never leaves the executor), emit typed metadata. The
    stub decode is pure md5 arithmetic, so DuckDB can oracle-check the
    mapInPandas path exactly."""
    from inform_spark.operators import multimodal
    from inform_spark.session import ship_package

    ship_package(spark)
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.lit("https://img.test/"), F.col("doc_id").cast("string"), F.lit(".png")
        ).alias("media_ref"),
    )
    feats = multimodal.image_features(multimodal.synthesize_media(docs))
    return feats.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "media_ref",
        "width",
        "height",
        "phash",
    )


def _phash_feats(spark, sf_dir):
    """Deterministic phash features over documents for the near-dup
    oracles: group g = doc_id div 7 shares a base hash H60('ph-'||g);
    member doc_id % 7 == 1 flips bit (g % 59) — one hamming-1 neighbor
    per ~6-member identical group. Reproducible bit-for-bit in DuckDB
    (xor / shift / bit_count are ANSI-expressible)."""
    from inform_spark.operators.textops import _h60

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("i")
    ).withColumn("g", F.expr("i div 7"))
    base = _h60(F.concat(F.lit("ph-"), F.col("g").cast("string")))
    flip = F.when(
        F.pmod(F.col("i"), F.lit(7)) == 1,
        F.expr("shiftleft(cast(1 as bigint), cast(pmod(g, 59) as int))"),
    ).otherwise(F.lit(0).cast("long"))
    return d.select(
        F.concat(F.lit("m"), F.col("i").cast("string")).alias("media_ref"),
        base.bitwiseXOR(flip).alias("phash"),
    )


def q_phash_neardup_pairs(spark, sf_dir):
    """Exact image near-dup pairs by perceptual hash (operators/
    multimodal.near_dup_by_phash, round-5 rewrite): identical phashes
    pre-collapse to one representative before the 4x16-bit band join,
    so a hot logo is one band row, not a quadratic bucket clique; the
    exact pair expansion is output-size-bound."""
    from inform_spark.operators import multimodal

    return multimodal.near_dup_by_phash(
        _phash_feats(spark, sf_dir), hamming_max=2
    )


def q_phash_neardup_stars(spark, sf_dir):
    """Star-edge form of the phash near-dup graph (operators/multimodal
    .phash_neardup_stars): identical connected components at O(n)
    edges — the clustering-consumer shape (same discipline as
    textops.star_pairs_from_bands)."""
    from inform_spark.operators import multimodal

    return multimodal.phash_neardup_stars(
        _phash_feats(spark, sf_dir), hamming_max=2
    )


def q_phash_incremental(spark, sf_dir):
    """Incremental image near-dup: the odd-doc_id half of the synthetic
    phash corpus probes an index built from the even half
    (operators/multimodal.phash_incremental — distinct-phash probes
    against the persisted band store, survivor components for
    new-vs-new; the image-side analog of dedup_incremental)."""
    from inform_spark.operators import multimodal

    f = _phash_feats(spark, sf_dir).withColumn(
        "__i",
        F.regexp_extract("media_ref", r"^m(\d+)$", 1).cast("long"),
    )
    new = f.filter(F.pmod("__i", F.lit(2)) == 1).drop("__i")
    idx = f.filter(F.pmod("__i", F.lit(2)) == 0).drop("__i")
    return multimodal.phash_incremental(new, index_feats=idx, hamming_max=2)


def q_w1_tumbling_window(spark, sf_dir):
    """Event-time tumbling-window rollup (streaming-capable op: same plan
    runs under readStream + watermark — see inform_spark/streaming)."""
    from inform_spark.streaming.windows import tumbling_counts

    return tumbling_counts(_t(spark, sf_dir, "events"))


def q_w2_sliding_window(spark, sf_dir):
    """Event-time HOPPING-window rollup (1h width, 30m slide — each event
    in exactly 2 overlapping windows; streaming-capable with watermark).
    Oracle formulation: a hop of width W, slide S is the union of W/S
    tumbling rollups offset by i·S."""
    from inform_spark.streaming.windows import sliding_counts

    return sliding_counts(
        _t(spark, sf_dir, "events"), width="1 hour", slide="30 minutes"
    )


def q_w3_sessionization(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) per user."""
    from inform_spark.streaming.windows import sessionize

    return sessionize(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Training-data pipeline ops (documents / embeddings tables)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return textops.dedup_exact(_docs(spark, sf_dir))


def q_minhash_signatures(spark, sf_dir):
    return textops.minhash_signatures(_docs(spark, sf_dir))


def q_minhash_lsh_pairs(spark, sf_dir):
    return textops.minhash_lsh_pairs(_docs(spark, sf_dir))


def q_dedup_minhash_clusters(spark, sf_dir):
    return components.minhash_clusters(_docs(spark, sf_dir))


def q_dedup_minhash_survivors(spark, sf_dir):
    return components.minhash_survivors(_docs(spark, sf_dir))


def q_dedup_lines(spark, sf_dir):
    return textops.dedup_lines(_docs(spark, sf_dir), min_chars=10)


def q_dedup_incremental(spark, sf_dir):
    # even doc_ids play the existing corpus index, odd ones the new batch
    docs = _docs(spark, sf_dir)
    return components.minhash_incremental(
        docs.filter("doc_id % 2 = 1"), docs.filter("doc_id % 2 = 0")
    )


def q_vocab_topk(spark, sf_dir):
    return textops.vocab_topk(_docs(spark, sf_dir), k=100)


def q_duplicate_passages(spark, sf_dir):
    return textops.duplicate_passage_stats(_docs(spark, sf_dir), w=8)


def q_trap_templates(spark, sf_dir):
    """Crawler-trap detection over a synthesized URL corpus: 20 hosts x 5
    path families; templates whose member count beats the uniform
    expectation get flagged."""
    from inform_spark.operators import traps

    ev = _t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://h"),
        (F.col("user_id") % 20).cast("string"),
        F.lit(".test/"),
        F.col("event_type"),
        F.lit("/"),
        F.col("event_id").cast("string"),
    )
    return traps.trap_templates(ev.select(url.alias("url")), min_count=110)


def q_simhash(spark, sf_dir):
    return textops.simhash(_docs(spark, sf_dir))


def q_ngram_jaccard_topk(spark, sf_dir):
    return textops.ngram_jaccard_topk(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return textops.lang_id(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    return textops.quality_score(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return textops.token_counts(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    return textops.fingerprints(_docs(spark, sf_dir))


def q_ann_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(_t(spark, sf_dir, "embeddings"))


def q_ann_lsh_topk(spark, sf_dir):
    return similarity.lsh_bucketed_topk(_t(spark, sf_dir, "embeddings"))


def q_ann_ivf_topk(spark, sf_dir):
    return similarity.ivf_topk(_t(spark, sf_dir, "embeddings"))


def q_ann_ivf_trained_topk(spark, sf_dir):
    """IVF over TRAINED cells: the k-means centroids
    (clustering.kmeans_centroids, 8 cells, 2 integer Lloyd rounds)
    converted back to float units and dropped into the identical
    ivf_topk assignment/probe/rank dataflow — the composition the
    trainer exists for. The oracle is the ann_ivf_topk SQL with only
    its centroid CTE swapped for the trained chain."""
    from inform_spark.operators.clustering import (
        centroids_as_float,
        kmeans_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = centroids_as_float(kmeans_centroids(emb, n_cells=8, iterations=2))
    return similarity.ivf_topk(emb, centroids=cents)


# ---------------------------------------------------------------------------
# Crawl engine itself (non-SQL-expressible: iterative self-referential
# dataflow — strong oracle lives in tests/test_crawl_e2e.py vs the
# sequential reference semantics)
# ---------------------------------------------------------------------------

_CRAWL_CACHE: dict = {}

# ONE fixture definition shared by the engine run below, the committed
# golden oracle (tests/golden/, generated from the plain-Python sequential
# reference semantics by tests/make_golden.py) and the sync test
# (tests/test_spark_entry_golden.py). Single seed => the sequential oracle
# (inform src/WebCrawler.js:244-273 at concurrency=1) applies verbatim.
# sized for the driver's correctness budget: (26 pages, limit 32) crawls in
# 3 batches (~9 s) instead of 8 (~38 s at 44/60) while still exercising
# multi-batch frontier growth, robots skips, 404s and media spans
CRAWL_FIXTURE = {
    "n_hosts": 1,
    "pages_per_host": 26,
    "seed": "https://site0.test/",
    "limit": 32,
}
GOLDEN_DIR = os.path.join(_REPO, "tests", "golden")


def _run_fixture_crawl(spark):
    if "eng" in _CRAWL_CACHE:
        return _CRAWL_CACHE["eng"]
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.session import ship_package
    from inform_spark.sources.pages import generate_site

    ship_package(spark)
    # tiny fixture -> tiny shuffles: 200 default partitions would drown the
    # 50-page crawl in task-scheduling overhead. Saved + restored below:
    # this session is shared with every other driver query, and leaving 8
    # behind would quietly run all their shuffles at 1/4 parallelism.
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    pages, robots = generate_site(
        CRAWL_FIXTURE["n_hosts"], CRAWL_FIXTURE["pages_per_host"]
    )
    from inform_spark.schemas import ROBOTS

    pages_df = spark.createDataFrame(pages)
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    )
    cfg = CrawlConfig(
        seeds=[CRAWL_FIXTURE["seed"]],
        limit=CRAWL_FIXTURE["limit"],
        render_partitions=8,
    )
    eng = CrawlEngine(spark, pages_df, robots_df, cfg)
    try:
        eng.run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    _CRAWL_CACHE["eng"] = eng
    return eng


def q_crawl_documents(spark, sf_dir):
    """Full engine run on the deterministic synthetic site: interleaved
    text+media span documents (input_hint shape), exploded for stability."""
    eng = _run_fixture_crawl(spark)
    return eng.documents().select(
        "doc_id",
        "url",
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        "doc_id",
        "url",
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
        F.md5(F.coalesce(F.col("span.text"), F.lit(""))).alias("text_md5"),
    )


def q_crawl_seen_order(spark, sf_dir):
    """Final URL-seen set + crawl order (the two north_rule equalities)."""
    eng = _run_fixture_crawl(spark)
    return eng.seen().select("url", "status", "crawl_rank")


# ---------------------------------------------------------------------------
# round-4 additions: subword tokenization, model lang-id, URL clustering,
# normalized-paragraph dedup, crawl budgeting, text canonicalization,
# pagination stitching
# ---------------------------------------------------------------------------


def q_subword_token_counts(spark, sf_dir):
    """Wordpiece-style greedy longest-match subword token accounting over
    a committed vocabulary (operators/subword.subword_token_counts) — the
    fold runs over DISTINCT words only (Zipf dictionary trick), counts
    join back per doc. The oracle replays the identical greedy walk in
    DuckDB via list_reduce."""
    from inform_spark.operators.subword import subword_token_counts

    return subword_token_counts(_docs(spark, sf_dir))


def q_pack_sequences_subword(spark, sf_dir):
    """pack_sequences driven by SUBWORD token counts (training-real
    budgets) instead of whitespace counts: the tokenizer feeds the
    distributed prefix-sum packer, seq_len=512."""
    from inform_spark.operators.packing import pack_sequences
    from inform_spark.operators.subword import subword_token_counts

    counts = subword_token_counts(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_subword_tokens").alias("tok")
    )
    out, caches = pack_sequences(
        counts, "tok", [F.col("doc_id").asc()], seq_len=512
    )
    _pin_caches(caches)
    return out.select(
        "doc_id", "tok", "cum_before", "seq_first", "seq_last",
        "offset_in_seq", "n_seqs",
    )


def q_lang_id_model(spark, sf_dir):
    """Hashed char-trigram per-language LM classifier in integer
    surprisal bits (operators/langid.lang_id_model) — the CLD/fastText
    shape with the committed seed corpus as training data."""
    from inform_spark.operators.langid import lang_id_model

    return lang_id_model(_docs(spark, sf_dir))


def _synth_urls(spark, sf_dir):
    """Deterministic messy-URL surface forms synthesized from events:
    case-variant scheme+host, default ports, trailing slashes, tracking
    params, unsorted query order, fragments."""
    ev = _t(spark, sf_dir, "events")
    https = F.col("event_id") % 7 == 0
    url = F.concat(
        F.lit("HTTP"),
        F.when(https, F.lit("S")).otherwise(F.lit("")),
        F.lit("://Host"),
        (F.col("user_id") % 20).cast("string"),
        F.lit(".Example.COM"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.when(https, F.lit(":443")).otherwise(F.lit(":80")),
        ).otherwise(F.lit("")),
        F.lit("/Path/"),
        F.col("event_type"),
        F.when(F.col("event_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="),
        (F.col("event_id") % 50).cast("string"),
        F.when(F.col("event_id") % 5 == 0, F.lit("&b=2&a=1")).otherwise(
            F.lit("")
        ),
        F.lit("#frag"),
    )
    return ev.select(url.alias("url"))


def q_url_canonical_cluster(spark, sf_dir):
    """RFC 3986 safe-normalization + tracking-param strip + query-param
    sort, clustering URL surface variants (operators/urlops)."""
    from inform_spark.operators.urlops import url_canonical_cluster

    return url_canonical_cluster(_synth_urls(spark, sf_dir))


def q_ccnet_paragraph_dedup(spark, sf_dir):
    """Corpus-wide first-occurrence dedup on CCNet-NORMALIZED paragraphs
    (lowercase, digits->0, punctuation stripped) — catches the
    boilerplate variants raw line-hash dedup misses."""
    return textops.ccnet_paragraph_dedup(_docs(spark, sf_dir))


def q_domain_crawl_budget(spark, sf_dir):
    """Next-round per-domain fetch budgets proportional to unique-doc
    value, integer-clamped to a politeness floor / anti-trap ceiling
    (operators/recrawl.domain_crawl_budget)."""
    from inform_spark.operators.recrawl import domain_crawl_budget

    return domain_crawl_budget(_docs(spark, sf_dir))


def q_text_normalize(spark, sf_dir):
    """Committed-table unicode punctuation transliteration + control
    strip + whitespace collapse (operators/textops.text_normalize)."""
    return textops.text_normalize(_docs(spark, sf_dir))


def q_suffix_prefix_overlap(spark, sf_dir):
    """Pagination stitching: (a, b) where a's last-k tokens equal b's
    first-k tokens (operators/textops.suffix_prefix_overlap, k=2)."""
    return textops.suffix_prefix_overlap(_docs(spark, sf_dir), k=2)


# committed target mixture for the corpus_mix_sample query: favor the
# even sources 3:1 (relative integer weights; only ratios matter)
MIX_WEIGHTS = {f"src{i}": (300 if i % 2 == 0 else 100) for i in range(16)}


def q_corpus_mix_sample(spark, sf_dir):
    """Static mixture sampling (The Pile/DoReMi shape): deterministic
    hash-Bernoulli acceptance tuned so per-source TOKEN shares match the
    committed MIX_WEIGHTS at the largest feasible budget
    (operators/sampling.corpus_mix_sample). src16-19 are absent from the
    target map -> explicit accepted=false verdicts."""
    from inform_spark.operators.sampling import corpus_mix_sample

    return corpus_mix_sample(_docs(spark, sf_dir), MIX_WEIGHTS, salt="m4")


def q_bigram_surprisal(spark, sf_dir):
    """Bigram-LM middle-band quality gate, integer-exact
    (operators/importance.bigram_surprisal)."""
    from inform_spark.operators.importance import bigram_surprisal

    return bigram_surprisal(_docs(spark, sf_dir))


def _warc_staged(spark, sf_dir):
    """documents staged as WARC inputs: deterministic uri/date/type."""
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.lit("https://corpus.test/doc/"), F.col("doc_id").cast("string")
        ).alias("uri"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        F.lit("text/plain; charset=utf-8").alias("content_type"),
        F.col("text").alias("payload"),
    )


def q_warc_roundtrip(spark, sf_dir):
    """WARC (ISO 28500) archive round trip: serialize every document as a
    WARC/1.0 response record (pure-codegen string concat, zero UDF),
    concatenate records into 16 shard buffers, then re-parse the shards
    with the Content-Length-framed mapInPandas parser
    (sources/warc.py). Output is derived entirely from PARSED values, so
    hash-equality with the oracle (which re-derives uri / byte length /
    payload md5 straight from `documents`) proves parse∘serialize ==
    identity, including byte-exact Content-Length on multi-byte text.
    The in-query shard concat is the test-scale stand-in for
    write_warc's one-file-per-partition publish path."""
    from inform_spark.session import ship_package
    from inform_spark.sources import warc

    ship_package(spark)
    recs = warc.serialize_warc(_warc_staged(spark, sf_dir)).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(16))
    )
    shards = recs.groupBy("shard").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "warc"))),
                lambda s: s["warc"],
            ),
        ).alias("content")
    )
    parsed = warc.parse_warc(shards, "content")
    return parsed.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("uri"),
        "content_length",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


def q_warc_replay_curation(spark, sf_dir):
    """The Common Crawl ingestion story composed end to end (VERDICT r4
    item 7): documents serialized as WARC/1.0 response records with
    source+doc_id encoded in the target URI, concatenated into 16
    archive shards, re-parsed with the Content-Length-framed
    mapInPandas parser (sources/warc.py), then fed through the SAME
    curation-verdict composition as q_curation_verdicts
    (:func:`_curation_verdicts_over` — one implementation, zero drift).
    The oracle is curation_verdicts' oracle verbatim, derived straight
    from the documents table: hash equality proves the whole replay
    path (serialize ∘ shard ∘ parse ∘ uri-decode) is identity on every
    byte the curation stages consume."""
    from inform_spark.session import ship_package
    from inform_spark.sources import warc

    ship_package(spark)
    staged = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.lit("https://corpus.test/"),
            F.col("source"),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("uri"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        F.lit("text/plain; charset=utf-8").alias("content_type"),
        F.col("text").alias("payload"),
    )
    recs = warc.serialize_warc(staged).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(16))
    )
    shards = recs.groupBy("shard").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "warc"))),
                lambda s: s["warc"],
            ),
        ).alias("content")
    )
    replayed = warc.parse_warc(shards, "content").select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("payload").alias("text"),
        F.regexp_extract(
            "target_uri", r"corpus\.test/([^/]+)/doc/", 1
        ).alias("source"),
    )
    return _curation_verdicts_over(spark, replayed)


def q_warc_cdx_index(spark, sf_dir):
    """CDX companion index for WARC shards: (uri, shard, offset, length)
    with offset = exclusive per-shard prefix sum of record byte lengths
    in write order (sources/warc.cdx_index) — the range-read handle that
    gives sub-file parallelism on oversized archive shards. The window
    is per-shard (bounded rows), never corpus-global; the oracle
    replicates the full record template in SQL and takes the same
    windowed sum."""
    from inform_spark.sources import warc

    recs = warc.serialize_warc(_warc_staged(spark, sf_dir)).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(16))
    )
    idx = warc.cdx_index(recs)
    return idx.select(
        "uri", F.col("shard").cast("long").alias("shard"), "offset", "length"
    )


def q_corpus_publish_manifest(spark, sf_dir):
    """Per-bucket publish manifest for the bucketed corpus layout
    (operators/publish.py): engine-portable H60 bucket assignment + one
    hash-groupBy. The bucketed-join zero-Exchange guarantee itself is
    plan-asserted in tests/test_publish.py; this query oracle-checks the
    bucket function and the per-bucket doc/token/byte totals a scheduler
    would size tasks from."""
    from inform_spark.operators.publish import publish_manifest

    m = publish_manifest(_docs(spark, sf_dir), n_buckets=32)
    return m.select(
        "bucket",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        "n_bytes",
        "min_key",
        "max_key",
    )


def q_sitemap_inventory(spark, sf_dir):
    """Sitemap-protocol URL inventory (sources/sitemaps.py — a
    beyond-reference crawl source: the reference discovers URLs only by
    link-following). Synthesizes 16 deterministic namespaced <urlset>
    documents from `documents` with pure-codegen XML concat, parses them
    back through the mapInPandas sitemap parser, and emits one row per
    URL with lastmod/priority — round-trip equality with the oracle's
    direct re-derivation proves the parser (incl. namespace stripping
    and priority float parse). Index expansion + robots discovery are
    pytest-covered (tests/test_sitemaps.py)."""
    from inform_spark.session import ship_package
    from inform_spark.sources import sitemaps

    ship_package(spark)
    entry = F.concat(
        F.lit("<url><loc>https://corpus.test/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2026-01-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><priority>0."),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("</priority></url>"),
    )
    staged = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % 16).alias("g"),
        entry.alias("entry"),
    )
    xml = staged.groupBy("g").agg(
        F.concat(
            F.lit(
                '<?xml version="1.0"?><urlset '
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            ),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda s: s["entry"],
                ),
            ),
            F.lit("</urlset>"),
        ).alias("body")
    ).select(
        F.concat(
            F.lit("https://corpus.test/sitemap-"),
            F.col("g").cast("string"),
            F.lit(".xml"),
        ).alias("url"),
        "body",
    )
    parsed = sitemaps.parse_sitemaps(xml)
    return parsed.select(
        "sitemap_url",
        "loc",
        "lastmod",
        F.round(F.col("priority"), 1).alias("priority"),
    )


def q_decontaminate_fraction(spark, sf_dir):
    """Graded decontamination (textops.ngram_contamination_fraction):
    per-training-doc fraction of distinct 8-gram shingles shared with
    the hash-designated 5% benchmark partition, integer milli
    fixed-point, keep = <5% overlap. Same broadcast semi-join shape as
    the binary `decontaminate` gate."""
    from inform_spark.operators.textops import (
        _h60,
        ngram_contamination_fraction,
    )

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    is_bench = (
        F.pmod(
            _h60(F.concat(F.lit("bench"), F.col("doc_id").cast("string"))),
            F.lit(20),
        )
        == 0
    )
    return ngram_contamination_fraction(d, is_bench)


def q_script_profile(spark, sf_dir):
    """Writing-system histogram + dominant script per document
    (operators/langid.script_profile) — the script-detection stage that
    partitions the candidate-language set before lang-ID. Zero-shuffle
    codegen regexp arithmetic; the oracle uses the IDENTICAL
    codepoint-range literals (shared SCRIPT_RANGES constants), so the
    counts hash-match exactly."""
    from inform_spark.operators.langid import script_profile

    return script_profile(_docs(spark, sf_dir))


def _script_profile_sql() -> str:
    from inform_spark.operators.langid import SCRIPT_RANGES, SCRIPTS

    cnt = ", ".join(
        f"cast(length(regexp_replace(text, '[^{r}]', '', 'g')) as bigint) "
        f"as n_{s}"
        for s, r in SCRIPT_RANGES.items()
    )
    tot = " + ".join(f"n_{s}" for s in SCRIPTS)
    g = "greatest(" + ", ".join(f"n_{s}" for s in SCRIPTS) + ")"
    dom = "case when __g = 0 then 'none' " + " ".join(
        f"when n_{s} = __g then '{s}'" for s in SCRIPTS
    ) + " end"
    return (
        "with c as (select cast(doc_id as bigint) as doc_id, "
        f"cast(length(text) as bigint) as n_chars, {cnt}, "
        "cast(length(regexp_replace(text, '[^0-9]', '', 'g')) as bigint) "
        "as n_digit, "
        "cast(length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) as bigint) "
        "as n_space from documents), "
        f"gg as (select *, {g} as __g from c) "
        "select doc_id, n_chars, "
        + ", ".join(f"n_{s}" for s in SCRIPTS)
        + ", n_digit, n_space, "
        f"cast(n_chars - ({tot} + n_digit + n_space) as bigint) as n_other, "
        f"{dom} as dominant_script, "
        "cast(case when n_chars > 0 then 1000 * __g // n_chars else 0 end "
        "as bigint) as script_milli from gg"
    )


def q_curated_publish_manifest(spark, sf_dir):
    """Capstone composition — the full corpus-build tail: curation
    verdicts (model + blocklist + LM band + canonical pick) select the
    survivors, which are published through the bucketed layout's
    manifest (operators/publish.publish_manifest). The Spark side
    literally chains the stage queries; the oracle composes the
    curation-verdict SQL inside the manifest SQL, so what gets
    cross-checked is the COMPOSITION: the per-bucket doc/token/byte
    totals of exactly the kept documents."""
    from inform_spark.operators.publish import publish_manifest

    kept = q_curation_verdicts(spark, sf_dir).filter(
        F.col("keep_final") == 1
    ).select("doc_id")
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).join(kept, "doc_id")
    m = publish_manifest(docs, n_buckets=16)
    return m.select(
        "bucket",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        "n_bytes",
        "min_key",
        "max_key",
    )


def q_sitemap_recrawl_overlay(spark, sf_dir):
    """Composition: sitemap freshness over the adaptive recrawl schedule
    (operators/recrawl.sitemap_informed_schedule). The revisit log's
    adaptive schedule (= the `recrawl_schedule` query) is joined with a
    deterministic sitemap inventory whose lastmod epochs straddle the
    log's last-check times, so both branches are exercised: a declared
    change AFTER our last check pulls next_due down to the change time;
    everything else keeps the adaptive interval. The oracle nests the
    recrawl-schedule SQL and applies the identical overlay."""
    from inform_spark.operators.recrawl import sitemap_informed_schedule

    sched = q_recrawl_schedule(spark, sf_dir)
    # inventory for even-numbered urls only (odd urls = not in sitemap):
    # lastmod = 2024-01-01 UTC + (urlnum % 60) days, spanning the log's
    # Jan-2024 check times
    inv = sched.select("url").filter(
        F.expr("cast(substring(url, 2) as bigint) % 2 = 0")
    ).select(
        "url",
        (
            F.lit(1_704_067_200_000)
            + (F.expr("cast(substring(url, 2) as bigint)") % 60)
            * F.lit(86_400_000)
        ).alias("lastmod_ms"),
    )
    out = sitemap_informed_schedule(sched, inv)
    return out.select(
        "url",
        "last_ms",
        "interval_ms",
        "next_due_ms",
        F.col("sitemap_override").cast("boolean").alias("sitemap_override"),
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the synthetic site end-to-end, emit span documents."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
    # touch the provided testdata to prove the read path works
    _ = _docs(spark, sf_dir).limit(1).count()
    return q_crawl_documents(spark, sf_dir)


# Queries whose IMPLEMENTATION changed this round (the builder updates
# this list each round): they verify ahead of everything except
# never-driver-verified queries, regardless of when they last had a
# driver row.
def q_hll_host_cardinality(spark, sf_dir):
    """Per-host distinct-URL cardinality via a mergeable HyperLogLog
    sketch (operators/sketches, Flajolet et al. 2007): m=64 one-byte
    registers per host answer "how many distinct URLs has this host
    contributed?" without ever re-scanning the URL strings — the
    frontier-monitoring signal a 10^10-URL seen-set (bloom/cuckoo)
    cannot provide. Engine-exact: integer hashing/rank/max/sums plus
    ONE committed-constant IEEE double division, so DuckDB hash-matches
    the estimate bit-for-bit; the exact distinct count rides alongside
    as the verification column. Items are deterministic URL-ids
    synthesized from events (event_id mod 2600 under 8 hosts — ~4x
    duplication, the regime where sketch vs exact diverges)."""
    from inform_spark.operators.sketches import hll_cardinality

    ev = _t(spark, sf_dir, "events")
    it = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 8).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("u"), (F.col("event_id") % 2600).cast("string")).alias(
            "item"
        ),
    )
    return hll_cardinality(it, "item", ["host"], p=6)


def q_inverted_postings(spark, sf_dir):
    """Positional inverted index over the corpus
    (operators/invindex.inverted_postings): per term, EXACT df/cf plus
    a canonical 'doc:tf:pos.pos'-string posting list capped at the 32
    lowest doc_ids with the truncation surfaced in n_dropped_docs —
    the capped+audited heavy-hitter discipline (stopwords are the
    skew). One posexplode + two map-side-combine groupBys; the
    per-term cap rank is the only per-bucket sort."""
    from inform_spark.operators.invindex import inverted_postings

    return inverted_postings(_docs(spark, sf_dir), max_docs_per_term=32)


def q_link_trustrank(spark, sf_dir):
    """Fixed-point TrustRank (Gyongyi et al., VLDB 2004) over the same
    deterministic synthetic link graph as link_pagerank: teleport mass
    restricted to a hash-designated ~12.5% trusted seed set, so trust
    decays with link distance from seeds — the spam-aware frontier
    priority, and (pagerank - trust) is the classic spam-mass signal.
    Same integer arithmetic as pagerank: associative sums + integer
    division = partitioning/engine independent."""
    from inform_spark.operators.linkgraph import synthetic_edges, trustrank
    from inform_spark.operators.textops import _h60

    nodes = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id")
    )
    seeded = nodes.withColumn(
        "is_seed",
        F.pmod(
            _h60(F.concat(F.lit("trust"), F.col("id").cast("string"))),
            F.lit(8),
        )
        == 0,
    )
    return trustrank(synthetic_edges(nodes), seeded, iterations=3).select(
        F.col("id").alias("doc_id"), "trust", "is_seed"
    )


def q_link_hits(spark, sf_dir):
    """Fixed-point HITS (Kleinberg 1999) over the same deterministic
    synthetic link graph as link_pagerank
    (operators/linkgraph.hits, 2 iterations): hub and authority scores
    as longs, max-normalized each half-step with integer division —
    associative sums + one 1-row max aggregate per half-step, so the
    result is partitioning/engine independent and DuckDB hash-matches
    the unrolled iteration."""
    from inform_spark.operators.linkgraph import hits, synthetic_edges

    nodes = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id")
    )
    return hits(synthetic_edges(nodes), nodes, iterations=2).select(
        F.col("id").alias("doc_id"), "hub", "auth"
    )


def q_degree_stats(spark, sf_dir):
    """Per-node link-graph degree profile over the synthetic graph
    (operators/linkgraph.degree_stats): distinct out/in degree plus
    reciprocal-edge count — the classic web-graph spam features (Becchetti
    et al. 2008 use degree/reciprocity ratios as link-spam signals).
    Three equi-shuffles on edge keys, map-side combine, no window."""
    from inform_spark.operators.linkgraph import degree_stats, synthetic_edges

    nodes = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id")
    )
    return degree_stats(synthetic_edges(nodes), nodes).select(
        F.col("id").alias("doc_id"), "out_deg", "in_deg", "n_reciprocal"
    )


def q_kmeans_train(spark, sf_dir):
    """Distributed fixed-point k-means (operators/clustering.kmeans_train,
    8 cells, 2 Lloyd iterations) over the embeddings table — the centroid
    TRAINER the IVF/SemDeDup cell families broadcast. Every quantity is
    integer (micro-unit quantization, exact long squared-L2, toward-zero
    division), so the trained centroids are partitioning-independent and
    DuckDB reproduces the whole training run, not a float approximation."""
    from inform_spark.operators.clustering import kmeans_train

    return kmeans_train(
        _t(spark, sf_dir, "embeddings"), n_cells=8, iterations=2
    )


def q_bpe_train(spark, sf_dir):
    """BPE merge training (Sennrich et al. 2016; operators/subword.
    bpe_train, 8 merges) over the corpus: the vocabulary-induction step
    that closes the loop vocab_topk (corpus stats) -> bpe_train (merge
    table) -> subword walk (tokenization). Pair counts are associative
    long sums over the DISTINCT word table (Zipf shortcut); each round
    is one shuffle + a 1-row argmax; the merge application is an
    anchored-replace scan byte-identical in Spark and DuckDB, so the
    oracle replays all 8 training rounds exactly."""
    from inform_spark.operators.subword import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=8)


def q_bpe_token_counts(spark, sf_dir):
    """Corpus tokenization under the corpus's OWN trained BPE merges
    (operators/subword.bpe_segment after bpe_train, 8 merges):
    per-doc subword-token and word counts — training-real token
    accounting where the tokenizer itself was induced from the data,
    the end-to-end form of the subword family. The walk runs over the
    distinct word table and joins counts back (Zipf shortcut)."""
    from inform_spark.operators.subword import bpe_segment, bpe_train

    docs = _docs(spark, sf_dir)
    merges = [
        (r["round"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_train(docs, n_merges=8).collect()
    ]
    return bpe_segment(docs, merges)


def q_pq_codes(spark, sf_dir):
    """Product quantization (Jégou et al., TPAMI 2011;
    operators/clustering.pq_codes, m=4 subspaces x k=8 codes, 2 Lloyd
    rounds): the corpus compressed to per-subspace centroid ids plus
    exact long quantization error — the memory-bound ANN scale path
    (4 B/vector vs 256 B of floats). All-integer training (same
    contract as kmeans_train) keyed by (sub, cid), so ONE shuffled
    aggregation trains all 4 codebooks at once and DuckDB reproduces
    both the codebook and every code."""
    from inform_spark.operators.clustering import pq_codes

    return pq_codes(_t(spark, sf_dir, "embeddings"), m=4, k=8, iterations=2)


def q_pq_adc_topk(spark, sf_dir):
    """Asymmetric-distance top-k under the trained PQ codebook
    (operators/clustering.pq_adc_topk, query vid=0, k=10): distance =
    sum over subspaces of a broadcast m*k lookup table — the corpus
    never re-reads its float vectors. Ties broken vid-ascending;
    TakeOrdered, no global sort."""
    from inform_spark.operators.clustering import pq_adc_topk

    return pq_adc_topk(
        _t(spark, sf_dir, "embeddings"), query_vid=0, topk=10
    )


def q_pq_rerank(spark, sf_dir):
    """Two-stage PQ serving for query vid=0
    (operators/clustering.pq_rerank_batch, ADC shortlist of 50 over the
    4-byte codes, exact integer squared-L2 rerank to top-10) — the
    production IVFADC+rerank layout: full-precision reads bounded by
    the shortlist, never the corpus. Measured recall@10 vs brute
    force: 0.25 raw ADC -> 0.72 reranked (bench ann_quality leg)."""
    from inform_spark.operators.clustering import pq_rerank_batch

    return pq_rerank_batch(
        _t(spark, sf_dir, "embeddings"),
        n_queries=1, topk=10, n_candidates=50,
    ).select("vid", "d2", "rank")


def q_graph_components(spark, sf_dir):
    """Connected components of the (undirected) synthetic link graph
    (operators/components.connected_components — hash-min label
    propagation + pointer jumping): the shared primitive the
    minhash-cluster / SemDeDup / incremental-dedup families all build
    on, given its own driver row. Component = min reachable node id (a
    canonical engine-independent representative), so the oracle needs
    no iteration parity — DuckDB computes true min-reachable via a
    recursive transitive closure and the converged Spark labels must
    match exactly. Isolated nodes are their own component."""
    from inform_spark.operators.components import connected_components
    from inform_spark.operators.linkgraph import synthetic_edges

    nodes = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id")
    )
    und = synthetic_edges(nodes).filter(F.col("src") != F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    comp = connected_components(und, "a", "b")
    return nodes.join(comp, nodes["id"] == comp["v"], "left").select(
        nodes["id"].alias("doc_id"),
        F.coalesce("component", nodes["id"]).cast("long").alias("component"),
    )


def q_doclen_quantiles(spark, sf_dir):
    """Exact per-language doc-length percentiles
    (operators/stats.value_quantiles): nearest-rank quantiles computed
    over the VALUE HISTOGRAM — one map-side-combined aggregation plus
    a cumulative window bounded by distinct-value cardinality, never a
    per-group total sort of the corpus. Integer selection
    (100*cum >= p*n), so DuckDB agrees exactly where
    approx_percentile/t-digest never would."""
    from inform_spark.operators.stats import value_quantiles

    return value_quantiles(
        _docs(spark, sf_dir), value_col="n_chars", group_col="lang"
    )


def q_cms_user_frequency(spark, sf_dir):
    """Count-Min frequency estimation (Cormode & Muthukrishnan 2005;
    operators/sketches.cms_frequencies, depth=4 x width=32) over event
    user ids: every user's exact event count next to its sketch
    estimate — width 32 under ~100+ users forces real collisions, so
    the overestimate-only property is exercised, not vacuous. The
    hot-key companion to hll_host_cardinality: same tiny mergeable
    integer state (union + SUM), one map-side-combined groupBy to
    build, broadcast probe to read."""
    from inform_spark.operators.sketches import cms_frequencies

    return cms_frequencies(
        _t(spark, sf_dir, "events"), "user_id", depth=4, width=32
    )


def q_host_reputation(spark, sf_dir):
    """Host/domain reputation gating (RefinedWeb §3.1 URL/host filtering
    shape; operators/reputation.host_reputation): per-host rollup of
    integer-exact doc quality (mean, low-quality fraction, distinct-text
    ratio), host verdict fanned back to every document via a broadcast
    dim join. The domain-level filter a 100 TB crawl applies BEFORE
    per-document gates — #hosts << #docs, so blocking a spam host here
    is the cheapest quality lever in the pipeline. The mean-quality bar
    here (650) is calibrated to the synthetic corpus's own distribution
    so BOTH verdict branches are exercised at sf0.01 (a few tail hosts
    block); production would calibrate against a held-out audit set."""
    from inform_spark.operators.reputation import host_reputation

    return host_reputation(_docs(spark, sf_dir), min_mean_quality_milli=650)


def q_weighted_sample(spark, sf_dir):
    """Quality-proportional weighted Bernoulli sampling
    (operators/sampling.weighted_hash_sample composed over the
    integer-exact quality_milli score): each doc's acceptance rate is
    base_ppm * quality_milli / 1000, decided by the cross-engine
    content hash — deterministic, partitioning-independent, monotone in
    the base rate. The doc-granularity reweighting step of mixture
    construction (DSIR/DoReMi shape)."""
    from inform_spark.operators.reputation import quality_milli_col
    from inform_spark.operators.sampling import weighted_hash_sample

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source"),
        quality_milli_col(),
    )
    return weighted_hash_sample(
        docs, "doc_id", "quality_milli", base_ppm=800_000, salt="r4"
    )


def q_tfidf_cosine_topk(spark, sf_dir):
    """Top-20 doc pairs by tf-idf cosine as a sparse all-pairs
    similarity join (Bayardo et al. WWW'07;
    operators/invindex.tfidf_cosine_topk): floor-log2 fixed-point idf
    makes every accumulation an exact long AND prunes stop-terms by
    construction (df > N/2 => zero weight), so the self-join is bounded
    by mid-frequency terms — the property that keeps all-pairs
    similarity sub-quadratic at corpus scale. Composed AFTER exact
    dedup (min-doc_id survivor per text, the dedup_exact rule) — the
    production order: byte-identical copies would saturate any top-k at
    cos 1.0, so similarity search always runs on the deduped corpus."""
    from inform_spark.operators.invindex import tfidf_cosine_topk

    docs = _docs(spark, sf_dir)
    surv = docs.groupBy("text").agg(F.min(F.col("doc_id").cast("long")).alias("doc_id"))
    return tfidf_cosine_topk(surv, topk=20)


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking redundancy stats (operators/chunking
    .cdc_chunks; LBFS/FastCDC family): rolling-window boundary rule over
    the token stream, chunk hashes counted corpus-wide, per-doc
    duplicate-chunk token fractions. The storage/delta-dedup layer
    between exact doc dedup and exact_substring_dedup's span surgery —
    measures what a content-addressed store saves on re-crawls and
    mirrors. Tiny w/divisor so ~30-token synthetic docs chunk; the
    boundary/hash/count dataflow is scale-real (in-row HOFs, one
    chunk-hash shuffle)."""
    from inform_spark.operators.chunking import cdc_chunks

    return cdc_chunks(_docs(spark, sf_dir), w=4, divisor=8)


def q_soft404_detect(spark, sf_dir):
    """Soft-404 detection (operators/soft404.soft404_detect; Bar-Yossef
    et al. WWW'04): status-200 pages flagged by (a) an error-phrase
    regexp, in-row, and (b) the per-host identical-content-template
    signal — many distinct URLs on one host serving one content hash.
    Pages synthesized from events: 20 hosts, ~1/13 of URLs serve a
    shared per-host "not found" template (both signals), another ~1/13
    a wording-free maintenance template (template signal only), another
    ~1/13 a unique "does not exist" body (phrase signal only), and
    1/17 carry real 404 statuses that must NOT be flagged."""
    from inform_spark.operators.soft404 import soft404_detect

    ev = _t(spark, sf_dir, "events")
    host = (F.col("user_id") % 20).cast("string")
    pages = ev.select(
        F.concat(
            F.lit("https://h"), host, F.lit(".test/"), F.col("event_type"),
            F.lit("/"), F.col("event_id").cast("string"),
        ).alias("url"),
        F.when(F.col("event_id") % 17 == 0, 404).otherwise(200).alias("status"),
        F.when(
            F.col("event_id") % 13 == 0,
            F.concat(F.lit("error page not found on h"), host),
        )
        .when(
            F.col("event_id") % 13 == 7,
            F.concat(F.lit("maintenance window h"), host, F.lit(" please retry")),
        )
        .when(
            F.col("event_id") % 13 == 3,
            F.concat(
                F.lit("post "), F.col("event_id").cast("string"),
                F.lit(" does not exist anymore"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("content "), F.col("event_id").cast("string"), F.lit(" "),
                F.col("event_type"), F.lit(" on h"), host,
            )
        )
        .alias("text"),
    )
    return soft404_detect(pages, min_template_urls=5)


def q_curriculum_shards(spark, sf_dir):
    """Curriculum sharding (operators/curriculum.curriculum_shards;
    Bengio et al. ICML'09): corpus ordered by integer-exact
    quality_milli and cut into 8 contiguous shards via the distributed
    rank kernel — the scale-safe replacement for the global-window
    NTILE a naive implementation would use. Shard formula
    (rank-1)*n div total is an exact closed form, reproducible in any
    engine."""
    from inform_spark.operators.curriculum import curriculum_shards

    return curriculum_shards(_docs(spark, sf_dir), n_shards=8)


def q_host_mirror_pairs(spark, sf_dir):
    """Host-level mirror detection (operators/mirrors.host_mirror_pairs):
    host pairs sharing >= min_shared distinct content fingerprints,
    with integer-ppm containment (shared/min — 1e6 = the smaller host
    is a full mirror) and jaccard. Synthetic mirror farm: every source
    becomes a host, each gets a '-m' mirror host serving every third
    document (expected containment 1e6), and all 20 base hosts serve
    one shared boilerplate page whose fingerprint spreads past the
    max_hosts_per_fp=10 cap — exercising the boilerplate exclusion
    that bounds pair fan-out at web scale."""
    from inform_spark.operators.mirrors import host_mirror_pairs

    docs = _docs(spark, sf_dir)
    base = docs.select(F.col("source").alias("host"), "text")
    mirror = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(F.col("source"), F.lit("-m")).alias("host"), "text"
    )
    boiler = docs.select(
        F.col("source").alias("host"),
        F.lit("shared boilerplate terms page").alias("text"),
    ).distinct()
    pages = base.unionByName(mirror).unionByName(boiler)
    return host_mirror_pairs(pages, min_shared=2, max_hosts_per_fp=10)


def q_recrawl_delta_cost(spark, sf_dir):
    """Chunk-level recrawl storage delta (operators/recrawl
    .recrawl_delta_cost): snapshot_diff composed with content-defined
    chunking — a changed page costs only its NEW chunks (cross-document
    reuse is free), unchanged/removed pages are pruned before any
    chunking. Synthetic recrawl over documents: every 7th doc removed,
    every remaining 5th gets an appended edit (delta << full doc),
    every 11th spawns an added page that reuses the doc's first 8
    tokens (exercising cross-doc chunk reuse)."""
    from inform_spark.operators.recrawl import recrawl_delta_cost

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    removed = F.col("doc_id") % 7 == 0
    new_changed = docs.filter(~removed & (F.col("doc_id") % 5 == 0)).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" updated section appended here")).alias(
            "text"
        ),
    )
    new_same = docs.filter(~removed & (F.col("doc_id") % 5 != 0))
    added = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)),
            F.lit(" plus brand new tail words"),
        ).alias("text"),
    )
    new = new_changed.unionByName(new_same).unionByName(added)
    return recrawl_delta_cost(docs, new, w=4, divisor=8)


def q_resolve_redirects(spark, sf_dir):
    """Distributed redirect-chain resolution (operators/redirects
    .resolve_redirects): pointer jumping — log2(max_hops) self-joins
    instead of a per-hop sequential walk; max_hops is a power of two so
    the capped semantics are the exact closed form f^max_hops that a
    bounded recursive CTE reproduces. Synthetic graph from events:
    10-node chains into a terminal, every 5th group closed into a
    10-cycle (comes back unresolved with hops = 16)."""
    from inform_spark.operators.redirects import resolve_redirects

    ev = _t(spark, sf_dir, "events")
    e = F.col("event_id")

    def u(x):
        return F.concat(F.lit("https://r.test/u"), x.cast("string"))

    pos = e % 10
    grp = F.expr("event_id div 10")
    dst = (
        F.when(pos < 9, u(e + 1))
        .when(grp % 5 == 0, u(e - 9))
        .otherwise(
            F.concat(F.lit("https://r.test/t"), grp.cast("string"))
        )
    )
    edges = ev.select(u(e).alias("src"), dst.alias("dst"))
    return resolve_redirects(edges, max_hops=16)


def q_canonical_clusters(spark, sf_dir):
    """Page-declared canonical consolidation (operators/urlops
    .declared_canonical_clusters): <link rel="canonical"> extracted
    in-row (both attribute orders), absolute-http targets honored,
    self otherwise; one-hop semantics with cluster sizes fanned back on
    the canonical key. Synthetic pages from events: half declare a
    shared canonical (alternating attribute order), a quarter no tag,
    a quarter a relative href that must fall back to self."""
    from inform_spark.operators.urlops import declared_canonical_clusters

    ev = _t(spark, sf_dir, "events")
    e = F.col("event_id")
    url = F.concat(F.lit("https://c.test/p"), e.cast("string"))
    blk = F.expr("event_id div 8").cast("string")
    canon = F.concat(F.lit("https://c.test/canon"), blk)
    html = (
        F.when(e % 4 == 0, F.lit("<html><head></head><body>no tag</body></html>"))
        .when(
            (e % 8 == 2) | (e % 8 == 6),
            F.concat(
                F.lit('<html><head><link rel="canonical" href="'),
                canon,
                F.lit('"></head></html>'),
            ),
        )
        .when(
            (e % 8 == 1) | (e % 8 == 5),
            F.concat(
                F.lit('<html><head><link href="'),
                canon,
                F.lit('" rel="canonical"></head></html>'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<html><head><link rel="canonical" href="/rel'),
                blk,
                F.lit('"></head></html>'),
            )
        )
    )
    return declared_canonical_clusters(
        ev.select(url.alias("url"), html.alias("html"))
    )


def q_span_corruption(spark, sf_dir):
    """T5-style span-corruption pair generation (operators/corruption
    .span_corruption_grid): deterministic grid masking — span_len=3
    every stride=12 tokens, per-doc hash phase — emitting sentineled
    (input, targets) training pairs entirely in-row. stride 12 (not the
    production 20) so ~30-token synthetic docs get 2-3 spans."""
    from inform_spark.operators.corruption import span_corruption_grid

    return span_corruption_grid(_docs(spark, sf_dir), stride=12, span_len=3)


def q_contrastive_pairs(spark, sf_dir):
    """Hard-negative contrastive pair mining (operators/similarity
    .contrastive_pairs; DPR/SimCSE shape): exact cosine top-5 per query
    relabeled as ranks 1-2 positive / 3-5 hard_negative — the
    top-of-ranking negatives embedding training mines, not uniform
    random draws."""
    from inform_spark.operators import similarity

    return similarity.contrastive_pairs(
        _t(spark, sf_dir, "embeddings"), n_queries=10, k_pos=2, k_neg=3
    )


def q_shuffle_shards(spark, sf_dir):
    """Seeded global shuffle + token-balanced training shards
    (operators/shards.seeded_shuffle_shards): the per-epoch
    deterministic permutation (order key = H60('epoch-0-'||doc_id))
    every LLM pipeline applies before writing shards, cut into 8
    shards balanced by TOKEN budget via the distributed prefix-sum
    kernel — no global window, no rand()."""
    from inform_spark.operators.shards import seeded_shuffle_shards

    out, caches = seeded_shuffle_shards(
        _docs(spark, sf_dir), n_shards=8, seed="epoch-0"
    )
    _pin_caches(caches)
    return out


def q_media_boilerplate(spark, sf_dir):
    """Boilerplate-media detection over the interleaved spans
    (operators/multimodal.media_boilerplate; OBELICS S3.2 logo
    filter): media occurrences keyed by a synthetic content
    fingerprint (floor(sqrt(H60(ref) % 64)) — 8 classes of skewed
    width, standing in for the pHash of operators/multimodal
    .image_features), flagged when the fingerprint spans >= 60
    distinct documents."""
    from inform_spark.operators.multimodal import media_boilerplate
    from inform_spark.operators.spans import media_manifest
    from inform_spark.operators.textops import _h60

    occ = media_manifest(_spans_df(spark, sf_dir)).select(
        "doc_id",
        "media_ref",
        F.floor(F.sqrt(F.pmod(_h60(F.col("media_ref")), F.lit(64))))
        .cast("long")
        .alias("fingerprint"),
    )
    return media_boilerplate(occ, min_docs=60)


def q_snapshot_dedup(spark, sf_dir):
    """Per-snapshot vs global exact-dedup accounting (operators/
    textops.snapshot_scoped_dedup; the FineWeb S4.4 ablation shape).
    Cross-snapshot duplicates are synthesized by re-crawling every
    7th document under a shifted doc_id; snapshot = H60('snap-'||id)
    % 4 assigns both copies independently."""
    from inform_spark.operators.textops import _h60, snapshot_scoped_dedup

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    recrawl = docs.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    )
    u = docs.unionByName(recrawl).withColumn(
        "snapshot",
        F.pmod(
            _h60(F.concat(F.lit("snap-"), F.col("doc_id").cast("string"))),
            F.lit(4),
        ),
    )
    return snapshot_scoped_dedup(u)


def q_ip_paced_admissions(spark, sf_dir):
    """Politeness budgeted at the IP, not the hostname (streaming/
    stateful.ip_paced_admissions; Mercator/IRLbot server-keyed
    politeness): hosts resolve through a broadcast DNS dim mapping
    16 hosts per /32 (H60(host) % 16), budget 3 per ip-minute — the
    host-farm defense the per-host form cannot express."""
    from inform_spark.streaming.stateful import ip_paced_admissions
    from inform_spark.operators.textops import _h60

    ev = _t(spark, sf_dir, "events")
    cand = ev.select(
        F.col("user_id").cast("string").alias("host"),
        F.col("event_id").cast("string").alias("url"),
        "ts",
    )
    dns = cand.select("host").distinct().select(
        "host",
        F.concat(
            F.lit("10.0.0."),
            F.pmod(_h60(F.col("host")), F.lit(16)).cast("string"),
        ).alias("ip"),
    )
    return ip_paced_admissions(cand, dns, budget=3, window_ms=60_000)


def q_key_skew_stats(spark, sf_dir):
    """Key-skew diagnosis (operators/skew.key_skew_stats): exact
    max/p50/p99 per-key cardinality, hottest key, max/mean ratio and
    the salting factor that bounds any (key, salt) task at 50 rows —
    the decision input for AQE-vs-salt-vs-broadcast, computed over
    histograms (window-free) so the diagnostic itself survives the
    skew it measures."""
    from inform_spark.operators.skew import key_skew_stats

    return key_skew_stats(
        _t(spark, sf_dir, "events"), "user_id", target_rows=50
    )


def q_salted_join(spark, sf_dir):
    """Explicit salted skew-join rewrite (operators/skew.salted_join):
    orders⋈customer on custkey with the fact side spread over 8 salt
    groups and the dim replicated 8x. The oracle is the PLAIN join —
    the whole point is byte-identical results with the hot key spread
    across tasks."""
    from inform_spark.operators.skew import salted_join

    fact = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("custkey"),
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
    )
    return salted_join(fact, dim, "custkey", 8, salt_src="o_orderkey")


def q_upsample_epochs(spark, sf_dir):
    """Fractional-epoch upsampling (operators/sampling.upsample_epochs;
    LLaMA Table-1 shape): src0 at 2.45 epochs, src1 at 0.3, src2
    dropped, src3 at 1.7, everything else exactly once — deterministic
    per-document copy counts keyed on the content hash, fanned out by
    an in-row sequence explode."""
    from inform_spark.operators.sampling import upsample_epochs

    out = upsample_epochs(
        _docs(spark, sf_dir),
        {"src0": 2450, "src1": 300, "src2": 0, "src3": 1700},
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "copy_idx"
    )


def q_dns_resolve(spark, sf_dir):
    """Batch DNS resolver stage with TTL cache (operators/dns
    .resolve_hosts; Mercator §3.2 — resolution is a crawl bottleneck,
    cache it): synthetic frontier hosts against a half-fresh/half-
    stale cache at a pinned now; fresh rows served from cache, the
    rest re-resolved by the deterministic fixture resolver and
    restamped."""
    from inform_spark.operators.dns import resolve_hosts

    now_ms, ttl = 1_700_000_000_000, 3_600_000
    ev = _t(spark, sf_dir, "events")
    hosts = ev.select(
        F.concat(
            F.lit("h"),
            F.pmod(F.col("user_id"), F.lit(200)).cast("string"),
            F.lit(".example.com"),
        ).alias("host")
    )
    from inform_spark.operators.textops import _h60

    cache = (
        hosts.distinct()
        .filter(F.pmod(_h60(F.concat(F.lit("cache-"), F.col("host"))), F.lit(2)) == 0)
        .select(
            "host",
            F.lit("10.200.0.1").alias("ip"),
            (
                F.lit(now_ms)
                - F.pmod(
                    _h60(F.concat(F.lit("age-"), F.col("host"))),
                    F.lit(2 * ttl),
                )
            ).cast("long").alias("resolved_at_ms"),
        )
    )
    return resolve_hosts(hosts, cache, now_ms=now_ms, ttl_ms=ttl)


def q_pld_budget(spark, sf_dir):
    """Pay-level-domain rollup (operators/dns.pld_budget_counts;
    IRLbot STRIKE budgeting — hostnames are free, PLDs cost money):
    synthetic hosts across .com/.org/.co.uk/.com.au/.github.io,
    grouped by the in-row longest-public-suffix PLD. The oracle
    derives each host's expected PLD independently from the
    construction, so the when-chain is genuinely cross-checked."""
    from inform_spark.operators.dns import pld_budget_counts

    ev = _t(spark, sf_dir, "events")
    hosts = ev.select(
        F.concat(
            F.lit("h"),
            F.pmod(F.col("user_id"), F.lit(97)).cast("string"),
            F.element_at(
                F.array(
                    F.lit(".example.co.uk"),
                    F.lit(".github.io"),
                    F.lit(".example.com"),
                    F.lit(".foo.org"),
                    F.lit(".example.com.au"),
                ),
                (F.pmod(F.col("user_id"), F.lit(5)) + 1).cast("int"),
            ),
        ).alias("host")
    )
    return pld_budget_counts(hosts)


def q_epoch_shards(spark, sf_dir):
    """The composed epoch pipeline the two operators document:
    fractional-epoch upsampling fans each document into copies, then
    the seeded shuffle shards each copy INDEPENDENTLY under the
    promised ``doc_id || '#' || copy_idx`` permutation key — the
    oracle composes both SQL forms, so the composition contract
    (copies of one document land in unrelated shard positions) is
    itself driver-checked."""
    from inform_spark.operators.sampling import upsample_epochs
    from inform_spark.operators.shards import seeded_shuffle_shards

    up = upsample_epochs(
        _docs(spark, sf_dir),
        {"src0": 2450, "src1": 300, "src2": 0, "src3": 1700},
    )
    keyed = up.select(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit("#"),
            F.col("copy_idx").cast("string"),
        ).alias("doc_id"),
        "text",
    )
    out, caches = seeded_shuffle_shards(keyed, n_shards=8, seed="epoch-0")
    _pin_caches(caches)
    return out


CHANGED_THIS_ROUND = [
    # round 5
    "snapshot_dedup",  # snapshot key keeps native type (ADVICE r4)
    "ip_paced_admissions",  # dns dim merge-on-read dedup (ADVICE r4)
    "epoch_shards",  # upsample_epochs reserved-column guard upstream
    "warc_replay_curation",  # new this round
    "phash_incremental",  # new this round
    "phash_neardup_pairs",  # new this round
    "phash_neardup_stars",  # new this round
]


def _verification_order(names) -> list[str]:
    """MECHANICAL rotation (VERDICT r3 item 1, tier fix r4 item 2):
    order queries so the driver's 50-row prefix always hits the biggest
    evidence gaps first. The last round each query had a driver row is
    read from the committed CORRECTNESS_r*.json artifacts; sort key =
    (tier, last-verified round, name) with three tiers: 0 =
    never-driver-verified (STRICTLY first — a query with zero driver
    rows is a bigger gap than any stale green row, so a large
    changed-set can never push debutants out of the window), 1 =
    CHANGED_THIS_ROUND, 2 = stable (ascending last-verified round —
    the oldest green rows refresh first). With W=50 and Q<=2W queries
    every query gets a driver row at least every 2 rounds with NO
    manual reordering; at Q=133 (> 2W by 33) the worst case is 3
    rounds for the least-recently-verified stable tier; the full local
    sweep (tests/verify/check_oracle.py with no args) covers whatever
    the window misses each round."""
    import glob as _glob
    import re as _re

    last: dict[str, int] = {n: -1 for n in names}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in _glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = _re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for k in data:
            if k in last:
                last[k] = max(last[k], rnd)

    def key(n: str):
        # never-driver-verified sorts STRICTLY before changed-this-round
        # (VERDICT r4 item 2): a query with zero driver rows is the
        # bigger evidence gap than one whose green row merely went
        # stale, so a large changed-set can never push debutants out of
        # the 50-row window again.
        if last[n] < 0:
            tier = 0
        elif n in CHANGED_THIS_ROUND:
            tier = 1
        else:
            tier = 2
        return (tier, last[n], n)

    return sorted(names, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate checks a PREFIX of
    # this dict (50 rows per round), so entries are ordered by
    # _verification_order — never-driver-verified and changed-this-round
    # queries first, then least-recently-verified (from the committed
    # CORRECTNESS_r*.json artifacts), alphabetical within a tier. The
    # literal dict below is the REGISTRY (alphabetical-ish, grouped by
    # family); the returned dict is the rotation. All entries also pass
    # tests/verify/check_oracle.py locally.
    reg = _query_registry()
    return {n: reg[n] for n in _verification_order(list(reg))}


def _query_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # -- (1) last driver row is r02 — verify first ----------------------
        "a1b_pricing_rollup": q_a1b_pricing_rollup,
        "boilerplate_filter": q_boilerplate_filter,
        "f1_content_type_gate": q_f1_content_type_gate,
        "f4_regex_filter": q_f4_regex_filter,
        "f5_glob_filter": q_f5_glob_filter,
        "f6_robots_match": q_f6_robots_match,
        "media_manifest": q_media_manifest,
        "o4_limit_union": q_o4_limit_union,
        "recrawl_schedule": q_recrawl_schedule,
        "repetition_gates": q_repetition_gates,
        "s10_feed_dedup": q_s10_feed_dedup,
        "s8_inline_vs_download": q_s8_inline_vs_download,
        "snapshot_diff": q_snapshot_diff,
        "span_rechunk": q_span_rechunk,
        "span_render": q_span_render,
        "t3_paced_admissions": q_t3_paced_admissions,
        "t5_retry_backoff": q_t5_retry_backoff,
        "w1_tumbling_window": q_w1_tumbling_window,
        "w2_sliding_window": q_w2_sliding_window,
        "w3_sessionization": q_w3_sessionization,
        "x5_url_filepath": q_x5_url_filepath,
        "x6_strip_html": q_x6_strip_html,
        "x7_content_hash": q_x7_content_hash,
        "x8_slugify": q_x8_slugify,
        "x9_date_normalize": q_x9_date_normalize,
        # -- (2) new or implementation-changed in round 4 --------------------
        "semdedup": q_semdedup,
        "exact_substring_dedup": q_exact_substring_dedup,
        "badword_filter": q_badword_filter,
        "curation_verdicts": q_curation_verdicts,
        "subword_token_counts": q_subword_token_counts,
        "pack_sequences_subword": q_pack_sequences_subword,
        "lang_id_model": q_lang_id_model,
        "url_canonical_cluster": q_url_canonical_cluster,
        "ccnet_paragraph_dedup": q_ccnet_paragraph_dedup,
        "domain_crawl_budget": q_domain_crawl_budget,
        "text_normalize": q_text_normalize,
        "suffix_prefix_overlap": q_suffix_prefix_overlap,
        "corpus_mix_sample": q_corpus_mix_sample,
        "bigram_surprisal": q_bigram_surprisal,
        "warc_roundtrip": q_warc_roundtrip,
        "warc_cdx_index": q_warc_cdx_index,
        "corpus_publish_manifest": q_corpus_publish_manifest,
        "sitemap_inventory": q_sitemap_inventory,
        "decontaminate_fraction": q_decontaminate_fraction,
        "script_profile": q_script_profile,
        "curated_publish_manifest": q_curated_publish_manifest,
        "sitemap_recrawl_overlay": q_sitemap_recrawl_overlay,
        "hll_host_cardinality": q_hll_host_cardinality,
        "inverted_postings": q_inverted_postings,
        "link_trustrank": q_link_trustrank,
        "link_hits": q_link_hits,
        "degree_stats": q_degree_stats,
        "kmeans_train": q_kmeans_train,
        "bpe_train": q_bpe_train,
        "bpe_token_counts": q_bpe_token_counts,
        "pq_codes": q_pq_codes,
        "pq_adc_topk": q_pq_adc_topk,
        "pq_rerank": q_pq_rerank,
        "ann_ivf_trained_topk": q_ann_ivf_trained_topk,
        "graph_components": q_graph_components,
        "doclen_quantiles": q_doclen_quantiles,
        "cms_user_frequency": q_cms_user_frequency,
        "host_reputation": q_host_reputation,
        "weighted_sample": q_weighted_sample,
        "tfidf_cosine_topk": q_tfidf_cosine_topk,
        "cdc_chunks": q_cdc_chunks,
        "soft404_detect": q_soft404_detect,
        "curriculum_shards": q_curriculum_shards,
        "host_mirror_pairs": q_host_mirror_pairs,
        "recrawl_delta_cost": q_recrawl_delta_cost,
        "resolve_redirects": q_resolve_redirects,
        "canonical_clusters": q_canonical_clusters,
        "span_corruption": q_span_corruption,
        "contrastive_pairs": q_contrastive_pairs,
        "shuffle_shards": q_shuffle_shards,
        "media_boilerplate": q_media_boilerplate,
        "snapshot_dedup": q_snapshot_dedup,
        "ip_paced_admissions": q_ip_paced_admissions,
        "key_skew_stats": q_key_skew_stats,
        "salted_join": q_salted_join,
        "upsample_epochs": q_upsample_epochs,
        "dns_resolve": q_dns_resolve,
        "pld_budget": q_pld_budget,
        "epoch_shards": q_epoch_shards,
        "phash_neardup_pairs": q_phash_neardup_pairs,
        "warc_replay_curation": q_warc_replay_curation,
        "phash_incremental": q_phash_incremental,
        "phash_neardup_stars": q_phash_neardup_stars,
        # -- (3) remainder (r03-green, code untouched) -----------------------
        "crawl_documents": q_crawl_documents,
        "crawl_seen_order": q_crawl_seen_order,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_minhash_clusters": q_dedup_minhash_clusters,
        "dedup_minhash_survivors": q_dedup_minhash_survivors,
        "dedup_incremental": q_dedup_incremental,
        "minhash_signatures": q_minhash_signatures,
        "dedup_exact": q_dedup_exact,
        "dedup_lines": q_dedup_lines,
        "source_cap": q_source_cap,
        "span_pii_redact": q_span_pii_redact,
        # ---- position 51+: every query below was green in CORRECTNESS_r03
        # and its implementation is untouched this round ---------------------
        "model_quality_score": q_model_quality_score,
        "pii_redact": q_pii_redact,
        "bm25_relevance": q_bm25_relevance,
        "simhash_neardup_pairs": q_simhash_neardup_pairs,
        "unigram_surprisal": q_unigram_surprisal,
        "vocab_topk": q_vocab_topk,
        "trap_templates": q_trap_templates,
        "duplicate_passages": q_duplicate_passages,
        "simhash": q_simhash,
        "ngram_jaccard_topk": q_ngram_jaccard_topk,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "fingerprints": q_fingerprints,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "a1_status_rollup": q_a1_status_rollup,
        "j1_anti_join_seen": q_j1_anti_join_seen,
        "j2_broadcast_lookup": q_j2_broadcast_lookup,
        "o3_rank_cap": q_o3_rank_cap,
        "t2_window_budget": q_t2_window_budget,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "multimodal_image_meta": q_multimodal_image_meta,
        "corpus_hash_sample": q_corpus_hash_sample,
        "corpus_split_assign": q_corpus_split_assign,
        "corpus_stratified_sample": q_corpus_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "spans_synthesize": q_spans_synthesize,
        "span_stats": q_span_stats,
        "link_pagerank": q_link_pagerank,
        "anchor_text_agg": q_anchor_text_agg,
        "dsir_importance": q_dsir_importance,
        "decontaminate": q_decontaminate,
        "gopher_gates": q_gopher_gates,
    }


def _minhash_sql(k: int = 8) -> str:
    cols = ", ".join(
        f"list_min(list_transform(hs, h -> xor(h, {textops.MIX_CONSTANTS[i]}))) "
        f"as mh_{i}"
        for i in range(k)
    )
    h = _H60_SQL.format(s="s")
    return (
        f"with sh as (select cast(doc_id as bigint) as doc_id, "
        f"list_transform({_SHINGLES_SQL}, s -> {h}) as hs from documents) "
        f"select doc_id, {cols} from sh"
    )


def _lsh_pairs_sql(k: int = 8, band: int = 2) -> str:
    sig = _minhash_sql(k)
    keys = _bands_keys_expr(k, band)
    return (
        f"with sig as ({sig}), bands as ("
        f"select doc_id, unnest([{keys}]) as band_key from sig) "
        f"select distinct l.doc_id as a, r.doc_id as b "
        f"from bands l join bands r using (band_key) where l.doc_id < r.doc_id"
    )


def _minhash_clusters_sql(k: int = 8, band: int = 2) -> str:
    """Transitive closure of the LSH pair graph via a recursive CTE:
    min reachable doc_id == the Spark hash-min component label."""
    pairs = _lsh_pairs_sql(k, band)
    return (
        f"with recursive pairs as ({pairs}), "
        "edges as (select a as u, b as v from pairs "
        "union select b, a from pairs), "
        "nodes as (select distinct u as v from edges), "
        "walk(v, lbl) as (select v, v from nodes "
        "union select e.v, w.lbl from walk w join edges e on e.u = w.v), "
        "comp as (select v, min(lbl) as lbl from walk group by v) "
        "select cast(d.doc_id as bigint) as doc_id, "
        "cast(coalesce(c.lbl, d.doc_id) as bigint) as cluster_id "
        "from documents d left join comp c on c.v = d.doc_id"
    )


def _minhash_survivors_sql(k: int = 8, band: int = 2) -> str:
    clusters = _minhash_clusters_sql(k, band)
    return (
        f"with clusters as ({clusters}), "
        "sizes as (select cluster_id, cast(count(*) as bigint) as n_members "
        "from clusters group by cluster_id) "
        "select c.doc_id, s.n_members from clusters c "
        "join sizes s using (cluster_id) where c.doc_id = c.cluster_id"
    )


def _bands_keys_expr(k: int = 8, band: int = 2) -> str:
    n_bands = k // band
    return ", ".join(
        "concat_ws('_', "
        + str(j)
        + ", "
        + ", ".join(f"mh_{j * band + x}" for x in range(band))
        + ")"
        for j in range(n_bands)
    )


def _incremental_sql(k: int = 8, band: int = 2) -> str:
    """Mirror of components.minhash_incremental with even doc_ids as the
    index and odd ones as the new batch: band-collision probe against the
    index, then recursive-CTE connected components among the survivors."""
    sig = _minhash_sql(k)
    keys = _bands_keys_expr(k, band)
    return (
        f"with recursive sig as ({sig}), "
        f"bands as (select doc_id, unnest([{keys}]) as band_key from sig), "
        "idx as (select * from bands where doc_id % 2 = 0), "
        "newb as (select * from bands where doc_id % 2 = 1), "
        "hits as (select n.doc_id, min(i.doc_id) as match_id from newb n "
        "join idx i using (band_key) group by n.doc_id), "
        "survb as (select n.* from newb n left join hits h "
        "on n.doc_id = h.doc_id where h.match_id is null), "
        "pairs as (select distinct l.doc_id as a, r.doc_id as b from survb l "
        "join survb r using (band_key) where l.doc_id < r.doc_id), "
        "edges as (select a as u, b as v from pairs "
        "union select b, a from pairs), "
        "nodes as (select distinct u as v from edges), "
        "walk(v, lbl) as (select v, v from nodes "
        "union select e.v, w.lbl from walk w join edges e on e.u = w.v), "
        "comp as (select v, min(lbl) as lbl from walk group by v), "
        "newids as (select distinct cast(doc_id as bigint) as doc_id "
        "from documents where doc_id % 2 = 1) "
        "select n.doc_id, "
        "case when h.match_id is not null then 'dup_of_index' "
        "when c.lbl is not null and c.lbl <> n.doc_id then 'dup_of_new' "
        "else 'kept' end as verdict, "
        "cast(coalesce(h.match_id, "
        "case when c.lbl <> n.doc_id then c.lbl end) as bigint) as match_id "
        "from newids n left join hits h on h.doc_id = n.doc_id "
        "left join comp c on c.v = n.doc_id"
    )


def _duplicate_passages_sql(w: int = 8) -> str:
    split = "string_split(lower(text),' ')"
    return (
        "with d as (select cast(doc_id as bigint) as doc_id, "
        f"list_distinct(list_transform("
        f"range(0, greatest(len({split})-{w},0)+1), "
        f"i -> array_to_string(({split})[i+1:i+{w}], ' '))) as sh "
        "from documents), "
        "wins as (select doc_id, "
        "cast('0x'||substr(md5(s),1,15) as bigint) as h "
        "from d, unnest(sh) as t(s)), "
        "dc as (select h, count(*) as n_docs from wins group by h) "
        "select w.doc_id, cast(count(*) as bigint) as n_windows, "
        "cast(sum(case when dc.n_docs >= 2 then 1 else 0 end) as bigint) "
        "as n_shared, "
        "round(sum(case when dc.n_docs >= 2 then 1 else 0 end) / count(*), 6) "
        "as dup_frac from wins w join dc using (h) group by w.doc_id"
    )


def _trap_templates_sql(min_count: int = 110) -> str:
    return (
        "with u as (select concat('https://h', cast(user_id % 20 as varchar), "
        "'.test/', event_type, '/', cast(event_id as varchar)) as url "
        "from events), "
        "t as (select regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) as host, "
        "regexp_replace(regexp_replace(regexp_extract(url, "
        "'^[a-z]+://[^/?#]+(/[^?#]*)', 1), '[0-9a-f]{8,}', '{H}', 'g'), "
        "'[0-9]+', '{N}', 'g') as template, url from u) "
        "select host, template, cast(count(*) as bigint) as n_urls, "
        "min(url) as example_url from t group by host, template "
        f"having count(*) >= {min_count}"
    )


def _vocab_topk_sql(k: int = 100) -> str:
    return (
        "with w as (select unnest(string_split(lower(text), ' ')) as token "
        "from documents) "
        "select token, cast(count(*) as bigint) as cnt from w "
        f"where len(token) > 0 group by token "
        f"order by cnt desc, token asc limit {k}"
    )


def _dedup_lines_sql(min_chars: int = 10) -> str:
    """Mirror of textops.dedup_lines: first corpus-wide occurrence of each
    dedup-eligible line wins (min doc_id*2^32+pos key), docs rebuilt from
    surviving lines in order."""
    return (
        "with lines as (select doc_id, t.s.pos as pos, t.s.line as line, "
        "doc_id * 4294967296 + t.s.pos as k from "
        "(select cast(doc_id as bigint) as doc_id, "
        "list_transform(string_split(text, chr(10)), "
        "(x, i) -> {'pos': i, 'line': x}) as pls from documents), "
        "unnest(pls) as t(s)), "
        f"winners as (select line, min(k) as wk from lines "
        f"where len(line) >= {min_chars} group by line), "
        "kept as (select l.doc_id, l.pos, l.line from lines l "
        "left join winners w on l.line = w.line "
        f"where len(l.line) < {min_chars} or l.k = w.wk), "
        "rebuilt as (select doc_id, "
        "string_agg(line, chr(10) order by pos) as t, "
        "cast(count(*) as bigint) as kept_n from kept group by doc_id), "
        "totals as (select cast(doc_id as bigint) as doc_id, "
        "cast(len(string_split(text, chr(10))) as bigint) as total_n "
        "from documents) "
        "select t.doc_id, coalesce(r.t, '') as text_dedup, "
        "coalesce(r.kept_n, 0) as n_lines_kept, "
        "t.total_n - coalesce(r.kept_n, 0) as n_lines_dropped "
        "from totals t left join rebuilt r using (doc_id)"
    )


def _simhash_sql(bits: int = 16, docs_src: str = "documents") -> str:
    bit_sums = ", ".join(
        f"sum(case when (h >> {j}) & 1 = 1 then 1 else -1 end) as s{j}"
        for j in range(bits)
    )
    sim = " + ".join(
        f"(case when s{j} > 0 then {1 << j} else 0 end)" for j in range(bits)
    )
    h = _H60_SQL.format(s="w")
    return (
        f"with words as (select cast(doc_id as bigint) as doc_id, "
        f"unnest(string_split(lower(text),' ')) as w from {docs_src} d0), "
        f"hashed as (select doc_id, {h} as h from words), "
        f"agg as (select doc_id, {bit_sums} from hashed group by doc_id) "
        f"select doc_id, cast({sim} as bigint) as simhash from agg"
    )


def _simhash_pairs_sql(bits: int = 16, n_bands: int = 4, max_h: int = 3) -> str:
    """DuckDB mirror of textops.simhash_neardup_pairs over the same
    injected near-dup corpus as q_simhash_neardup_pairs."""
    bw = bits // n_bands
    docs_src = (
        "(select cast(doc_id as bigint) as doc_id, text from documents "
        "union all select cast(doc_id as bigint) + 10000, "
        "text || ' extratoken' from documents where doc_id % 10 = 0)"
    )
    sig = _simhash_sql(bits, docs_src)
    keys = ", ".join(
        f"concat('{j}_', cast((simhash >> {j * bw}) & {(1 << bw) - 1} "
        "as varchar))"
        for j in range(n_bands)
    )
    return (
        f"with sig as ({sig}), "
        f"bands as (select doc_id, simhash, unnest([{keys}]) as band_key "
        "from sig) "
        "select distinct l.doc_id as a, r.doc_id as b, "
        "cast(bit_count(xor(l.simhash, r.simhash)) as int) as hamming "
        "from bands l join bands r using (band_key) "
        "where l.doc_id < r.doc_id "
        f"and bit_count(xor(l.simhash, r.simhash)) <= {max_h}"
    )


_STOP_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]"
    for lang, ws in textops.STOPWORDS.items()
}


def _lang_id_sql() -> str:
    scores = ", ".join(
        f"len(list_intersect(string_split(lower(text),' '), {_STOP_SQL[lang]})) as s_{lang}"
        for lang in textops.STOPWORDS
    )
    langs = list(textops.STOPWORDS)
    m = "greatest(" + ", ".join(f"s_{x}" for x in langs) + ")"
    whens = " ".join(f"when s_{x} = m then '{x}'" for x in langs[:-1])
    return (
        f"with s as (select cast(doc_id as bigint) as doc_id, {scores} from documents), "
        f"m as (select *, {m} as m from s) "
        f"select doc_id, case when m <= 0 then 'unk' {whens} else '{langs[-1]}' end "
        f"as predicted_lang from m"
    )


def _ann_cosine_sql(n_queries: int = 10, k: int = 5) -> str:
    dot = (
        "list_sum(list_transform(range(1, len(q.qv)+1), "
        "i -> cast(q.qv[i] as double) * cast(c.cv[i] as double)))"
    )

    def norm(v):
        return (
            f"sqrt(list_sum(list_transform({v}, "
            f"x -> cast(x as double) * cast(x as double))))"
        )

    return (
        f"with q as (select vec_id as q, embedding as qv from embeddings "
        f"where vec_id < {n_queries}), "
        f"c as (select vec_id as neighbor, embedding as cv from embeddings), "
        f"scored as (select q.q, c.neighbor, "
        f"round({dot} / ({norm('q.qv')} * {norm('c.cv')}), 6) as cosine "
        f"from c cross join q where c.neighbor <> q.q), "
        f"ranked as (select *, row_number() over "
        f"(partition by q order by cosine desc, neighbor asc) as rank from scored) "
        f"select cast(q as bigint) as q, cast(neighbor as bigint) as neighbor, "
        f"cosine, cast(rank as int) as rank from ranked where rank <= {k}"
    )


def _ann_lsh_sql(n_queries: int = 10, k: int = 5, n_planes: int = 4, dim: int = 64) -> str:
    planes = similarity._hyperplanes(dim, n_planes)
    terms = []
    for j in range(n_planes):
        lits = "[" + ", ".join(repr(float(x)) for x in planes[j]) + "]"
        d = (
            f"list_sum(list_transform(range(1, {dim}+1), "
            f"i -> cast(embedding[i] as double) * ({lits})[i]))"
        )
        terms.append(f"(case when {d} > 0 then {1 << j} else 0 end)")
    bucket = " + ".join(terms)
    dot = (
        "list_sum(list_transform(range(1, len(q.qv)+1), "
        "i -> cast(q.qv[i] as double) * cast(c.cv[i] as double)))"
    )

    def norm(v):
        return (
            f"sqrt(list_sum(list_transform({v}, "
            f"x -> cast(x as double) * cast(x as double))))"
        )

    return (
        f"with b as (select vec_id, embedding, {bucket} as bucket from embeddings), "
        f"q as (select vec_id as q, embedding as qv, bucket from b "
        f"where vec_id < {n_queries}), "
        f"c as (select vec_id as neighbor, embedding as cv, bucket from b), "
        f"scored as (select q.q, c.neighbor, "
        f"round({dot} / ({norm('q.qv')} * {norm('c.cv')}), 6) as cosine "
        f"from c join q using (bucket) where c.neighbor <> q.q), "
        f"ranked as (select *, row_number() over "
        f"(partition by q order by cosine desc, neighbor asc) as rank from scored) "
        f"select cast(q as bigint) as q, cast(neighbor as bigint) as neighbor, "
        f"cosine, cast(rank as int) as rank from ranked where rank <= {k}"
    )


def _ann_ivf_sql(
    n_queries: int = 10, k: int = 5, n_cells: int = 8, n_probe: int = 2
) -> str:
    dot = (
        "list_sum(list_transform(range(1, len({a})+1), "
        "i -> cast({a}[i] as double) * cast({b}[i] as double)))"
    )

    def norm(v):
        return (
            f"sqrt(list_sum(list_transform({v}, "
            f"x -> cast(x as double) * cast(x as double))))"
        )

    def cos(a, b):
        return f"round({dot.format(a=a, b=b)} / ({norm(a)} * {norm(b)}), 6)"

    return (
        f"with cents as (select vec_id as cid, embedding as cv from embeddings "
        f"where vec_id < {n_cells}), "
        "corpus as (select vec_id as neighbor, embedding as nv from embeddings), "
        f"ac as (select neighbor, nv, cid, {cos('nv', 'cv')} as ccos "
        "from corpus cross join cents), "
        "assigned as (select neighbor, nv, cell from (select neighbor, nv, "
        "cid as cell, row_number() over (partition by neighbor "
        "order by ccos desc, cid) as rk from ac) where rk = 1), "
        f"q0 as (select vec_id as q, embedding as qv from embeddings "
        f"where vec_id < {n_queries}), "
        f"qc as (select q, qv, cid, {cos('qv', 'cv')} as ccos "
        "from q0 cross join cents), "
        "probes as (select q, qv, cell from (select q, qv, cid as cell, "
        "row_number() over (partition by q order by ccos desc, cid) as rk "
        f"from qc) where rk <= {n_probe}), "
        f"scored as (select p.q, a.neighbor, {cos('p.qv', 'a.nv')} as cosine "
        "from assigned a join probes p using (cell) where a.neighbor <> p.q), "
        "ranked as (select *, row_number() over (partition by q "
        "order by cosine desc, neighbor asc) as rank from scored) "
        "select cast(q as bigint) as q, cast(neighbor as bigint) as neighbor, "
        f"cosine, cast(rank as int) as rank from ranked where rank <= {k}"
    )


def _embedding_neardup_sql(per_group: int = 3) -> str:
    dot = (
        "list_sum(list_transform(range(1, len(l.va)+1), "
        "i -> cast(l.va[i] as double) * cast(r.vb[i] as double)))"
    )

    def norm(v):
        return (
            f"sqrt(list_sum(list_transform({v}, "
            f"x -> cast(x as double) * cast(x as double))))"
        )

    return (
        "with l as (select label as g, vec_id as a, embedding as va from embeddings), "
        "r as (select label as g, vec_id as b, embedding as vb from embeddings), "
        f"p as (select l.g, l.a, r.b, round({dot} / ({norm('l.va')} * {norm('r.vb')}), 6) "
        "as cosine from l join r using (g) where l.a < r.b), "
        "rk as (select *, row_number() over (partition by g order by cosine desc, a, b) "
        "as rank from p) "
        "select cast(g as int) as g, cast(a as bigint) as a, cast(b as bigint) as b, "
        f"cosine, cast(rank as int) as rank from rk where rank <= {per_group}"
    )


def _semdedup_sql(n_cells: int = 8, tau: float = 0.95) -> str:
    """DuckDB mirror of operators/similarity.semdedup over the same
    injected-duplicate corpus as q_semdedup: assignment window, tau-pair
    graph, recursive-CTE components, farthest-from-centroid survivor."""

    def dot(x, y):
        return (
            f"list_sum(list_transform(range(1, len({x})+1), "
            f"i -> cast({x}[i] as double) * cast({y}[i] as double)))"
        )

    def norm(v):
        return (
            f"sqrt(list_sum(list_transform({v}, "
            f"x -> cast(x as double) * cast(x as double))))"
        )

    return (
        "with recursive e0 as (select vec_id, embedding from embeddings), "
        "e as (select vec_id, embedding from e0 "
        "union all select vec_id + 10000, embedding from e0 "
        "where vec_id % 10 = 0 "
        "union all select vec_id + 20000, embedding from e0 "
        "where vec_id % 20 = 0), "
        f"cents as (select vec_id as cid, embedding as cv from e "
        f"where vec_id < {n_cells}), "
        "ac0 as (select e.vec_id as v, cid, e.embedding as vv, "
        f"round({dot('e.embedding', 'cv')} / "
        f"({norm('e.embedding')} * {norm('cv')}), 6) as ccos "
        "from e, cents), "
        "ac as (select *, row_number() over (partition by v "
        "order by ccos desc, cid) as rk from ac0), "
        "asg as (select v, cell, ccos, vv from (select v, cid as cell, "
        "ccos, vv from ac where rk = 1)), "
        "p as (select a.v as a, b.v as b from asg a "
        "join asg b on a.cell = b.cell and a.v < b.v "
        f"where round({dot('a.vv', 'b.vv')} / "
        f"({norm('a.vv')} * {norm('b.vv')}), 6) >= {tau}), "
        "edges as (select a as u, b as v from p union select b, a from p), "
        "nodes as (select distinct u as v from edges), "
        "walk(v, lbl) as (select v, v from nodes "
        "union select ed.v, wk.lbl from walk wk "
        "join edges ed on ed.u = wk.v), "
        "comp as (select v, min(lbl) as lbl from walk group by v), "
        "lab as (select asg.v, asg.cell, asg.ccos, "
        "coalesce(comp.lbl, asg.v) as component from asg "
        "left join comp on comp.v = asg.v), "
        "pick as (select component, v as pv from (select component, v, "
        "row_number() over (partition by component "
        "order by ccos asc, v asc) as rn from lab) where rn = 1), "
        "sizes as (select component, cast(count(*) as bigint) as n_members "
        "from lab group by component) "
        "select cast(lab.v as bigint) as vec_id, "
        "cast(lab.cell as bigint) as cell, lab.ccos, "
        "cast(lab.component as bigint) as component, sizes.n_members, "
        "cast(lab.v = pick.pv as int) as keep "
        "from lab join pick using (component) join sizes using (component)"
    )


def _repetition_oracle() -> str:
    """Relational mirror of operators/repetition.repetition_gates: per
    width, unnest grams -> group counts -> top-1 window / duplicate sums;
    the Spark side computes the same values with a shuffle-free sorted
    fold (tie-break parity: ORDER BY cnt DESC, gram ASC == first max-run
    gram in sorted order)."""
    widths = {2: "top", 3: "top", 4: "top", 5: "dup", 8: "dup", 10: "dup"}
    thr = {"top2": 0.20, "top3": 0.18, "top4": 0.16,
           "dup5": 0.15, "dup8": 0.12, "dup10": 0.10}
    ctes = [
        "base as (select cast(doc_id as bigint) as doc_id, text, "
        "string_split(lower(text), ' ') as ws, "
        "string_split(text, chr(10)) as lines, "
        "cast(greatest(length(text), 1) as double) as nc from documents)"
    ]
    joins, sel = [], []
    for w, kind in widths.items():
        ctes.append(
            f"g{w} as (select doc_id, array_to_string(ws[i:i+{w-1}], ' ') "
            f"as gram from base, unnest(generate_series(1, len(ws)-{w-1})) "
            f"s(i) where len(ws) >= {w})"
        )
        ctes.append(
            f"c{w} as (select doc_id, gram, count(*) as cnt from g{w} "
            "group by all)"
        )
        if kind == "top":
            ctes.append(
                f"a{w} as (select doc_id, cnt*length(gram) as v from "
                f"(select *, row_number() over (partition by doc_id "
                f"order by cnt desc, gram asc) as rn from c{w}) where rn=1)"
            )
        else:
            ctes.append(
                f"a{w} as (select doc_id, sum((cnt-1)*length(gram)) as v "
                f"from c{w} group by doc_id)"
            )
        joins.append(f"left join a{w} using (doc_id)")
        sel.append(
            f"round(coalesce(a{w}.v, 0)/base.nc, 6) as {kind}{w}_frac"
        )
    ctes.append(
        "lc as (select doc_id, line, count(*) as cnt from "
        "(select doc_id, unnest(lines) as line from base) group by all)"
    )
    ctes.append(
        "ls as (select doc_id, sum(cnt-1) as dcnt, "
        "sum((cnt-1)*length(line)) as dchars, sum(cnt) as total, "
        "sum(cnt*length(line)) as chars from lc group by doc_id)"
    )
    joins.append("left join ls using (doc_id)")
    sel.append(
        "round(coalesce(ls.dcnt, 0)/greatest(ls.total, 1), 6) "
        "as dup_line_frac"
    )
    sel.append(
        "round(coalesce(ls.dchars, 0)/greatest(ls.chars, 1), 6) "
        "as dup_line_char_frac"
    )
    frac_names = [s.split(" as ")[-1] for s in sel]
    gate_exprs = [
        f"cast({n} <= {thr[n.removesuffix('_frac')]} as int) as "
        f"gate_{n.removesuffix('_frac')}"
        for n in frac_names
        if n.removesuffix("_frac") in thr
    ]
    gate_exprs.append(
        "cast(dup_line_frac <= 0.30 as int) as gate_dup_line"
    )
    gate_exprs.append(
        "cast(dup_line_char_frac <= 0.20 as int) as gate_dup_line_chars"
    )
    conds = [
        f"{n} <= {thr[n.removesuffix('_frac')]}"
        for n in frac_names
        if n.removesuffix("_frac") in thr
    ] + ["dup_line_frac <= 0.30", "dup_line_char_frac <= 0.20"]
    return (
        "with " + ", ".join(ctes) + ", fr as (select base.doc_id, "
        "cast(len(base.ws) as bigint) as n_words, " + ", ".join(sel)
        + " from base " + " ".join(joins) + ") select *, "
        + ", ".join(gate_exprs)
        + ", cast(" + " and ".join(conds) + " as int) as pass_all from fr"
    )


def _subword_counts_sql() -> str:
    """DuckDB replay of operators/subword.subword_token_counts: the same
    greedy longest-match walk over the DISTINCT word dictionary, as a
    lambda-free RECURSIVE CTE (one state row per word per step, vocab as
    a values table, longest match via a correlated max subquery).

    Deliberately NOT a list_reduce fold: DuckDB 1.0.0 mis-evaluates a
    list_reduce lambda that captures an outer column under multithreaded
    execution (reproducibly tokenizes 'table' as 3 pieces instead of 2
    with default threads, correct with PRAGMA threads=1), so the fold
    formulation cannot serve as an oracle."""
    from inform_spark.operators.subword import VOCAB

    vocab_rows = ", ".join(f"('{p}')" for p in VOCAB)
    match = (
        "case when w.pos = 1 "
        "then v.pp not like '##%' and "
        "substr(w.word, cast(w.pos as int), length(v.pp)) = v.pp "
        "else v.pp like '##%' and "
        "substr(w.word, cast(w.pos as int), length(v.pp)-2) = "
        "substr(v.pp, 3, length(v.pp)-2) end"
    )
    return (
        "base as (select cast(doc_id as bigint) as doc_id from documents), "
        "p as (select cast(doc_id as bigint) as doc_id, "
        "unnest(list_filter(string_split(lower(text), ' '), "
        "w -> length(w) > 0)) as word from documents), "
        "dw as (select distinct word from p), "
        f"vocab(pp) as (values {vocab_rows}), "
        "walk(word, pos, n, unk) as ("
        "select word, cast(1 as bigint), cast(0 as bigint), false from dw "
        "union all "
        "select word, "
        "case when ml is null then pos else pos + ml end, "
        "case when ml is null then n else n + 1 end, "
        "ml is null "
        "from (select w.word, w.pos, w.n, "
        "(select max(length(v.pp) - "
        "case when v.pp like '##%' then 2 else 0 end) "
        f"from vocab v where {match}) as ml "
        "from walk w where w.pos <= length(w.word) and not w.unk) t), "
        "tk as (select word, "
        "case when unk then 1 else n end as n_sub, "
        "cast(unk as bigint) as unk from walk "
        "where unk or pos > length(word)), "
        "swc as (select doc_id, cast(count(*) as bigint) as n_words, "
        "cast(sum(n_sub) as bigint) as n_subword_tokens, "
        "cast(sum(unk) as bigint) as n_unk_words "
        "from p join tk using (word) group by doc_id)"
    )


def _lang_id_model_sql() -> str:
    """DuckDB replay of operators/langid.lang_id_model: same committed
    seeds, trigram buckets, integer floor-log2 surprisal, argmin with
    alphabetical tie-break."""
    from inform_spark.operators.langid import LANGS, N_BUCKETS, SEEDS

    seeds = ", ".join(f"('{lang}', '{SEEDS[lang]}')" for lang in LANGS)
    tri = (
        "list_transform(range(1, greatest(length({s})-2, 0)+1), "
        "i -> cast('0x'||substr(md5('lid'||substr({s}, cast(i as int), 3))"
        f",1,15) as bigint) % {N_BUCKETS})"
    )
    # casts: DuckDB sum() is HUGEINT, which printf('%b', ...) rejects
    tot_cols = ", ".join(
        f"cast(sum(case when lang='{lang}' then cnt end) as bigint) "
        f"as tot_{lang}"
        for lang in LANGS
    )
    cnt_cols = ", ".join(
        f"cast(sum(case when lang='{lang}' then cnt end) as bigint) "
        f"as c_{lang}"
        for lang in LANGS
    )
    w_cols = ", ".join(
        f"length(printf('%b', (tot_{lang} + {N_BUCKETS}) // "
        f"(coalesce(c_{lang}, 0) + 1))) - 1 as w_{lang}"
        for lang in LANGS
    )
    bit_cols = ", ".join(
        f"cast(sum(cnt * coalesce(w_{lang}, "
        f"length(printf('%b', tot_{lang} + {N_BUCKETS})) - 1)) as bigint) "
        f"as bits_{lang}"
        for lang in LANGS
    )
    return (
        f"with seeds(lang, s) as (values {seeds}), "
        f"sg as (select lang, unnest({tri.format(s='s')}) as bucket "
        "from seeds), "
        "sc as (select lang, bucket, count(*) as cnt from sg "
        "group by lang, bucket), "
        f"tots as (select {tot_cols} from sc), "
        f"wp as (select bucket, {cnt_cols} from sc group by bucket), "
        f"wb as (select bucket, {w_cols} from wp, tots), "
        "dg as (select cast(doc_id as bigint) as doc_id, "
        f"unnest({tri.format(s='lower(text)')}) as bucket from documents), "
        "dc as (select doc_id, bucket, count(*) as cnt from dg "
        "group by doc_id, bucket), "
        "sc2 as (select doc_id, cast(sum(cnt) as bigint) as n_trigrams, "
        f"{bit_cols} from dc left join wb using (bucket), tots "
        "group by doc_id), "
        "base as (select cast(doc_id as bigint) as doc_id from documents) "
        "select base.doc_id, "
        "cast(coalesce(n_trigrams, 0) as bigint) as n_trigrams, "
        "bits_de, bits_en, bits_es, bits_fr, "
        "case when n_trigrams is null then null "
        "when bits_de <= bits_en and bits_de <= bits_es and "
        "bits_de <= bits_fr then 'de' "
        "when bits_en <= bits_es and bits_en <= bits_fr then 'en' "
        "when bits_es <= bits_fr then 'es' else 'fr' end as pred_lang "
        "from base left join sc2 using (doc_id)"
    )


def _url_canon_sql() -> str:
    """DuckDB replay of operators/urlops over the same synthesized
    messy-URL surface forms (see _synth_urls)."""
    return (
        "with ev as (select 'HTTP' || "
        "case when event_id % 7 = 0 then 'S' else '' end || '://Host' || "
        "cast(user_id % 20 as varchar) || '.Example.COM' || "
        "case when event_id % 3 = 0 then "
        "(case when event_id % 7 = 0 then ':443' else ':80' end) "
        "else '' end || '/Path/' || event_type || "
        "case when event_id % 2 = 0 then '/' else '' end || "
        "'?utm_source=feed&id=' || cast(event_id % 50 as varchar) || "
        "case when event_id % 5 = 0 then '&b=2&a=1' else '' end || "
        "'#frag' as url from events), "
        "x as (select url, "
        "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) "
        "as scheme, "
        "lower(regexp_extract(url, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) as host0, "
        "regexp_extract(url, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) as path0, "
        "regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) as q from ev), "
        "y as (select url, scheme, "
        "case when scheme = 'http' and host0 like '%:80' "
        "then substr(host0, 1, length(host0)-3) "
        "when scheme = 'https' and host0 like '%:443' "
        "then substr(host0, 1, length(host0)-4) else host0 end as host, "
        "case when regexp_replace(path0, '/+$', '') = '' then '/' "
        "else regexp_replace(path0, '/+$', '') end as path, "
        "array_to_string(list_sort(list_filter(string_split(q, '&'), "
        "p -> p != '' and not starts_with(p, 'utm_') "
        "and not starts_with(p, 'gclid') "
        "and not starts_with(p, 'fbclid'))), '&') as qc from x), "
        "c as (select url, scheme || '://' || host || path || "
        "case when qc != '' then '?' || qc else '' end as canon_url "
        "from y) "
        "select canon_url, cast(count(*) as bigint) as n_occurrences, "
        "cast(count(distinct url) as bigint) as n_variants, "
        "min(url) as rep_url from c group by canon_url"
    )


# CCNet paragraph normalization, DuckDB side (regexp_replace needs the
# 'g' flag — DuckDB replaces first-match-only by default, Spark always
# replaces all)
_CCNET_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(lower({p}), "
    "'[0-9]', '0', 'g'), '[^a-z0 ]', '', 'g'), ' +', ' ', 'g'))"
)


# the synthetic-link-graph CTE (DuckDB mirror of
# linkgraph.synthetic_edges) — the ONE definition every link-graph
# oracle builds on: pagerank, trustrank, HITS, degree stats, and
# anchor_text_agg. A change to synthetic_edges lands here once.
_LG_EDGES_SQL = (
    "nodes as (select cast(doc_id as bigint) as id from documents), "
    "cnt as (select count(*) as n from nodes), "
    "e0 as (select id as src, k from nodes, "
    "unnest(range(1 + id % 3)) as t(k)), "
    "edges as (select src, "
    "cast('0x'||substr(md5('edge'||cast(src as varchar)||'-'"
    "||cast(k as varchar)),1,15) as bigint) "
    "% (select n from cnt) as dst from e0)"
)


def oracle_sql() -> dict[str, str]:
    d = _oracle_base()
    # curation_verdicts composes the STAGE ORACLES as subqueries — the
    # composition itself is cross-checked, not a re-derivation
    d["curation_verdicts"] = (
        "select g.doc_id, g.pass_all as pass_gopher, "
        "q.keep as pass_model, "
        "b.keep as pass_badword, u.keep as pass_lm, c.is_canonical, "
        "cast(q.keep = 1 and b.keep = 1 and u.keep = 1 "
        "and c.is_canonical = 1 as int) as keep_final "
        f"from ({d['gopher_gates']}) g "
        f"join ({d['model_quality_score']}) q using (doc_id) "
        f"join ({d['badword_filter']}) b using (doc_id) "
        f"join ({d['unigram_surprisal']}) u using (doc_id) "
        "join (with m as (select text, min(doc_id) as mn from documents "
        "group by text) select cast(d2.doc_id as bigint) as doc_id, "
        "cast(d2.doc_id = m.mn as int) as is_canonical "
        "from documents d2 join m using (text)) c using (doc_id)"
    )
    # ---- round-4 additions --------------------------------------------
    d["subword_token_counts"] = (
        f"with recursive {_subword_counts_sql()} "
        "select base.doc_id, "
        "cast(coalesce(n_words, 0) as bigint) as n_words, "
        "cast(coalesce(n_subword_tokens, 0) as bigint) as n_subword_tokens, "
        "cast(coalesce(n_unk_words, 0) as bigint) as n_unk_words "
        "from base left join swc using (doc_id)"
    )
    d["pack_sequences_subword"] = (
        f"with recursive {_subword_counts_sql()}, "
        "t as (select base.doc_id, "
        "cast(coalesce(n_subword_tokens, 0) as bigint) as tok "
        "from base left join swc using (doc_id)), "
        "c as (select doc_id, tok, cast(coalesce(sum(tok) over "
        "(order by doc_id rows between unbounded preceding and 1 "
        "preceding), 0) as bigint) as cum_before from t) "
        "select doc_id, tok, cum_before, "
        "cum_before // 512 as seq_first, "
        "(cum_before + greatest(tok, 1) - 1) // 512 as seq_last, "
        "cum_before % 512 as offset_in_seq, "
        "(cum_before + greatest(tok, 1) - 1) // 512 "
        "- cum_before // 512 + 1 as n_seqs from c"
    )
    d["lang_id_model"] = _lang_id_model_sql()
    d["url_canonical_cluster"] = _url_canon_sql()
    d["ccnet_paragraph_dedup"] = (
        "with paras as (select doc_id, t.s.pos as pos, t.s.para as para, "
        "doc_id * 4294967296 + t.s.pos as k, "
        + _CCNET_NORM_SQL.format(p="t.s.para")
        + " as norm from "
        "(select cast(doc_id as bigint) as doc_id, "
        "list_transform(string_split(text, chr(10)), "
        "(x, i) -> {'pos': i, 'para': x}) as pls from documents), "
        "unnest(pls) as t(s)), "
        "winners as (select norm, min(k) as wk from paras "
        "where norm != '' group by norm), "
        "kept as (select p.doc_id, p.pos, p.para from paras p "
        "left join winners w on p.norm = w.norm "
        "where p.norm = '' or p.k = w.wk), "
        "rebuilt as (select doc_id, "
        "string_agg(para, chr(10) order by pos) as t, "
        "cast(count(*) as bigint) as kept_n from kept group by doc_id), "
        "totals as (select cast(doc_id as bigint) as doc_id, "
        "cast(len(string_split(text, chr(10))) as bigint) as total_n "
        "from documents) "
        "select totals.doc_id, coalesce(t, '') as text_dedup, "
        "cast(coalesce(kept_n, 0) as bigint) as n_paras_kept, "
        "cast(total_n - coalesce(kept_n, 0) as bigint) as n_paras_dropped "
        "from totals left join rebuilt using (doc_id)"
    )
    d["domain_crawl_budget"] = (
        "with s as (select source, md5(text) as h, "
        "cast(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) as bigint) as tok "
        "from documents), "
        "g as (select source, cast(count(*) as bigint) as n_docs, "
        "cast(count(distinct h) as bigint) as n_unique_docs, "
        "cast(sum(tok) as bigint) as n_tokens from s group by source), "
        "tv as (select sum(n_unique_docs) as tv from g) "
        "select source, n_docs, n_unique_docs, n_tokens, "
        "cast(greatest(least((n_unique_docs * 10000) // tv, 4000), 100) "
        "as bigint) as budget_pages from g, tv"
    )
    # text_normalize: replace() chain mirrors operators/textops.PUNCT_MAP
    from inform_spark.operators.textops import PUNCT_MAP

    norm_expr = "text"
    for src, dst in PUNCT_MAP:
        sq, dq = src.replace("'", "''"), dst.replace("'", "''")
        norm_expr = f"replace({norm_expr}, '{sq}', '{dq}')"
    norm_expr = (
        f"trim(regexp_replace(regexp_replace({norm_expr}, "
        "'[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g'))"
    )
    d["text_normalize"] = (
        f"with n as (select cast(doc_id as bigint) as doc_id, "
        f"{norm_expr} as norm_text, "
        "cast(length(text) as bigint) as n_chars from documents) "
        "select doc_id, norm_text, n_chars, "
        "cast(length(norm_text) as bigint) as n_chars_norm from n"
    )
    _w_sum = sum(MIX_WEIGHTS.values())
    _wm_rows = ", ".join(f"('{s}', {w})" for s, w in MIX_WEIGHTS.items())
    d["corpus_mix_sample"] = (
        "with b as (select cast(doc_id as bigint) as doc_id, source, "
        "cast(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) as bigint) as n_tokens "
        "from documents), "
        f"wm(source, w) as (values {_wm_rows}), "
        "ps as (select source, cast(sum(n_tokens) as bigint) as tokens_s, "
        "cast(min(w) as bigint) as w_s from b join wm using (source) "
        "group by source), "
        f"tb as (select min(tokens_s * {_w_sum} // w_s) as T from ps), "
        f"dim as (select source, ((w_s * T // {_w_sum}) * 1000000) "
        "// tokens_s as p_micro from ps, tb) "
        "select b.doc_id, b.source, b.n_tokens, "
        "cast(coalesce(p_micro, 0) as bigint) as p_micro, "
        "(cast('0x'||substr(md5('mixm4'||cast(b.doc_id as varchar)),1,15) "
        "as bigint) % 1000000) < coalesce(p_micro, 0) as accepted "
        "from b left join dim using (source)"
    )
    d["bigram_surprisal"] = (
        "with s as (select cast(doc_id as bigint) as doc_id, "
        "list_filter(string_split(lower(text), ' '), w -> w != '') as ws "
        "from documents), "
        "base as (select doc_id, cast(len(ws) as bigint) as n_tokens from s), "
        "t as (select doc_id, unnest(ws) as token from s), "
        "ug as (select token, cast(count(*) as bigint) as c1 from t "
        "group by token), "
        "tot as (select cast(sum(c1) as bigint) as N from ug), "
        "fb as (select s.doc_id, "
        "cast(length(printf('%b', N // c1)) - 1 as bigint) as bits "
        "from s join ug on ug.token = s.ws[1], tot where len(s.ws) >= 1), "
        "bg0 as (select doc_id, unnest(list_transform(range(1, len(ws)), "
        "i -> {'w1': ws[i], 'w2': ws[i+1]})) as g from s "
        "where len(ws) >= 2), "
        "pdb as (select doc_id, g.w1 as w1, g.w2 as w2, "
        "cast(count(*) as bigint) as cnt from bg0 "
        "group by doc_id, g.w1, g.w2), "
        "bv as (select w1, w2, cast(sum(cnt) as bigint) as c12 from pdb "
        "group by w1, w2), "
        "cb as (select doc_id, cnt * "
        "cast(length(printf('%b', c1 // c12)) - 1 as bigint) as bits "
        "from pdb join bv using (w1, w2) join ug on ug.token = pdb.w1), "
        "sc as (select doc_id, cast(sum(bits) as bigint) as surprisal_bits "
        "from (select * from fb union all select * from cb) "
        "group by doc_id) "
        "select doc_id, n_tokens, surprisal_bits, mean_bits_milli, "
        "coalesce(mean_bits_milli between 500 and 12000, false) as keep "
        "from (select base.doc_id, n_tokens, surprisal_bits, "
        "case when n_tokens > 0 then (1000 * surprisal_bits) // n_tokens "
        "end as mean_bits_milli from base left join sc using (doc_id))"
    )
    # WARC round trip: the oracle re-derives the PARSED output straight
    # from documents — equality proves parse(serialize(x)) == x with
    # byte-exact (octet_length) Content-Length
    d["warc_roundtrip"] = (
        "select cast(doc_id as bigint) as doc_id, "
        "'https://corpus.test/doc/'||cast(doc_id as varchar) as uri, "
        "cast(octet_length(encode(text)) as bigint) as content_length, "
        "md5(text) as payload_md5 from documents"
    )
    # CDX index: replicate the full WARC/1.0 record template in SQL
    # (same field order + CRLFs as sources/warc.warc_record_col), take
    # octet_length, and prefix-sum per shard in write order
    _crlf = "chr(13)||chr(10)"
    d["warc_cdx_index"] = (
        "with s as (select doc_id, "
        "'https://corpus.test/doc/'||cast(doc_id as varchar) as uri, "
        "md5('https://corpus.test/doc/'||cast(doc_id as varchar)"
        "||chr(10)||'2026-01-01T00:00:00Z') as h, text from documents), "
        "r as (select doc_id, uri, doc_id % 16 as shard, "
        "octet_length(encode("
        f"'WARC/1.0'||{_crlf}||'WARC-Type: response'||{_crlf}"
        f"||'WARC-Target-URI: '||uri||{_crlf}"
        f"||'WARC-Date: 2026-01-01T00:00:00Z'||{_crlf}"
        "||'WARC-Record-ID: <urn:uuid:'||substr(h,1,8)||'-'||substr(h,9,4)"
        "||'-'||substr(h,13,4)||'-'||substr(h,17,4)||'-'||substr(h,21,12)"
        f"||'>'||{_crlf}"
        f"||'Content-Type: text/plain; charset=utf-8'||{_crlf}"
        "||'Content-Length: '"
        f"||cast(octet_length(encode(text)) as varchar)||{_crlf}||{_crlf}"
        f"||text||{_crlf}||{_crlf})) as length from s) "
        "select uri, cast(shard as bigint) as shard, "
        "cast(coalesce(sum(length) over (partition by shard order by doc_id "
        "rows between unbounded preceding and 1 preceding), 0) as bigint) "
        "as offset, cast(length as bigint) as length from r"
    )
    d["corpus_publish_manifest"] = (
        "with b as (select cast('0x'||substr(md5('pub'"
        "||cast(doc_id as varchar)),1,15) as bigint) % 32 as bucket, "
        "doc_id, text from documents) "
        "select cast(bucket as int) as bucket, "
        "cast(count(*) as bigint) as n_docs, "
        "cast(sum(len(list_filter(string_split(lower(text), ' '), "
        "w -> w != ''))) as bigint) as n_tokens, "
        "cast(sum(octet_length(encode(text))) as bigint) as n_bytes, "
        "cast(min(doc_id) as bigint) as min_key, "
        "cast(max(doc_id) as bigint) as max_key "
        "from b group by bucket"
    )
    d["decontaminate_fraction"] = (
        "with d as (select cast(doc_id as bigint) as doc_id, "
        "list_distinct(list_transform("
        "range(0, greatest(len(string_split(lower(text),' '))-8,0)+1), "
        "i -> array_to_string((string_split(lower(text),' '))[i+1:i+8], "
        "' '))) as sh, "
        f"{_H60_SQL.format(s=chr(39) + 'bench' + chr(39) + ' || cast(doc_id as varchar)')} "
        "% 20 = 0 as is_bench from documents), "
        "hs as (select doc_id, is_bench, "
        "cast('0x'||substr(md5(s),1,15) as bigint) as h "
        "from d, unnest(sh) as t(s)), "
        "bh as (select distinct h from hs where is_bench), "
        "tr as (select doc_id, cast(len(sh) as bigint) as n_shingles "
        "from d where not is_bench), "
        "hits as (select doc_id, cast(count(*) as bigint) as n_contaminated "
        "from hs where not is_bench and h in (select h from bh) "
        "group by doc_id) "
        "select tr.doc_id, n_shingles, "
        "cast(coalesce(n_contaminated, 0) as bigint) as n_contaminated, "
        "cast(case when n_shingles > 0 then "
        "1000 * coalesce(n_contaminated, 0) // n_shingles else 0 end "
        "as bigint) as contamination_milli, "
        "(case when n_shingles > 0 then "
        "1000 * coalesce(n_contaminated, 0) // n_shingles else 0 end) < 50 "
        "as keep from tr left join hits using (doc_id)"
    )
    d["script_profile"] = _script_profile_sql()
    # capstone composition: the curation-verdict oracle nested inside
    # the publish-manifest oracle — the chain is what's cross-checked
    d["curated_publish_manifest"] = (
        "with kept as (select doc_id from ("
        + d["curation_verdicts"]
        + ") where keep_final = 1), "
        "b as (select cast('0x'||substr(md5('pub'"
        "||cast(d.doc_id as varchar)),1,15) as bigint) % 16 as bucket, "
        "cast(d.doc_id as bigint) as doc_id, d.text "
        "from documents d join kept on kept.doc_id = cast(d.doc_id as bigint)) "
        "select cast(bucket as int) as bucket, "
        "cast(count(*) as bigint) as n_docs, "
        "cast(sum(len(list_filter(string_split(lower(text), ' '), "
        "w -> w != ''))) as bigint) as n_tokens, "
        "cast(sum(octet_length(encode(text))) as bigint) as n_bytes, "
        "cast(min(doc_id) as bigint) as min_key, "
        "cast(max(doc_id) as bigint) as max_key "
        "from b group by bucket"
    )
    d["sitemap_recrawl_overlay"] = (
        "with s as (" + d["recrawl_schedule"] + "), "
        "inv as (select url, 1704067200000 "
        "+ (cast(substring(url, 2) as bigint) % 60) * 86400000 "
        "as lastmod_ms from s "
        "where cast(substring(url, 2) as bigint) % 2 = 0) "
        "select s.url, last_ms, interval_ms, "
        "cast(case when inv.lastmod_ms is not null "
        "and inv.lastmod_ms > last_ms "
        "then least(next_due_ms, inv.lastmod_ms) else next_due_ms end "
        "as bigint) as next_due_ms, "
        "coalesce(inv.lastmod_ms is not null "
        "and inv.lastmod_ms > last_ms, false) as sitemap_override "
        "from s left join inv using (url)"
    )
    d["sitemap_inventory"] = (
        "select 'https://corpus.test/sitemap-'"
        "||cast(doc_id % 16 as varchar)||'.xml' as sitemap_url, "
        "'https://corpus.test/doc/'||cast(doc_id as varchar) as loc, "
        "'2026-01-'||lpad(cast(doc_id % 28 + 1 as varchar), 2, '0') "
        "as lastmod, "
        "round(cast(doc_id % 9 + 1 as double) / 10, 1) as priority "
        "from documents"
    )
    d["suffix_prefix_overlap"] = (
        "with t as (select cast(doc_id as bigint) as doc_id, "
        "string_split(lower(text), ' ') as w from documents), "
        "b as (select doc_id, array_to_string(w[1:2], ' ') as pre, "
        "array_to_string(w[len(w)-1:len(w)], ' ') as suf from t "
        "where len(w) >= 2) "
        "select x.doc_id as a, y.doc_id as b, x.suf as boundary "
        "from b x join b y on x.suf = y.pre and x.doc_id != y.doc_id"
    )
    # HLL: identical committed constants on both sides — the alpha*m^2*2^55
    # double literal and the integer linear-counting table come from ONE
    # Python computation (operators/sketches), so no engine evaluates ln or
    # non-integer math beyond a single IEEE-deterministic division
    from inform_spark.operators.sketches import _c_literal, _lc_milli_table

    _hll_c = repr(_c_literal(64, 6))
    _hll_lc = ", ".join(str(x) for x in _lc_milli_table(64))
    d["hll_host_cardinality"] = (
        "with it as (select 'h' || cast(user_id % 8 as varchar) as host, "
        "'u' || cast(event_id % 2600 as varchar) as item from events), "
        "h as (select host, item, "
        "cast('0x'||substr(md5('hll'||item),1,15) as bigint) as hv from it), "
        "r as (select host, hv % 64 as bucket, "
        "case when hv // 64 > 0 then 54 - (length(printf('%b', hv // 64)) - 1) "
        "else 55 end as rank from h), "
        "regs as (select host, bucket, max(rank) as register "
        "from r group by host, bucket), "
        "agg as (select host, count(*) as present, "
        "sum(cast(1 as bigint) << (55 - register)) as psum "
        "from regs group by host), "
        "est as (select host, cast(64 - present as bigint) as n_zero_registers, "
        "cast(psum + cast(64 - present as bigint) * (cast(1 as bigint) << 55) "
        "as bigint) as sum_scaled from agg), "
        "ex as (select host, cast(count(distinct item) as bigint) "
        "as exact_distinct from it group by host) "
        "select ex.host, exact_distinct, n_zero_registers, sum_scaled, "
        f"case when cast(floor({_hll_c} / cast(sum_scaled as double) * 1000.0) "
        "as bigint) <= 160000 and n_zero_registers > 0 "
        f"then cast(list_extract([{_hll_lc}], "
        "greatest(1, cast(n_zero_registers as int))) as bigint) "
        f"else cast(floor({_hll_c} / cast(sum_scaled as double) * 1000.0) "
        "as bigint) end as est_milli "
        "from ex join est using (host)"
    )
    d["inverted_postings"] = (
        "with toks as (select doc_id, t.s.term as term, t.s.idx as idx from "
        "(select cast(doc_id as bigint) as doc_id, "
        "list_transform(string_split(lower(text), ' '), "
        "(x, i) -> {'term': x, 'idx': i - 1}) as ws from documents), "
        "unnest(ws) as t(s) where len(t.s.term) > 0), "
        "pd as (select term, doc_id, cast(count(*) as bigint) as tf, "
        "string_agg(cast(idx as varchar), '.' order by idx) as poss "
        "from toks group by term, doc_id), "
        "rk as (select *, row_number() over (partition by term "
        "order by doc_id) as rn from pd), "
        "agg as (select term, cast(count(*) as bigint) as df, "
        "cast(sum(tf) as bigint) as cf, "
        "string_agg(case when rn <= 32 then cast(doc_id as varchar)||':'||"
        "cast(tf as varchar)||':'||poss end, ';' order by doc_id) as postings "
        "from rk group by term) "
        "select term, df, cf, cast(df - least(df, 32) as bigint) "
        "as n_dropped_docs, postings from agg"
    )
    # TrustRank: the pagerank oracle's unrolled 3 iterations with the
    # teleport mass gated on the hash-designated seed set
    _tr_edges = (
        f"{_LG_EDGES_SQL}, "
        "deg as (select src, count(*) as deg from edges group by src), "
        "seeds as (select id, (cast('0x'||substr(md5('trust'||"
        "cast(id as varchar)),1,15) as bigint) % 8) = 0 as is_seed "
        "from nodes)"
    )
    _tr_step = (
        "c{i} as (select e.dst as id, sum(r.trust // d.deg) as s "
        "from edges e join deg d using(src) join r{p} r on r.id = e.src "
        "group by e.dst), "
        "r{i} as (select n.id, n.is_seed, "
        "cast((case when n.is_seed then 150000 else 0 end) "
        "+ (85 * coalesce(c.s, 0)) // 100 as bigint) as trust "
        "from seeds n left join c{i} c using(id))"
    )
    d["link_trustrank"] = (
        f"with {_tr_edges}, "
        "r0 as (select id, is_seed, cast(case when is_seed then 1000000 "
        "else 0 end as bigint) as trust from seeds), "
        + ", ".join(_tr_step.format(i=i, p=i - 1) for i in (1, 2, 3))
        + " select id as doc_id, trust, is_seed from r3"
    )
    # HITS: 2 unrolled iterations, L-infinity (max) normalization with
    # integer division each half-step — exactly linkgraph.hits
    _hits_step = (
        "ar{i} as (select n.id, coalesce(t.s, 0) as s from nodes n "
        "left join (select e.dst as id, sum(h.hub) as s from edges e "
        "join h{p} h on h.id = e.src group by e.dst) t using (id)), "
        "a{i} as (select id, cast((s::hugeint * 1000000) // "
        "greatest((select max(s) from ar{i}), 1) as bigint) as auth "
        "from ar{i}), "
        "hr{i} as (select n.id, coalesce(t.s, 0) as s from nodes n "
        "left join (select e.src as id, sum(a.auth) as s from edges e "
        "join a{i} a on a.id = e.dst group by e.src) t using (id)), "
        "h{i} as (select id, cast((s::hugeint * 1000000) // "
        "greatest((select max(s) from hr{i}), 1) as bigint) as hub "
        "from hr{i})"
    )
    d["link_hits"] = (
        f"with {_LG_EDGES_SQL}, "
        "h0 as (select id, cast(1000000 as bigint) as hub from nodes), "
        + ", ".join(_hits_step.format(i=i, p=i - 1) for i in (1, 2))
        + " select h2.id as doc_id, h2.hub, a2.auth "
        "from h2 join a2 using (id)"
    )
    # Count-Min sketch: salted 60-bit md5 hashes, integer counter sums,
    # min over depth probes — identical arithmetic to sketches.cms_*
    d["cms_user_frequency"] = (
        "with ev as (select cast(user_id as varchar) as item "
        "from events), "
        "er as (select item, r from ev, unnest(range(4)) as t(r)), "
        "counters as (select r, "
        "cast('0x'||substr(md5('cms'||cast(r as varchar)||'|'||item),"
        "1,15) as bigint) % 32 as c, "
        "cast(count(*) as bigint) as cnt from er group by r, c), "
        "items as (select distinct item from ev), "
        "pr as (select i.item, t.r, "
        "cast('0x'||substr(md5('cms'||cast(t.r as varchar)||'|'||i.item),"
        "1,15) as bigint) % 32 as c "
        "from items i, unnest(range(4)) as t(r)), "
        "est as (select p.item, cast(min(coalesce(k.cnt, 0)) as bigint) "
        "as cms_est from pr p left join counters k "
        "on k.r = p.r and k.c = p.c group by p.item), "
        "tr as (select item, cast(count(*) as bigint) as true_cnt "
        "from ev group by item) "
        "select tr.item, tr.true_cnt, est.cms_est "
        "from tr join est using (item)"
    )
    # exact nearest-rank quantiles over the value histogram — identical
    # integer selection rule as operators/stats.value_quantiles
    d["doclen_quantiles"] = (
        "with hist as (select lang, n_chars, "
        "cast(count(*) as bigint) as cnt from documents "
        "where n_chars is not null group by lang, n_chars), "
        "cum as (select lang, n_chars, cnt, "
        "sum(cnt) over (partition by lang order by n_chars "
        "rows between unbounded preceding and current row) as cum "
        "from hist), "
        "tot as (select lang, cast(sum(cnt) as bigint) as n "
        "from hist group by lang) "
        "select c.lang, cast(max(t.n) as bigint) as n_rows, "
        + ", ".join(
            f"cast(min(case when c.cum * 100 >= {p} * t.n "
            f"then c.n_chars end) as bigint) as p{p}"
            for p in (25, 50, 75, 90, 99)
        )
        + " from cum c join tot t using (lang) group by c.lang"
    )
    # connected components: the oracle computes TRUE min-reachable via a
    # recursive transitive closure (no iteration-count parity needed —
    # the Spark side converges to the same canonical min-id labels)
    d["graph_components"] = (
        f"with recursive {_LG_EDGES_SQL}, "
        "und as (select src as a, dst as b from edges where src <> dst "
        "union select dst as a, src as b from edges where src <> dst), "
        "reach(v, m) as (select id, id from nodes union "
        "select u.b, r.m from reach r join und u on u.a = r.v) "
        "select n.id as doc_id, "
        "cast(coalesce(c.component, n.id) as bigint) as component "
        "from nodes n left join (select v, min(m) as component "
        "from reach group by v) c on c.v = n.id"
    )
    d["degree_stats"] = (
        f"with {_LG_EDGES_SQL}, "
        "de as (select distinct src, dst from edges), "
        "outd as (select src as id, cast(count(*) as bigint) as out_deg "
        "from de group by src), "
        "ind as (select dst as id, cast(count(*) as bigint) as in_deg "
        "from de group by dst), "
        # (src,dst) is distinct, so the reverse-edge inner join matches
        # at most once per edge — an EXISTS expressed as a join
        "recip as (select d.src as id, cast(count(*) as bigint) "
        "as n_reciprocal from de d join de r "
        "on r.src = d.dst and r.dst = d.src group by d.src) "
        "select n.id as doc_id, "
        "cast(coalesce(o.out_deg, 0) as bigint) as out_deg, "
        "cast(coalesce(i.in_deg, 0) as bigint) as in_deg, "
        "cast(coalesce(r.n_reciprocal, 0) as bigint) as n_reciprocal "
        "from nodes n left join outd o using (id) "
        "left join ind i using (id) left join recip r using (id)"
    )
    # k-means: 2 unrolled Lloyd iterations with the identical integer
    # arithmetic as operators/clustering (micro-quantize, exact long
    # squared-L2, (d2, cid) argmin, toward-zero division, empty-cell keep)
    _km_d2 = (
        "cast(list_sum(list_transform(range(1, len(q.qv)+1), "
        "j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))) as bigint)"
    )
    _km_step = (
        "s{i} as (select vid, qv, cid, d2, row_number() over "
        "(partition by vid order by d2, cid) as rn from "
        f"(select q.vid, q.qv, c.cid, {_km_d2} as d2 "
        "from q cross join c{p} c)), "
        "a{i} as (select vid, qv, cid, d2 from s{i} where rn = 1), "
        "u{i} as (select cid, t.p.i as i, "
        "cast(sum(t.p.v) as bigint) as s, "
        "cast(count(*) as bigint) as n from "
        "(select cid, list_transform(qv, (x, j) -> {{'i': j, 'v': x}}) "
        "as ps from a{i}), unnest(ps) as t(p) group by cid, t.p.i), "
        "nc{i} as (select cid, list(cast(case when s < 0 "
        "then -((-s) // n) else s // n end as bigint) order by i) "
        "as ncv from u{i} group by cid), "
        "c{i} as (select c.cid, coalesce(n.ncv, c.cv) as cv "
        "from c{p} c left join nc{i} n using (cid))"
    )
    # the trained-centroid chain (c2 = the final centroid relation),
    # shared by kmeans_train and the trained-IVF variant
    _km_chain = (
        "q as (select cast(vec_id as bigint) as vid, "
        "list_transform(embedding, x -> cast(round(cast(x as double) "
        "* 1000000) as bigint)) as qv from embeddings), "
        "c0 as (select vid as cid, qv as cv from q where vid < 8), "
        + ", ".join(_km_step.format(i=i, p=i - 1) for i in (1, 2))
    )
    d["kmeans_train"] = (
        f"with {_km_chain}"
        ", fs as (select vid, cid, d2, row_number() over "
        "(partition by vid order by d2, cid) as rn from "
        f"(select q.vid, c.cid, {_km_d2} as d2 from q cross join c2 c)), "
        "roll as (select cid, cast(count(*) as bigint) as n_assigned, "
        "cast(sum(d2) as bigint) as inertia from fs where rn = 1 "
        "group by cid) "
        "select c.cid, cast(coalesce(r.n_assigned, 0) as bigint) "
        "as n_assigned, cast(coalesce(r.inertia, 0) as bigint) as inertia, "
        "array_to_string(list_transform(c.cv, x -> cast(x as varchar)), "
        "',') as centroid from c2 c left join roll r using (cid)"
    )
    # trained-IVF: the ann_ivf_topk oracle with its first-8-vectors
    # centroid CTE swapped for the TRAINED chain (centroids back in
    # float units via exact double division of the micro-longs) — the
    # scoring body is byte-identical by construction
    _ivf_cents_cte = (
        "with cents as (select vec_id as cid, embedding as cv "
        "from embeddings where vec_id < 8)"
    )
    assert _ivf_cents_cte in d["ann_ivf_topk"]
    d["ann_ivf_trained_topk"] = d["ann_ivf_topk"].replace(
        _ivf_cents_cte,
        f"with {_km_chain}, "
        "cents as (select cid, list_transform(cv, "
        "x -> cast(x as double) / 1000000) as cv from c2)",
    )
    # Product quantization: 2 unrolled Lloyd iterations over all 4
    # subspaces at once, keyed (sub, cid) — identical integer arithmetic
    # to the kmeans oracle. CTEs MATERIALIZED (iterative chains inline
    # exponentially in DuckDB otherwise, as with the BPE oracle).
    _pq_d2 = (
        "cast(list_sum(list_transform(range(1, len(s.sv)+1), "
        "j -> (s.sv[j] - c.cv[j]) * (s.sv[j] - c.cv[j]))) as bigint)"
    )
    _pq_step = (
        "s{i} as materialized (select vid, sub, cid, d2, sv, "
        "row_number() over (partition by vid, sub order by d2, cid) "
        "as rn from "
        f"(select s.vid, s.sub, c.cid, {_pq_d2} as d2, s.sv "
        "from sv s join c{p} c using (sub))), "
        "a{i} as materialized (select vid, sub, cid, d2, sv from s{i} "
        "where rn = 1), "
        "u{i} as materialized (select sub, cid, t.p.i as i, "
        "cast(sum(t.p.v) as bigint) as s, "
        "cast(count(*) as bigint) as n from "
        "(select sub, cid, list_transform(sv, (x, j) -> {{'i': j, 'v': x}}) "
        "as ps from a{i}), unnest(ps) as t(p) group by sub, cid, t.p.i), "
        "nc{i} as materialized (select sub, cid, "
        "list(cast(case when s < 0 "
        "then -((-s) // n) else s // n end as bigint) order by i) "
        "as ncv from u{i} group by sub, cid), "
        "c{i} as materialized (select c.sub, c.cid, "
        "coalesce(n.ncv, c.cv) as cv from c{p} c "
        "left join nc{i} n on n.sub = c.sub and n.cid = c.cid)"
    )
    _pq_ctes = (
        "q as materialized (select cast(vec_id as bigint) as vid, "
        "list_transform(embedding, x -> cast(round(cast(x as double) "
        "* 1000000) as bigint)) as qv from embeddings), "
        "sv as materialized (select vid, sub, "
        "list_slice(qv, sub * (len(qv) // 4) + 1, "
        "(sub + 1) * (len(qv) // 4)) as sv "
        "from q, unnest(range(4)) as t(sub)), "
        "c0 as materialized (select sub, vid as cid, sv as cv "
        "from sv where vid < 8), "
        + ", ".join(_pq_step.format(i=i, p=i - 1) for i in (1, 2))
        + ", fs as materialized (select vid, sub, cid, d2, "
        "row_number() over (partition by vid, sub order by d2, cid) "
        "as rn from "
        f"(select s.vid, s.sub, c.cid, {_pq_d2} as d2, s.sv "
        "from sv s join c2 c using (sub))), "
        "fa as materialized (select vid, sub, cid, d2 from fs "
        "where rn = 1)"
    )
    d["pq_codes"] = (
        f"with {_pq_ctes} "
        "select vid, string_agg(cast(cid as varchar), ',' order by sub) "
        "as codes, cast(sum(d2) as bigint) as qerr from fa group by vid"
    )
    d["pq_adc_topk"] = (
        f"with {_pq_ctes}, "
        "qsv as (select sub, sv as qsv from sv where vid = 0), "
        "lut as materialized (select c.sub, c.cid, "
        "cast(list_sum(list_transform(range(1, len(q2.qsv)+1), "
        "j -> (q2.qsv[j] - c.cv[j]) * (q2.qsv[j] - c.cv[j]))) as bigint) "
        "as ld2 from c2 c join qsv q2 using (sub)) "
        "select fa.vid, cast(sum(l.ld2) as bigint) as ad2 from fa "
        "join lut l on l.sub = fa.sub and l.cid = fa.cid "
        "where fa.vid <> 0 group by fa.vid order by ad2, vid limit 10"
    )
    d["pq_rerank"] = (
        f"with {_pq_ctes}, "
        "qsv as (select sub, sv as qsv from sv where vid = 0), "
        "lut as materialized (select c.sub, c.cid, "
        "cast(list_sum(list_transform(range(1, len(q2.qsv)+1), "
        "j -> (q2.qsv[j] - c.cv[j]) * (q2.qsv[j] - c.cv[j]))) as bigint) "
        "as ld2 from c2 c join qsv q2 using (sub)), "
        "cand as materialized (select fa.vid, "
        "cast(sum(l.ld2) as bigint) as ad2 from fa "
        "join lut l on l.sub = fa.sub and l.cid = fa.cid "
        "where fa.vid <> 0 group by fa.vid order by ad2, vid limit 50), "
        "q0 as (select qv as q0v from q where vid = 0), "
        "ex as (select c.vid, "
        "cast(list_sum(list_transform(range(1, len(q.qv)+1), "
        "j -> (q.qv[j] - q0.q0v[j]) * (q.qv[j] - q0.q0v[j]))) as bigint) "
        "as d2 from cand c join q on q.vid = c.vid cross join q0) "
        "select vid, d2, rank from (select vid, d2, "
        "cast(row_number() over (order by d2, vid) as int) as rank "
        "from ex) where rank <= 10"
    )
    # BPE training: 8 unrolled merge rounds — pair counts over the
    # distinct word table, (cnt desc, a, b) argmax, anchored-replace
    # merge scan; DuckDB's replace() has the same left-to-right
    # non-rescanning semantics as Spark's, so the oracle replays the
    # whole training run. Every CTE is MATERIALIZED: each round
    # references its predecessor 2-3 times, so DuckDB's default CTE
    # inlining turns the 8-round chain into ~3^8 expansions of the
    # corpus scan (measured: >9 min inlined, 0.2 s materialized).
    _bpe_words = (
        "pw as materialized (select cast(doc_id as bigint) as doc_id, w from "
        "(select doc_id, unnest(string_split(lower(text), ' ')) as w "
        "from documents) where len(w) > 0), "
        "w0 as materialized (select w, cast(count(*) as bigint) as freq "
        "from pw group by w), "
        "s0 as materialized (select w, freq, "
        "array_to_string(list_transform("
        "range(1, len(w)+1), i -> substr(w, i, 1)), '  ') as seq from w0)"
    )
    _bpe_round = (
        "p{i} as materialized (select t.p[1] as a, t.p[2] as b, "
        "cast(sum(freq) as bigint) as cnt from "
        "(select freq, list_zip(syms[1:len(syms)-1], syms[2:len(syms)]) "
        "as ps from (select freq, string_split(seq, '  ') as syms "
        "from s{p})), unnest(ps) as t(p) group by a, b), "
        "b{i} as materialized (select a, b, cnt, a||b as merged, "
        "' '||a||'  '||b||' ' as pat, ' '||a||b||' ' as rep "
        "from p{i} order by cnt desc, a, b limit 1), "
        # CASE guard: when training exhausts early b{i} is empty and the
        # scalar subqueries are NULL — replace(seq, NULL, NULL) would
        # NULL-poison every word; Spark's bpe_train breaks the loop
        # instead, so an exhausted round must be a no-op here too
        "s{i} as materialized (select w, freq, case when "
        "(select pat from b{i}) is null then seq else "
        "trim(replace(' '||seq||' ', "
        "(select pat from b{i}), (select rep from b{i}))) end as seq "
        "from s{p})"
    )
    _bpe_ctes = f"{_bpe_words}, " + ", ".join(
        _bpe_round.format(i=i, p=i - 1) for i in range(1, 9)
    )
    d["bpe_train"] = (
        f"with {_bpe_ctes} "
        + " union all ".join(
            f"select cast({i} as int) as round, a, b, merged, cnt "
            f"from b{i}"
            for i in range(1, 9)
        )
    )
    # token counts read straight off the s8 chain (which carries each
    # distinct word through all 8 guarded merge rounds) — no second
    # replay of the merge application
    d["bpe_token_counts"] = (
        f"with {_bpe_ctes}, "
        "tk as (select w, cast(len(string_split(seq, '  ')) "
        "as bigint) as n_toks from s8) "
        "select pw.doc_id, cast(sum(tk.n_toks) as bigint) "
        "as n_subword_tokens, cast(count(*) as bigint) as n_words "
        "from pw join tk using (w) group by pw.doc_id"
    )
    # integer-exact doc quality (reputation.quality_milli_col): length
    # credit + mean-word-length band + stopword credit, all bigint
    _QM_SQL = (
        "qb as (select cast(doc_id as bigint) as doc_id, source, text, "
        "string_split(lower(text),' ') as words, "
        "cast(length(text) as bigint) as n_chars from documents), "
        "qm as (select doc_id, source, text, cast("
        "least(500, len(words)*5) "
        "+ (case when (n_chars - (len(words)-1)) "
        "between 3*len(words) and 10*len(words) then 300 else 0 end) "
        "+ least(200, (2000*len(list_filter(words, w -> "
        "list_contains(['the','a','of','and','to'], w)))) // len(words)) "
        "as bigint) as quality_milli from qb)"
    )
    d["host_reputation"] = (
        f"with {_QM_SQL}, "
        "th as (select doc_id, source, quality_milli, "
        "cast('0x'||substr(md5(text),1,15) as bigint) as th from qm), "
        "dim as (select source, cast(count(*) as bigint) as host_docs, "
        "cast(sum(quality_milli) // count(*) as bigint) "
        "as host_mean_quality_milli, "
        "cast((sum(case when quality_milli < 300 then 1 else 0 end) "
        "* 1000000) // count(*) as bigint) as host_low_frac_ppm, "
        "cast((count(distinct th) * 1000000) // count(*) as bigint) "
        "as host_distinct_ppm from th group by source), "
        "dd as (select *, (host_mean_quality_milli < 650 "
        "or host_low_frac_ppm > 600000 "
        "or host_distinct_ppm < 500000) as host_blocked from dim) "
        "select t.doc_id, t.source, t.quality_milli, d.host_docs, "
        "d.host_mean_quality_milli, d.host_low_frac_ppm, "
        "d.host_distinct_ppm, d.host_blocked, "
        "not d.host_blocked as kept from th t join dd d using (source)"
    )
    d["weighted_sample"] = (
        f"with {_QM_SQL}, "
        "p as (select doc_id, source, quality_milli, "
        "cast(greatest(0, least(1000000, "
        "(800000 * quality_milli) // 1000)) as bigint) as p_micro "
        "from qm) "
        "select doc_id, source, quality_milli, p_micro, "
        "(cast('0x'||substr(md5('wr4'||cast(doc_id as varchar)),1,15) "
        "as bigint) % 1000000) < p_micro as accepted from p"
    )
    # sparse tf-idf all-pairs cosine: floor-log2 fixed-point idf (the
    # shared printf('%b') idiom), exact-long dot/norms, one rounded
    # double division per pair — mirrors invindex.tfidf_cosine_topk
    d["tfidf_cosine_topk"] = (
        "with surv as (select cast(min(doc_id) as bigint) as doc_id, "
        "text from documents group by text), "
        "dw as (select doc_id, string_split(lower(text),' ') as w "
        "from surv), "
        "sh as (select doc_id, array_to_string(w[i:i+2], ' ') as term "
        "from dw, unnest(range(1, greatest(len(w)-2, 1)+1)) as t(i)), "
        "tdf as (select doc_id, term, cast(count(*) as bigint) as tf "
        "from sh where length(term) > 0 group by doc_id, term), "
        "n as (select cast(count(distinct doc_id) as bigint) as nn "
        "from surv), "
        "idf as (select term, cast(length(printf('%b', "
        "(nn*nn) // (df*df))) - 1 as bigint) as idf_bits from "
        "(select term, cast(count(*) as bigint) as df from tdf "
        "group by term), n), "
        "wt as (select t.doc_id, t.term, t.tf * i.idf_bits as w "
        "from tdf t join idf i using (term) where i.idf_bits >= 1), "
        "norms as (select doc_id, cast(sum(w*w) as bigint) as n2 "
        "from wt group by doc_id), "
        "ex as (select wt.doc_id, wt.term, wt.w, norms.n2 "
        "from wt join norms using (doc_id)), "
        "pairs as (select l.doc_id as a, r.doc_id as b, "
        "cast(sum(l.w * r.w) as bigint) as dot, "
        "min(l.n2) as na2, min(r.n2) as nb2 "
        "from ex l join ex r on l.term = r.term "
        "and l.doc_id < r.doc_id group by l.doc_id, r.doc_id) "
        "select a, b, dot, round(dot / sqrt(cast(na2 as double) * "
        "cast(nb2 as double)), 6) as cos6 from pairs "
        "order by cos6 desc, a, b limit 20"
    )
    d["cdc_chunks"] = (
        "with t as (select cast(doc_id as bigint) as doc_id, "
        "string_split(lower(text),' ') as toks, "
        "len(string_split(lower(text),' ')) as n from documents), "
        "e as (select doc_id, toks, n, [j+3 for j in "
        "generate_series(0, n-4) if cast('0x'||substr(md5("
        "array_to_string(toks[j+1:j+4],' ')),1,15) as bigint) % 8 = 0] "
        "as ends from t), "
        "ef as (select doc_id, toks, n, case when len(ends)=0 or "
        "ends[len(ends)] <> n-1 then list_append(ends, n-1) else ends "
        "end as ends from e), "
        "ch as (select doc_id, [{'h': cast('0x'||substr(md5("
        "array_to_string(toks[(case when i=1 then -1 else ends[i-1] "
        "end)+2 : ends[i]+1],' ')),1,15) as bigint), "
        "'tk': cast(ends[i]-(case when i=1 then -1 else ends[i-1] end) "
        "as bigint)} for i in generate_series(1,len(ends))] as cs "
        "from ef), "
        "cx as (select doc_id, unnest(cs, recursive:=true) from ch), "
        "occ as (select h, count(*) as n_occ from cx group by h) "
        "select doc_id, cast(count(*) as bigint) as n_chunks, "
        "cast(sum(case when n_occ>=2 then 1 else 0 end) as bigint) "
        "as n_dup_chunks, "
        "cast(sum(case when n_occ>=2 then tk else 0 end) as bigint) "
        "as dup_tokens, cast(sum(tk) as bigint) as n_tokens "
        "from cx join occ using (h) group by doc_id"
    )
    d["soft404_detect"] = (
        "with p as (select 'https://h' || (user_id % 20) || '.test/' "
        "|| event_type || '/' || event_id as url, "
        "cast(case when event_id % 17 = 0 then 404 else 200 end as int) "
        "as status, "
        "case when event_id % 13 = 0 then 'error page not found on h' "
        "|| (user_id % 20) "
        "when event_id % 13 = 7 then 'maintenance window h' "
        "|| (user_id % 20) || ' please retry' "
        "when event_id % 13 = 3 then 'post ' || event_id "
        "|| ' does not exist anymore' "
        "else 'content ' || event_id || ' ' || event_type || ' on h' "
        "|| (user_id % 20) end as text from events), "
        "b as (select url, status, "
        "regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) as host, "
        "cast('0x'||substr(md5(text),1,15) as bigint) as fp, "
        "regexp_matches(lower(text), '(page not found|404 error"
        "|does not exist|no longer available|temporarily unavailable)') "
        "as phrase_hit from p), "
        "tpl as (select host, fp from b where status = 200 "
        "group by host, fp having count(distinct url) >= 5) "
        "select b.url, b.status, b.phrase_hit, "
        "(tpl.host is not null) as template_hit, "
        "(b.status = 200 and (b.phrase_hit or tpl.host is not null)) "
        "as is_soft404 "
        "from b left join tpl on b.host = tpl.host and b.fp = tpl.fp"
    )
    d["host_mirror_pairs"] = (
        "with p as (select source as host, text from documents "
        "union all select source || '-m' as host, text from documents "
        "where doc_id % 3 = 0 "
        "union all select distinct source as host, "
        "'shared boilerplate terms page' as text from documents), "
        "fps as (select distinct host, "
        "cast('0x'||substr(md5(text),1,15) as bigint) as fp from p), "
        "spread as (select fp, count(*) as nh from fps group by fp), "
        "kept as (select fps.host, fps.fp from fps join spread "
        "using (fp) where nh <= 10), "
        "sizes as (select host, cast(count(*) as bigint) as n_docs "
        "from kept group by host), "
        "pr as (select a.host as host_a, b.host as host_b, "
        "cast(count(*) as bigint) as shared_docs "
        "from kept a join kept b on a.fp = b.fp and a.host < b.host "
        "group by 1, 2 having count(*) >= 2) "
        "select host_a, host_b, shared_docs, sa.n_docs as docs_a, "
        "sb.n_docs as docs_b, "
        "cast(shared_docs * 1000000 // least(sa.n_docs, sb.n_docs) "
        "as bigint) as containment_ppm, "
        "cast(shared_docs * 1000000 // "
        "(sa.n_docs + sb.n_docs - shared_docs) as bigint) as jaccard_ppm "
        "from pr join sizes sa on pr.host_a = sa.host "
        "join sizes sb on pr.host_b = sb.host"
    )
    def _cdc_cte(src: str, pre: str) -> str:
        # DuckDB mirror of operators/chunking.chunk_structs (w=4, D=8)
        # over `src` (must expose k, txt); ends with {pre}x = one row
        # per chunk (k, h, tk)
        return (
            f"{pre}t as (select k, string_split(lower(txt),' ') as toks, "
            f"len(string_split(lower(txt),' ')) as n from {src}), "
            f"{pre}e as (select k, toks, n, [j+3 for j in "
            "generate_series(0, n-4) if cast('0x'||substr(md5("
            "array_to_string(toks[j+1:j+4],' ')),1,15) as bigint) % 8 = 0]"
            f" as ends from {pre}t), "
            f"{pre}f as (select k, toks, n, case when len(ends)=0 or "
            "ends[len(ends)] <> n-1 then list_append(ends, n-1) else ends "
            f"end as ends from {pre}e), "
            f"{pre}c as (select k, [{{'h': cast('0x'||substr(md5("
            "array_to_string(toks[(case when i=1 then -1 else ends[i-1] "
            "end)+2 : ends[i]+1],' ')),1,15) as bigint), "
            "'tk': cast(ends[i]-(case when i=1 then -1 else ends[i-1] end) "
            f"as bigint)}} for i in generate_series(1,len(ends))] as cs "
            f"from {pre}f), "
            f"{pre}x as (select k, unnest(cs, recursive:=true) from {pre}c)"
        )

    d["recrawl_delta_cost"] = (
        "with oldt as (select cast(doc_id as bigint) as k, text "
        "from documents), "
        "newt as (select k, text || ' updated section appended here' "
        "as text from oldt where k % 7 <> 0 and k % 5 = 0 "
        "union all select k, text from oldt "
        "where k % 7 <> 0 and k % 5 <> 0 "
        "union all select k + 1000000 as k, "
        "array_to_string(string_split(text,' ')[1:8],' ') || "
        "' plus brand new tail words' as text from oldt "
        "where k % 11 = 0), "
        "st as (select coalesce(o.k, nn.k) as k, "
        "case when o.k is null then 'added' "
        "when nn.k is null then 'removed' "
        "when md5(o.text) <> md5(nn.text) then 'changed' "
        "else 'unchanged' end as change, "
        "cast(case when nn.k is null then 0 else "
        "len(string_split(lower(nn.text),' ')) end as bigint) "
        "as n_tokens_new, nn.text as tn "
        "from oldt o full outer join newt nn on o.k = nn.k), "
        + _cdc_cte("(select k, text as txt from oldt)", "o")
        + ", oh as (select distinct h from ox), "
        + _cdc_cte(
            "(select k, tn as txt from st "
            "where change in ('added','changed'))",
            "nw",
        )
        + ", nwg as (select k, h, min(tk) as tk from nwx group by k, h), "
        "mo as (select h, min(k) as mk from nwg group by h), "
        "dl as (select nwg.k, cast(sum(case when oh.h is null and "
        "nwg.k = mo.mk then tk else 0 end) as bigint) as delta_tokens "
        "from nwg left join oh on nwg.h = oh.h "
        "join mo on nwg.h = mo.h group by nwg.k) "
        "select st.k as doc_id, st.change, st.n_tokens_new, "
        "cast(coalesce(dl.delta_tokens, 0) as bigint) as delta_tokens "
        "from st left join dl on st.k = dl.k"
    )
    d["contrastive_pairs"] = (
        "with base as (" + _ann_cosine_sql(10, 5) + ") "
        "select q, neighbor, cosine, rank, "
        "case when rank <= 2 then 'positive' else 'hard_negative' end "
        "as role from base"
    )
    d["span_corruption"] = (
        "with t as (select cast(doc_id as bigint) as doc_id, "
        "string_split(lower(text),' ') as toks, "
        "len(string_split(lower(text),' ')) as n, "
        "cast('0x'||substr(md5('corrupt-' || cast(doc_id as bigint)),"
        "1,15) as bigint) % 12 as phi from documents) "
        "select doc_id, cast(n as bigint) as n_tokens, "
        "cast(len([p for p in generate_series(0, n-1) "
        "if p >= phi and (p - phi) % 12 < 3]) as bigint) as n_masked, "
        "coalesce(array_to_string(list_filter([case "
        "when not (p >= phi and (p - phi) % 12 < 3) then toks[p+1] "
        "when (p - phi) % 12 = 0 then "
        "'<extra_id_' || ((p - phi) // 12) || '>' end "
        "for p in generate_series(0, n-1)], x -> x is not null), ' '), '') "
        "as input_text, "
        "coalesce(array_to_string(list_filter([case "
        "when (p >= phi and (p - phi) % 12 < 3) then "
        "(case when (p - phi) % 12 = 0 then "
        "'<extra_id_' || ((p - phi) // 12) || '> ' else '' end) "
        "|| toks[p+1] end "
        "for p in generate_series(0, n-1)], x -> x is not null), ' '), '') "
        "as targets_text from t"
    )
    d["canonical_clusters"] = (
        "with p as (select 'https://c.test/p' || event_id as url, "
        "case when event_id % 4 = 0 then "
        "'<html><head></head><body>no tag</body></html>' "
        "when event_id % 8 in (2,6) then "
        "'<html><head><link rel=\"canonical\" href=\"https://c.test/canon'"
        " || (event_id // 8) || '\"></head></html>' "
        "when event_id % 8 in (1,5) then "
        "'<html><head><link href=\"https://c.test/canon' || "
        "(event_id // 8) || '\" rel=\"canonical\"></head></html>' "
        "else '<html><head><link rel=\"canonical\" href=\"/rel' || "
        "(event_id // 8) || '\"></head></html>' end as html from events), "
        "m as (select url, coalesce(case when regexp_matches(c, "
        "'(?i)^https?://') then c end, url) as canonical_url from "
        "(select url, coalesce(nullif(regexp_extract(html, "
        "'(?i)<link[^>]*rel=[\"'']canonical[\"''][^>]*"
        "href=[\"'']([^\"'']+)[\"'']', 1), ''), "
        "nullif(regexp_extract(html, "
        "'(?i)<link[^>]*href=[\"'']([^\"'']+)[\"''][^>]*"
        "rel=[\"'']canonical[\"'']', 1), '')) "
        "as c from p)), "
        "s as (select canonical_url, cast(count(*) as bigint) as "
        "cluster_size from m group by canonical_url) "
        "select m.url, m.canonical_url, "
        "(m.url = m.canonical_url) as self_canonical, s.cluster_size "
        "from m join s using (canonical_url)"
    )
    d["resolve_redirects"] = (
        "with recursive e as (select 'https://r.test/u' || event_id "
        "as src, case when event_id % 10 < 9 then "
        "'https://r.test/u' || (event_id + 1) "
        "when (event_id // 10) % 5 = 0 then "
        "'https://r.test/u' || (event_id - 9) "
        "else 'https://r.test/t' || (event_id // 10) end as dst "
        "from events), "
        "en as (select src, min(dst) as dst from e group by src), "
        "w(src, cur, hops) as (select src, dst, 1 from en "
        "union all select w.src, en.dst, w.hops + 1 from w "
        "join en on w.cur = en.src where w.hops < 16), "
        "last as (select src, max(hops) as hops from w group by src), "
        "fin as (select w.src, w.cur, w.hops from w join last "
        "on w.src = last.src and w.hops = last.hops) "
        "select fin.src as url, fin.cur as final_url, "
        "cast(fin.hops as bigint) as hops, "
        "(en2.src is not null) as unresolved "
        "from fin left join (select distinct src from en) en2 "
        "on fin.cur = en2.src"
    )
    d["curriculum_shards"] = (
        f"with {_QM_SQL}, "
        "r as (select doc_id, quality_milli, "
        "row_number() over (order by quality_milli, doc_id) as rank, "
        "count(*) over () as total from qm) "
        "select doc_id, quality_milli, cast(rank as bigint) as rank, "
        "cast((rank-1)*8 // total as bigint) as shard from r"
    )
    h_shuf = _H60_SQL.format(s="'epoch-0-'||cast(doc_id as varchar)")
    d["shuffle_shards"] = (
        "with t as (select cast(doc_id as bigint) as doc_id, "
        "cast(len(string_split(text, ' ')) as bigint) as n_tokens, "
        f"{h_shuf} as shuffle_key from documents), "
        "c as (select doc_id, n_tokens, shuffle_key, "
        "cast(coalesce(sum(n_tokens) over (order by shuffle_key, doc_id "
        "rows between unbounded preceding and 1 preceding), 0) as bigint) "
        "as cum_before from t), "
        "tot as (select sum(n_tokens) as total from t) "
        "select doc_id, n_tokens, shuffle_key, cum_before, "
        "cast(cum_before * 8 // total as bigint) as shard from c, tot"
    )
    h_fp = _H60_SQL.format(s="media_ref")
    d["media_boilerplate"] = (
        f"{_SPANS_CTE}, "
        "occ as (select doc_id, media_ref, "
        f"cast(floor(sqrt(({h_fp}) % 64)) as bigint) as fingerprint "
        "from spans where kind='media'), "
        "freq as (select fingerprint, cast(count(distinct doc_id) as "
        "bigint) as doc_freq from occ group by fingerprint) "
        "select occ.doc_id, occ.media_ref, occ.fingerprint, "
        "freq.doc_freq, freq.doc_freq >= 60 as is_boilerplate "
        "from occ join freq using (fingerprint)"
    )
    h_snap = _H60_SQL.format(s="'snap-'||cast(doc_id as varchar)")
    d["snapshot_dedup"] = (
        "with u as (select cast(doc_id as bigint) as doc_id, text "
        "from documents union all "
        "select cast(doc_id + 1000000 as bigint), text from documents "
        "where doc_id % 7 = 0), "
        f"s as (select doc_id, text, ({h_snap}) % 4 as snapshot from u), "
        # distinct-pairs CTE, not count(distinct text): the operator
        # counts a NULL-text group as a survivor, and count(distinct)
        # would exclude it while the global CTE counts it — asymmetric
        "sg as (select distinct snapshot, text from s), "
        "nd as (select snapshot, cast(count(*) as bigint) as n_docs "
        "from s group by snapshot), "
        "scoped as (select sg.snapshot, nd.n_docs, "
        "cast(count(*) as bigint) as scoped_survivors "
        "from sg join nd using (snapshot) group by sg.snapshot, "
        "nd.n_docs), "
        "g0 as (select text, min(snapshot * 1073741824 + doc_id) as w "
        "from s group by text), "
        "g as (select w // 1073741824 as snapshot, "
        "cast(count(*) as bigint) as global_survivors from g0 "
        "group by 1) "
        "select cast(scoped.snapshot as bigint) as snapshot, "
        "scoped.n_docs, scoped.scoped_survivors, "
        "cast(coalesce(g.global_survivors, 0) as bigint) as "
        "global_survivors from scoped left join g using (snapshot)"
    )
    h_ip = _H60_SQL.format(s="host")
    d["ip_paced_admissions"] = (
        "with c as (select cast(user_id as varchar) as host, "
        "cast(event_id as varchar) as url, ts from events), "
        "d as (select host, url, ts, "
        f"'10.0.0.' || cast(({h_ip}) % 16 as varchar) as ip, "
        "epoch_ms(ts) - epoch_ms(ts) % 60000 as window_start_ms from c) "
        "select ip, host, url, ts, "
        "cast(window_start_ms as bigint) as window_start_ms, "
        "row_number() over (partition by ip, window_start_ms "
        "order by ts, url) <= 3 as admitted from d"
    )
    d["key_skew_stats"] = (
        "with pk as (select cast(user_id as varchar) as k, "
        "cast(count(*) as bigint) as cnt from events group by 1), "
        "hist as (select cnt, cast(count(*) as bigint) as nk "
        "from pk group by cnt), "
        "cum as (select h1.cnt, cast(sum(h2.nk) as bigint) as cum "
        "from hist h1 join hist h2 on h2.cnt <= h1.cnt group by h1.cnt), "
        "tot as (select cast(sum(nk) as bigint) as tot from hist), "
        "quant as (select cast(min(case when cum*100 >= 50*tot then cnt "
        "end) as bigint) as p50_key_rows, "
        "cast(min(case when cum*100 >= 99*tot then cnt end) as bigint) "
        "as p99_key_rows from cum, tot), "
        "top as (select cast(sum(cnt) as bigint) as n_rows, "
        "cast(count(*) as bigint) as n_keys, "
        "cast(max(cnt) as bigint) as max_key_rows, "
        "(select max(k) from pk where cnt = (select max(cnt) from pk)) "
        "as top_key from pk) "
        "select n_rows, n_keys, max_key_rows, p50_key_rows, "
        "p99_key_rows, top_key, "
        "cast((cast(1000 as hugeint) * max_key_rows * n_keys) // n_rows "
        "as bigint) as skew_ratio_milli, "
        "cast(greatest(1, (max_key_rows + 49) // 50) as bigint) "
        "as suggested_salt from top, quant"
    )
    d["salted_join"] = (
        "select cast(o_orderkey as bigint) as o_orderkey, "
        "cast(o_custkey as bigint) as custkey, "
        "cast(c_nationkey as bigint) as c_nationkey "
        "from orders join customer on o_custkey = c_custkey"
    )
    h_up = _H60_SQL.format(s="'up-'||cast(doc_id as varchar)")
    d["upsample_epochs"] = (
        "with t as (select cast(doc_id as bigint) as doc_id, source, "
        "case source when 'src0' then 2450 when 'src1' then 300 "
        "when 'src2' then 0 when 'src3' then 1700 else 1000 end as w, "
        f"({h_up}) % 1000 as r from documents), "
        "n as (select doc_id, source, (w // 1000 + case when r < w % "
        "1000 then 1 else 0 end) as k from t) "
        "select doc_id, source, cast(u.i as bigint) as copy_idx "
        "from n, unnest(range(k)) as u(i)"
    )
    h_dns = _H60_SQL.format(s="'dns-'||host")
    h_cache = _H60_SQL.format(s="'cache-'||host")
    h_age = _H60_SQL.format(s="'age-'||host")
    d["dns_resolve"] = (
        "with hosts as (select distinct 'h'||cast(user_id % 200 as "
        "varchar)||'.example.com' as host from events), "
        f"cache as (select host, '10.200.0.1' as cip, "
        f"1700000000000 - (({h_age}) % 7200000) as cat "
        f"from hosts where ({h_cache}) % 2 = 0), "
        "j as (select hosts.host, cache.cip, cache.cat from hosts "
        "left join cache using (host)), "
        "f as (select host, cip, cat, (cat is not null and "
        "1700000000000 - cat < 3600000) as fresh from j) "
        "select host, case when fresh then cip else "
        f"'10.'||cast(({h_dns}) % 256 as varchar)||'.'||"
        f"cast((({h_dns}) // 256) % 256 as varchar)||'.1' end as ip, "
        "cast(case when fresh then cat else 1700000000000 end "
        "as bigint) as resolved_at_ms, fresh as from_cache from f"
    )
    d["pld_budget"] = (
        "with h as (select user_id % 97 as k, user_id % 5 as m "
        "from events), "
        "p as (select 'h'||cast(k as varchar)|| (case m when 0 then "
        "'.example.co.uk' when 1 then '.github.io' when 2 then "
        "'.example.com' when 3 then '.foo.org' else "
        "'.example.com.au' end) as host, "
        # the oracle's PLD comes from the CONSTRUCTION, independently
        # of the operator's suffix-match chain
        "case m when 0 then 'example.co.uk' when 1 then "
        "'h'||cast(k as varchar)||'.github.io' when 2 then "
        "'example.com' when 3 then 'foo.org' else 'example.com.au' "
        "end as pld from h) "
        "select pld, cast(count(distinct host) as bigint) as n_hosts, "
        "cast(count(*) as bigint) as n_rows from p group by pld"
    )
    h_up2 = _H60_SQL.format(s="'up-'||cast(doc_id as varchar)")
    h_es = _H60_SQL.format(s="'epoch-0-'||key")
    d["epoch_shards"] = (
        # stage 1: the upsample CTE chain, carrying text through
        "with t as (select cast(doc_id as bigint) as doc_id, text, "
        "case source when 'src0' then 2450 when 'src1' then 300 "
        "when 'src2' then 0 when 'src3' then 1700 else 1000 end as w, "
        f"({h_up2}) % 1000 as r from documents), "
        "n as (select doc_id, text, (w // 1000 + case when r < w % "
        "1000 then 1 else 0 end) as k from t), "
        "e as (select cast(doc_id as varchar)||'#'||cast(u.i as "
        "varchar) as key, text from n, unnest(range(k)) as u(i)), "
        # stage 2: the seeded shuffle-shard chain over the copies
        "s as (select key, cast(len(string_split(text, ' ')) as "
        "bigint) as n_tokens, "
        f"{h_es} as shuffle_key from e), "
        "c as (select key, n_tokens, shuffle_key, "
        "cast(coalesce(sum(n_tokens) over (order by shuffle_key, key "
        "rows between unbounded preceding and 1 preceding), 0) as "
        "bigint) as cum_before from s), "
        "tot as (select sum(n_tokens) as total from s) "
        "select key as doc_id, n_tokens, shuffle_key, cum_before, "
        "cast(cum_before * 8 // total as bigint) as shard from c, tot"
    )
    # ---- round-5 additions --------------------------------------------
    d["warc_replay_curation"] = d["curation_verdicts"]
    h_ph = _H60_SQL.format(s="'ph-'||cast(g as varchar)")
    phash_cte = (
        "with b as (select cast(doc_id as bigint) as i, "
        "cast(doc_id as bigint) // 7 as g from documents), "
        "f as (select 'm'||cast(i as varchar) as media_ref, "
        f"xor(({h_ph}), case when i % 7 = 1 then "
        "(cast(1 as bigint) << cast(g % 59 as int)) else "
        "cast(0 as bigint) end) as phash from b)"
    )
    d["phash_neardup_pairs"] = (
        f"{phash_cte} "
        "select x.media_ref as a, y.media_ref as b, "
        "cast(bit_count(xor(x.phash, y.phash)) as int) as hamming "
        "from f x join f y on x.media_ref < y.media_ref "
        "where bit_count(xor(x.phash, y.phash)) <= 2"
    )
    d["phash_neardup_stars"] = (
        f"{phash_cte}, "
        "g as (select phash, min(media_ref) as rep from f group by phash), "
        "intra as (select rep as a, media_ref as b from f "
        "join g using (phash) where media_ref <> rep), "
        "rp as (select g1.rep as r1, g2.rep as r2 from g g1 "
        "join g g2 on g1.phash < g2.phash "
        "where bit_count(xor(g1.phash, g2.phash)) <= 2) "
        "select a, b from intra union all "
        "select least(r1, r2) as a, greatest(r1, r2) as b from rp"
    )
    d["phash_incremental"] = (
        f"{phash_cte.replace('with ', 'with recursive ', 1)}, "
        "fx as (select media_ref, phash, "
        "cast(substr(media_ref, 2) as bigint) as i from f), "
        "idx as (select * from fx where i % 2 = 0), "
        "nw as (select * from fx where i % 2 = 1), "
        "ig as (select phash, min(media_ref) as anchor from idx "
        "group by phash), "
        "ng as (select phash from nw group by phash), "
        "hits as (select n.phash, min(g.anchor) as hit from ng n "
        "join ig g on bit_count(xor(n.phash, g.phash)) <= 2 "
        "group by n.phash), "
        "surv as (select phash from ng where phash not in "
        "(select phash from hits)), "
        "und as (select x.phash as a, y.phash as b from surv x "
        "join surv y on x.phash <> y.phash "
        "and bit_count(xor(x.phash, y.phash)) <= 2), "
        "reach(v, m) as (select phash, phash from surv union "
        "select u.b, r.m from reach r join und u on u.a = r.v), "
        "comp as (select v as phash, min(m) as lbl from reach "
        "group by v), "
        "lab as (select s.phash, coalesce(c.lbl, s.phash) as lbl "
        "from surv s left join comp c on c.phash = s.phash), "
        "anch as (select l.lbl, min(n.media_ref) as anchor "
        "from nw n join lab l on n.phash = l.phash group by l.lbl) "
        "select n.media_ref, "
        "case when h.hit is not null then 'dup_of_index' "
        "when n.media_ref <> a.anchor then 'dup_of_new' "
        "else 'kept' end as verdict, "
        "case when h.hit is not null then h.hit "
        "when n.media_ref <> a.anchor then a.anchor end as match_ref "
        "from nw n left join hits h on n.phash = h.phash "
        "left join lab l on n.phash = l.phash "
        "left join anch a on a.lbl = l.lbl"
    )
    return d


def _oracle_base() -> dict[str, str]:
    en = _STOP_SQL["en"]
    return {
        "a1_status_rollup": (
            "select o_orderstatus, cast(count(*) as bigint) as n "
            "from orders group by o_orderstatus"
        ),
        "j1_anti_join_seen": (
            "select c_custkey as never_seen_key from customer "
            "where c_custkey not in (select o_custkey from orders)"
        ),
        "j2_broadcast_lookup": (
            "select r_name, cast(count(*) as bigint) as n_nations "
            "from nation join region on n_regionkey = r_regionkey group by r_name"
        ),
        "o3_rank_cap": (
            "select event_id, cast(rk as int) as rk from ("
            "select event_id, row_number() over (order by ts, event_id) as rk "
            "from events) where rk <= 100"
        ),
        "t2_window_budget": (
            "select user_id, event_id, cast(rk as int) as rk from ("
            "select user_id, event_id, row_number() over "
            "(partition by user_id order by ts, event_id) as rk from events) "
            "where rk <= 3"
        ),
        "f4_regex_filter": (
            "select source, cast(count(*) as bigint) as n from documents "
            "where regexp_matches(text, '(spark|shuffle|join)') group by source"
        ),
        "x7_content_hash": (
            "select cast(doc_id as bigint) as doc_id, md5(text) as content_md5 "
            "from documents"
        ),
        "o4_limit_union": (
            "(select doc_id, source from documents where source = 'src0' "
            "order by doc_id limit 5) union all "
            "(select doc_id, source from documents where source = 'src1' "
            "order by doc_id limit 5)"
        ),
        "s10_feed_dedup": "select distinct user_id, event_type from events",
        "a1b_pricing_rollup": (
            "select l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) as sum_qty, "
            "round(sum(l_extendedprice), 2) as sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price, "
            "cast(count(*) as bigint) as count_order "
            "from lineitem where l_shipdate <= timestamp '1998-09-02' "
            "group by l_returnflag, l_linestatus "
            "order by l_returnflag, l_linestatus"
        ),
        "x8_slugify": (
            "select cast(doc_id as bigint) as doc_id, "
            "case when s = '' then 'item' else s end as slug from ("
            "select doc_id, substr(regexp_replace(regexp_replace("
            "regexp_replace(substr(lower(text), 1, 50), '[''\"]', '', 'g'), "
            "'[^a-z0-9]+', '-', 'g'), '^-|-$', '', 'g'), 1, 120) as s "
            "from documents)"
        ),
        "x9_date_normalize": (
            "select event_id, strftime(try_strptime(case when event_id % 7 = 0 "
            "then 'not-a-date' else strftime(ts, '%Y-%m-%d %H:%M:%S') end, "
            "'%Y-%m-%d %H:%M:%S'), '%Y-%m-%dT%H:%M:%S') as iso from events"
        ),
        "x5_url_filepath": (
            "select cast(doc_id as bigint) as doc_id, "
            "concat('https://', source, '.test/docs/item-', doc_id, q) as url, "
            "concat('docs/item-', doc_id, regexp_replace(q, '[?&=]', '_', 'g'), "
            "'.md') as doc_path from (select doc_id, source, "
            "case when doc_id % 3 = 0 then '?page=1&sort=asc' else '' end as q "
            "from documents)"
        ),
        "f1_content_type_gate": (
            "select source, cast(count(*) as bigint) as n_html from ("
            "select source, case when doc_id % 4 = 0 then 'text/html; charset=utf-8' "
            "when doc_id % 4 = 1 then 'text/html' when doc_id % 4 = 2 then "
            "'application/pdf' else 'image/png' end as ct from documents) "
            "where ct like '%text/html%' group by source"
        ),
        "f5_glob_filter": (
            "select cast(doc_id as bigint) as doc_id, path from ("
            "select doc_id, concat(case when doc_id % 3 = 0 then 'docs/' "
            "when doc_id % 3 = 1 then 'guide/' else 'private/' end, 'item-', "
            "doc_id, '.', case when doc_id % 5 = 0 then 'md' "
            "when doc_id % 5 = 1 then 'html' when doc_id % 5 = 2 then 'txt' "
            "when doc_id % 5 = 3 then 'pdf' else 'md' end) as path "
            "from documents) where not regexp_matches(path, '^private/') "
            "and regexp_matches(path, '\\.(md|html)$')"
        ),
        "f6_robots_match": (
            "select cast(doc_id as bigint) as doc_id, path, "
            "not (starts_with(path, '/admin') "
            "or regexp_matches(path, '^/files/.*\\.zip') "
            "or regexp_matches(path, '^/exact$')) as allowed from ("
            "select doc_id, case when doc_id % 6 = 0 then '/admin/panel' "
            "when doc_id % 6 = 1 then '/adminx' "
            "when doc_id % 6 = 2 then '/files/a.zip' "
            "when doc_id % 6 = 3 then '/files/a.txt' "
            "when doc_id % 6 = 4 then '/exact' else '/exact/more' end as path "
            "from documents)"
        ),
        "x6_strip_html": (
            "select cast(doc_id as bigint) as doc_id, "
            "trim(regexp_replace(replace(replace(replace(replace(replace("
            "regexp_replace(regexp_replace("
            "concat('<p>', text, '</p><script>var x = 1;</script>"
            "<b>bold &amp; &lt;tagged&gt;</b>'), "
            "'<script[^>]*>.*?</script>', ' ', 'g'), '<[^>]+>', ' ', 'g'), "
            "'&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), "
            "'&#39;', ''''), '\\s+', ' ', 'g')) as plain from documents"
        ),
        "s8_inline_vs_download": (
            "select case when n_chars <= 256 then 'inline' else 'download' end "
            "as branch, cast(count(*) as bigint) as n_files, "
            "cast(sum(n_chars) as bigint) as total_bytes "
            "from documents group by 1"
        ),
        "t5_retry_backoff": (
            "select event_id, cast(event_id % 5 as int) as retries, "
            "(event_id % 5) <= 3 as retryable, "
            "cast((power(2, least(event_id % 5, 3)) - 1) * 1000 as bigint) "
            "as backoff_ms from events"
        ),
        "dedup_embedding_cosine": _embedding_neardup_sql(),
        "semdedup": _semdedup_sql(),
        "multimodal_image_meta": (
            "with m as (select cast(doc_id as bigint) as doc_id, "
            "concat('https://img.test/', doc_id, '.png') as media_ref, "
            "md5(concat('FAKEPNG:https://img.test/', doc_id, '.png')) as h "
            "from documents) "
            "select doc_id, media_ref, "
            "cast(64 + cast('0x'||substr(h,10,1) as int) * 64 as int) as width, "
            "cast(64 + cast('0x'||substr(h,12,1) as int) * 64 as int) as height, "
            "cast('0x'||substr(h,13,15) as bigint) * 8 "
            "+ cast('0x'||substr(h,28,1) as bigint) // 2 as phash from m"
        ),
        "w1_tumbling_window": (
            "select date_trunc('hour', ts) as window_start, event_type, "
            "cast(count(*) as bigint) as n_events, "
            "round(sum(value), 6) as sum_value "
            "from events group by 1, 2"
        ),
        "corpus_hash_sample": (
            "select cast(doc_id as bigint) as doc_id, source from documents "
            f"where {_H60_SQL.format(s=chr(39) + 'bench' + chr(39) + ' || cast(doc_id as varchar)')} "
            "% 1000000 < 250000"
        ),
        "corpus_split_assign": (
            "with h as (select doc_id, "
            f"{_H60_SQL.format(s=chr(39) + 's1' + chr(39) + ' || cast(doc_id as varchar)')} "
            "% 1000000 as b from documents) "
            "select cast(doc_id as bigint) as doc_id, "
            "case when b < 100000 then 'test' "
            "when b < 900000 then 'train' else 'val' end as split from h"
        ),
        "corpus_stratified_sample": (
            "with h as (select doc_id, source, "
            f"{_H60_SQL.format(s=chr(39) + 's2' + chr(39) + ' || cast(doc_id as varchar)')} "
            "as hv from documents), "
            "r as (select doc_id, source, row_number() over "
            "(partition by source order by hv, doc_id) as rk from h) "
            "select cast(doc_id as bigint) as doc_id, source from r "
            "where rk <= 20"
        ),
        "pack_sequences": (
            "with t as (select cast(doc_id as bigint) as doc_id, "
            "cast(len(regexp_split_to_array(text, '\\s+')) as bigint) as tok "
            "from documents), "
            "c as (select doc_id, tok, cast(coalesce(sum(tok) over "
            "(order by doc_id rows between unbounded preceding and 1 "
            "preceding), 0) as bigint) as cum_before from t) "
            "select doc_id, tok, cum_before, "
            "cum_before // 2048 as seq_first, "
            "(cum_before + greatest(tok, 1) - 1) // 2048 as seq_last, "
            "cum_before % 2048 as offset_in_seq, "
            "(cum_before + greatest(tok, 1) - 1) // 2048 "
            "- cum_before // 2048 + 1 as n_seqs from c"
        ),
        "spans_synthesize": (
            f"{_SPANS_CTE} "
            'select doc_id, kind, text, media_ref, "offset" from spans'
        ),
        "span_stats": (
            f"{_SPANS_CTE} "
            "select doc_id, cast(count(*) as bigint) as n_spans, "
            "cast(sum(case when kind='text' then 1 else 0 end) as bigint) "
            "as n_text, "
            "cast(sum(case when kind='media' then 1 else 0 end) as bigint) "
            "as n_media, "
            "cast(coalesce(sum(case when kind='text' then len(text) end),0) "
            "as bigint) as text_chars, "
            "round(sum(case when kind='media' then 1 else 0 end) "
            "/ count(*), 6) as media_ratio "
            "from spans group by doc_id"
        ),
        "span_rechunk": (
            f"{_SPANS_CTE}, "
            'costed as (select doc_id, "offset", kind, media_ref, '
            "case when kind='text' then len(text) else 32 end as cost "
            "from spans), "
            "cum as (select *, coalesce(sum(cost) over (partition by doc_id "
            'order by "offset" rows between unbounded preceding and 1 '
            "preceding), 0) as cumb from costed) "
            'select doc_id, "offset", kind, media_ref, '
            "cast(cumb // 512 as bigint) as chunk_id, "
            "cast(cumb % 512 as bigint) as char_start from cum"
        ),
        "span_render": (
            f"{_SPANS_CTE} "
            "select doc_id, string_agg(case when kind='text' then text "
            "else '![media]('||media_ref||')' end, chr(10)||chr(10) "
            'order by "offset") as md from spans group by doc_id'
        ),
        "decontaminate": (
            "with d as (select cast(doc_id as bigint) as doc_id, "
            "list_distinct(list_transform("
            "range(0, greatest(len(string_split(lower(text),' '))-8,0)+1), "
            "i -> array_to_string((string_split(lower(text),' '))[i+1:i+8], "
            "' '))) as sh, "
            f"{_H60_SQL.format(s=chr(39) + 'bench' + chr(39) + ' || cast(doc_id as varchar)')} "
            "% 20 = 0 as is_bench from documents), "
            "hs as (select doc_id, is_bench, "
            "cast('0x'||substr(md5(s),1,15) as bigint) as h "
            "from d, unnest(sh) as t(s)), "
            "bh as (select distinct h from hs where is_bench) "
            "select distinct doc_id from hs "
            "where not is_bench and h in (select h from bh)"
        ),
        "exact_substring_dedup": (
            "with s as (select cast(doc_id as bigint) as doc_id, "
            "string_split(lower(text), ' ') as w from documents), "
            "t0 as (select doc_id, unnest(list_transform(range(len(w)), "
            "i -> {'idx': i, 'tok': w[i+1]})) as u from s), "
            "t as (select doc_id, u.idx as idx, u.tok as tok from t0), "
            "wn0 as (select doc_id, unnest(list_transform("
            "range(greatest(len(w)-7, 0)), i -> {'pos': i, "
            "'hm': md5(array_to_string(w[i+1:i+8], ' '))})) as u "
            "from s where len(w) >= 8), "
            "wn as (select doc_id, u.pos as pos, "
            "cast('0x'||substr(u.hm,1,15) as bigint) as h1, "
            "cast('0x'||substr(u.hm,17,15) as bigint) as h2 from wn0), "
            "d as (select h1, h2 from wn group by h1, h2 "
            "having count(*) >= 2), "
            "rem as (select distinct doc_id, pos + j as idx "
            "from wn join d using (h1, h2), unnest(range(8)) as r(j)), "
            "k as (select t.* from t anti join rem "
            "using (doc_id, idx)), "
            "rb as (select doc_id, string_agg(tok, ' ' order by idx) "
            "as clean_text, cast(count(*) as bigint) as n_kept "
            "from k group by doc_id) "
            "select s.doc_id, coalesce(rb.clean_text, '') as clean_text, "
            "cast(len(s.w) as bigint) as n_tokens, "
            "cast(len(s.w) - coalesce(rb.n_kept, 0) as bigint) as n_removed "
            "from s left join rb using (doc_id)"
        ),
        "model_quality_score": (
            "with s as (select cast(doc_id as bigint) as doc_id, "
            "string_split(lower(text), ' ') as w from documents), "
            "f as (select doc_id, list_concat(w, "
            "list_transform(range(0, greatest(len(w)-1, 0)), "
            "i -> w[i+1] || '_' || w[i+2])) as feats from s), "
            "b as (select doc_id, cast(len(feats) as bigint) as n_feats, "
            "list_transform(feats, x -> "
            "cast('0x'||substr(md5(x),1,15) as bigint) % 262144) as bks "
            "from f), "
            "t as (select doc_id, n_feats, cast(list_sum(list_transform(bks, "
            "bk -> cast('0x'||substr(md5('qw' || cast(bk as varchar)),1,15) "
            "as bigint) % 2001 - 1000)) as bigint) as score_milli from b) "
            "select doc_id, n_feats, score_milli, "
            "cast(score_milli > 0 as int) as keep from t"
        ),
        "pii_redact": (
            "with d as (select cast(doc_id as bigint) as doc_id, "
            "text || ' contact u' || cast(doc_id as varchar) || "
            "'@example.org or 10.2.' || cast(doc_id % 250 as varchar) || "
            "'.9 tel +1 415 550 ' || "
            "lpad(cast(doc_id % 10000 as varchar), 4, '0') || ' end' "
            "as text from documents), "
            "s1 as (select doc_id, cast(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) as bigint) "
            "as n_emails, regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', "
            "'g') as t1 from d), "
            "s2 as (select doc_id, n_emails, "
            "cast(len(regexp_extract_all(t1, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) as bigint) "
            "as n_ipv4, regexp_replace(t1, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') "
            "as t2 from s1), "
            "s3 as (select doc_id, n_emails, n_ipv4, "
            "cast(len(regexp_extract_all(t2, '\\+\\d[\\d \\-]{5,13}\\d')) "
            "as bigint) as n_phones, regexp_replace(t2, "
            "'\\+\\d[\\d \\-]{5,13}\\d', '<PHONE>', 'g') as clean_text "
            "from s2) "
            "select doc_id, clean_text, n_emails, n_ipv4, n_phones, "
            "n_emails + n_ipv4 + n_phones as n_pii from s3"
        ),
        "span_pii_redact": (
            f"{_SPANS_CTE}, "
            "inj as (select doc_id, kind, "
            'case when "offset" = 0 then text || '
            "' contact u' || doc_id || '@example.org or 10.2.' || "
            "cast(cast(doc_id as bigint) % 250 as varchar) || "
            "'.9 tel +1 415 550 ' || "
            "lpad(cast(cast(doc_id as bigint) % 10000 as varchar), 4, '0') "
            "|| ' end' else text end as text, media_ref, \"offset\" "
            "from spans), "
            "r as (select doc_id, kind, media_ref, \"offset\", "
            "case when kind = 'text' then regexp_replace(regexp_replace("
            "regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', "
            "'g'), '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', "
            "'<IP>', 'g'), '\\+\\d[\\d \\-]{5,13}\\d', '<PHONE>', 'g') "
            "else text end as clean, "
            "case when kind = 'text' then len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "else 0 end as e, "
            "case when kind = 'text' then len(regexp_extract_all("
            "regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', "
            "'g'), '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) "
            "else 0 end as i, "
            "case when kind = 'text' then len(regexp_extract_all("
            "regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', "
            "'g'), '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', "
            "'<IP>', 'g'), '\\+\\d[\\d \\-]{5,13}\\d')) "
            "else 0 end as p from inj), "
            "g as (select doc_id, cast(sum(e) as bigint) as n_emails, "
            "cast(sum(i) as bigint) as n_ipv4, "
            "cast(sum(p) as bigint) as n_phones from r group by doc_id) "
            'select r.doc_id, r.kind, r.clean as text, r.media_ref, '
            'r."offset", g.n_emails, g.n_ipv4, g.n_phones, '
            "g.n_emails + g.n_ipv4 + g.n_phones as n_pii "
            "from r join g using (doc_id)"
        ),
        "badword_filter": (
            "with d as (select cast(doc_id as bigint) as doc_id, "
            "text || case when doc_id % 5 = 0 then ' badword' else '' end "
            "|| case when doc_id % 11 = 0 then ' nsfw nsfw' else '' end "
            "as text, source from documents), "
            "m as (select doc_id, cast(len(list_filter("
            "string_split(lower(text), ' '), t -> "
            "list_contains(['badword','slur0','slur1','nsfw'], t))) "
            "as bigint) as n_bad_words, "
            "source in ('src3','src7','src11') as blocked from d) "
            "select doc_id, n_bad_words, cast(blocked as int) "
            "as source_blocked, cast(n_bad_words = 0 and not blocked as int) "
            "as keep from m"
        ),
        "bm25_relevance": (
            "with s as (select cast(doc_id as bigint) as doc_id, "
            "list_filter(string_split(lower(text), ' '), t -> len(t) > 0) "
            "as w from documents), "
            "base as (select doc_id, cast(len(w) as bigint) as dl from s), "
            "q as (select unnest(['hash','scan','spark','window']) as term), "
            "tok as (select doc_id, unnest(w) as term from s), "
            "tf as (select doc_id, term, cast(count(*) as bigint) as tf "
            "from tok join q using (term) group by doc_id, term), "
            "dfq as (select term, cast(count(*) as bigint) as df "
            "from tf group by term), "
            "sc as (select cast(count(*) as bigint) as n_docs, "
            "cast(1000 * sum(dl) // count(*) as bigint) as avgdl_milli "
            "from base), "
            "pt as (select tf.doc_id as doc_id, "
            "cast(length(printf('%b', 2 + (2 * (n_docs - df) + 1) "
            "// (2 * df + 1))) - 1 as bigint) as idf_bits, "
            "tf.tf as tf, base.dl as dl, sc.avgdl_milli as avgdl_milli "
            "from tf join dfq using (term), sc "
            "join base on tf.doc_id = base.doc_id), "
            "ts as (select doc_id, cast(idf_bits * tf * 2200 * 1000 "
            "// (300 + (900 * (1000000 * dl // avgdl_milli)) // 1000 "
            "+ 1000 * tf) as bigint) as tsm from pt), "
            "agg as (select doc_id, cast(count(*) as bigint) as n_matched, "
            "cast(sum(tsm) as bigint) as score_milli from ts group by doc_id) "
            "select base.doc_id, base.dl, "
            "cast(coalesce(agg.n_matched, 0) as bigint) as n_matched, "
            "cast(coalesce(agg.score_milli, 0) as bigint) as score_milli "
            "from base left join agg using (doc_id)"
        ),
        "unigram_surprisal": (
            "with s as (select cast(doc_id as bigint) as doc_id, "
            "list_filter(string_split(lower(text), ' '), t -> len(t) > 0) "
            "as w from documents), "
            "pt as (select doc_id, tok, cast(count(*) as bigint) as cnt "
            "from (select doc_id, unnest(w) as tok from s) "
            "group by doc_id, tok), "
            "v as (select tok, cast(sum(cnt) as bigint) as c "
            "from pt group by tok), "
            "n as (select cast(sum(c) as bigint) as nt from v), "
            "sc as (select doc_id, cast(sum(cnt) as bigint) as n_tokens, "
            "cast(sum(cnt * (length(printf('%b', nt // c)) - 1)) as bigint) "
            "as surprisal_bits from pt join v using (tok), n "
            "group by doc_id) "
            "select s.doc_id, "
            "cast(coalesce(sc.n_tokens, 0) as bigint) as n_tokens, "
            "sc.surprisal_bits, "
            "1000 * sc.surprisal_bits // sc.n_tokens as mean_bits_milli, "
            "cast(coalesce(1000 * sc.surprisal_bits // sc.n_tokens "
            "between 1000 and 14000, false) as int) as keep "
            "from s left join sc using (doc_id)"
        ),
        "gopher_gates": (
            "with w as (select cast(doc_id as bigint) as doc_id, text, "
            "string_split(text, ' ') as words, "
            "string_split(text, chr(10)) as lines from documents), "
            "m as (select doc_id, "
            "cast(len(words) as bigint) as wc, "
            "round(list_sum(list_transform(words, x -> len(x))) "
            "/ len(words), 6) as mean_word_len, "
            "round((cast((len(text) - len(replace(text, '#', ''))) "
            "as bigint) + cast((len(text) - len(replace(text, '...', ''))) "
            "/ 3 as bigint)) / len(words), 6) as symbol_ratio, "
            "round(len(list_filter(words, x -> "
            "regexp_matches(x, '[a-zA-Z]'))) / len(words), 6) "
            "as alpha_ratio, "
            "cast(len(list_filter(['the','be','to','of','and','that',"
            "'have','with'], s -> list_contains(list_transform(words, "
            "x -> lower(x)), s))) as bigint) as stop_hits, "
            "cast(len(lines) as bigint) as n_lines, "
            "cast(len(list_filter(lines, x -> regexp_matches(x, "
            "'^\\s*[-*•]'))) as bigint) as bullets, "
            "cast(len(list_filter(lines, x -> regexp_matches(x, "
            "'(\\.\\.\\.|…)\\s*$'))) as bigint) as ellipsis_ends "
            "from w) "
            "select doc_id, wc as word_count, mean_word_len, symbol_ratio, "
            "alpha_ratio, stop_hits, "
            "cast(wc >= 50 and wc <= 100000 as int) as gate_word_count, "
            "cast(mean_word_len >= 3 and mean_word_len <= 10 as int) "
            "as gate_mean_word_len, "
            "cast(symbol_ratio <= 0.1 as int) as gate_symbol_ratio, "
            "cast(alpha_ratio >= 0.80 as int) as gate_alpha_ratio, "
            "cast(stop_hits >= 2 as int) as gate_stop_words, "
            "cast(bullets <= 0.9 * n_lines as int) as gate_bullets, "
            "cast(ellipsis_ends <= 0.3 * n_lines as int) as gate_ellipsis, "
            "cast((wc >= 50 and wc <= 100000) and "
            "(mean_word_len >= 3 and mean_word_len <= 10) and "
            "symbol_ratio <= 0.1 and alpha_ratio >= 0.80 and "
            "stop_hits >= 2 and bullets <= 0.9 * n_lines and "
            "ellipsis_ends <= 0.3 * n_lines as int) as pass_all from m"
        ),
        "repetition_gates": _repetition_oracle(),
        "source_cap": (
            "select doc_id, source, cap_rank from ("
            "select cast(doc_id as bigint) as doc_id, source, "
            "cast(row_number() over (partition by source order by "
            "cast('0x'||substr(md5(cast(doc_id as varchar)),1,15) "
            "as bigint) asc, cast(doc_id as varchar) asc) as bigint) "
            "as cap_rank from documents) where cap_rank <= 25"
        ),
        "boilerplate_filter": (
            "with b as (select cast(doc_id as bigint) as doc_id, "
            "string_split(text, ' ') as ws from documents), "
            "l as (select doc_id, list_transform("
            "generate_series(0, cast(ceil(len(ws)/8.0) as int)-1), "
            "i -> array_to_string(ws[i*8+1:i*8+8], ' ')) as lines from b), "
            "f as (select doc_id, lines, list_filter(lines, x -> "
            "length(x) >= 35 and regexp_matches(x, '[A-Za-z]') and "
            "not contains(lower(x), 'table')) as kept from l) "
            "select doc_id, coalesce(array_to_string(kept, chr(10)), '') "
            "as clean_text, "
            "cast(len(kept) as bigint) as kept_lines, "
            "cast(len(lines) as bigint) as total_lines, "
            "round(coalesce(list_sum(list_transform(kept, "
            "x -> length(x))), 0) / greatest(coalesce(list_sum("
            "list_transform(lines, x -> length(x))), 0), 1), 6) "
            "as kept_char_ratio from f"
        ),
        "snapshot_diff": (
            "with d as (select cast(doc_id as varchar) as url, text "
            "from documents), "
            "old as (select url, md5(text) as f from d), "
            "survived as (select url, md5(case when "
            f"{_H60_SQL.format(s=chr(39) + 'mod' + chr(39) + '||url')} % 7 = 0 "
            "then text||' v2' else text end) as f from d where "
            f"{_H60_SQL.format(s=chr(39) + 'del' + chr(39) + '||url')} % 10 <> 0), "
            "added as (select 'n'||url as url, md5('new '||url) as f "
            "from d where "
            f"{_H60_SQL.format(s=chr(39) + 'add' + chr(39) + '||url')} % 13 = 0), "
            "nw as (select * from survived union all select * from added) "
            "select coalesce(o.url, n.url) as url, "
            "case when o.f is null then 'added' "
            "when n.f is null then 'removed' "
            "when o.f <> n.f then 'changed' else 'unchanged' end as change "
            "from old o full outer join nw n on o.url = n.url"
        ),
        "recrawl_schedule": (
            "with h as (select 'u'||cast(event_id % 2000 as varchar) as url, "
            "ts, (event_type = 'click') as changed from events), "
            "s as (select url, cast(count(*) as bigint) as checks, "
            "cast(sum(case when changed then 1 else 0 end) as bigint) "
            "as changes, cast(max(epoch_ms(ts)) as bigint) as last_ms "
            "from h group by url) "
            "select url, checks, changes, last_ms, "
            "cast(least(2592000000, greatest(3600000, "
            "86400000 * (checks + 1) // (changes + 1))) as bigint) "
            "as interval_ms, "
            "cast(last_ms + least(2592000000, greatest(3600000, "
            "86400000 * (checks + 1) // (changes + 1))) as bigint) "
            "as next_due_ms from s"
        ),
        "link_pagerank": (
            f"with {_LG_EDGES_SQL}, "
            "deg as (select src, count(*) as deg from edges group by src), "
            "r0 as (select id, cast(1000000 as bigint) as rank from nodes), "
            "c1 as (select e.dst as id, sum(r.rank // d.deg) as s "
            "from edges e join deg d using(src) join r0 r on r.id = e.src "
            "group by e.dst), "
            "r1 as (select n.id, cast(150000 + (85 * coalesce(c.s, 0)) // 100 "
            "as bigint) as rank from nodes n left join c1 c using(id)), "
            "c2 as (select e.dst as id, sum(r.rank // d.deg) as s "
            "from edges e join deg d using(src) join r1 r on r.id = e.src "
            "group by e.dst), "
            "r2 as (select n.id, cast(150000 + (85 * coalesce(c.s, 0)) // 100 "
            "as bigint) as rank from nodes n left join c2 c using(id)), "
            "c3 as (select e.dst as id, sum(r.rank // d.deg) as s "
            "from edges e join deg d using(src) join r2 r on r.id = e.src "
            "group by e.dst), "
            "r3 as (select n.id, cast(150000 + (85 * coalesce(c.s, 0)) // 100 "
            "as bigint) as rank from nodes n left join c3 c using(id)) "
            "select id as doc_id, rank from r3"
        ),
        "anchor_text_agg": (
            f"with {_LG_EDGES_SQL}, "
            "ea as (select dst, 'a' || cast("
            "cast('0x'||substr(md5('anchor'||cast(src as varchar)||'-'"
            "||cast(dst as varchar)),1,15) as bigint) % 5 as varchar) "
            "as anchor from edges), "
            "per as (select dst, anchor, count(*) as cnt "
            "from ea group by dst, anchor), "
            "ranked as (select dst, anchor, cnt, "
            "row_number() over (partition by dst "
            "order by cnt desc, anchor asc) as rn, "
            "sum(cnt) over (partition by dst) as in_degree, "
            "count(*) over (partition by dst) as n_anchors from per) "
            "select dst, cast(in_degree as bigint) as in_degree, "
            "cast(n_anchors as bigint) as n_anchors, anchor as top_anchor, "
            "cast(cnt as bigint) as top_anchor_cnt from ranked where rn = 1"
        ),
        "dsir_importance": (
            "with w as (select cast(doc_id as bigint) as doc_id, "
            "(cast('0x'||substr(md5('dsir-t'||cast(doc_id as varchar)),1,15) "
            "as bigint) % 10) = 0 as is_target, "
            "unnest(string_split(lower(text), ' ')) as token "
            "from documents), "
            "t as (select doc_id, is_target, "
            "cast('0x'||substr(md5('dsir'||token),1,15) as bigint) % 4096 "
            "as bucket from w where len(token) > 0), "
            "db as (select doc_id, is_target, bucket, count(*) as cnt "
            "from t group by doc_id, is_target, bucket), "
            "bw as (select bucket, "
            "((coalesce(sum(cnt) filter (where is_target), 0) + 1) "
            "* 1000000) // (sum(cnt) + 1) as w from db group by bucket), "
            "scored as (select db.doc_id, "
            "cast(sum(db.cnt) as bigint) as n_tokens, "
            "cast(sum(db.cnt * bw.w) // sum(db.cnt) as bigint) as importance "
            "from db join bw using(bucket) group by db.doc_id), "
            "base as (select cast(doc_id as bigint) as doc_id, "
            "(cast('0x'||substr(md5('dsir-t'||cast(doc_id as varchar)),1,15) "
            "as bigint) % 10) = 0 as is_target from documents) "
            "select base.doc_id, base.is_target, "
            "cast(coalesce(scored.n_tokens, 0) as bigint) as n_tokens, "
            "scored.importance from base left join scored using(doc_id)"
        ),
        "media_manifest": (
            f"{_SPANS_CTE}, "
            'lagged as (select doc_id, kind, media_ref, "offset", '
            "lag(case when kind='text' then text end) over "
            '(partition by doc_id order by "offset") as caption from spans) '
            'select doc_id, media_ref, cast("offset" as bigint) as offset, '
            "caption from lagged where kind='media'"
        ),
        "t3_paced_admissions": (
            "with c as (select cast(user_id as varchar) as host, "
            "cast(event_id as varchar) as url, ts, "
            "epoch_ms(ts) - epoch_ms(ts) % 60000 as window_start_ms "
            "from events) "
            "select host, url, ts, cast(window_start_ms as bigint) "
            "as window_start_ms, "
            "row_number() over (partition by host, window_start_ms "
            "order by ts, url) <= 3 as admitted from c"
        ),
        "w2_sliding_window": (
            "with h as ("
            "select time_bucket(interval '30 minutes', ts) as window_start, "
            "event_type, value from events "
            "union all "
            "select time_bucket(interval '30 minutes', ts) "
            "- interval '30 minutes' as window_start, "
            "event_type, value from events) "
            "select window_start, event_type, "
            "cast(count(*) as bigint) as n_events, "
            "round(sum(value), 6) as sum_value "
            "from h group by 1, 2"
        ),
        "w3_sessionization": (
            "with e as (select user_id, event_id, ts, lag(ts) over "
            "(partition by user_id order by ts, event_id) as prev from events), "
            "s as (select user_id, event_id, ts, case when prev is null or "
            "epoch(ts) - epoch(prev) > 1800 then 1 else 0 end as st from e), "
            "c as (select user_id, ts, event_id, sum(st) over "
            "(partition by user_id order by ts, event_id) as session_id from s) "
            "select user_id, cast(session_id as bigint) as session_id, "
            "cast(count(*) as bigint) as n_events, min(ts) as session_start, "
            "max(ts) as session_end from c group by user_id, session_id"
        ),
        "dedup_exact": (
            "select cast(min(doc_id) as bigint) as keep_id, "
            "cast(count(*) as bigint) as n_copies from documents group by text"
        ),
        "minhash_signatures": _minhash_sql(),
        "minhash_lsh_pairs": _lsh_pairs_sql(),
        "dedup_minhash_clusters": _minhash_clusters_sql(),
        "dedup_minhash_survivors": _minhash_survivors_sql(),
        "dedup_lines": _dedup_lines_sql(),
        "dedup_incremental": _incremental_sql(),
        "vocab_topk": _vocab_topk_sql(),
        "trap_templates": _trap_templates_sql(),
        "duplicate_passages": _duplicate_passages_sql(),
        "simhash": _simhash_sql(),
        "simhash_neardup_pairs": _simhash_pairs_sql(bits=32),
        "ngram_jaccard_topk": (
            f"with sh as (select cast(doc_id as bigint) as doc_id, source, "
            f"list_transform({_SHINGLES_SQL}, s -> {_H60_SQL.format(s='s')}) "
            f"as sh from documents) "
            "select l.doc_id as a, r.doc_id as b, "
            "round(len(list_intersect(l.sh, r.sh)) / "
            "len(list_distinct(list_concat(l.sh, r.sh))), 6) as jaccard "
            "from sh l join sh r using (source) where l.doc_id < r.doc_id "
            "order by jaccard desc, a, b limit 20"
        ),
        "lang_id": _lang_id_sql(),
        "quality_score": (
            "with base as (select cast(doc_id as bigint) as doc_id, "
            "string_split(lower(text),' ') as words, length(text) as n_chars "
            "from documents), "
            "m as (select doc_id, len(words) as n_words, "
            "round((n_chars - (len(words) - 1)) / len(words), 4) as mean_word_len, "
            f"round(len(list_filter(words, w -> list_contains({en}, w))) "
            "/ len(words), 4) as stop_ratio from base) "
            "select doc_id, cast(n_words as bigint) as n_words, mean_word_len, "
            "stop_ratio, round(least(1.0, n_words/100.0) * 0.5 + "
            "(case when mean_word_len >= 3 and mean_word_len <= 10 "
            "then 0.3 else 0.0 end) + least(stop_ratio * 2.0, 0.2), 4) as quality "
            "from m"
        ),
        "token_counts": (
            "select cast(doc_id as bigint) as doc_id, "
            "cast(len(regexp_split_to_array(text, '\\s+')) as bigint) as ws_tokens, "
            "cast(ceil(n_chars / 4.0) as bigint) as bpe_est from documents"
        ),
        "fingerprints": (
            f"with sh as (select cast(doc_id as bigint) as doc_id, "
            f"{_SHINGLES_SQL} as sh from documents) "
            f"select doc_id, cast(len(sh) as bigint) as n_shingles, "
            f"list_min(list_transform(sh, s -> {_H60_SQL.format(s='s')})) as min_fp "
            f"from sh"
        ),
        "ann_cosine_topk": _ann_cosine_sql(),
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_ivf_topk": _ann_ivf_sql(),
        # crawl_documents / crawl_seen_order: the crawl itself is an
        # iterative self-referential dataflow (not SQL-expressible), so the
        # oracle is a COMMITTED GOLDEN generated from the plain-Python
        # sequential reference semantics (tests/make_golden.py; independent
        # of the Spark engine) on the same deterministic CRAWL_FIXTURE.
        # tests/test_spark_entry_golden.py regenerates the golden every test
        # run and fails on drift, so these rows stay a real oracle.
        "crawl_documents": (
            f"select * from read_parquet('{GOLDEN_DIR}/crawl_documents.parquet')"
        ),
        "crawl_seen_order": (
            f"select * from read_parquet('{GOLDEN_DIR}/crawl_seen_order.parquet')"
        ),
    }
