"""Physical-plan audit: prove the plans are the ones we want at 100 TB.

For a handful of representative driver-contract queries, print the
formatted plan and grep it for the properties that matter at scale:

- parquet scans carry PushedFilters + a pruned ReadSchema (predicate
  pushdown / column pruning reached the scan),
- small dims join via BroadcastHashJoin (no shuffle of the fact side),
- relational sections run inside WholeStageCodegen spans,
- no CartesianProduct anywhere.

Usage: python tests/verify/plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> properties we assert on its formatted plan
AUDITS = {
    "a1b_pricing_rollup": {
        "require": ["PushedFilters: [IsNotNull(l_shipdate)",
                    "WholeStageCodegen", "HashAggregate"],
        "forbid": ["CartesianProduct"],
        # column pruning: the scan must NOT read l_comment
        "absent_in_readschema": ["l_comment"],
    },
    "f4_regex_filter": {
        "require": ["PushedFilters", "WholeStageCodegen"],
        "forbid": ["CartesianProduct"],
        "absent_in_readschema": ["n_chars"],
    },
    "j2_broadcast_lookup": {
        "require": ["BroadcastHashJoin", "BroadcastExchange"],
        "forbid": ["SortMergeJoin", "CartesianProduct"],
    },
    "ann_ivf_topk": {
        "require": ["BroadcastHashJoin"],
        "forbid": ["CartesianProduct"],
    },
    "j1_anti_join_seen": {
        "require": ["LeftAnti"],
        "forbid": ["CartesianProduct"],
    },
    # phash near-dup star form (r5 pre-collapse rewrite): band join over
    # DISTINCT phashes + hash joins only — a cross join here is the r4
    # quadratic coming back
    "phash_neardup_stars": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "phash_neardup_pairs": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    # interleaved-span rechunk: strictly narrow — in-row higher-order
    # functions only; ANY exchange means the design regressed
    "span_rechunk": {
        "require": ["codegen id"],
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # quality gates: narrow map over a two-column scan
    "gopher_gates": {
        "require": ["codegen id"],
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["source", "n_chars"],
    },
    # decontamination: benchmark side broadcast, semi-join probe, never
    # a pair materialization
    "decontaminate": {
        "require": ["BroadcastHashJoin", "LeftSemi"],
        "forbid": ["SortMergeJoin", "CartesianProduct"],
    },
    # fixed-point pagerank: aggregation-based, no cartesian anywhere
    "link_pagerank": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct"],
    },
    # anchor-text agg: two-phase aggregation only — a Window or a global
    # sort means the associative modal pick regressed
    "anchor_text_agg": {
        "require": ["HashAggregate"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
    },
    # DSIR importance: bucket weights must come back via broadcast, and
    # nothing may sort or window — pure aggregation pipeline
    "dsir_importance": {
        "require": ["HashAggregate", "BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning",
                   "SortMergeJoin"],
    },
    "snapshot_diff": {
        "require": ["FullOuter"],
        "forbid": ["CartesianProduct"],
    },
    # repetition gates: the whole point is the shuffle-free fold — any
    # Exchange means the sorted-fold design regressed to explode/groupBy
    "repetition_gates": {
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # per-source cap: exactly one exchange (hash on source for the
    # window); a global sort or a second shuffle is a regression
    "source_cap": {
        "require": ["Window", "hashpartitioning(source"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["text"],
    },
    "boilerplate_filter": {
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # global line dedup: two hash shuffles, never a global sort; only
    # doc_id+text read
    "dedup_lines": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang"],
    },
    # top-k vocabulary: TakeOrdered (per-partition k then merge), never a
    # global sort; text is the only column read
    "vocab_topk": {
        "require": ["TakeOrderedAndProject"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["doc_id", "source", "lang", "n_chars"],
    },
    # cluster resolution: the iterative part is localCheckpoint-ed; the
    # visible tail must still be joins/aggregates, never a cartesian or
    # global sort
    "dedup_minhash_clusters": {
        "forbid": ["CartesianProduct", "rangepartitioning"],
    },
    "dedup_incremental": {
        "forbid": ["CartesianProduct", "rangepartitioning"],
    },
    # PII scrub: pure narrow regexp chain — ANY exchange is a regression;
    # only doc_id+text may be read
    "pii_redact": {
        "require": ["codegen id"],
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # blocklist gate: word check in-row; the domain dim must broadcast
    "badword_filter": {
        "require": ["BroadcastHashJoin"],
        "forbid": ["SortMergeJoin", "CartesianProduct", "Window"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # span-local PII scrub: in-row higher-order functions over the spans
    # array — ANY exchange is a regression; only doc_id+text may be read
    "span_pii_redact": {
        "require": ["codegen id"],
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # curation composition: the stage pipeline is aggregations + the
    # canonical-text groupBy; the blocklist dim must broadcast and
    # nothing may sort globally or windows anywhere
    "curation_verdicts": {
        "require": ["HashAggregate", "BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
    },
    # simhash hamming pairs: band equi-join only — never an all-pairs
    # product; hamming verify is in-row codegen
    "simhash_neardup_pairs": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
    },
    # SemDeDup: centroids broadcast (assignment map-side), pair join is
    # a cell equi-join — never a corpus-wide cartesian; survivor pick is
    # an aggregation, no range partitioning anywhere
    # (min(struct) compiles to SortAggregate — per-partition sort, not a
    # range repartition — so only the join/partitioning shape is pinned)
    "semdedup": {
        "require": ["BroadcastHashJoin"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
    },
    # BM25 relevance: the query dim and all stats dims must broadcast;
    # pure aggregation pipeline — no window, no sort anywhere
    "bm25_relevance": {
        "require": ["HashAggregate", "BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # unigram surprisal: aggregation pipeline; the corpus-total scalar
    # must come in via broadcast, never a sort/window
    "unigram_surprisal": {
        "require": ["HashAggregate", "BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # ---- round 4 -------------------------------------------------------
    # subword counts: the distinct-word dictionary joins back to the
    # (doc, word) pairs — aggregation + equi-join, never a window/sort;
    # only doc_id+text may be read
    "subword_token_counts": {
        "require": ["HashAggregate"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # model lang-id: the <=4096-row weight table and the totals scalar
    # must broadcast; aggregation pipeline. (The final resurface join of
    # per-doc scores back to the doc base is a corpus-side equi-join —
    # SortMergeJoin is the right plan there, so it is not forbidden.)
    "lang_id_model": {
        "require": ["HashAggregate", "BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # URL clustering: canonicalization is map-side codegen; ONE
    # aggregation, nothing else. min(url) over strings compiles to
    # SortAggregate (variable-width buffer — per-partition sort after the
    # hash exchange, not a range repartition), so 'Aggregate' matches
    # either physical form.
    "url_canonical_cluster": {
        "require": ["Aggregate", "codegen id"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["value", "props", "ts"],
    },
    # normalized-paragraph dedup: same two-hash-shuffle shape as
    # dedup_lines, never a global sort
    "ccnet_paragraph_dedup": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang"],
    },
    # crawl budgets: one groupBy(source) + the 1-row value total crossed
    # in by broadcast
    "domain_crawl_budget": {
        "require": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # text normalization: pure narrow replace/regexp chain — ANY
    # exchange is a regression
    "text_normalize": {
        "require": ["codegen id"],
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["source", "lang"],
    },
    # pagination stitching: one boundary equi-join, one row per doc per
    # side — never an all-pairs product, no window
    "suffix_prefix_overlap": {
        "forbid": ["CartesianProduct", "Window", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # mixture sampling: per-source dims broadcast back, acceptance is
    # narrow hash arithmetic
    "corpus_mix_sample": {
        "require": ["HashAggregate", "BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # bigram LM band: aggregation pipeline, corpus-total via broadcast;
    # vocab joins are corpus-side equi-joins (SMJ is correct there)
    "bigram_surprisal": {
        "require": ["HashAggregate", "BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # WARC serialization: the record-build leg is pure codegen (the
    # parser is a deliberate mapInPandas); one groupBy shard — no
    # window, no product, and the scan must not read doc metadata
    "warc_roundtrip": {
        "require": ["WholeStageCodegen", "HashAggregate"],
        "forbid": ["Window", "CartesianProduct"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # CDX index: per-shard window over record lengths is the DESIGN
    # (bounded rows per shard) — but never a corpus-global sort, and
    # the record column build stays codegen
    "warc_cdx_index": {
        "require": ["WholeStageCodegen", "Window"],
        "forbid": ["CartesianProduct", "GlobalLimit", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # publish manifest: ONE hash aggregation with map-side combine —
    # no join, no window
    "corpus_publish_manifest": {
        "require": ["HashAggregate", "WholeStageCodegen"],
        "forbid": ["Window", "CartesianProduct", "SortMergeJoin",
                   "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # graded decontamination: benchmark shingle set BROADCASTS; the
    # per-doc count is a hash agg — no pair materialization, no window
    "decontaminate_fraction": {
        "require": ["BroadcastHashJoin", "HashAggregate"],
        "forbid": ["Window", "CartesianProduct"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # HLL sketch: two hash aggs (register build + estimate), no window,
    # no sort; the events scan reads only event_id/user_id
    "hll_host_cardinality": {
        "require": ["HashAggregate"],
        "forbid": ["Window", "CartesianProduct", "Sort "],
        "absent_in_readschema": ["props", "value", "event_type"],
    },
    # positional postings: two-phase agg; the ONLY sort/window allowed
    # is the per-term cap rank (partitioned, spillable) — a global
    # rangepartitioning would mean the build regressed to a total sort
    "inverted_postings": {
        "require": ["HashAggregate", "Window"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # fixed-point trustrank: aggregation-based like pagerank
    "link_trustrank": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct"],
        "absent_in_readschema": ["text", "source", "lang", "n_chars"],
    },
    # fixed-point HITS: aggregation half-steps + broadcast 1-row max;
    # no window over the graph
    "link_hits": {
        "require": ["HashAggregate", "BroadcastExchange"],
        "forbid": ["Window", "CartesianProduct"],
        "absent_in_readschema": ["text", "source", "lang", "n_chars"],
    },
    # degree/reciprocity: equi-shuffled aggs + one semi join; never a
    # window over the edge set
    "degree_stats": {
        "require": ["HashAggregate", "LeftSemi"],
        "forbid": ["Window", "CartesianProduct"],
        "absent_in_readschema": ["text", "source", "lang", "n_chars"],
    },
    # k-means: centroids broadcast into the assignment (the n_cells-way
    # compare is a broadcast nested-loop by design — NEVER a shuffled
    # CartesianProduct of the corpus), argmin via min(struct) agg
    "kmeans_train": {
        "require": ["HashAggregate", "BroadcastExchange"],
        "forbid": ["CartesianProduct", "Window"],
    },
    # PQ encode: codebook broadcast-joined on the subspace key; argmin
    # via min(struct) agg, no window over the corpus
    "pq_codes": {
        "require": ["HashAggregate", "BroadcastExchange"],
        "forbid": ["CartesianProduct", "Window"],
    },
    # PQ ADC: LUT broadcast; global top-k as TakeOrdered, never a
    # rangepartitioned total sort of the scored corpus
    "pq_adc_topk": {
        "require": ["TakeOrderedAndProject", "BroadcastExchange"],
        "forbid": ["CartesianProduct", "rangepartitioning"],
    },
    # trained-IVF: the training chain + the IVF probe must both stay
    # broadcast-shaped; the only windows are the bounded per-key ranks
    "ann_ivf_trained_topk": {
        "require": ["BroadcastHashJoin"],
        "forbid": ["CartesianProduct"],
    },
    # CMS: counter build + probe are hash aggs; the counter table
    # broadcasts into the probe; no window anywhere
    "cms_user_frequency": {
        "require": ["HashAggregate", "BroadcastExchange"],
        "forbid": ["Window", "CartesianProduct"],
        "absent_in_readschema": ["props", "value", "event_type"],
    },
    # exact quantiles: the histogram agg comes FIRST, so the window runs
    # over distinct values, never the corpus; the scan must not read text
    "doclen_quantiles": {
        "require": ["HashAggregate", "Window"],
        "forbid": ["CartesianProduct"],
        "absent_in_readschema": ["text", "source"],
    },
    # connected components: the propagation rounds run behind
    # localCheckpoint (bounded-lineage by design), so the FINAL plan is
    # the nodes⋈labels join — what the audit can see is that the join
    # is equi-shaped and there's no window/cartesian over the graph
    "graph_components": {
        "require": ["BroadcastHashJoin"],
        "forbid": ["Window", "CartesianProduct"],
        "absent_in_readschema": ["text", "source", "lang", "n_chars"],
    },
    # host reputation: ONE host rollup (map-side combined) fanned back
    # with an explicit broadcast dim join — a SortMergeJoin here means
    # the #hosts<<#docs design regressed to shuffling the corpus twice
    "host_reputation": {
        "require": ["BroadcastHashJoin", "HashAggregate"],
        "forbid": ["SortMergeJoin", "CartesianProduct"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # weighted sampling: strictly narrow integer arithmetic — any
    # exchange means the hash-keyed decision regressed to a shuffle
    "weighted_sample": {
        "require": ["codegen id"],
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # sparse tf-idf all-pairs: shuffled-hash self-join on the term with
    # a TakeOrdered top-k — a global Sort or cartesian means the
    # sparse-join design regressed to all-pairs scoring
    "tfidf_cosine_topk": {
        "require": ["ShuffledHashJoin", "TakeOrderedAndProject"],
        "forbid": ["CartesianProduct"],
        "absent_in_readschema": ["lang", "n_chars", "source"],
    },
    # CDC chunking: boundaries/hashes/lengths computed in-row; only the
    # chunk-hash occurrence count and the doc rollup shuffle — never a
    # window, never a global sort, and the text column never shuffles
    # (only h/tk explode)
    "cdc_chunks": {
        "require": ["HashAggregate"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # soft-404: phrase signal in-row; the (host, fp) template dim is
    # HAVING-pruned tiny and must come back via broadcast — a
    # SortMergeJoin means the corpus got shuffled for a handful of
    # template groups
    "soft404_detect": {
        "require": ["BroadcastHashJoin", "HashAggregate"],
        "forbid": ["SortMergeJoin", "CartesianProduct"],
    },
    # contrastive mining: composes the exact-cosine top-k — broadcast
    # query side, never a SortMergeJoin of the corpus against 10 queries
    "contrastive_pairs": {
        "require": ["BroadcastNestedLoopJoin"],
        "forbid": ["SortMergeJoin", "rangepartitioning"],
    },
    # span corruption: strictly narrow in-row HOFs — ANY exchange means
    # the example-generation path regressed off the zero-shuffle design
    "span_corruption": {
        "require": ["codegen id"],
        "forbid": ["Exchange", "CartesianProduct"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # declared canonicals: in-row regexp extraction, one shuffle of
    # (url, canonical_url) pairs for the cluster-size fan-back — the
    # html must never be part of the shuffled columns
    "canonical_clusters": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "Window", "rangepartitioning"],
    },
    # redirect resolution: log-round pointer jumping — equi-joins and
    # aggregation only, never a cartesian or a window over the graph
    "resolve_redirects": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "Window", "rangepartitioning"],
    },
    # recrawl delta: full-outer snapshot join; unchanged/removed docs
    # pruned before any chunk explode (the filter feeds the explode)
    "recrawl_delta_cost": {
        "require": ["FullOuter", "HashAggregate"],
        "forbid": ["CartesianProduct", "Window"],
        "absent_in_readschema": ["lang", "n_chars", "source"],
    },
    # host mirror detection: fp self-join co-partitioned (never
    # cartesian), tiny host-size dims broadcast back
    "host_mirror_pairs": {
        "require": ["BroadcastHashJoin", "HashAggregate"],
        "forbid": ["CartesianProduct"],
        "absent_in_readschema": ["lang", "n_chars"],
    },
    # curriculum sharding: the rank kernel's range shuffle runs BEFORE
    # the localCheckpoint that releases the kernel's caches, so the
    # final plan is a checkpoint scan + narrow project — what the audit
    # can still prove is that no Window/global-sort machinery appears
    # downstream (the no-NTILE property); the range-shuffle design
    # itself is covered by rank.py's own audited consumers and the
    # operator's exactness tests
    "curriculum_shards": {
        "require": ["Scan ExistingRDD"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
    },
    # seeded shuffle shards: the prefix-sum kernel's ONE range shuffle
    # is visible inside the pinned cache's plan (unlike
    # curriculum_shards, whose localCheckpoint hides it) — that
    # exchange IS the design; what must never appear is Window/NTILE
    # machinery or a cartesian
    "shuffle_shards": {
        "require": ["InMemoryTableScan"],
        "forbid": ["Window", "CartesianProduct"],
    },
    # boilerplate media: two-phase exact distinct (dedup then count) +
    # fan-back join — aggregation-only, never a window or cartesian,
    # and the scan reads only what the span synthesis needs
    "media_boilerplate": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "Window", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # snapshot-scoped dedup: two hash groupBys on the text key + a
    # per-snapshot rollup join — no window, no global sort
    "snapshot_dedup": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "Window", "rangepartitioning"],
        "absent_in_readschema": ["source", "lang", "n_chars"],
    },
    # per-IP politeness: the DNS dim comes back via BROADCAST (a
    # SortMergeJoin would shuffle the whole candidate stream for a
    # host->ip lookup); the admission rank is a per-(ip, window)
    # Window — partitioned, never global
    "ip_paced_admissions": {
        "require": ["BroadcastHashJoin", "Window"],
        "forbid": ["SortMergeJoin", "CartesianProduct",
                   "rangepartitioning"],
    },
    # skew diagnosis: aggregation over histograms only — the corpus is
    # touched once by the per-key groupBy; the cumsum/quantile joins
    # run on tiny count-histogram relations (BroadcastNestedLoopJoin
    # is fine THERE, the point is no Window and no corpus cartesian)
    "key_skew_stats": {
        "require": ["HashAggregate"],
        "forbid": ["Window", "CartesianProduct", "rangepartitioning"],
    },
    # salted join: the dim replication is an in-row Generate (explode),
    # never a cartesian; no window machinery anywhere. (At sf0.01 the
    # 8x-replicated dim still broadcasts — at production sizes the same
    # plan degrades gracefully to a shuffled join on (key, salt), which
    # is exactly the rewrite's purpose.)
    "salted_join": {
        "require": ["Generate"],
        "forbid": ["CartesianProduct", "Window", "rangepartitioning"],
    },
    # fractional-epoch upsampling: strictly narrow — scan, in-row copy
    # count, sequence explode, all in ONE codegen span; any exchange
    # means the fan-out regressed to a shuffle
    "upsample_epochs": {
        "require": ["Generate", "codegen id"],
        "forbid": ["Exchange", "CartesianProduct", "Window"],
        "absent_in_readschema": ["text", "lang", "n_chars"],
    },
    # DNS resolver stage: distinct frontier hosts equi-joined against
    # the TTL cache, resolution in-row — no window, no cartesian (at
    # sf the cache side broadcasts; at 10^8 hosts it hash-shuffles on
    # host, the documented plan)
    "dns_resolve": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "Window", "rangepartitioning"],
        "absent_in_readschema": ["event_type", "value"],
    },
    # composed epoch pipeline: upsample explode + the shard kernel's
    # pinned cache — still no Window/NTILE machinery anywhere
    "epoch_shards": {
        "require": ["InMemoryTableScan"],
        "forbid": ["Window", "CartesianProduct"],
    },
    # PLD rollup: in-row suffix-chain PLD + one two-phase distinct-host
    # count — pure aggregation, the scan reads only the key column
    "pld_budget": {
        "require": ["HashAggregate"],
        "forbid": ["CartesianProduct", "Window", "rangepartitioning",
                   "Generate"],
        "absent_in_readschema": ["event_type", "value"],
    },
}


def main() -> int:
    import __spark_entry__ as entry
    from inform_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="plan-audit", master="local[4]")
    qs = entry.queries()
    failures = 0
    for name, spec in AUDITS.items():
        if only and name not in only:
            continue
        df = qs[name](spark, SF_DIR)
        # execute THIS df's own QueryExecution first (collect, not count —
        # count() builds a separate QE): with AQE the pre-execution plan is
        # `isFinalPlan=false` and carries no WholeStageCodegen ids, so a
        # codegen requirement would flakily fail on an unexecuted plan
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # final adaptive plans render codegen as `*(n)` in the tree string
        # (Spark 4's formatted mode omits the ids there) — audit both forms
        tree = df._jdf.queryExecution().executedPlan().toString()
        problems = []
        for needle in spec.get("require", []):
            if needle == "WholeStageCodegen":
                if "WholeStageCodegen" not in plan and "*(" not in tree:
                    problems.append(f"missing {needle!r}")
                continue
            if needle not in plan and needle not in tree:
                problems.append(f"missing {needle!r}")
        for needle in spec.get("forbid", []):
            if needle in plan or needle in tree:
                problems.append(f"contains {needle!r}")
        for col in spec.get("absent_in_readschema", []):
            for m in re.finditer(r"ReadSchema: (.+)", plan):
                if col in m.group(1):
                    problems.append(f"ReadSchema not pruned: reads {col!r}")
        status = "OK " if not problems else "FAIL"
        print(f"[{status}] {name}" + ("" if not problems else f" — {problems}"))
        if problems:
            failures += 1
            print(plan[:4000])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
