"""Snapshot diff + freshness-driven recrawl scheduling.

The reference crawls once and exits; a production crawler RE-crawls, and
what it recrawls first is decided by (a) what changed between the last
two snapshots and (b) each URL's observed change frequency (the classic
adaptive-revisit policy: pages that change often are revisited often —
Cho & Garcia-Molina, "Effective page refresh policies for web crawlers",
ACM TODS 2003). This module implements both halves over the engine's
snapshot tables (plans/checkpoint.SnapshotTable.read_at gives any two
document snapshots; the tombstone/invalidation API handles takedowns —
these operators decide what to fetch NEXT).

Everything is deterministic integer arithmetic (counts, epoch millis,
integer-clamped intervals) so schedules are reproducible across engines
and partitionings — a recrawl plan that changes when the cluster resizes
would make incremental crawls unauditable.

Scale:
- :func:`snapshot_diff` is ONE full-outer shuffle join on the URL key —
  at 10^10 rows, bucket both snapshot tables by ``bucket(url_hash)`` so
  the join is co-located (zero shuffle); AQE absorbs host skew here.
- :func:`change_history_stats` is a single groupBy with map-side combine.
- :func:`recrawl_schedule` is narrow arithmetic on the stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    fingerprint: str = "fingerprint",
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, fingerprints differ),
    ``unchanged``. One full-outer join on ``key``."""
    o = old.select(F.col(key).alias("__k"), F.col(fingerprint).alias("__fo"))
    n = new.select(F.col(key).alias("__k"), F.col(fingerprint).alias("__fn"))
    j = o.join(n, "__k", "full_outer")
    change = (
        F.when(F.col("__fo").isNull(), F.lit("added"))
        .when(F.col("__fn").isNull(), F.lit("removed"))
        .when(F.col("__fo") != F.col("__fn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("__k").alias(key), change.alias("change"))


def change_history_stats(
    history: DataFrame,
    key: str = "url",
    checked_col: str = "checked_at",
    changed_col: str = "changed",
) -> DataFrame:
    """Per-URL revisit statistics from a (url, checked_at, changed) log:
    total checks, observed changes, last check time (epoch ms)."""
    return history.groupBy(key).agg(
        F.count(F.lit(1)).alias("checks"),
        F.sum(F.col(changed_col).cast("long")).alias("changes"),
        # cast handles TIMESTAMP_NTZ parquet columns; the engine pins
        # spark.sql.session.timeZone=UTC (session.py) so the naive value
        # is read as UTC — identical to DuckDB's epoch_ms
        F.max(F.unix_millis(F.col(checked_col).cast("timestamp"))).alias(
            "last_ms"
        ),
    )


def recrawl_schedule(
    stats: DataFrame,
    base_interval_ms: int = 86_400_000,
    min_interval_ms: int = 3_600_000,
    max_interval_ms: int = 2_592_000_000,
) -> DataFrame:
    """Adaptive revisit interval per URL: ``base * (checks+1) div
    (changes+1)``, clamped to [min, max] — a URL that changed on every
    check converges to ~base, one that never changes backs off toward
    ``max``. Emits ``next_due_ms = last_ms + interval_ms`` for the
    frontier's admission filter. Narrow integer arithmetic."""
    interval = F.least(
        F.lit(max_interval_ms),
        F.greatest(
            F.lit(min_interval_ms),
            F.expr(
                f"{base_interval_ms} * (checks + 1) div (changes + 1)"
            ),
        ),
    ).cast("long")
    return stats.withColumn("interval_ms", interval).withColumn(
        "next_due_ms", (F.col("last_ms") + F.col("interval_ms")).cast("long")
    )


def due_now(
    schedule: DataFrame, now_ms: int, budget: int | None = None
) -> DataFrame:
    """URLs whose revisit is due at ``now_ms``, most-overdue first,
    optionally capped to a fetch budget (TakeOrdered — no global sort
    materialization)."""
    due = schedule.filter(F.col("next_due_ms") <= F.lit(now_ms))
    due = due.orderBy(F.col("next_due_ms").asc(), F.col("url").asc())
    return due.limit(budget) if budget else due


def domain_crawl_budget(
    docs: DataFrame,
    total_budget: int = 10_000,
    min_pages: int = 100,
    max_pages: int = 4_000,
    source_col: str = "source",
) -> DataFrame:
    """Per-domain page budget for the NEXT crawl round: (source, n_docs,
    n_unique_docs, n_tokens, budget_pages). The classic crawl-planning
    allocation (BUbiNG / IRLbot-style politeness budgeting): each
    domain's share of the global fetch budget is proportional to the
    VALUE it produced last round — its count of unique documents
    (exact-duplicate pages earn nothing; a domain serving one template
    under 10^6 URLs gets the floor, not 10^6 fetches) — then clamped to
    [min_pages, max_pages] so no domain starves (politeness floor) or
    monopolizes (anti-trap ceiling).

    Integer arithmetic throughout (``div`` shares, integer clamp):
    budgets are reproducible across engines and partitionings —
    a crawl plan must not change when the cluster resizes. Clamping
    happens after the proportional share, so sum(budget) can differ
    from total_budget by design (the clamp is the contract, not the
    total).

    Scale: one groupBy(source) with map-side combine over
    (source, text-hash) partials; the global value total is a 1-row
    broadcast cross. Nothing O(corpus^2), no window."""
    per_source = (
        docs.select(
            F.col(source_col).alias("source"),
            F.md5("text").alias("__h"),
            F.size(
                F.filter(
                    F.split(F.lower("text"), " "),
                    lambda w: F.length(w) > 0,
                )
            ).cast("long").alias("__tok"),  # empty tokens excluded — the
            # shared words_col + non-empty idiom, so n_tokens agrees with
            # publish_manifest / bigram_surprisal over the same corpus
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("__h").cast("long").alias("n_unique_docs"),
            F.sum("__tok").cast("long").alias("n_tokens"),
        )
    )
    total_value = per_source.agg(
        F.sum("n_unique_docs").cast("long").alias("__tv")
    )
    share = F.expr(f"(n_unique_docs * {total_budget}) div __tv").cast("long")
    budget = F.greatest(
        F.least(share, F.lit(max_pages).cast("long")),
        F.lit(min_pages).cast("long"),
    )
    return per_source.join(F.broadcast(total_value)).select(
        "source",
        "n_docs",
        "n_unique_docs",
        "n_tokens",
        budget.alias("budget_pages"),
    )


def sitemap_informed_schedule(
    schedule: DataFrame,
    inventory: DataFrame,
    url_col: str = "url",
    lastmod_col: str = "lastmod_ms",
) -> DataFrame:
    """Overlay sitemap freshness onto the adaptive schedule: when the
    site DECLARES a modification after our last check (sitemap
    ``lastmod`` > ``last_ms``), the page is due at the declared change
    time — ``next_due_ms`` drops to ``least(next_due_ms, lastmod_ms)``
    so :func:`due_now`'s most-overdue-first order surfaces it ahead of
    interval-driven revisits. URLs the sitemap doesn't cover (or whose
    declared change predates our last check) keep the adaptive
    interval untouched. This is the standard crawler freshness loop:
    sitemaps are hints, not truth, so the adaptive interval stays as
    the floor of trust — a site spamming future lastmods cannot pull
    pages EARLIER than the declared time itself, and never bumps
    ``interval_ms`` (the change-rate model is only updated by observed
    checks).

    Scale: one equi-join on url (the inventory is corpus-scale — no
    broadcast; AQE handles host skew), then narrow arithmetic.
    """
    # real inventories repeat URLs (the same page listed by two
    # urlsets); aggregate to the NEWEST declared change per url so the
    # left join can never fan one schedule row into several
    inv = (
        inventory.select(
            F.col(url_col).alias("url"),
            F.col(lastmod_col).cast("long").alias("__lastmod_ms"),
        )
        .groupBy("url")
        .agg(F.max("__lastmod_ms").alias("__lastmod_ms"))
    )
    j = schedule.join(inv, "url", "left")
    override = F.col("__lastmod_ms").isNotNull() & (
        F.col("__lastmod_ms") > F.col("last_ms")
    )
    return (
        j.withColumn("sitemap_override", override)
        .withColumn(
            "next_due_ms",
            F.when(
                override, F.least(F.col("next_due_ms"), F.col("__lastmod_ms"))
            ).otherwise(F.col("next_due_ms")),
        )
        .drop("__lastmod_ms")
    )


def recrawl_delta_cost(
    old_docs: DataFrame,
    new_docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    w: int = 4,
    divisor: int = 8,
) -> DataFrame:
    """Chunk-level storage cost of a recrawl: ``(doc_id, change,
    n_tokens_new, delta_tokens)`` for every key in either snapshot.

    Composes :func:`snapshot_diff` with content-defined chunking
    (operators/chunking): a content-addressed store pays only for NEW
    chunks, so a changed page whose edit touched one paragraph costs a
    few chunks, not the whole document — the delta a re-fetch actually
    writes. ``delta_tokens`` = tokens of the DISTINCT new-snapshot
    chunks this doc is the first (min doc_id) owner of, among chunks
    absent from the OLD snapshot's chunk set. Reuse is free in every
    direction: a paragraph moved between pages (old→new cross-doc), a
    new boilerplate chunk shared by many added pages (charged ONCE, to
    its min-id owner), and a chunk repeated within one doc — so
    ``sum(delta_tokens)`` is exactly the store's growth, never an
    overstatement.

    Scale design: the status gate prunes BEFORE the expensive chunking —
    ``unchanged`` docs (the overwhelming majority of any real recrawl)
    and ``removed`` docs never reach the chunk explode; their token
    counts come from a narrow ``size(split())``. The old snapshot
    contributes only its distinct chunk-hash set (one explode + one
    distinct), probed with a left join on h. At production scale the old
    chunk set IS the persisted index of
    ``streaming/chunkdedup.py`` — pass its table in and skip the old
    explode entirely.
    """
    from inform_spark.operators.chunking import chunk_structs

    o = old_docs.select(
        F.col(key).cast("long").alias("k"),
        F.col(text_col).alias("__to"),
    )
    n = new_docs.select(
        F.col(key).cast("long").alias("k"),
        F.col(text_col).alias("__tn"),
    )
    j = o.join(n, "k", "full_outer")
    change = (
        F.when(F.col("__to").isNull(), F.lit("added"))
        .when(F.col("__tn").isNull(), F.lit("removed"))
        .when(
            F.md5(F.col("__to")) != F.md5(F.col("__tn")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    ).alias("change")
    n_tokens_new = F.when(
        F.col("__tn").isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.lower(F.col("__tn")), " "))).cast("long")
    st = j.select(F.col("k"), change, F.col("__tn"), n_tokens_new.alias("n_tokens_new"))

    old_hashes = (
        old_docs.select(
            F.explode(chunk_structs(text_col, w, divisor)).alias("c")
        )
        .select(F.col("c.h").alias("h"))
        .distinct()
        .withColumn("__old", F.lit(True))
    )
    to_chunk = st.filter(F.col("change").isin("added", "changed"))
    new_chunks = (
        to_chunk.select(
            "k",
            F.explode(
                chunk_structs("__tn", w, divisor)
            ).alias("c"),
        )
        .select("k", F.col("c.h").alias("h"), F.col("c.tk").alias("tk"))
        # distinct per (doc, chunk): a chunk repeated in one doc stores once
        .groupBy("k", "h")
        .agg(F.min("tk").alias("tk"))
    )
    min_owner = new_chunks.groupBy("h").agg(F.min("k").alias("__mk"))
    deltas = (
        new_chunks.join(old_hashes, "h", "left")
        .join(min_owner, "h")
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("__old").isNull() & (F.col("k") == F.col("__mk")),
                    F.col("tk"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("delta_tokens")
        )
    )
    return (
        st.join(deltas, "k", "left")
        .select(
            F.col("k").alias(key),
            "change",
            "n_tokens_new",
            F.coalesce("delta_tokens", F.lit(0)).cast("long").alias("delta_tokens"),
        )
    )
