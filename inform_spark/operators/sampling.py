"""Deterministic corpus sampling — reproducible, engine-independent.

Training-data pipelines sample constantly (per-source mixing rates,
held-out splits, eval carve-outs) and the sample MUST be reproducible
across reruns and engines — ``df.sample()`` is seeded per-partition and
changes with partitioning, so it is useless for lineage. These operators
key every decision on a cross-engine content hash instead
(``H60(s) = int(md5(s)[:15], 16)`` — the same hash the minhash/LSH family
uses, DuckDB-identical, see operators/textops.py), so the same row set is
selected no matter the cluster size, partitioning, or engine.

Scale:
- :func:`hash_sample` is NARROW — a filter on a hash of the key, no
  shuffle, pushdown-friendly; rate changes don't move earlier decisions
  (a row's fate depends only on (salt, key)).
- :func:`stratified_sample_exact` shuffles once on the stratum and ranks
  within each stratum — per-stratum windows, never a global one. Skewed
  strata are bounded by the per-stratum top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60 as h60

_DENOM = 1_000_000


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep a row iff ``H60(salt || key) % 1e6 < rate * 1e6`` — a
    deterministic Bernoulli(rate) sample, independent of partitioning.
    Nested rates are monotone per salt: rate=0.1 selects a subset of
    rate=0.2's rows under the same salt."""
    bucket = F.pmod(
        h60(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.lit(_DENOM),
    )
    return df.filter(bucket < F.lit(int(rate * _DENOM)))


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test …) by
    hash bucket; fractions must sum to ≤ 1 (remainder gets ``None``).
    Deterministic and stable under data growth: a key's split never
    changes when other rows are added."""
    bucket = F.pmod(
        h60(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.lit(_DENOM),
    )
    expr = F.lit(None).cast("string")
    hi = 0
    for name, frac in sorted(splits.items()):
        lo, hi = hi, hi + int(frac * _DENOM)
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(
            expr
        )
    return df.withColumn(out_col, expr)


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum: rank by the content
    hash within each stratum (a deterministic shuffle order) and keep the
    top n. One shuffle on the stratum; per-stratum windows."""
    hcol = h60(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(hcol.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def per_source_cap(
    df: DataFrame,
    source_col: str,
    k: int,
    key_col: str,
    salt: str = "",
    prefilter: bool = False,
) -> DataFrame:
    """Domain/source cap (RefinedWeb-style): keep at most ``k`` rows per
    source, chosen deterministically by content-hash order (the same
    cross-engine H60, so the kept set is engine- and partitioning-
    independent). Adds ``cap_rank`` (1..k within the source).

    Scale: one shuffle on the source key; per-source windows. A hot
    source (one domain = 10% of a 100 TB crawl) would make that window's
    sort huge — ``prefilter=True`` first drops hot-source rows by a
    generous hash cutoff (expected 4k survivors per hot source, so the
    sort ranks thousands, not billions), then VERIFIES exactness: any
    hot source left with fewer than min(k, count) survivors is re-ranked
    without the cutoff. The verification collect is over the hot-source
    dim only (tiny), never over rows."""
    hcol = h60(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    base = df
    if prefilter:
        counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
        hot = counts.filter(F.col("__n") > 16 * k)
        space = float(1 << 60)
        cut = hot.select(
            source_col,
            (F.lit(4.0 * k) / F.col("__n") * space).cast("long").alias("__cut"),
        )
        pruned = (
            df.join(F.broadcast(cut), source_col, "left")
            .filter(F.col("__cut").isNull() | (hcol <= F.col("__cut")))
            .drop("__cut")
        )
        surv = pruned.groupBy(source_col).agg(F.count("*").alias("__m"))
        # Drive from HOT with a left join: a hot source whose rows ALL
        # exceed the cutoff has no surv row at all (P ≈ e^(-4k) per source)
        # and an inner join would silently drop it to 0 rows; coalesce(0)
        # re-ranks it without the cutoff instead.
        short = (
            hot.withColumnRenamed("__n", "__nn")
            .join(surv, source_col, "left")
            .filter(F.coalesce(F.col("__m"), F.lit(0)) < F.least(F.col("__nn"), F.lit(k)))
        )
        short_keys = [r[source_col] for r in short.collect()]
        if short_keys:
            pruned = pruned.filter(
                ~F.col(source_col).isin(short_keys)
            ).unionByName(df.filter(F.col(source_col).isin(short_keys)))
        base = pruned
    w = Window.partitionBy(source_col).orderBy(
        hcol.asc(), F.col(key_col).cast("string").asc()
    )
    return base.withColumn("cap_rank", F.row_number().over(w)).filter(
        F.col("cap_rank") <= k
    )


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_milli_col: str,
    base_ppm: int,
    salt: str = "",
) -> DataFrame:
    """Per-row weighted Bernoulli sample — each row's acceptance rate is
    its own weight times a base rate: ``p_micro = clamp(base_ppm *
    weight_milli div 1000, 0, 1e6)``, accepted iff
    ``H60('w' || salt || key) % 1e6 < p_micro``.

    This is the quality-proportional upsampling step of mixture
    construction (DSIR / DoReMi reweighting at document granularity —
    Xie et al. 2023): a weight_milli of 1000 samples at the base rate,
    2000 at double (capped at certainty), 0 never. Like every sampler
    in this module the decision is keyed on the content hash, so it is
    exact, reproducible, and identical under any partitioning or
    engine; raising ``base_ppm`` only ever ADDS rows (monotone per
    salt), which makes staged corpus growth lineage-stable.

    Scale: completely narrow — integer arithmetic on two columns, no
    shuffle, pushdown-friendly. Returns the input plus
    ``(p_micro, accepted)`` — verdict columns, not a filter, so callers
    can audit acceptance mass per stratum before dropping rows."""
    p = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(_DENOM).cast("long"),
            F.expr(f"({base_ppm} * {weight_milli_col}) div 1000"),
        ),
    )
    bucket = F.pmod(
        h60(F.concat(F.lit(f"w{salt}"), F.col(key_col).cast("string"))),
        F.lit(_DENOM),
    )
    return df.withColumn("p_micro", p).withColumn(
        "accepted", bucket < F.col("p_micro")
    )


def corpus_mix_sample(
    docs: DataFrame,
    weights: dict[str, int],
    salt: str = "",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Static mixture sampling (The Pile / DoReMi shape, Gao et al. 2020,
    Xie et al. 2023): select a sub-corpus whose per-source TOKEN shares
    match a committed target ``weights`` map (integer milli-style
    weights; only relative size matters), scaled to the largest total
    budget every source can actually supply.

    For each source s with weight w_s (W = sum of weights):
    - T = min over s of ``tokens_s * W div w_s`` — the largest total
      token budget for which no source is oversubscribed;
    - the source's expected contribution is ``t_s = w_s * T div W``
      (<= tokens_s by construction of T);
    - a document is ACCEPTED iff
      ``H60('mix' || salt || doc_id) % 1e6 < (t_s * 1e6) div tokens_s``
      — a deterministic Bernoulli whose token-expected value hits t_s.

    Sources absent from ``weights`` are excluded (accepted = false,
    p_micro = 0) — an explicit verdict, not a dropped row. Every
    decision is integer arithmetic keyed on the content hash, so the
    selected set is identical under any partitioning or engine (the
    module contract; df.sample() cannot provide this).

    Scale: one groupBy(source) for the per-source token totals (a
    <=#sources-row dim, broadcast back), acceptance itself is narrow.
    Returns (doc_id, source, n_tokens, p_micro, accepted)."""
    w_sum = sum(weights.values())
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(source_col).alias("source"),
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "),
                lambda w: F.length(w) > 0,
            )
        )
        .cast("long")
        .alias("n_tokens"),  # empty tokens excluded (shared idiom)
    ).withColumn("w", wmap[F.col("source")].cast("long"))
    per_source = base.filter(F.col("w").isNotNull()).groupBy("source").agg(
        F.sum("n_tokens").alias("tokens_s"), F.first("w").alias("w_s")
    )
    t_budget = per_source.agg(
        F.min(F.expr(f"tokens_s * {w_sum} div w_s")).alias("T")
    )
    dim = F.broadcast(
        per_source.join(F.broadcast(t_budget)).select(
            "source",
            F.expr(
                f"((w_s * T div {w_sum}) * {_DENOM}) div tokens_s"
            ).cast("long").alias("p_micro"),
        )
    )
    return (
        base.join(dim, "source", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce("p_micro", F.lit(0)).cast("long").alias("p_micro"),
            (
                F.pmod(
                    h60(F.concat(F.lit(f"mix{salt}"), F.col("doc_id"))),
                    F.lit(_DENOM),
                )
                < F.coalesce("p_micro", F.lit(0))
            ).alias("accepted"),
        )
    )


def upsample_epochs(
    docs: DataFrame,
    epochs_milli: dict[str, int],
    salt: str = "up",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic FRACTIONAL-EPOCH upsampling — the other half of
    mixture construction: :func:`corpus_mix_sample` can only shrink a
    source toward its share; training mixes also REPEAT sources
    (LLaMA trains ~2.45 epochs of Wikipedia while CommonCrawl gets
    <1 — Touvron et al. 2023, Table 1). Source s with
    ``epochs_milli[s] = 2450`` emits 2 copies of every document plus a
    third for the deterministic 45% of documents with
    ``H60(salt || '-' || doc_id) % 1000 < 450`` — so the EXACT
    document multiset is reproducible under any partitioning or
    engine, unlike rand()-based repetition. Sources absent from the
    map default to 1000 (one epoch).

    Output: the input row repeated with ``copy_idx`` 0..k-1 (k = 0
    drops the document — an explicit down-weight-to-nothing).
    ``copy_idx`` exists so downstream seeded shuffles can place each
    copy independently (seed the shard permutation with
    ``doc_id || '#' || copy_idx``).

    Scale: completely narrow — the copy count is in-row integer
    arithmetic and the fan-out is an in-row sequence explode; no
    shuffle, no UDF. Corpus growth is exactly
    sum_s epochs_s * |s| by construction.
    """
    reserved = {"__w", "__k", "copy_idx"} & set(docs.columns)
    if reserved:
        raise ValueError(
            "upsample_epochs writes reserved columns "
            f"{sorted(reserved)} which already exist on the input "
            "(e.g. an already-upsampled frame) — rename or drop them "
            "first"
        )
    emap = F.create_map(
        *[F.lit(x) for kv in epochs_milli.items() for x in kv]
    )
    w = F.coalesce(
        emap[F.col(source_col)].cast("long"), F.lit(1000).cast("long")
    )
    r = F.pmod(
        h60(
            F.concat(
                F.lit(f"{salt}-"), F.col("doc_id").cast("string")
            )
        ),
        F.lit(1000),
    )
    k = (
        F.expr("__w div 1000")
        + F.when(r < F.pmod(F.col("__w"), F.lit(1000)), 1).otherwise(0)
    ).cast("int")
    staged = docs.withColumn("__w", w).withColumn("__k", k)
    # sequence(0, -1) would infer step -1 and emit [0, -1]; guard the
    # k == 0 case to an empty array so those documents drop cleanly
    copies = F.when(
        F.col("__k") > 0, F.sequence(F.lit(0), F.col("__k") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        staged.withColumn("copy_idx", F.explode(copies))
        .drop("__w", "__k")
        .withColumn("copy_idx", F.col("copy_idx").cast("long"))
    )
