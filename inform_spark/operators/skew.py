"""Key-skew diagnosis and the salted-join rewrite.

At 100 TB every shuffle is keyed, and one hot key (a host farm, a
boilerplate fingerprint, a NULL-ish default) turns a 1000-task stage
into a 999-idle-tasks stage. The engine handles its own known hot
paths (salted per-host pre-rank in plans/crawl.py, star pairs in
textops, two-phase distincts) — this module exports the GENERIC tools:

- :func:`key_skew_stats` — measure the key distribution of any keyed
  relation BEFORE choosing a join/agg strategy: exact max/median/p99
  per-key cardinality over the key-count histogram (window-free — the
  cumsum is a triangular self-join over distinct counts, never the
  corpus), the hottest key, the
  max/mean skew ratio, and the salting factor that would bound any
  single (key, salt) task at ``target_rows`` rows. This is the
  decision input for AQE-vs-salt-vs-broadcast.
- :func:`salted_join` — the explicit skew-join rewrite for a
  big-fact-to-small-dim equi-join whose dim is too large (or too
  mutable) to broadcast: the fact side gets a deterministic per-row
  salt, the dim side is replicated once per salt value, and the join
  key becomes (key, salt) — a hot key's rows spread over ``n_salt``
  tasks instead of one. Row-for-row equal to the plain join by
  construction (each fact row meets exactly the one dim replica
  carrying its salt); proven in tests/test_skew_ops.py.

The reference runs one Node process and never shuffles
(builder-brief scope: scale infrastructure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_skew_stats(
    df: DataFrame, key_col: str, target_rows: int = 1_000_000
) -> DataFrame:
    """One row: ``(n_rows, n_keys, max_key_rows, p50_key_rows,
    p99_key_rows, top_key, skew_ratio_milli, suggested_salt)``.

    ``skew_ratio_milli`` = 1000 * max_key_rows * n_keys / n_rows
    (max over mean, integer milli — 1000 means perfectly uniform).
    ``suggested_salt`` = ceil(max_key_rows / target_rows), floored at
    1 — the replication factor :func:`salted_join` needs so no
    (key, salt) group exceeds ``target_rows``.

    Scale: one groupBy on the key (map-side combined), then all stats
    over per-key/count HISTOGRAMS — |distinct keys| and |distinct
    count values| rows, never the corpus, and never a global window
    (the cumulative sum for the quantiles is a triangular self-join
    over the count histogram: counts cluster hard in real key
    distributions, so that relation is tiny even at 10^9 keys). NULL
    keys count as a key (they are exactly the classic accidental hot
    key)."""
    per_key = df.groupBy(
        F.col(key_col).cast("string").alias("__k")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))

    # exact nearest-rank quantiles over the count histogram, cumsum
    # via triangular self-join (window-free; |hist| is small)
    hist = per_key.groupBy("cnt").agg(
        F.count(F.lit(1)).cast("long").alias("nk")
    )
    h1, h2 = hist.alias("h1"), hist.alias("h2")
    cum = (
        h1.join(h2, F.col("h2.cnt") <= F.col("h1.cnt"))
        .groupBy(F.col("h1.cnt").alias("cnt"))
        .agg(F.sum("h2.nk").cast("long").alias("cum"))
    )

    def q(p: int) -> Column:
        return F.min(
            F.when(F.col("cum") * 100 >= F.lit(p) * F.col("tot"), F.col("cnt"))
        ).cast("long")

    quant = cum.crossJoin(
        hist.agg(F.sum("nk").cast("long").alias("tot"))
    ).agg(
        q(50).alias("p50_key_rows"),
        q(99).alias("p99_key_rows"),
    )
    top = per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        # deterministic hottest key: struct max — lexicographically
        # largest key string among count ties
        F.max(F.struct(F.col("cnt"), F.col("__k")))["__k"].alias("top_key"),
    )
    return top.crossJoin(quant).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        "p50_key_rows",
        "p99_key_rows",
        "top_key",
        # decimal(38,0) intermediate: 1000 * max * n_keys overflows
        # int64 already at 10^9-row keys x 10^9 keys — exactly the
        # regime this diagnostic exists for (DuckDB mirrors in hugeint)
        F.expr(
            "cast((cast(1000 as decimal(38,0)) * max_key_rows * n_keys)"
            " div n_rows as bigint)"
        ).alias("skew_ratio_milli"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(
                f"(max_key_rows + {int(target_rows)} - 1) "
                f"div {int(target_rows)}"
            ).cast("long"),
        ).alias("suggested_salt"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salt: int,
    salt_src: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on column ``on`` with the fact side's
    hot keys spread over ``n_salt`` shuffle groups.

    ``salt_src`` names a fact column whose hash spreads a key's rows
    (any high-cardinality column — a url, an id); default salts on
    the whole-row hash of the fact's columns, which spreads even
    byte-identical rows only if they differ somewhere — pass an
    explicit unique column when they may not. The dim side replicates
    each row ``n_salt`` times (explode of a literal sequence — dim
    shuffle volume grows n_salt-fold, the deliberate trade against
    the fact side's hot-task wall-clock).

    ``how`` may be ``inner`` or ``left`` (outer dims would need
    dedup-after, refused explicitly). Output columns = fact columns
    then dim's non-key columns, exactly like ``fact.join(dim, on)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    if "__salt" in fact.columns or "__salt" in dim.columns:
        # the internal column would silently shadow the caller's and
        # then break the final select — refuse loudly instead
        raise ValueError(
            "salted_join reserves the column name '__salt'; rename it "
            "on the input first"
        )
    if salt_src is None:
        src = F.xxhash64(*[F.col(c) for c in fact.columns])
    elif isinstance(salt_src, str):
        src = F.xxhash64(F.col(salt_src))
    else:
        src = F.xxhash64(salt_src)
    f = fact.withColumn("__salt", F.pmod(src, F.lit(n_salt)).cast("int"))
    d = dim.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(n_salt - 1).cast("int"))
        ),
    )
    out = f.join(d, [on, "__salt"], how).drop("__salt")
    # fact columns first, then dim's non-key columns — the plain-join
    # column order, so callers can swap strategies without reselecting
    dim_cols = [c for c in dim.columns if c != on]
    return out.select(*fact.columns, *dim_cols)
