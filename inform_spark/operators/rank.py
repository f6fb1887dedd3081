"""Distributed exact global row-number — the no-partition-window killer.

A bare ``row_number().over(Window.orderBy(...))`` funnels the whole input
through ONE task (Spark logs "No Partition Defined for Window"); fine at
1k rows, a wall at a production batch of millions. This operator computes
the identical contiguous 1-based rank distributed:

1. range-repartition on the order key — partition i's keys all precede
   partition i+1's (the range partitioner gives ordered partitions),
2. ``row_number`` per partition (each task ranks only its own slice),
3. add the cumulative row count of all earlier partitions — a
   driver-side scalar per partition (≤ n_partitions rows collected),
   folded back in as a literal map lookup: no extra shuffle.

Used by the crawl engine's parent_rank (plans/crawl.py) and the O3
queue-cap oracle query (reference admission rank,
src/WebCrawler.js:553-560).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """Exact global ``row_number`` by ``order_cols``, computed distributed.

    ``order_cols`` must be a deterministic total order (ties would make
    the rank nondeterministic under ANY formulation, including the
    single-partition window this replaces).

    Returns ``(ranked_df, caches)`` — the caller unpersists ``caches``
    once the ranked output has been materialized. The input is persisted
    internally because the range partitioner SAMPLES its input: without
    the pin, the upstream plan would execute twice (sampling pass +
    shuffle pass).
    """
    spark = df.sparkSession
    n = num_partitions or max(
        2, min(spark.sparkContext.defaultParallelism, 64)
    )
    df = df.persist()
    ranked = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__local",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(*order_cols)
            ),
        )
        .persist()
    )
    counts = sorted(
        (r["__pid"], r["n"])
        for r in ranked.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    base: dict[int, int] = {}
    acc = 0
    for pid, cnt in counts:
        base[pid] = acc
        acc += cnt
    if base:
        offset = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for pid in base for x in (pid, base[pid])]
                ),
                F.col("__pid"),
            ),
            F.lit(0),
        )
    else:
        offset = F.lit(0)
    out = ranked.withColumn(
        out_col, (F.col("__local") + offset).cast("int")
    ).drop("__pid", "__local")
    return out, [df, ranked]
