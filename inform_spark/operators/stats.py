"""Exact distributed quantiles via the value-histogram trick.

Corpus profiling (doc-length bands for Gopher-style gates, token-budget
planning, skew detection) needs per-group percentiles. The naive plan —
a rank window over the corpus — materializes a per-group TOTAL SORT of
every row: at 100 TB that is the single worst operator you can run.
``approx_percentile`` avoids it but is engine-specific (Spark's GK
sketch and DuckDB's t-digest disagree), so it can't be oracle-checked.

The scale-sound exact plan exploits that metric columns are
low-cardinality relative to the corpus (doc lengths, token counts,
scores in fixed bands — Zipf again): build a (group, value, count)
HISTOGRAM with one map-side-combined aggregation, then run the
cumulative window over DISTINCT VALUES — bounded by value cardinality,
never corpus size. The quantile is nearest-rank (the classic
definition: the smallest value whose cumulative count reaches
ceil(p/100 * n)), selected with pure integer arithmetic
(100*cum >= p*n avoids any division), so Spark and DuckDB agree
bit-for-bit and the whole thing is one shuffle + one bounded window +
one final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_quantiles(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    ps: tuple = (25, 50, 75, 90, 99),
) -> DataFrame:
    """(group, n_rows, p<p>...) — exact nearest-rank percentiles of an
    integer metric per group. NULL metric values are excluded (they
    have no rank); a group that is all-NULL disappears with them."""
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy(group_col).agg(F.sum("cnt").cast("long").alias("n"))
    j = cum.join(tot, group_col)
    aggs = [F.max("n").cast("long").alias("n_rows")]
    for p in ps:
        # nearest-rank: smallest value with cum >= ceil(p*n/100), i.e.
        # 100*cum >= p*n in exact integer arithmetic
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(int(p)) * F.col("n"),
                    F.col(value_col),
                )
            )
            .cast("long")
            .alias(f"p{int(p)}")
        )
    return j.groupBy(group_col).agg(*aggs)
