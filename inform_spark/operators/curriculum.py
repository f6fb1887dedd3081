"""Curriculum sharding — quality-ordered contiguous training shards.

Curriculum learning (Bengio et al., ICML'09) feeds a model easy/clean
data first and hard/noisy data later; data pipelines implement it by
writing the corpus as N shards ordered by a difficulty/quality score
so the trainer can walk shard 1 -> N. The reference has no training
notion at all (builder-brief scope: LLM-data-pipeline operator).

The naive Spark form is ``ntile(N) over (order by quality)`` — a
GLOBAL window, i.e. every row through ONE partition: the exact
single-reducer collapse that dies at 100 TB. This implementation uses
the repo's distributed rank kernel (operators/rank.py: range-shuffle +
per-partition local rank + driver-side base offsets, no window
anywhere) and assigns

    shard = (rank - 1) * n_shards // total      (0-based, contiguous)

a formula chosen over SQL NTILE because it is an exact closed form of
(rank, total) — cross-engine reproducible without replicating NTILE's
front-loaded remainder distribution, and balanced to within one row.

Scale: one range shuffle (the rank kernel) + one count on the pinned
input; the order key must be a deterministic total order, so doc_id
breaks quality ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.rank import distributed_row_number
from inform_spark.operators.reputation import quality_milli_col


def curriculum_shards(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    descending: bool = False,
) -> DataFrame:
    """``(doc_id, quality_milli, rank, shard)`` — rank is the exact
    1-based global position in (quality_milli, doc_id) order
    (descending=True ranks best-first), shard the 0-based contiguous
    curriculum shard of ``n_shards``."""
    scored = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        quality_milli_col(text_col).alias("quality_milli"),
    )
    q = F.col("quality_milli").desc() if descending else F.col("quality_milli").asc()
    ranked, caches = distributed_row_number(
        scored, [q, F.col("doc_id").asc()], out_col="rank"
    )
    # honor the kernel's cache contract without handing `caches` to the
    # caller: pin the ranked output once (localCheckpoint materializes
    # eagerly and cuts the lineage back to the kernel's persisted
    # frames), then release them — no session-lifetime leak
    ranked = ranked.localCheckpoint(eager=True)
    total = ranked.count()  # scan of the checkpointed blocks only
    for c in caches:
        c.unpersist()
    out = ranked.select(
        "doc_id",
        "quality_milli",
        F.col("rank").cast("long").alias("rank"),
        # integer `div`, not float `/`: exact at any corpus size
        F.expr(
            f"cast((cast(rank as bigint) - 1) * {int(n_shards)} "
            f"div {int(total)} as bigint)"
        ).alias("shard"),
    )
    return out
