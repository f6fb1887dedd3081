"""Training-sequence packing: map documents to fixed-size context windows.

Pretraining pipelines concatenate the tokenized corpus in a deterministic
document order and cut it into fixed ``seq_len`` windows ("concat then
chunk"); a document can span a window boundary. This operator computes,
for every document, WHERE its tokens land — first/last sequence index and
offset within the first sequence — from which a writer can emit the
actual packed batches per partition.

Spark-first formulation: the only global dependency is the exclusive
prefix sum of token counts in corpus order, computed with the distributed
two-phase prefix sum (operators/rank.distributed_cumsum — range
partitions + per-partition running sums + driver-folded partition bases,
never a single-partition window). Everything else is per-row integer
arithmetic in whole-stage codegen. One range shuffle total; survives any
corpus size that fits the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.rank import distributed_cumsum


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    order_cols: list[Column],
    seq_len: int = 2048,
) -> tuple[DataFrame, list[DataFrame]]:
    """Returns (packed_df, caches_to_unpersist). ``packed_df`` adds:

    - ``cum_before``: tokens in all strictly-earlier documents,
    - ``seq_first`` / ``seq_last``: first/last window index touched,
    - ``offset_in_seq``: the document's start offset inside ``seq_first``,
    - ``n_seqs``: windows spanned (1 unless the document crosses a cut).

    Empty documents (0 tokens) land at their position with
    ``seq_last == seq_first`` and ``n_seqs == 1``.
    ``order_cols`` must be a deterministic total order."""
    cum, caches = distributed_cumsum(
        docs, order_cols, value_col=token_col, out_col="cum_before"
    )
    tokens = F.col(token_col).cast("long")
    last_tok = F.col("cum_before") + F.greatest(tokens, F.lit(1)) - F.lit(1)

    # exact integer division on longs ((x - x % n) / n stays integral at
    # every step; a double `/` + cast could truncate wrong near
    # representability edges for non-pow2 seq_len)
    def idiv(x: Column, n: int) -> Column:
        return ((x - (x % F.lit(n))) / F.lit(n)).cast("long")

    out = (
        cum.withColumn("seq_first", idiv(F.col("cum_before"), seq_len))
        .withColumn("seq_last", idiv(last_tok, seq_len))
        .withColumn(
            "offset_in_seq", F.col("cum_before") % F.lit(seq_len)
        )
        .withColumn(
            "n_seqs", (F.col("seq_last") - F.col("seq_first") + 1).cast("long")
        )
    )
    return out, caches
