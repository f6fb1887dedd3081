"""Seeded global shuffle + token-balanced training shards.

Training pipelines write each epoch's corpus in a DIFFERENT
deterministic random order (a seeded global shuffle — e.g. the
"document-level shuffling" every LLM data pipeline performs before
sharding, cf. The Pile / GPT-3 App. A data prep), and cut it into N
shards balanced by TOKEN budget, not row count, so every data-parallel
worker reads the same number of training tokens. The reference has no
training notion (builder-brief scope: LLM-data-pipeline operator).

The naive Spark form is ``ntile(N) over (order by rand())`` — a global
single-partition window AND a nondeterministic order. This
implementation uses

- order key = 60-bit md5 of ``seed || '-' || doc_id`` (cross-engine
  reproducible, so DuckDB replays the identical permutation; a new
  seed per epoch is a fresh permutation with zero state),
- the repo's distributed prefix-sum kernel (operators/rank.py: range
  shuffle + streaming per-partition cumsum + driver-folded bases — no
  window anywhere) over the token counts in shuffled order,
- ``shard = cum_before * n_shards // total_tokens`` — an exact closed
  form that balances shards to within one document's tokens.

Scale: ONE range shuffle at any corpus size. The multiply is long
arithmetic: at 10^13 corpus tokens × 2^10 shards the product is 10^16,
three orders of magnitude inside int64; the operator raises before
overflow could occur rather than wrapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.rank import distributed_cumsum
from inform_spark.operators.textops import _h60

# cum_before * n_shards must stay inside int64
_MAX_TOKENS_TIMES_SHARDS = (1 << 62)


def seeded_shuffle_shards(
    docs: DataFrame,
    n_shards: int = 8,
    seed: str = "epoch-0",
    token_col: str | None = None,
    doc_id_col: str = "doc_id",
) -> tuple[DataFrame, list[DataFrame]]:
    """``(doc_id, n_tokens, shuffle_key, cum_before, shard)`` — the
    seeded-permutation position and token-balanced shard of every
    document.

    ``token_col`` is the per-document token count; ``None`` counts
    whitespace tokens of ``text`` (consistent with
    :func:`inform_spark.operators.textops.token_counts`; pass a
    subword count from ``operators.subword`` for training-real
    budgets). Returns ``(df, caches)`` like the rank kernel — the
    caller unpersists ``caches`` after materializing.

    Documents with 0 tokens land in the shard their position falls in
    (they cost nothing, so any shard is balanced); ties in the 60-bit
    key are broken by ``doc_id``, keeping the permutation total.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    did = F.col(doc_id_col).cast("string")
    key = _h60(F.concat(F.lit(seed), F.lit("-"), did))
    if token_col is None:
        toks = F.size(F.split(F.col("text"), " ")).cast("long")
    else:
        toks = F.col(token_col).cast("long")

    keyed = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        key.alias("shuffle_key"),
    )
    cum, caches = distributed_cumsum(
        keyed,
        [F.col("shuffle_key"), F.col("doc_id")],
        value_col="n_tokens",
        out_col="cum_before",
    )
    # total = last cum_before + its tokens; a 1-row aggregate (cheap,
    # and the kernel already materialized the input into cache)
    total_row = cum.select(
        F.coalesce(
            F.max(F.col("cum_before") + F.col("n_tokens")), F.lit(0)
        ).alias("t")
    ).collect()[0]
    total = int(total_row["t"])
    if total * n_shards >= _MAX_TOKENS_TIMES_SHARDS:
        raise ValueError(
            f"total_tokens*n_shards={total * n_shards} would overflow "
            "the int64 shard formula; reduce n_shards or shard "
            "hierarchically"
        )
    if total == 0:
        shard = F.lit(0).cast("long")
    else:
        # `div` is exact integer division on longs; a double `/` + cast
        # loses exactness past 2^53 — precisely the 100-TB token range
        shard = F.expr(
            f"(cum_before * cast({n_shards} as bigint)) div "
            f"cast({total} as bigint)"
        ).cast("long")
    out = cum.select(
        "doc_id",
        "n_tokens",
        "shuffle_key",
        "cum_before",
        shard.alias("shard"),
    )
    return out, caches
