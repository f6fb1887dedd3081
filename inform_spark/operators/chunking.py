"""Content-defined chunking (CDC) dedup statistics.

LBFS-style rolling-window chunking (Muthitacharoen et al., SOSP'01;
the FastCDC/restic/borg family descends from it): a chunk boundary is
declared after token position ``e`` whenever the hash of the last ``w``
tokens satisfies ``h % divisor == 0``. Because boundaries are decided
by local CONTENT, not absolute offsets, an insertion near the start of
a document shifts only the chunks it touches — unlike fixed-size
blocking, where one inserted token re-keys every downstream block.

Why a crawl/training pipeline wants this: exact-hash doc dedup misses
near-identical re-fetches (a page whose byline changed), and
``exact_substring_dedup`` is span surgery — CDC chunking is the cheap
middle layer that measures *how much* of the corpus is chunk-level
redundant (re-crawled pages, mirrored sites, boilerplate tails) and
what a content-addressed store would save. The reference has no
counterpart (its dedup is whole-item id-based, src/FeedMonitor.js);
this is the storage/delta angle a 100 TB crawl needs.

Scale design:
- chunk boundaries, chunk hashes and chunk token counts are all
  computed IN-ROW with higher-order functions over the token array —
  zero shuffle, whole-stage codegen, and the chunk TEXT never leaves
  the row (only 60-bit hashes + token counts explode);
- the single shuffle is the corpus-wide ``groupBy(chunk_hash)``
  occurrence count, with map-side combine absorbing heavy hitters
  (boilerplate chunks are Zipf-heavy, partial aggregation flattens
  them);
- the per-doc rollup re-groups by doc_id: second shuffle, but of
  (doc_id, 3 longs) rows only.

Hashes are the repo-standard 60-bit md5 (`textops._h60`), DuckDB-exact;
at 60 bits a corpus would need ~10^9 DISTINCT chunks before birthday
collisions matter, and a collision here only miscounts one chunk as
duplicated (a stats error, not a span cut), so the narrower hash is
acceptable where `exact_substring_dedup` needed 120 bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60, hof_let, words_col


def chunk_structs(text_col: str = "text", w: int = 4, divisor: int = 8):
    """array<struct<h:long, tk:long>> of CDC chunks for one document —
    boundary after token e (0-based) iff H60(tokens[e-w+1..e]) % divisor
    == 0; the final token always ends the last chunk. Pure in-row HOFs,
    with let-bindings so the token array, the boundary list and the
    closed boundary list each evaluate exactly once per row."""

    def chunks_of(toks, ends_full):
        def _prev_end(i):
            # element_at(arr, 0) throws in Spark; when() evaluates
            # lazily, so the i==1 branch never touches it
            return F.when(i == 1, F.lit(-1)).otherwise(
                F.element_at(ends_full, i - 1)
            )

        return F.transform(
            F.sequence(F.lit(1), F.size(ends_full)),
            lambda i: F.struct(
                _h60(
                    F.concat_ws(
                        " ",
                        F.slice(
                            toks,
                            _prev_end(i) + 2,
                            F.element_at(ends_full, i) - _prev_end(i),
                        ),
                    )
                ).alias("h"),
                (F.element_at(ends_full, i) - _prev_end(i))
                .cast("long")
                .alias("tk"),
            ),
        )

    def with_toks(toks):
        n = F.size(toks)
        # qualifying boundary END positions (0-based), ascending by
        # construction; sequence(0, n-w) is empty when n < w
        ends = F.filter(
            F.transform(
                F.when(n >= w, F.sequence(F.lit(0), n - w)).otherwise(
                    F.array().cast("array<int>")
                ),
                lambda j: F.when(
                    F.pmod(
                        _h60(F.concat_ws(" ", F.slice(toks, j + 1, w))),
                        divisor,
                    )
                    == 0,
                    j + w - 1,
                ).otherwise(F.lit(-1)),
            ),
            lambda x: x >= 0,
        )
        # the last token always closes the final chunk
        ends_full = hof_let(
            ends,
            lambda e: F.when(
                F.coalesce(F.try_element_at(e, F.lit(-1)), F.lit(-1))
                == n - 1,
                e,
            ).otherwise(F.concat(e, F.array(n - 1))),
        )
        return hof_let(ends_full, lambda ef: chunks_of(toks, ef))

    return hof_let(words_col(text_col), with_toks)


def cdc_chunks(
    docs: DataFrame,
    w: int = 4,
    divisor: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Per-document chunk-level redundancy: ``(doc_id, n_chunks,
    n_dup_chunks, dup_tokens, n_tokens)`` where a chunk is "dup" when
    its hash occurs >= 2 times anywhere in the corpus (including twice
    within one document — both copies count, matching what a
    content-addressed store would deduplicate).

    Expected chunk length ~= divisor tokens (geometric); w sets the
    context window the boundary decision sees. Production: w=48,
    divisor=512 for ~512-token chunks; tests use tiny values so sf0.01
    docs (~30 tokens) produce multiple chunks."""
    chunks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(chunk_structs(text_col, w, divisor)).alias("c"),
    ).select("doc_id", F.col("c.h").alias("h"), F.col("c.tk").alias("tk"))
    occ = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        chunks.join(occ, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((F.col("n_occ") >= 2).cast("long")).alias("n_dup_chunks"),
            F.sum(
                F.when(F.col("n_occ") >= 2, F.col("tk")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("dup_tokens"),
            F.sum("tk").cast("long").alias("n_tokens"),
        )
    )
