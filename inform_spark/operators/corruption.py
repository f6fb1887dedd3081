"""Span-corruption example generation — T5/UL2-style denoising pairs.

Masked-span denoising (Raffel et al., JMLR 2020 §3.1.4) turns a clean
corpus into (input, targets) training pairs: contiguous token spans are
replaced by ``<extra_id_k>`` sentinels in the input, and the targets
list each sentinel followed by the tokens it hid. The corpus side of a
T5/UL2 pretraining pipeline runs exactly this transformation at corpus
scale; the reference has no training notion (builder-brief scope).

This is the DETERMINISTIC GRID variant: spans of length ``span_len``
every ``stride`` tokens, with a per-document phase drawn from the
document id's hash — mask rate is exactly span_len/stride in
expectation, spans never overlap by construction, and every engine
reproduces the same pairs bit-for-bit (the property i.i.d. sampling
can't give a distributed pipeline without seeding discipline; the
per-doc phase restores the cross-document decorrelation the grid would
otherwise lose). Targets carry no trailing sentinel (documented
divergence from T5's final ``<extra_id_K+1>``; add it downstream if
the trainer wants it).

Scale: pure in-row higher-order functions over the token array — zero
shuffle, zero UDF; the text column never leaves the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60, hof_let, words_col


def span_corruption_grid(
    docs: DataFrame,
    stride: int = 20,
    span_len: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_tokens, n_masked, input_text, targets_text)`` —
    position p (0-based) is masked iff p >= phase and
    ``(p - phase) % stride < span_len`` where phase =
    H60('corrupt-' || doc_id) % stride; span k starts where
    ``(p - phase) % stride == 0`` and is sentineled ``<extra_id_k>``."""
    if not 0 < span_len < stride:
        raise ValueError("need 0 < span_len < stride")
    def body(b):
        toks = b["t"]
        phase = b["ph"]
        n = F.size(toks)

        def rel(p):
            return p - phase

        def is_masked(p):
            return (p >= phase) & (F.pmod(rel(p), stride) < span_len)

        def is_start(p):
            return (p >= phase) & (F.pmod(rel(p), stride) == 0)

        def sentinel(p):
            return F.concat(
                F.lit("<extra_id_"),
                F.floor(rel(p) / stride).cast("long").cast("string"),
                F.lit(">"),
            )

        pos = F.sequence(F.lit(0), n - 1)
        input_parts = F.transform(
            pos,
            lambda p: F.when(~is_masked(p), F.element_at(toks, p + 1))
            .when(is_start(p), sentinel(p))
            .otherwise(F.lit(None).cast("string")),
        )
        target_parts = F.transform(
            pos,
            lambda p: F.when(
                is_masked(p),
                F.concat(
                    F.when(
                        is_start(p), F.concat(sentinel(p), F.lit(" "))
                    ).otherwise(F.lit("")),
                    F.element_at(toks, p + 1),
                ),
            ),
        )
        return F.struct(
            n.cast("long").alias("n_tokens"),
            F.size(F.filter(pos, is_masked)).cast("long").alias("n_masked"),
            F.concat_ws(
                " ", F.filter(input_parts, lambda x: x.isNotNull())
            ).alias("input_text"),
            F.concat_ws(
                " ", F.filter(target_parts, lambda x: x.isNotNull())
            ).alias("targets_text"),
        )

    # bind the token array and the per-doc phase ONCE per row (HOF
    # lambdas re-evaluate referenced subtrees per element otherwise —
    # the split and the md5 must not run once per token position)
    bound = hof_let(
        F.struct(
            words_col(text_col).alias("t"),
            F.pmod(
                _h60(
                    F.concat(F.lit("corrupt-"), F.col("doc_id").cast("string"))
                ),
                F.lit(stride),
            ).alias("ph"),
        ),
        body,
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        bound.alias("__o"),
    ).select(
        "doc_id",
        F.col("__o.n_tokens").alias("n_tokens"),
        F.col("__o.n_masked").alias("n_masked"),
        F.col("__o.input_text").alias("input_text"),
        F.col("__o.targets_text").alias("targets_text"),
    )
