"""Repetition-based quality signals (Gopher A1.1, Rae et al. 2021).

The rules a web-corpus curation run applies after the static Gopher
gates (operators/quality.py): documents dominated by repeated lines or
repeated word n-grams are machine-generated boilerplate and get dropped.
Signals per document:

- ``top{w}_frac`` (w = 2,3,4): fraction of the document's characters
  covered by the single most frequent word w-gram (count x gram length /
  text length).  Tie-break: highest count, then lexicographically
  smallest gram — deterministic and engine-independent.
- ``dup{w}_frac`` (w = 5,8,10): fraction of characters in *duplicate*
  w-grams, first occurrence excluded: sum over grams of
  ``(count-1) * len(gram) / len(text)``.
- ``dup_line_frac`` / ``dup_line_char_frac``: fraction of lines (and of
  line characters) that are duplicates of an earlier line.

Scale design — ZERO SHUFFLE: the obvious formulation (explode grams,
``groupBy(doc_id, gram)``) shuffles every n-gram of a 100 TB corpus.
Instead each document's gram array is ``array_sort``-ed and folded once
with ``F.aggregate`` (duplicates are adjacent after the sort, so one
linear pass yields the max run length and the duplicated-character sum).
O(G log G) per row, all JVM-side, no exchange anywhere in the plan; the
operator composes with a parquet scan without breaking partitioning.
The fold's tie-break (first gram in sorted order among max-count grams)
is exactly the relational ``ORDER BY cnt DESC, gram ASC`` pick, so a
group-by SQL engine (the DuckDB oracle) reproduces every value bit-for-
bit.

Reference corpus ops context: fwdslsh/inform has no corpus-curation
stage (closest: content cleanup, src/sources/render.js); these operators
are part of the beyond-reference LLM-pipeline family (SURVEY.md §2
addendum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOP_WIDTHS = (2, 3, 4)
DUP_WIDTHS = (5, 8, 10)

# Gopher A1.1 thresholds
TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_THRESHOLDS = {5: 0.15, 8: 0.12, 10: 0.10}
DUP_LINE_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.20


def _grams(words: Column, w: int) -> Column:
    """Non-distinct word w-grams (space-joined); empty when < w words."""
    n = F.size(words)
    return F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(0), n - w),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _rep_fold(arr: Column) -> Column:
    """Linear fold over a SORTED string array. Returns
    struct(best_chars, dup_chars, dup_cnt, total):

    - best_chars = count x length of the most frequent element
      (ties: first in sorted order, i.e. lexicographically smallest)
    - dup_chars  = sum of lengths of occurrences 2..k of each element
    - dup_cnt    = number of occurrences beyond each first
    - total      = element count

    Duplicates are adjacent in a sorted array, so one pass with a
    (prev, run) accumulator computes exact group counts — the shuffle-
    free equivalent of groupBy(element).count().
    """
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_run"),
        F.lit(0).cast("long").alias("best_chars"),
        F.lit(0).cast("long").alias("dup_chars"),
        F.lit(0).cast("long").alias("dup_cnt"),
        F.lit(0).cast("long").alias("total"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1).cast("long"))
        is_dup = run >= 2
        new_best = run > acc["best_run"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(new_best, run).otherwise(acc["best_run"]).alias("best_run"),
            F.when(new_best, run * F.length(x))
            .otherwise(acc["best_chars"])
            .alias("best_chars"),
            (
                acc["dup_chars"]
                + F.when(is_dup, F.length(x).cast("long")).otherwise(F.lit(0))
            ).alias("dup_chars"),
            (
                acc["dup_cnt"] + F.when(is_dup, F.lit(1)).otherwise(F.lit(0))
            ).alias("dup_cnt"),
            (acc["total"] + 1).alias("total"),
        )

    return F.aggregate(
        arr,
        init,
        merge,
        lambda acc: F.struct(
            acc["best_chars"].alias("best_chars"),
            acc["dup_chars"].alias("dup_chars"),
            acc["dup_cnt"].alias("dup_cnt"),
            acc["total"].alias("total"),
        ),
    )


def ngram_repetition(
    docs: DataFrame,
    text_col: str = "text",
    top_widths: tuple = TOP_WIDTHS,
    dup_widths: tuple = DUP_WIDTHS,
) -> DataFrame:
    """Per-document repetition fractions over word n-grams and lines.
    Output: doc_id, n_words, top{w}_frac, dup{w}_frac, dup_line_frac,
    dup_line_char_frac — every fraction of ``length(text)`` (lines:
    of line count / line chars), rounded to 6 decimals."""
    text = F.col(text_col)
    words = F.split(F.lower(text), " ")
    nc = F.greatest(F.length(text), F.lit(1)).cast("double")

    cols = [
        F.col("doc_id"),
        F.size(words).cast("long").alias("n_words"),
    ]
    folds = {}
    for w in sorted(set(top_widths) | set(dup_widths)):
        folds[w] = _rep_fold(F.array_sort(_grams(words, w)))
    # one select materializes every fold once; fractions derive from the
    # struct fields (staged select keeps CollapseProject from re-running
    # the fold per output column)
    staged = docs.select(
        "doc_id",
        *cols[1:],
        nc.alias("__nc"),
        *[folds[w].alias(f"__f{w}") for w in sorted(folds)],
        _rep_fold(F.array_sort(F.split(text, "\n"))).alias("__fl"),
        F.aggregate(
            F.split(text, "\n"),
            F.lit(0).cast("long"),
            lambda a, ln: a + F.length(ln),
        ).alias("__line_chars"),
    )
    out = [F.col("doc_id"), F.col("n_words")]
    for w in sorted(top_widths):
        out.append(
            F.round(F.col(f"__f{w}")["best_chars"] / F.col("__nc"), 6).alias(
                f"top{w}_frac"
            )
        )
    for w in sorted(dup_widths):
        out.append(
            F.round(F.col(f"__f{w}")["dup_chars"] / F.col("__nc"), 6).alias(
                f"dup{w}_frac"
            )
        )
    fl = F.col("__fl")
    out.append(
        F.round(
            fl["dup_cnt"] / F.greatest(fl["total"], F.lit(1)), 6
        ).alias("dup_line_frac")
    )
    out.append(
        F.round(
            fl["dup_chars"]
            / F.greatest(F.col("__line_chars"), F.lit(1)),
            6,
        ).alias("dup_line_char_frac")
    )
    return staged.select(*out)


def repetition_gates(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher A1.1 repetition gates: the fractions plus one boolean per
    threshold and ``pass_all``. Narrow end-to-end."""
    rep = ngram_repetition(docs, text_col)
    gates = []
    for w in sorted(TOP_THRESHOLDS):
        gates.append(
            (F.col(f"top{w}_frac") <= TOP_THRESHOLDS[w]).alias(
                f"gate_top{w}"
            )
        )
    for w in sorted(DUP_THRESHOLDS):
        gates.append(
            (F.col(f"dup{w}_frac") <= DUP_THRESHOLDS[w]).alias(
                f"gate_dup{w}"
            )
        )
    gates.append(
        (F.col("dup_line_frac") <= DUP_LINE_FRAC_MAX).alias("gate_dup_line")
    )
    gates.append(
        (F.col("dup_line_char_frac") <= DUP_LINE_CHAR_FRAC_MAX).alias(
            "gate_dup_line_chars"
        )
    )
    with_gates = rep.select("*", *gates)
    flag_names = [
        c for c in with_gates.columns if c.startswith("gate_")
    ]
    pass_all = flag_names[0]
    expr = F.col(pass_all)
    for c in flag_names[1:]:
        expr = expr & F.col(c)
    return with_gates.withColumn("pass_all", expr)
