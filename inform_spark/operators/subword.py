"""Subword (wordpiece-style) tokenization, engine-exact.

Training pipelines budget sequences in SUBWORD tokens, not whitespace
tokens (Devlin et al. 2019 "BERT" §A; whitespace counts undercount
CJK/code by 2-5x), so packing and token accounting need a tokenizer.
This module implements greedy longest-match wordpiece over a COMMITTED
deterministic vocabulary:

- a word is tokenized left to right; at each position the longest
  matching vocabulary piece wins (start pieces match at position 1,
  ``##``-prefixed continuation pieces afterwards);
- a word with no match at some position is a single ``[UNK]`` token
  (the standard wordpiece fallback);
- empty words (split artifacts) contribute zero tokens.

The walk is a pure in-row fold — ``aggregate(sequence(1, len), init,
step)`` over a struct accumulator with the vocabulary as a literal
array — so it is expressible IDENTICALLY in Spark (higher-order
functions, JVM-side) and DuckDB (list_reduce + lambdas), which is what
lets the driver hash-match the two engines. No Python UDF anywhere.

Scale design (100 TB): tokenizing every token occurrence is wasteful —
Zipf gives ~10^7 DISTINCT words against ~10^13 running tokens — so
:func:`subword_token_counts` explodes (doc, word) pairs, folds the walk
over the DISTINCT word dictionary only, and joins the per-word token
counts back (broadcast when the dictionary is small, AQE otherwise).
The fold itself is O(len(word) * |vocab|) per distinct word; the
vocabulary rides along as a literal array (a broadcast in spirit,
codegen constant in practice).

Reference scope note: the reference engine (fwdslsh/inform) has no
tokenizer; this belongs to the training-data pipeline family layered on
the crawl (SURVEY §2 extension), like packing and dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import words_col

# Committed deterministic vocabulary. Single a-z letters (start +
# continuation) guarantee any lowercase-alpha word tokenizes without
# UNK; the multi-character pieces exercise longest-match preference.
# Words containing characters outside the vocabulary (digits,
# punctuation) become [UNK]. Order is irrelevant — matching maximizes
# CORE length, never vocab position.
VOCAB: list[str] = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [
        # start pieces
        "th", "the", "ta", "wi", "va", "cu", "sp", "st", "ba", "fi",
        "so", "gr", "or", "co", "me", "li", "ke", "ro", "sc", "sl",
        "fa", "sm", "bi", "jo", "ag", "da", "qu", "ha", "pa", "key",
        "row", "val",
        # continuation pieces
        "##ble", "##ndow", "##au", "##ark", "##stomer", "##eam",
        "##tch", "##lter", "##oup", "##der", "##lumn", "##rge",
        "##ue", "##ery", "##an", "##ow", "##rt", "##ine", "##can",
        "##ort", "##ast", "##all", "##ta", "##sh", "##in", "##er",
        "##lue", "##ge", "##le", "##dow",
    ]
)


def _vocab_array() -> Column:
    return F.array(*[F.lit(p) for p in VOCAB])


def wordpiece_fold(word: Column) -> Column:
    """The greedy longest-match walk over one (non-empty) word as an
    in-row fold. Returns struct(pos, n, unk): ``n`` pieces consumed,
    ``unk`` true when some position had no matching piece (the word is
    then ONE [UNK] token regardless of ``n``)."""
    vocab_arr = _vocab_array()

    def match(pp: Column, pos: Column) -> Column:
        cont = pp.startswith("##")
        return F.when(
            pos == 1,
            (~cont) & (word.substr(pos.cast("int"), F.length(pp)) == pp),
        ).otherwise(
            cont
            & (
                word.substr(pos.cast("int"), F.length(pp) - 2)
                == pp.substr(F.lit(3), F.length(pp) - 2)
            )
        )

    def core_len(pp: Column) -> Column:
        return F.length(pp) - F.when(
            pp.startswith("##"), F.lit(2)
        ).otherwise(F.lit(0))

    def step(acc: Column, i: Column) -> Column:
        pos = acc["pos"]
        ml = F.array_max(
            F.transform(
                F.filter(vocab_arr, lambda pp: match(pp, pos)), core_len
            )
        )
        return F.when((i != pos) | acc["unk"], acc).otherwise(
            F.when(
                ml.isNull(),
                F.struct(
                    pos.alias("pos"),
                    acc["n"].alias("n"),
                    F.lit(True).alias("unk"),
                ),
            ).otherwise(
                F.struct(
                    (pos + ml).cast("long").alias("pos"),
                    (acc["n"] + 1).cast("long").alias("n"),
                    F.lit(False).alias("unk"),
                )
            )
        )

    init = F.struct(
        F.lit(1).cast("long").alias("pos"),
        F.lit(0).cast("long").alias("n"),
        F.lit(False).alias("unk"),
    )
    return F.aggregate(
        F.sequence(F.lit(1).cast("long"), F.length(word).cast("long")),
        init,
        step,
    )


def subword_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_subword_tokens, n_unk_words) per document.

    The fold runs over DISTINCT words only (the Zipf dictionary trick —
    see module docstring); per-word counts join back to the (doc, word)
    occurrences and roll up per doc. Documents with zero non-empty
    words appear with explicit zeros, never dropped."""
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    pairs = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(words_col(text_col)).alias("word"),
    ).filter(F.length("word") > 0)
    st = wordpiece_fold(F.col("word"))
    dictionary = pairs.select("word").distinct().select(
        "word",
        F.when(st["unk"], F.lit(1).cast("long"))
        .otherwise(st["n"])
        .alias("__n_sub"),
        st["unk"].cast("long").alias("__unk"),
    )
    rolled = (
        pairs.join(dictionary, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__n_sub").cast("long").alias("n_subword_tokens"),
            F.sum("__unk").cast("long").alias("n_unk_words"),
        )
    )
    return base.join(rolled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_subword_tokens", F.lit(0)).cast("long").alias(
            "n_subword_tokens"
        ),
        F.coalesce("n_unk_words", F.lit(0)).cast("long").alias("n_unk_words"),
    )


# ---------------------------------------------------------------------------
# BPE merge training — learning the vocabulary the wordpiece walk consumes
# ---------------------------------------------------------------------------


def _apply_merge(seq, a, b):
    """One greedy left-to-right BPE merge pass over a symbol-sequence
    string, as a single ``replace``: the pattern ' a  b ' consumes one
    space of each neighboring double separator and the replacement
    ' ab ' re-emits them, so CONSECUTIVE occurrences all merge in one
    pass while OVERLAPPING ones don't re-merge — exactly the classic
    BPE tokenizer's scan (Sennrich et al. 2016), and byte-identical in
    Spark and DuckDB (both replace() scan left-to-right and never
    rescan emitted text)."""
    pat = F.concat(F.lit(" "), a, F.lit("  "), b, F.lit(" "))
    rep = F.concat(F.lit(" "), a, b, F.lit(" "))
    framed = F.concat(F.lit(" "), seq, F.lit(" "))
    return F.trim(F.replace(framed, pat, rep))


def bpe_train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus (Sennrich et al.
    2016): start from characters, repeatedly merge the most frequent
    adjacent symbol pair (frequency-weighted by word count; ties broken
    pair-ascending). Returns (round, a, b, merged, cnt) — the ordered
    merge table :func:`subword_token_counts`-style tokenizers consume,
    completing the loop ``vocab_topk`` (corpus stats) -> bpe_train
    (vocabulary induction) -> wordpiece walk (tokenization).

    Engine-exactness: pair counts are associative long sums over the
    distinct-word table; the argmax is an order-by-(cnt desc, a, b)
    head; the merge application is the anchored-``replace`` scan of
    :func:`_apply_merge` — all three byte-identical in DuckDB, so the
    oracle reproduces the whole training run, not just one round.

    Scale design (100 TB): training runs on the DISTINCT word table
    (Zipf: ~10^7 rows against ~10^13 running tokens), built with one
    map-side-combined groupBy. Each round is one pair-count shuffle
    (map-side combine absorbs the Zipf head) plus a ONE-ROW argmax
    aggregate collected to the driver — the provably-small scalar
    class (same as the crawl's 1-row Observation reads); the reshaped
    word table is persisted and the previous round released, so
    lineage stays one round deep regardless of n_merges."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(words_col(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    cur = words.select(
        "freq",
        F.concat_ws(
            "  ",
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ),
        ).alias("seq"),
    ).persist()
    merges: list[tuple] = []
    try:
        for rnd in range(1, n_merges + 1):
            syms = F.split("seq", "  ")
            pairs = (
                cur.select(
                    "freq",
                    F.explode(
                        F.zip_with(
                            F.slice(syms, 1, F.size(syms) - 1),
                            F.slice(syms, 2, F.size(syms) - 1),
                            lambda a, b: F.struct(
                                a.alias("a"), b.alias("b")
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
            )
            best = pairs.agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        "a",
                        "b",
                        "cnt",
                    )
                ).alias("m")
            ).collect()[0]["m"]
            if best is None:
                break  # corpus fully merged: no adjacent pairs remain
            merges.append((rnd, best["a"], best["b"],
                           best["a"] + best["b"], best["cnt"]))
            nxt = cur.select(
                "freq",
                _apply_merge(
                    F.col("seq"), F.lit(best["a"]), F.lit(best["b"])
                ).alias("seq"),
            ).persist()
            cur.unpersist(blocking=False)
            cur = nxt
    finally:
        cur.unpersist(blocking=False)
    return spark.createDataFrame(
        merges, "round int, a string, b string, merged string, cnt long"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus under a trained merge list: (doc_id,
    n_subword_tokens, n_words). ``merges`` is the collected
    (round, a, b, merged, cnt) rows of :func:`bpe_train`, applied in
    round order — the standard BPE inference rule. The walk runs over
    the DISTINCT word table and joins counts back, same Zipf shortcut
    as ``subword_token_counts``."""
    per_word = (
        docs.select(
            F.col("doc_id"), F.explode(words_col(text_col)).alias("w")
        )
        .filter(F.length("w") > 0)
    )
    dict_ = per_word.select("w").distinct()
    seq = F.concat_ws(
        "  ",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
    )
    for m in sorted(merges, key=lambda t: t[0]):
        seq = _apply_merge(seq, F.lit(m[1]), F.lit(m[2]))
    toks = dict_.select(
        "w", F.size(F.split(seq, "  ")).cast("long").alias("n_toks")
    )
    return (
        per_word.join(toks, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_toks").cast("long").alias("n_subword_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )
