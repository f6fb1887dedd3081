"""Deterministic sampling + sequence packing: invariants beyond the
DuckDB oracle (partitioning-independence, nesting, span arithmetic)."""

import pyspark.sql.functions as F
import pytest

from inform_spark.operators.packing import pack_sequences
from inform_spark.operators.sampling import (
    hash_sample,
    split_assign,
    stratified_sample_exact,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).cache()


def test_hash_sample_partitioning_independent(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), "doc_id", 0.3).collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_rates_nest(spark, docs):
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.4).collect()}
    assert small <= big


def test_hash_sample_salt_decorrelates(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, salt="b").collect()}
    assert a != b


def test_split_assign_partitions_corpus(spark, docs):
    out = split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert None not in counts and sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stability under growth: a key's split is unchanged on a subset
    sub = split_assign(
        docs.limit(50), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_stratified_exact_n(spark, docs):
    out = stratified_sample_exact(docs, "source", 7, "doc_id")
    sizes = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    orig = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for s, n in sizes.items():
        assert n == min(7, orig[s])


def test_pack_sequences_matches_sequential_oracle(spark):
    rows = [(i, t) for i, t in enumerate([100, 2000, 48, 5000, 0, 1, 2047])]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    out, caches = pack_sequences(
        df, "tok", [F.col("doc_id").asc()], seq_len=1024
    )
    got = {r["doc_id"]: r for r in out.collect()}
    for c in caches:
        c.unpersist()
    cum = 0
    for i, t in rows:
        r = got[i]
        assert r["cum_before"] == cum
        assert r["seq_first"] == cum // 1024
        assert r["offset_in_seq"] == cum % 1024
        last = cum + max(t, 1) - 1
        assert r["seq_last"] == last // 1024
        assert r["n_seqs"] == last // 1024 - cum // 1024 + 1
        cum += t
    # boundary-crossing doc spans the right number of windows
    assert got[3]["n_seqs"] >= 5  # 5000 tokens over 1024-len windows
    # empty doc: stays in place, spans one window
    assert got[4]["n_seqs"] == 1 and got[4]["seq_first"] == got[4]["seq_last"]


def test_pack_sequences_total_coverage(spark, docs):
    """Window arithmetic is gap-free: doc i's first token position equals
    doc i-1's cum_before + tok, and every window index between global 0
    and the last seq_last is touched by at least one document."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split("text", r"\s+")).cast("long").alias("tok"),
    )
    out, caches = pack_sequences(
        toks, "tok", [F.col("doc_id").asc()], seq_len=512
    )
    rows = sorted(
        out.select("doc_id", "tok", "cum_before", "seq_first", "seq_last").collect(),
        key=lambda r: r["doc_id"],
    )
    for c in caches:
        c.unpersist()
    cum = 0
    touched = set()
    for r in rows:
        assert r["cum_before"] == cum
        cum += r["tok"]
        touched.update(range(r["seq_first"], r["seq_last"] + 1))
    assert touched == set(range(max(touched) + 1))


def test_ngram_contamination(spark):
    from pyspark.sql import functions as F

    from inform_spark.operators.textops import ngram_contamination

    bench_text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (1, bench_text),  # benchmark doc
        (2, "x " * 4 + bench_text),  # contains the full 8-gram -> flagged
        (3, "w1 w2 w3 w4 w5 a b c d e f g h"),  # only a 5-gram overlap
        (4, "totally different words here nothing shared at all ok"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in ngram_contamination(d, F.col("doc_id") == 1, w=8).collect()
    )
    assert got == [2]


def test_ngram_contamination_fraction(spark):
    from pyspark.sql import functions as F

    from inform_spark.operators.textops import ngram_contamination_fraction

    bench_text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (1, bench_text),                       # benchmark doc
        (2, bench_text),                       # fully contaminated copy
        (3, "x " * 4 + bench_text),            # partial overlap
        (4, "totally different words here nothing shared at all ok"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in ngram_contamination_fraction(
            d, F.col("doc_id") == 1, w=8
        ).collect()
    }
    assert set(out) == {2, 3, 4}  # every training doc has a row
    # doc 2: all 3 distinct 8-grams contaminated -> 1000 milli, dropped
    assert out[2]["n_shingles"] == 3
    assert out[2]["n_contaminated"] == 3
    assert out[2]["contamination_milli"] == 1000
    assert out[2]["keep"] is False
    # doc 3: shingles of 14 words -> 7 distinct; the 3 bench shingles
    # appear among them -> 3/7 = 428 milli, dropped at the 5% default
    assert out[3]["n_contaminated"] == 3
    assert out[3]["contamination_milli"] == 1000 * 3 // out[3]["n_shingles"]
    assert out[3]["keep"] is False
    # doc 4: zero overlap, kept
    assert out[4]["n_contaminated"] == 0
    assert out[4]["contamination_milli"] == 0
    assert out[4]["keep"] is True
    # threshold is a policy knob: at drop_at_milli=1001 everything keeps
    lax = ngram_contamination_fraction(
        d, F.col("doc_id") == 1, w=8, drop_at_milli=1001
    )
    assert all(r["keep"] for r in lax.collect())
