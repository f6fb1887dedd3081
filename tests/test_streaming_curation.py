"""Streaming curation: frozen-stats gating, cross-batch first-arrival
canonical pick, and foreachBatch replay idempotence."""

import os

import pytest
from pyspark.sql import functions as F

from inform_spark.streaming.curation import (
    build_reference_stats,
    curation_stream,
    init_index,
    process_batch,
    read_verdicts,
)

SCHEMA = "doc_id long, text string, source string"
GOOD = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "one two three four five six seven eight nine ten"


@pytest.fixture(scope="module")
def ref_corpus(spark):
    # a reference corpus rich enough that GOOD/OTHER tokens are in-vocab
    rows = [
        (i, (GOOD + " " + OTHER + f" filler{i % 5}"), "ref")
        for i in range(50)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _setup(spark, tmp, ref_corpus):
    stats_dir = os.path.join(tmp, "stats")
    index_dir = os.path.join(tmp, "index")
    verdicts_dir = os.path.join(tmp, "verdicts")
    build_reference_stats(spark, ref_corpus, stats_dir)
    init_index(spark, index_dir)
    return stats_dir, index_dir, verdicts_dir


def test_stream_two_batches_first_arrival_wins(spark, tmp_path, ref_corpus):
    tmp = str(tmp_path)
    stats_dir, index_dir, verdicts_dir = _setup(spark, tmp, ref_corpus)
    in_dir = os.path.join(tmp, "incoming")
    os.makedirs(in_dir)
    b0 = [(1, GOOD, "s1"), (2, GOOD, "s1"), (3, OTHER, "s2")]
    b1 = [(10, GOOD, "s1"), (11, "fresh unseen words entirely", "s3")]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = curation_stream(stream, stats_dir, index_dir, verdicts_dir,
                        os.path.join(tmp, "ck"))
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r for r in read_verdicts(spark, verdicts_dir).collect()
    }
    assert set(got) == {1, 2, 3, 10, 11}
    # in-batch dedup: min doc_id canonical
    assert got[1]["dup_verdict"] == "kept"
    assert got[2]["dup_verdict"] == "dup_of_new" and got[2]["match_id"] == 1
    assert got[3]["dup_verdict"] == "kept"
    # cross-batch: first arrival (doc 1) wins over the batch-1 copy
    assert got[10]["dup_verdict"] == "dup_of_index" and got[10]["match_id"] == 1
    assert got[11]["dup_verdict"] == "kept"
    # a duplicate can never be keep_final
    assert got[2]["keep_final"] == 0 and got[10]["keep_final"] == 0


def test_frozen_stats_make_verdicts_batching_invariant(
    spark, tmp_path, ref_corpus
):
    """The same docs chopped 1-batch vs 2-batch must get identical gate
    verdicts (the point of freezing the LM stats)."""
    rows = [
        (1, GOOD, "s1"),
        (2, OTHER, "s2"),
        (3, "zz" + " yy xx ww vv uu tt" * 3, "s3"),  # all-OOV
    ]
    outs = []
    for split in ([rows], [rows[:1], rows[1:]]):
        tmp = str(tmp_path / f"run{len(outs)}")
        os.makedirs(tmp)
        stats_dir, index_dir, verdicts_dir = _setup(spark, tmp, ref_corpus)
        for i, chunk in enumerate(split):
            process_batch(
                spark.createDataFrame(chunk, SCHEMA), i,
                stats_dir, index_dir, verdicts_dir,
            )
        outs.append({
            r["doc_id"]: (
                r["pass_model"], r["pass_badword"], r["pass_lm"],
                r["dup_verdict"],
            )
            for r in read_verdicts(spark, verdicts_dir).collect()
        })
    assert outs[0] == outs[1]


def test_replay_idempotent(spark, tmp_path, ref_corpus):
    """Replaying a batch after the index append committed must reproduce
    identical verdicts (no self-dup_of_index) and append nothing."""
    tmp = str(tmp_path)
    stats_dir, index_dir, verdicts_dir = _setup(spark, tmp, ref_corpus)
    batch = spark.createDataFrame(
        [(1, GOOD, "s1"), (2, OTHER, "s2")], SCHEMA
    )
    process_batch(batch, 0, stats_dir, index_dir, verdicts_dir)
    first = {
        r["doc_id"]: (r["dup_verdict"], r["match_id"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }
    idx1 = sorted(
        (r["text_hash"], r["doc_id"])
        for r in spark.read.parquet(index_dir).collect()
    )
    assert first[1] == ("kept", None) and first[2] == ("kept", None)
    process_batch(batch, 0, stats_dir, index_dir, verdicts_dir)  # replay
    second = {
        r["doc_id"]: (r["dup_verdict"], r["match_id"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }
    idx2 = sorted(
        (r["text_hash"], r["doc_id"])
        for r in spark.read.parquet(index_dir).collect()
    )
    assert second == first
    assert idx2 == idx1


def test_blocked_source_gated(spark, tmp_path, ref_corpus):
    tmp = str(tmp_path)
    stats_dir, index_dir, verdicts_dir = _setup(spark, tmp, ref_corpus)
    blocked = spark.createDataFrame([("s9",)], "source: string")
    batch = spark.createDataFrame(
        [(1, GOOD, "s9"), (2, GOOD + " extra", "s1")], SCHEMA
    )
    process_batch(
        batch, 0, stats_dir, index_dir, verdicts_dir,
        blocked_sources=blocked,
    )
    got = {
        r["doc_id"]: r for r in read_verdicts(spark, verdicts_dir).collect()
    }
    assert got[1]["pass_badword"] == 0 and got[1]["keep_final"] == 0
    assert got[2]["pass_badword"] == 1


def test_empty_and_duplicate_batches(spark, tmp_path, ref_corpus):
    """A zero-row batch is a no-op (no schema-less verdicts dir crash);
    intra-batch duplicate doc_ids yield ONE verdict row, not a join
    cross product."""
    tmp = str(tmp_path)
    stats_dir, index_dir, verdicts_dir = _setup(spark, tmp, ref_corpus)
    empty = spark.createDataFrame([], SCHEMA)
    process_batch(empty, 0, stats_dir, index_dir, verdicts_dir)
    assert read_verdicts(spark, verdicts_dir).count() == 0
    dup_batch = spark.createDataFrame(
        [(1, GOOD, "s1"), (1, GOOD, "s1"), (1, GOOD, "s1")], SCHEMA
    )
    process_batch(dup_batch, 1, stats_dir, index_dir, verdicts_dir)
    v = read_verdicts(spark, verdicts_dir)
    assert v.count() == 1
    assert v.collect()[0]["dup_verdict"] == "kept"
