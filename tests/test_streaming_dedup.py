"""Streaming incremental dedup: batch-equivalence and cross-batch
first-arrival semantics."""

import os

import pytest

from inform_spark.streaming.dedup import dedup_stream, init_index, read_verdicts

A = "alpha beta gamma delta epsilon zeta eta theta"
B = "one two three four five six seven eight nine ten"
C = "unrelated words entirely fresh content never seen anywhere else"
SCHEMA = "doc_id long, text string"


def _run(spark, tmp, index_docs, batches, max_files_per_trigger=None):
    """Seed the index, drop each batch as one parquet file, run the
    stream to completion, return {doc_id: (verdict, match_id)}."""
    index_dir = os.path.join(tmp, "index")
    verdicts_dir = os.path.join(tmp, "verdicts")
    ck = os.path.join(tmp, "ck")
    in_dir = os.path.join(tmp, "incoming")
    os.makedirs(in_dir)
    init_index(spark, index_dir, index_docs)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}")
        )
    reader = spark.readStream.schema(SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.option("recursiveFileLookup", "true").parquet(in_dir)
    q = dedup_stream(stream, index_dir, verdicts_dir, ck)
    q.awaitTermination(120)
    return {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }


def test_stream_single_batch_equals_batch_operator(spark, tmp_path):
    index = spark.createDataFrame([(0, A)], SCHEMA)
    new_rows = [(10, A), (11, B), (12, B), (13, C)]
    got = _run(spark, str(tmp_path), index, [new_rows])
    from inform_spark.operators.components import minhash_incremental

    batch = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in minhash_incremental(
            spark.createDataFrame(new_rows, SCHEMA), index
        ).collect()
    }
    assert got == batch
    assert got[10] == ("dup_of_index", 0)
    assert got[12] == ("dup_of_new", 11)


def test_replay_idempotent(spark, tmp_path):
    """foreachBatch replay after a crash BETWEEN the index append and the
    streaming checkpoint commit: re-running the identical batch against
    an index that already contains its own band keys must reproduce the
    identical verdicts (no self-dup_of_index) and append nothing twice."""
    from inform_spark.streaming.dedup import process_batch

    index_dir = os.path.join(str(tmp_path), "index")
    verdicts_dir = os.path.join(str(tmp_path), "verdicts")
    init_index(spark, index_dir, spark.createDataFrame([(0, A)], SCHEMA))
    batch = spark.createDataFrame([(10, A), (11, B), (12, B), (13, C)], SCHEMA)

    process_batch(batch, 0, index_dir, verdicts_dir)
    first = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }
    index_rows_1 = sorted(
        (r["doc_id"], r["band_key"])
        for r in spark.read.parquet(index_dir).collect()
    )
    assert first[11] == ("kept", None) and first[13] == ("kept", None)

    # the crash window: verdicts + index append committed, checkpoint not —
    # Spark re-invokes with the SAME batch content and batch_id
    process_batch(batch, 0, index_dir, verdicts_dir)
    second = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }
    index_rows_2 = sorted(
        (r["doc_id"], r["band_key"])
        for r in spark.read.parquet(index_dir).collect()
    )
    assert second == first, "replay changed verdicts"
    assert index_rows_2 == index_rows_1, "replay duplicated index rows"


def test_stream_cross_batch_first_arrival_wins(spark, tmp_path):
    # batch 0 introduces B (kept); batch 1 re-sends B -> must be flagged
    # against the ACCRETED index, proving the index append took effect
    index = spark.createDataFrame([(0, A)], SCHEMA)
    got = _run(
        spark,
        str(tmp_path),
        index,
        [[(11, B)], [(21, B), (22, C)]],
        max_files_per_trigger=1,
    )
    assert got[11] == ("kept", None)
    assert got[21] == ("dup_of_index", 11)
    assert got[22] == ("kept", None)
