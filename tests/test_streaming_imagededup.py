"""Streaming incremental image dedup: batch-equivalence, cross-batch
first-arrival, and foreachBatch replay idempotence — the image-side
mirror of test_streaming_dedup.py."""

import os

from inform_spark.streaming.imagededup import (
    image_dedup_stream,
    init_index,
    read_verdicts,
)

P = 0x1111_2222_3333_4444
Q = 0x0F0F_F0F0_0F0F_F0F0
R = 0x7777_0000_1234_5678
SCHEMA = "media_ref string, phash long"


def _run(spark, tmp, index_feats, batches, max_files_per_trigger=None):
    index_dir = os.path.join(tmp, "index")
    verdicts_dir = os.path.join(tmp, "verdicts")
    ck = os.path.join(tmp, "ck")
    in_dir = os.path.join(tmp, "incoming")
    os.makedirs(in_dir)
    init_index(spark, index_dir, index_feats)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}")
        )
    reader = spark.readStream.schema(SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.option("recursiveFileLookup", "true").parquet(in_dir)
    q = image_dedup_stream(stream, index_dir, verdicts_dir, ck, hamming_max=2)
    q.awaitTermination(120)
    return {
        r["media_ref"]: (r["verdict"], r["match_ref"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }


def test_stream_single_batch_equals_batch_operator(spark, tmp_path):
    from inform_spark.operators.multimodal import phash_incremental

    index = spark.createDataFrame([("i-a", P)], SCHEMA)
    new_rows = [
        ("n-exact", P),
        ("n-near", P ^ 0x1),
        ("n-q1", Q),
        ("n-q2", Q),
        ("n-solo", R),
    ]
    got = _run(spark, str(tmp_path), index, [new_rows])
    batch = {
        r["media_ref"]: (r["verdict"], r["match_ref"])
        for r in phash_incremental(
            spark.createDataFrame(new_rows, SCHEMA),
            index_feats=index,
            hamming_max=2,
        ).collect()
    }
    assert got == batch
    assert got["n-exact"] == ("dup_of_index", "i-a")
    assert got["n-q2"] == ("dup_of_new", "n-q1")
    assert got["n-solo"] == ("kept", None)


def test_cross_batch_first_arrival_wins(spark, tmp_path):
    """An image kept in batch 0 becomes the index anchor a batch-1
    duplicate attributes to — the accretion semantics."""
    got = _run(
        spark,
        str(tmp_path),
        None,
        [[("b0-q", Q)], [("b1-q", Q), ("b1-near", Q ^ 0x3), ("b1-new", R)]],
        max_files_per_trigger=1,
    )
    assert got["b0-q"] == ("kept", None)
    assert got["b1-q"] == ("dup_of_index", "b0-q")
    assert got["b1-near"] == ("dup_of_index", "b0-q")
    assert got["b1-new"] == ("kept", None)


def test_replay_idempotent(spark, tmp_path):
    """Replaying the identical batch against an index that already
    contains its own appended rows must reproduce identical verdicts
    (no self-dup_of_index) and append nothing twice."""
    from inform_spark.streaming.imagededup import process_batch

    index_dir = os.path.join(str(tmp_path), "index")
    verdicts_dir = os.path.join(str(tmp_path), "verdicts")
    init_index(
        spark, index_dir, spark.createDataFrame([("i-a", P)], SCHEMA)
    )
    batch = spark.createDataFrame(
        [("n-exact", P), ("n-q", Q), ("n-solo", R)], SCHEMA
    )
    process_batch(batch, 0, index_dir, verdicts_dir, hamming_max=2)
    first = {
        r["media_ref"]: (r["verdict"], r["match_ref"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }
    rows1 = sorted(
        (r["phash"], r["band_key"], r["anchor"])
        for r in spark.read.parquet(index_dir).collect()
    )
    assert first["n-q"] == ("kept", None)
    assert first["n-solo"] == ("kept", None)

    process_batch(batch, 0, index_dir, verdicts_dir, hamming_max=2)
    second = {
        r["media_ref"]: (r["verdict"], r["match_ref"])
        for r in read_verdicts(spark, verdicts_dir).collect()
    }
    rows2 = sorted(
        (r["phash"], r["band_key"], r["anchor"])
        for r in spark.read.parquet(index_dir).collect()
    )
    assert first == second
    assert rows1 == rows2
