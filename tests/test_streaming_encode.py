"""Streaming PQ encoding: batch-equivalence under a frozen codebook,
batch-chopping invariance, and replay idempotence."""

import os

import pytest

from pyspark.sql import functions as F

from inform_spark.streaming.encode import (
    init_codebook,
    process_batch,
    run_stream,
)

SCHEMA = "vec_id long, embedding array<float>"


def _vecs(n, start=0):
    import random

    rng = random.Random(31)
    rows = []
    for vid in range(start, start + n):
        base = 0.5 if vid % 2 == 0 else -0.5
        rows.append(
            (vid, [base + rng.uniform(-0.1, 0.1) for _ in range(8)])
        )
    return rows


def _run(spark, tmp, seed_rows, batches, max_files_per_trigger=None):
    codebook_dir = os.path.join(tmp, "codebook")
    codes_dir = os.path.join(tmp, "codes")
    ck = os.path.join(tmp, "ck")
    in_dir = os.path.join(tmp, "incoming")
    os.makedirs(in_dir)
    init_codebook(
        spark, codebook_dir, spark.createDataFrame(seed_rows, SCHEMA),
        m=4, k=4,
    )
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}")
        )
    reader = spark.readStream.schema(SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.option("recursiveFileLookup", "true").parquet(in_dir)
    q = run_stream(stream, codebook_dir, codes_dir, ck)
    q.awaitTermination(120)
    return codebook_dir, {
        r["vid"]: (r["codes"], r["qerr"])
        for r in spark.read.parquet(codes_dir).collect()
    }


def _batch_encode(spark, codebook_dir, rows):
    from inform_spark.operators.clustering import encode_with_codebook
    from inform_spark.streaming.encode import CODEBOOK_SCHEMA

    cents = spark.read.schema(CODEBOOK_SCHEMA).parquet(codebook_dir)
    return {
        r["vid"]: (r["codes"], r["qerr"])
        for r in encode_with_codebook(
            spark.createDataFrame(rows, SCHEMA), cents, 4
        ).collect()
    }


def test_stream_equals_batch_encoder(spark, tmp_path):
    seed = _vecs(12)
    new = _vecs(8, start=100)
    codebook_dir, got = _run(spark, str(tmp_path), seed, [new])
    assert got == _batch_encode(spark, codebook_dir, new)


def test_batch_chopping_invariant(spark, tmp_path):
    """Codes depend only on (vector, frozen codebook) — one batch and
    three batches must produce identical rows."""
    seed = _vecs(12)
    new = _vecs(9, start=100)
    _, one = _run(spark, str(tmp_path) + "/a", seed, [new])
    chopped = [new[0:3], new[3:6], new[6:9]]
    _, three = _run(
        spark, str(tmp_path) + "/b", seed, chopped, max_files_per_trigger=1
    )
    assert one == three
    assert len(one) == 9


def test_replay_idempotent(spark, tmp_path):
    """Re-invoking process_batch with the same (batch_df, batch_id)
    (a crash between sink write and checkpoint commit) must leave the
    store byte-identical — no duplicate rows."""
    seed = _vecs(12)
    codebook_dir = str(tmp_path / "codebook")
    codes_dir = str(tmp_path / "codes")
    init_codebook(
        spark, codebook_dir, spark.createDataFrame(seed, SCHEMA), m=4, k=4
    )
    batch = spark.createDataFrame(_vecs(6, start=50), SCHEMA)
    process_batch(batch, 0, codebook_dir, codes_dir, 4)
    first = sorted(
        tuple(r) for r in spark.read.parquet(codes_dir).collect()
    )
    process_batch(batch, 0, codebook_dir, codes_dir, 4)  # replay
    second = sorted(
        tuple(r) for r in spark.read.parquet(codes_dir).collect()
    )
    assert first == second
    assert len(first) == 6


def test_codebook_stays_frozen(spark, tmp_path):
    """Processing more batches must not touch the codebook files —
    codes issued earlier stay valid."""
    seed = _vecs(12)
    codebook_dir = str(tmp_path / "codebook")
    codes_dir = str(tmp_path / "codes")
    init_codebook(
        spark, codebook_dir, spark.createDataFrame(seed, SCHEMA), m=4, k=4
    )
    before = sorted(
        tuple(r) for r in spark.read.parquet(codebook_dir).collect()
    )
    process_batch(
        spark.createDataFrame(_vecs(5, start=30), SCHEMA),
        0, codebook_dir, codes_dir, 4,
    )
    process_batch(
        spark.createDataFrame(_vecs(5, start=60), SCHEMA),
        1, codebook_dir, codes_dir, 4,
    )
    after = sorted(
        tuple(r) for r in spark.read.parquet(codebook_dir).collect()
    )
    assert before == after
