"""Streaming HLL cardinality: batch-equivalence across arbitrary
micro-batch chops, replay idempotence, and compaction invariance."""

import os

from pyspark.sql import functions as F

from inform_spark.streaming.cardinality import (
    cardinality_stream,
    compact,
    estimates,
    merged_registers,
    process_batch,
)

SCHEMA = "key string, item string"


def _rows(lo, hi):
    # two keys, items overlap across batches (re-observations must not
    # move the registers)
    return [
        (f"k{i % 2}", f"u{i % 700}") for i in range(lo, hi)
    ]


def _run_stream(spark, tmp, batches, trigger_files=1):
    regs_dir = os.path.join(tmp, "regs")
    ck = os.path.join(tmp, "ck")
    in_dir = os.path.join(tmp, "incoming")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", trigger_files)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = cardinality_stream(stream, regs_dir, ck)
    q.awaitTermination(120)
    return regs_dir


def _est(spark, regs_dir):
    return {
        r["key"]: (r["sum_scaled"], r["est_milli"])
        for r in estimates(spark, regs_dir).collect()
    }


def test_stream_equals_whole_batch_build(spark, tmp_path):
    """Estimates after the stream drains == a single batch build over
    the union, however the stream was chopped."""
    from inform_spark.operators.sketches import hll_cardinality

    all_rows = _rows(0, 1500)
    chops = [all_rows[:200], all_rows[200:900], all_rows[900:]]
    regs_dir = _run_stream(spark, str(tmp_path), chops)
    got = _est(spark, regs_dir)
    whole = {
        r["key"]: (r["sum_scaled"], r["est_milli"])
        for r in hll_cardinality(
            spark.createDataFrame(all_rows, SCHEMA), "item", ["key"]
        ).collect()
    }
    assert got == whole
    # multiple batch partitions actually existed (the merge did work)
    n_parts = (
        spark.read.parquet(regs_dir).select("batch_id").distinct().count()
    )
    assert n_parts == 3


def test_replay_idempotent(spark, tmp_path):
    """foreachBatch may re-run a batch after a crash: re-invoking
    process_batch with the same (df, batch_id) must leave the register
    table — and the estimates — unchanged."""
    regs_dir = os.path.join(str(tmp_path), "regs")
    b0 = spark.createDataFrame(_rows(0, 400), SCHEMA)
    b1 = spark.createDataFrame(_rows(400, 800), SCHEMA)
    process_batch(b0, 0, regs_dir)
    process_batch(b1, 1, regs_dir)
    before = _est(spark, regs_dir)
    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(regs_dir).collect()
    )
    process_batch(b1, 1, regs_dir)  # replay
    assert _est(spark, regs_dir) == before
    rows_after = sorted(
        tuple(r) for r in spark.read.parquet(regs_dir).collect()
    )
    assert rows_after == rows_before


def test_compact_preserves_estimates(spark, tmp_path):
    regs_dir = os.path.join(str(tmp_path), "regs")
    out_dir = os.path.join(str(tmp_path), "regs_compacted")
    process_batch(spark.createDataFrame(_rows(0, 500), SCHEMA), 0, regs_dir)
    process_batch(spark.createDataFrame(_rows(300, 900), SCHEMA), 1, regs_dir)
    before = _est(spark, regs_dir)
    compact(spark, regs_dir, out_dir)
    assert _est(spark, out_dir) == before
    # compacted table holds exactly the merged registers, one partition
    c = spark.read.parquet(out_dir)
    assert c.select("batch_id").distinct().count() == 1
    assert c.select("p").distinct().collect()[0]["p"] == 6  # p preserved
    assert (
        sorted(tuple(r) for r in c.drop("batch_id", "p").collect())
        == sorted(
            tuple(r) for r in merged_registers(spark, regs_dir).collect()
        )
    )


def test_empty_batch_is_noop(spark, tmp_path):
    regs_dir = os.path.join(str(tmp_path), "regs")
    process_batch(
        spark.createDataFrame([], SCHEMA), 0, regs_dir
    )
    assert not os.path.exists(regs_dir)
    # a monitor polling before the first batch gets ZERO rows, not a
    # PATH_NOT_FOUND crash
    assert estimates(spark, regs_dir).count() == 0


def test_p_mismatch_raises(spark, tmp_path):
    """Registers at different p occupy different bucket spaces: a
    caller expectation that contradicts the stored p, or a mixed-p
    table, must raise instead of estimating garbage."""
    import pytest as _pytest

    regs_dir = os.path.join(str(tmp_path), "regs")
    process_batch(
        spark.createDataFrame(_rows(0, 300), SCHEMA), 0, regs_dir, p=8
    )
    assert estimates(spark, regs_dir).count() == 2  # p derived: fine
    with _pytest.raises(ValueError, match="p=8"):
        estimates(spark, regs_dir, p=6)
    # mixing precisions in one table is refused too
    process_batch(
        spark.createDataFrame(_rows(300, 600), SCHEMA), 1, regs_dir, p=6
    )
    with _pytest.raises(ValueError, match="mixes precisions"):
        estimates(spark, regs_dir)
