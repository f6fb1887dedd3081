"""Streaming host reputation: single-batch equality with the batch
operator, cross-batch evidence accretion, and replay idempotence."""

import os

from pyspark.sql import functions as F

from inform_spark.operators.reputation import host_reputation
from inform_spark.streaming.reputation import (
    VERDICTS_SCHEMA,
    init_state,
    process_batch,
    reputation_stream,
)

SCHEMA = "doc_id long, source string, text string"
GOOD = (
    "the quick brown fox jumps over a lazy dog and runs to the river "
    "of winding water and the trees stand tall beside the path "
) * 5 + "the travelers walked along the shore and watched the boats drift"


def _read_verdicts(spark, verdicts_dir):
    return spark.read.schema(VERDICTS_SCHEMA).parquet(verdicts_dir)


def _corpus_rows():
    rows = [(i, "good.example", GOOD + f" unique tail {i}") for i in range(8)]
    rows += [(100 + i, "junk.example", f"x{i}") for i in range(8)]
    rows += [(200 + i, "mill.example", GOOD) for i in range(8)]
    return rows


def test_single_batch_equals_batch_operator(spark, tmp_path):
    tmp = str(tmp_path)
    state, verdicts = os.path.join(tmp, "st"), os.path.join(tmp, "v")
    init_state(spark, state)
    df = spark.createDataFrame(_corpus_rows(), SCHEMA)
    process_batch(df, 0, state, verdicts)
    got = {
        r["doc_id"]: r
        for r in _read_verdicts(spark, verdicts).drop("batch_id").collect()
    }
    want = {r["doc_id"]: r for r in host_reputation(df).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].asDict() == want[k].asDict(), k


def test_evidence_accretes_across_batches(spark, tmp_path):
    """A spam host's early docs can pass; once the evidence accretes the
    SAME host's later docs are blocked — and the cumulative stats match
    the all-at-once totals."""
    tmp = str(tmp_path)
    state, verdicts = os.path.join(tmp, "st"), os.path.join(tmp, "v")
    init_state(spark, state)
    # batch 0: junk host shows only 2 good-looking docs -> passes
    b0 = [(1, "sneaky.example", GOOD + " one"), (2, "sneaky.example", GOOD + " two")]
    # batch 1: 18 junk docs from the same host -> mean collapses
    b1 = [(10 + i, "sneaky.example", f"z{i}") for i in range(18)]
    process_batch(spark.createDataFrame(b0, SCHEMA), 0, state, verdicts)
    process_batch(spark.createDataFrame(b1, SCHEMA), 1, state, verdicts)
    got = {r["doc_id"]: r for r in _read_verdicts(spark, verdicts).collect()}
    assert got[1]["kept"] and got[2]["kept"]            # early: no evidence yet
    assert all(not got[10 + i]["kept"] for i in range(18))  # later: blocked
    # cumulative host stats through batch 1 cover all 20 docs
    assert got[10]["host_docs"] == 20
    full = spark.createDataFrame(b0 + b1, SCHEMA)
    want = host_reputation(full).collect()[0]
    assert got[10]["host_mean_quality_milli"] == want["host_mean_quality_milli"]
    assert got[10]["host_low_frac_ppm"] == want["host_low_frac_ppm"]
    assert got[10]["host_distinct_ppm"] == want["host_distinct_ppm"]


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch (foreachBatch at-least-once) must not
    double-count stats or change any verdict."""
    tmp = str(tmp_path)
    state, verdicts = os.path.join(tmp, "st"), os.path.join(tmp, "v")
    init_state(spark, state)
    b0 = spark.createDataFrame(_corpus_rows()[:12], SCHEMA)
    b1 = spark.createDataFrame(_corpus_rows()[12:], SCHEMA)
    process_batch(b0, 0, state, verdicts)
    process_batch(b1, 1, state, verdicts)
    before = sorted(
        (r.asDict() for r in _read_verdicts(spark, verdicts).collect()),
        key=lambda r: r["doc_id"],
    )
    process_batch(b1, 1, state, verdicts)  # replay the last batch
    after = sorted(
        (r.asDict() for r in _read_verdicts(spark, verdicts).collect()),
        key=lambda r: r["doc_id"],
    )
    assert before == after
    # pairs index did not grow on replay
    pairs = spark.read.parquet(os.path.join(state, "pairs"))
    assert pairs.count() == pairs.dropDuplicates(["source", "text_hash"]).count()


def test_duplicate_ids_with_different_payloads_are_deterministic(
    spark, tmp_path
):
    """An at-least-once source can deliver the same doc_id twice with
    DIFFERENT payloads in one batch; the survivor must be deterministic
    (min by (text_hash, source)) or a replay could rebuild different
    pairs/stats rows than the original attempt."""
    from inform_spark.operators.textops import _h60

    tmp = str(tmp_path)
    texts = [GOOD + " variant alpha", GOOD + " variant beta"]
    rows = [
        (7, "dup.example", texts[0]),
        (7, "dup.example", texts[1]),
    ]
    # which text wins under the contract? the one with the smaller H60
    want_hash = min(
        r["h"]
        for r in spark.createDataFrame([(t,) for t in texts], "text string")
        .select(_h60(F.col("text")).alias("h"))
        .collect()
    )
    for attempt in range(2):
        state = os.path.join(tmp, f"st{attempt}")
        verdicts = os.path.join(tmp, f"v{attempt}")
        init_state(spark, state)
        # vary partitioning between attempts — the survivor must not
        # depend on partition order (dropDuplicates would)
        df = spark.createDataFrame(rows, SCHEMA).repartition(
            1 if attempt == 0 else 7
        )
        process_batch(df, 0, state, verdicts)
        pairs = spark.read.parquet(os.path.join(state, "pairs")).collect()
        assert len(pairs) == 1 and pairs[0]["text_hash"] == want_hash
        got = _read_verdicts(spark, verdicts).collect()
        assert len(got) == 1 and got[0]["host_docs"] == 1


def test_streaming_query_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    state, verdicts = os.path.join(tmp, "st"), os.path.join(tmp, "v")
    init_state(spark, state)
    in_dir = os.path.join(tmp, "incoming")
    os.makedirs(in_dir)
    rows = _corpus_rows()
    for i, chunk in enumerate([rows[:12], rows[12:]]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = reputation_stream(stream, state, verdicts, os.path.join(tmp, "ck"))
    q.awaitTermination(120)
    got = _read_verdicts(spark, verdicts)
    assert got.count() == len(rows)
    assert got.select("doc_id").distinct().count() == len(rows)
    # the mill host is blocked once its duplicate texts accrete
    mill = got.filter(F.col("source") == "mill.example")
    last = mill.orderBy(F.desc("batch_id"), F.desc("doc_id")).first()
    assert last["host_distinct_ppm"] < 500_000 and not last["kept"]
