"""applyInPandasWithState politeness admission: stream == batch on
in-order input; state carries across micro-batches; late rows defer."""

import pyspark.sql.functions as F
import pytest

from inform_spark.streaming.stateful import (
    paced_admissions_batch,
    paced_admissions_stream,
)


@pytest.fixture(scope="module")
def candidates(spark):
    # per-host bursts: 5 urls inside one minute (budget 3 → 2 deferred),
    # then a later window (tokens refill)
    rows = []
    for h in range(4):
        for i in range(5):
            rows.append((f"site{h}.test", f"https://site{h}.test/p{i}",
                         f"2024-01-01 00:00:{10 + i:02d}"))
        rows.append((f"site{h}.test", f"https://site{h}.test/late",
                     "2024-01-01 00:02:05"))
    df = spark.createDataFrame(rows, "host string, url string, ts_s string")
    return df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").cache()


def _key(r):
    return (r["host"], r["url"])


def test_batch_budget_semantics(spark, candidates):
    out = {_key(r): r for r in paced_admissions_batch(candidates, budget=3).collect()}
    for h in range(4):
        admits = [out[(f"site{h}.test", f"https://site{h}.test/p{i}")]["admitted"]
                  for i in range(5)]
        assert admits == [True, True, True, False, False]
        # new window: tokens refill
        assert out[(f"site{h}.test", f"https://site{h}.test/late")]["admitted"]


def test_stream_equals_batch_in_order(spark, candidates, tmp_path):
    """Feed the candidates through the stateful stream in event-time order
    (2 files split at an arbitrary boundary → state must carry between
    micro-batches) and compare against the batch formulation."""
    early = candidates.filter(F.col("url").endswith("p0") | F.col("url").endswith("p1"))
    late = candidates.join(early, ["host", "url"], "left_anti")
    src = str(tmp_path / "cand-src")
    # lexicographic file order == event-time order (maxFilesPerTrigger=1)
    early.coalesce(1).write.parquet(src + "/d=0")
    late.coalesce(1).write.parquet(src + "/d=1")
    stream = (
        spark.readStream.schema("host string, url string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/d=*")
    )
    out = paced_admissions_stream(stream, budget=3)
    q = (
        out.writeStream.format("memory")
        .queryName("paced_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        _key(r): (r["admitted"], r["window_start_ms"])
        for r in spark.sql("select * from paced_smoke").collect()
    }
    want = {
        _key(r): (r["admitted"], r["window_start_ms"])
        for r in paced_admissions_batch(candidates, budget=3).collect()
    }
    assert got == want


def test_stream_late_row_deferred(spark, tmp_path):
    """A row arriving AFTER its host's state has advanced to a later
    window is deferred (politeness never over-admits retroactively) —
    this is where stream and batch legitimately differ."""
    src = str(tmp_path / "late-src")
    spark.createDataFrame(
        [("h.test", "https://h.test/a", "2024-01-01 00:05:00")],
        "host string, url string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s") \
        .coalesce(1).write.parquet(src + "/d=0")
    spark.createDataFrame(
        [("h.test", "https://h.test/old", "2024-01-01 00:00:00")],
        "host string, url string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s") \
        .coalesce(1).write.parquet(src + "/d=1")
    stream = (
        spark.readStream.schema("host string, url string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/d=*")
    )
    q = (
        paced_admissions_stream(stream, budget=3, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {r["url"]: r["admitted"]
           for r in spark.sql("select * from late_smoke").collect()}
    assert got == {"https://h.test/a": True, "https://h.test/old": False}
