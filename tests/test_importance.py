"""DSIR-style importance weights: semantics + plan shape."""

from pyspark.sql import functions as F

from inform_spark.operators.importance import dsir_weights


def test_dsir_target_resemblance_orders_docs(spark):
    # target docs are all "alpha"; a raw doc full of "alpha" must outscore
    # a raw doc full of never-target tokens
    rows = [
        (0, "alpha alpha alpha", True),
        (1, "alpha alpha alpha", True),
        (2, "alpha alpha alpha alpha", False),   # resembles target
        (3, "zeta yotta kappa omega", False),    # doesn't
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {r["doc_id"]: r for r in dsir_weights(docs, F.col("tgt")).collect()}
    assert out[2]["importance"] > out[3]["importance"]
    assert out[0]["is_target"] and not out[2]["is_target"]
    assert out[2]["n_tokens"] == 4
    # fixed-point: weights are longs, deterministic across partitionings
    repartitioned = {
        r["doc_id"]: r["importance"]
        for r in dsir_weights(docs.repartition(7), F.col("tgt")).collect()
    }
    assert repartitioned == {k: v["importance"] for k, v in out.items()}


def test_dsir_plan_no_window_no_cartesian(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3}", i % 2 == 0) for i in range(50)],
        "doc_id long, text string, tgt boolean",
    )
    plan = (
        dsir_weights(docs, F.col("tgt"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan


def test_dsir_zero_token_doc_emitted_with_null_importance(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", True), (1, "", False), (2, "   ", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = {r["doc_id"]: r for r in dsir_weights(docs, F.col("tgt")).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1]["n_tokens"] == 0 and out[1]["importance"] is None
    assert out[2]["n_tokens"] == 0 and out[2]["importance"] is None
    assert out[0]["n_tokens"] == 2 and out[0]["importance"] is not None
