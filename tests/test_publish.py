"""Bucketed corpus publishing (operators/publish.py): the manifest totals
and the zero-Exchange guarantee on joins between identically-bucketed
catalog tables — the co-location contract that saves the corpus shuffle
on every downstream join at scale."""

import pytest
from pyspark.sql import Row, functions as F

from inform_spark.operators import publish


def _docs(spark, n=200):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i} body " + ("w " * (i % 17))) for i in range(n)]
    )


def test_manifest_totals_match_source(spark):
    docs = _docs(spark)
    m = publish.publish_manifest(docs, n_buckets=8).collect()
    assert sum(r["n_docs"] for r in m) == 200
    assert sorted({r["bucket"] for r in m}) == sorted(
        set(range(8)) & {r["bucket"] for r in m}
    )
    total_bytes = docs.select(
        F.sum(F.octet_length("text")).alias("b")
    ).first()["b"]
    assert sum(r["n_bytes"] for r in m) == total_bytes
    # bucket assignment is the portable hash, not Spark-internal hash()
    one = docs.select(
        "doc_id", publish.bucket_of("doc_id", 8).alias("bucket")
    ).first()
    import hashlib

    expect = int(hashlib.md5(f"pub{one['doc_id']}".encode()).hexdigest()[:15], 16) % 8
    assert one["bucket"] == expect


def test_bucket_assignment_is_partitioning_independent(spark):
    docs = _docs(spark)
    a = {
        r["doc_id"]: r["bucket"]
        for r in docs.repartition(1)
        .select("doc_id", publish.bucket_of("doc_id", 16).alias("bucket"))
        .collect()
    }
    b = {
        r["doc_id"]: r["bucket"]
        for r in docs.repartition(13, "text")
        .select("doc_id", publish.bucket_of("doc_id", 16).alias("bucket"))
        .collect()
    }
    assert a == b


def test_bucketed_join_has_no_exchange(spark):
    """Two tables published with the same bucketBy spec join with ZERO
    Exchange on either side — the plan-level proof that the published
    layout actually buys co-location. (Managed tables in the session's
    default warehouse; dropped — files included — in the finally.)"""
    docs = _docs(spark)
    feats = docs.select("doc_id", F.octet_length("text").alias("n"))
    for tbl in ("pub_corpus_t", "pub_feats_t"):
        spark.sql(f"drop table if exists {tbl}")
    try:
        publish.publish_bucketed(docs, "pub_corpus_t", n_buckets=4)
        publish.publish_bucketed(feats, "pub_feats_t", n_buckets=4)
        # disable broadcast so the join would otherwise shuffle both sides
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("pub_corpus_t").join(
                spark.table("pub_feats_t"), "doc_id"
            )
            assert j.count() == 200
            tree = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in tree
            assert "Exchange" not in tree, tree
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        for tbl in ("pub_corpus_t", "pub_feats_t"):
            spark.sql(f"drop table if exists {tbl}")


def test_manifest_detects_incomplete_publish(spark):
    """The verification use: manifest of the published subset differs
    from the source manifest exactly in the missing rows."""
    docs = _docs(spark, 50)
    partial = docs.filter("doc_id != 7")
    full = {r["bucket"]: r["n_docs"] for r in publish.publish_manifest(docs, 8).collect()}
    part = {r["bucket"]: r["n_docs"] for r in publish.publish_manifest(partial, 8).collect()}
    diffs = {b: full[b] - part.get(b, 0) for b in full if full[b] != part.get(b, 0)}
    assert sum(diffs.values()) == 1
