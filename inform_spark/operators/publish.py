"""Bucketed corpus publishing — the co-location contract for downstream
joins at 100 TB.

A curated corpus is not an end state: every downstream stage (incremental
dedup probes, embedding joins, eval decontamination, per-doc feature
attach) JOINS against it on doc identity. If the published layout carries
no co-location guarantee, each of those joins pays a full corpus shuffle
— at 100 TB that is the dominant cost of the whole pipeline. Publishing
with Spark's native bucketing (``bucketBy(n, key).sortBy(key)`` +
``saveAsTable``) records bucket metadata in the catalog, so any two
relations bucketed the same way join with ZERO Exchange on either side
(tests/test_publish.py asserts this on the executed plan).

The MANIFEST is the other half of the contract: per-bucket row/token/byte
totals let a scheduler size tasks before reading data, detect bucket skew
(a hot bucket == a hash-abuse signal), and verify a publish completed
(manifest totals vs source totals). Bucket assignment uses the
engine-portable content hash (``H60(salt||key) % n`` — the same
DuckDB-identical md5 construction the sampling/minhash family uses, see
operators/textops.py) rather than Spark's internal ``hash()``, so the
manifest is reproducible by ANY engine reading the files — the DuckDB
oracle recomputes it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60 as h60, words_col

PUBLISH_SALT = "pub"


def bucket_of(key_col: Column | str, n_buckets: int, salt: str = PUBLISH_SALT) -> Column:
    """Engine-portable bucket id: ``H60(salt || key) % n_buckets``."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(
        h60(F.concat(F.lit(salt), key.cast("string"))), F.lit(n_buckets)
    ).cast("int")


def publish_manifest(
    docs: DataFrame,
    n_buckets: int = 32,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket publish manifest: (bucket, n_docs, n_tokens, n_bytes,
    min_key, max_key). One hash-groupBy with map-side combine — the
    aggregation is by the same key the files are bucketed by, so when
    computed over an already-published table it is shuffle-free."""
    toks = F.size(F.filter(words_col(text_col), lambda w: w != ""))
    return (
        docs.select(
            bucket_of(key_col, n_buckets).alias("bucket"),
            F.col(key_col).cast("long").alias("__k"),
            toks.cast("long").alias("__t"),
            F.octet_length(text_col).cast("long").alias("__b"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
            F.sum("__b").alias("n_bytes"),
            F.min("__k").alias("min_key"),
            F.max("__k").alias("max_key"),
        )
    )


def publish_bucketed(
    docs: DataFrame,
    table: str,
    n_buckets: int = 32,
    key_col: str = "doc_id",
    mode: str = "error",
) -> None:
    """Publish the corpus as a BUCKETED, per-bucket-sorted catalog table:
    ``bucketBy(n, key).sortBy(key)`` + ``saveAsTable``. Spark records the
    bucket spec in the catalog; a subsequent equi-join between two tables
    bucketed identically on the join key runs with no Exchange on either
    side, and the sortBy enables sort-merge joins without a per-task
    sort. At 100 TB this converts every downstream corpus join from a
    full shuffle into a zipped per-bucket merge."""
    (
        docs.write.mode(mode)
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
        .format("parquet")
        .saveAsTable(table)
    )
