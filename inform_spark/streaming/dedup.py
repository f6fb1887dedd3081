"""Continuous-ingest incremental dedup — the streaming form of
``operators.components.minhash_incremental``.

A production corpus is not rebuilt; it ACCRETES: crawl output arrives
continuously, each arriving document is judged against the signature
index of everything already accepted, survivors are appended to both
the corpus and the index, duplicates are tombstoned with an
attribution. This module runs that loop as a Structured Streaming query
(``readStream`` → ``foreachBatch``):

- the stream is any streaming DataFrame of (doc_id, text) — file source,
  Kafka, or the crawl engine's documents output;
- per micro-batch, ``foreachBatch`` loads the persisted band-key index
  (parquet; at scale an Iceberg table bucketed by band_key so the probe
  join is co-located), runs the same deterministic batch operator, and
  appends the verdicts + the kept docs' band keys — the index is only
  ever appended to, mirroring the engine's append-only seen/attempts
  tables;
- IN-BATCH duplicates resolve exactly like the batch op (connected
  components, min doc_id survives), so results are independent of how
  the stream happens to be chopped into micro-batches ONLY up to
  arrival order: like the crawl engine's seen-set, first-arrival wins
  across batches. With ``availableNow`` and a single batch, the output
  is byte-identical to the batch operator — the equivalence the test
  asserts.

Exactly-once: foreachBatch can replay a batch after a crash; the writes
here are idempotent per batch_id (the verdict sink partitions by
batch_id and replaces, matching Spark's foreachBatch contract).

Scale: state lives entirely in the index table, not the state store —
there is no watermark and no unbounded driver memory; a 100 TB corpus's
index is its band keys (~4 rows/doc), bucketed by band_key so each
micro-batch probe touches only matching buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BANDS_SCHEMA = "doc_id long, band_key string"


def init_index(spark: SparkSession, index_dir: str, docs: DataFrame | None = None,
               k: int = 8, band: int = 2) -> None:
    """Create the persisted band-key index, optionally seeded with an
    existing corpus. At scale: an Iceberg table bucketed by band_key."""
    from inform_spark.operators import textops

    seed = (
        textops.minhash_band_keys(docs, k, band)
        if docs is not None
        else spark.createDataFrame([], BANDS_SCHEMA)
    )
    seed.write.mode("overwrite").parquet(index_dir)


def dedup_stream(
    stream: DataFrame,
    index_dir: str,
    verdicts_dir: str,
    checkpoint_dir: str,
    k: int = 8,
    band: int = 2,
    available_now: bool = True,
):
    """Run the continuous dedup loop on a streaming (doc_id, text)
    DataFrame. Returns the StreamingQuery (caller awaits termination).

    Every micro-batch: probe the index, write (doc_id, verdict,
    match_id, batch_id) to ``verdicts_dir`` (partitioned by batch_id —
    idempotent on foreachBatch replay), append kept+new-survivor band
    keys to ``index_dir``."""
    from inform_spark.operators import textops
    from inform_spark.operators.components import connected_components

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        index = spark.read.schema(BANDS_SCHEMA).parquet(index_dir)
        # minhash_incremental probes (doc_id, band_key) via band keys of
        # index_docs; here the index already IS band keys, so inline the
        # probe against it (no re-signature of the corpus)
        nb = textops.minhash_band_keys(batch_df, k, band).persist()
        hits = (
            nb.join(
                index.select(F.col("doc_id").alias("__idx"), "band_key"),
                "band_key",
            )
            .groupBy("doc_id")
            .agg(F.min("__idx").alias("__hit"))
        )
        survivors_b = nb.join(hits, "doc_id", "left_anti")
        comp = connected_components(
            textops.pairs_from_bands(survivors_b), "a", "b"
        ).withColumnRenamed("v", "doc_id")
        verdicts = (
            batch_df.select("doc_id")
            .distinct()
            .join(hits, "doc_id", "left")
            .join(comp, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("__hit").isNotNull(), F.lit("dup_of_index"))
                .when(
                    F.col("component").isNotNull()
                    & (F.col("component") != F.col("doc_id")),
                    F.lit("dup_of_new"),
                )
                .otherwise(F.lit("kept"))
                .alias("verdict"),
                F.coalesce(
                    "__hit",
                    F.when(
                        F.col("component") != F.col("doc_id"),
                        F.col("component"),
                    ),
                ).alias("match_id"),
                F.lit(batch_id).alias("batch_id"),
            )
        )
        # idempotent on replay: the batch overwrites only its own partition
        verdicts.write.mode("overwrite").partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(verdicts_dir)
        # read the just-committed verdicts back rather than recomputing the
        # whole probe lineage a second time
        kept_ids = (
            spark.read.parquet(verdicts_dir)
            .filter(
                (F.col("batch_id") == batch_id) & (F.col("verdict") == "kept")
            )
            .select("doc_id")
        )
        kept_bands = nb.join(kept_ids, "doc_id", "left_semi").select(
            "doc_id", "band_key"
        )
        kept_bands.write.mode("append").parquet(index_dir)
        nb.unpersist()

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_verdicts(spark: SparkSession, verdicts_dir: str) -> DataFrame:
    if not os.path.isdir(verdicts_dir):
        return spark.createDataFrame(
            [], "doc_id long, verdict string, match_id long, batch_id long"
        )
    return spark.read.parquet(verdicts_dir)
