"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference stores media only as markdown links (``![alt](src)`` spans,
media_ref in our span model — reference src/WebCrawler.js rendering path);
a 100 TB training-data pipeline additionally needs the *bytes*. This module
defines the Spark-side plumbing — schema, partitioning, Arrow batch shape,
``mapInPandas`` UDF signatures — as real, tested code, while the actual
codec calls (PIL/ffmpeg are not in this container) are isolated behind
``decode_image_stub``: a deterministic fake decoder so every downstream
shape is exercised end-to-end. Swapping in a real codec changes ONE
function, not the pipeline.

Design for scale:
- media rows are fat (binary column): process with ``mapInPandas`` so one
  task streams Arrow batches instead of collecting rows; batch size is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- partition by ``pmod(xxhash64(media_ref), N)`` — content-hash partitioning
  balances skew from hot documents.
- metadata (width/height/format/...) lives in NARROW typed columns so
  filters like ``width >= 512`` prune without touching bytes (column
  pruning keeps the binary out of the scan unless selected).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("content_len", LongType(), False),
        StructField("format", StringType(), True),  # png/jpeg/wav/mp4/...
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", FloatType(), True),
        StructField("phash", LongType(), True),  # perceptual hash (8x8 DCT-free)
        StructField("decode_ok", StringType(), False),  # ok | stub | error
    ]
)

FRAME_SAMPLE = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def synthesize_media(docs_with_media: DataFrame) -> DataFrame:
    """Deterministic fake media table from the media spans of a crawl
    (seeded by media_ref) — stands in for the fetch-bytes stage which the
    sandbox cannot perform. Pure column ops: the 'bytes' are a zlib-ish
    deterministic function of the ref string."""
    return docs_with_media.select(
        F.col("media_ref"),
        F.col("doc_id"),
        F.lit("image").alias("kind"),
        F.encode(
            F.concat(F.lit("FAKEPNG:"), F.col("media_ref")), "utf-8"
        ).cast("binary").alias("content"),
        F.length(F.col("media_ref")).cast("long").alias("content_len"),
        F.lower(F.regexp_extract("media_ref", r"\.(\w+)$", 1)).alias("format"),
    )


def decode_image_stub(content: bytes | None, ref: str) -> dict:
    """Deterministic fake decode. A real deployment replaces this body with
    PIL.Image.open(BytesIO(content)); everything else in the pipeline is
    unchanged. Raises for None content like a real decoder would.

    Returns width/height/mean_luma/phash derived from a seeded hash of the
    bytes so tests can assert exact values.
    """
    if content is None:
        raise ValueError(f"no content for {ref}")
    h = hashlib.md5(content).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    width = int(64 + (h[4] % 16) * 64)  # 64..1024, deterministic
    height = int(64 + (h[5] % 16) * 64)
    luma = float(rng.uniform(0, 255))
    phash = int.from_bytes(h[6:14], "big", signed=False) >> 1
    return {
        "width": width,
        "height": height,
        "mean_luma": round(luma, 3),
        "phash": phash,
    }


def image_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched, binary
    column never leaves the executor). Content-hash repartition balances
    hot-document skew before the CPU-heavy stage."""
    n = partitions or media.sparkSession.sparkContext.defaultParallelism

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "doc_id": [], "width": [], "height": [],
                "mean_luma": [], "phash": [], "decode_ok": [],
            }
            for ref, doc, content in zip(
                pdf["media_ref"], pdf["doc_id"], pdf["content"]
            ):
                out["media_ref"].append(ref)
                out["doc_id"].append(doc)
                try:
                    f = decode_image_stub(
                        bytes(content) if content is not None else None, ref
                    )
                    out["width"].append(f["width"])
                    out["height"].append(f["height"])
                    out["mean_luma"].append(f["mean_luma"])
                    out["phash"].append(f["phash"])
                    out["decode_ok"].append("stub")
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_luma"].append(None)
                    out["phash"].append(None)
                    out["decode_ok"].append("error")
            yield pd.DataFrame(out)

    return (
        media.repartition(n, F.pmod(F.xxhash64("media_ref"), F.lit(n)))
        .mapInPandas(extract, schema=IMAGE_FEATURES)
    )


def resize_stub(media: DataFrame, max_px: int = 256) -> DataFrame:
    """'Resize' plumbing: same mapInPandas shape as a real thumbnailer; the
    stub truncates the fake bytes deterministically (a real impl calls
    PIL thumbnail + re-encode)."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                None if c is None else bytes(c)[: max_px * 4]
                for c in pdf["content"]
            ]
            out = pdf.copy()
            out["content"] = content
            out["content_len"] = [0 if c is None else len(c) for c in content]
            yield out

    return media.mapInPandas(shrink, schema=MEDIA)


def sample_frames_stub(media: DataFrame, every_ms: int = 1000, n_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing (1 row in -> n rows out via
    mapInPandas): real impl shells to a decoder; stub emits deterministic
    crc-tagged frames so ordering/fan-out is testable."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                for i in range(n_frames):
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    tag = zlib.crc32(f"{ref}:{i}".encode()) & 0xFFFFFFFF
                    out["frame"].append(
                        None if content is None else tag.to_bytes(4, "big")
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind").isin("video", "image")).mapInPandas(
        sample, schema=FRAME_SAMPLE
    )


def near_dup_by_phash(features: DataFrame, hamming_max: int = 4) -> DataFrame:
    """Near-duplicate images by perceptual-hash band bucketing: split the
    64-bit phash into 4 x 16-bit bands; candidates share >= 1 band
    (pigeonhole guarantees recall for hamming distance <= 3 across 4 bands);
    exact popcount filter on candidates. Never an O(n^2) cross join."""
    bands = features.select(
        "media_ref",
        "phash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(j),
                        F.shiftright("phash", j * 16).bitwiseAND(F.lit(0xFFFF)),
                    )
                    for j in range(4)
                ]
            )
        ).alias("band_key"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(r, "band_key")
        .filter(F.col("l.media_ref") < F.col("r.media_ref"))
        .select(
            F.col("l.media_ref").alias("a"),
            F.col("r.media_ref").alias("b"),
            F.col("l.phash").alias("ph_a"),
            F.col("r.phash").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.withColumn("hamming", hamming.cast("int")).filter(
        F.col("hamming") <= hamming_max
    ).select("a", "b", "hamming")
