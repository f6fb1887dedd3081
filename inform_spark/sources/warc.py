"""WARC (ISO 28500 / WARC-1.0) crawl-archive serialization and parsing.

WARC is the interchange format of web-scale crawling: Common Crawl, the
Internet Archive, and every pipeline downstream of them (C4, RefinedWeb,
FineWeb, Dolma) starts by reading ~1 GB ``.warc.gz`` files. The reference
engine writes per-page markdown files (src/crawler.js saveContent); this
module is the archive-grade equivalent for the Spark engine: crawl output
can be published as WARC shards, and foreign WARC archives can be ingested
straight into the curation operators.

Scale design
------------
- **Serialization is pure codegen** (:func:`warc_record_col`): one string
  concat per row built from ``pyspark.sql.functions`` only — no UDF, stays
  inside WholeStageCodegen, and is therefore also expressible in ANSI SQL
  (the DuckDB oracle serializes records with the identical expression).
  ``Content-Length`` uses ``octet_length`` (UTF-8 *bytes*, per the spec),
  never character length.
- **The file is the unit of parallelism on read** (Common Crawl convention:
  ~1 GB per ``warc.gz``; a 100 TB crawl is ~100k files, far above any
  realistic executor count, so per-file tasks saturate the cluster without
  sub-file splits). :func:`read_warc` maps ``binaryFile`` rows through one
  Arrow-batched parser; bytes never reach the driver.
- **Sub-file parallelism via CDX** (:func:`cdx_index`): the standard
  companion index (uri, shard, offset, length) lets a reader fan one huge
  shard out to many tasks by byte range; offsets come from a per-shard
  prefix sum over ``octet_length`` (window partitioned by shard — a shard
  is K records by construction, never corpus-wide).
- **Framing is by Content-Length only.** The parser never scans payloads
  for ``WARC/1.0`` — a crawled page ABOUT warc files would break any
  scan-based splitter. Per-record gzip members (the ``.warc.gz``
  convention: each record its own gzip member, so ranges stay seekable)
  are detected by magic and decompressed member-by-member via
  ``zlib.decompressobj``'s ``unused_data``.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CRLF = "\r\n"

WARC_OUT = StructType(
    [
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def warc_record_col(uri, date, content_type, payload):
    """A WARC/1.0 ``response`` record as ONE string column — pure
    ``F.concat`` codegen, zero UDF. ``Content-Length`` is
    ``octet_length(payload)`` (bytes of the UTF-8 encoding, per ISO 28500
    §4 — a multi-byte payload with N characters and M bytes MUST declare
    M). ``WARC-Record-ID`` is a deterministic urn:uuid derived from
    md5(uri, date) so serialization is idempotent and oracle-checkable."""
    uri = F.col(uri) if isinstance(uri, str) else uri
    date = F.col(date) if isinstance(date, str) else date
    content_type = (
        F.col(content_type) if isinstance(content_type, str) else content_type
    )
    payload = F.col(payload) if isinstance(payload, str) else payload
    # F.concat null-propagates: a NULL uri/date would SILENTLY drop the
    # whole record (shard concat skips it, cdx_index emits a null-length
    # row — file and index disagree). Fail loudly instead; a missing
    # payload/content-type is legitimate and becomes empty.
    uri = F.when(
        uri.isNotNull() & date.isNotNull(), uri
    ).otherwise(F.raise_error(F.lit("warc_record_col: NULL uri or date")))
    content_type = F.coalesce(content_type, F.lit(""))
    payload = F.coalesce(payload, F.lit(""))
    digest = F.md5(F.concat_ws("\n", uri, date))
    record_id = F.concat(
        F.lit("<urn:uuid:"),
        F.substring(digest, 1, 8),
        F.lit("-"),
        F.substring(digest, 9, 4),
        F.lit("-"),
        F.substring(digest, 13, 4),
        F.lit("-"),
        F.substring(digest, 17, 4),
        F.lit("-"),
        F.substring(digest, 21, 12),
        F.lit(">"),
    )
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Target-URI: "),
        uri,
        F.lit(CRLF),
        F.lit("WARC-Date: "),
        date,
        F.lit(CRLF),
        F.lit("WARC-Record-ID: "),
        record_id,
        F.lit(CRLF),
        F.lit("Content-Type: "),
        content_type,
        F.lit(CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(CRLF),
        F.lit(CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


def serialize_warc(
    df: DataFrame,
    uri_col: str = "uri",
    date_col: str = "warc_date",
    content_type_col: str = "content_type",
    payload_col: str = "payload",
    out_col: str = "warc",
) -> DataFrame:
    """Append a ``warc`` string column holding each row's full record."""
    return df.withColumn(
        out_col, warc_record_col(uri_col, date_col, content_type_col, payload_col)
    )


def write_warc(df: DataFrame, path: str, record_col: str = "warc", mode: str = "error"):
    """Publish records as WARC shards: one file per partition, records
    back-to-back, byte-exact. The text source appends ``lineSep`` after
    EVERY row and refuses an empty separator, so each record's trailing
    CRLF is stripped and ``lineSep='\\r\\n'`` puts the identical bytes
    back — output files parse with the same framing as in-memory
    buffers, and :func:`cdx_index` offsets hold against them. Partition
    the frame by shard before calling (``df.repartition('shard')``) to
    control file count/size; Common Crawl targets ~1 GB per file."""
    body = F.expr(f"substring({record_col}, 1, length({record_col}) - 2)")
    df.select(body.alias("r")).write.mode(mode).option("lineSep", "\r\n").text(path)


def _parse_headers(block: bytes) -> dict[str, str]:
    lines = block.split(b"\r\n")
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {lines[:1]!r}")
    out: dict[str, str] = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(b":")
        out[k.decode("ascii").strip().lower()] = v.decode("utf-8", "replace").strip()
    return out


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield parsed records from a buffer of concatenated WARC records,
    plain or per-record-gzip (members detected by magic ``1f 8b``).
    Framing is strictly ``Content-Length``-driven; stray CR/LF between
    records (e.g. a writer that appended a newline per record) is
    tolerated and skipped."""
    pos, n = 0, len(blob)
    mv = memoryview(blob)
    while pos < n:
        while pos < n and blob[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            return
        if blob[pos : pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            # memoryview slice: zero-copy — a bytes slice here would
            # memmove the remaining buffer once PER MEMBER (O(n^2) over
            # a 50k-member .warc.gz shard)
            member = d.decompress(mv[pos:])
            consumed = (n - pos) - len(d.unused_data)
            yield from iter_warc_records(member)
            pos += consumed
            continue
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_headers(blob[pos:hdr_end])
        clen = int(headers.get("content-length", "0"))
        if clen < 0:
            # a negative length would move pos BACKWARD — at best garbage
            # records, at worst an infinite re-parse of the same bytes
            raise ValueError(f"negative WARC Content-Length: {clen}")
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError(
                f"truncated WARC payload: need {clen} bytes at {body_start}, "
                f"have {n - body_start}"
            )
        yield {
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": blob[body_start : body_start + clen],
        }
        pos = body_start + clen


def parse_warc(df: DataFrame, blob_col: str = "content") -> DataFrame:
    """Explode a frame of WARC buffers (one file/shard per row, ``binary``
    or ``string``) into one row per record via an Arrow-batched
    ``mapInPandas`` — buffers stay executor-side end to end."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in WARC_OUT.fields}
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                if isinstance(blob, str):
                    blob = blob.encode("utf-8")
                for rec in iter_warc_records(bytes(blob)):
                    for k, v in rec.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.select(blob_col).mapInPandas(parse, WARC_OUT)


def read_warc(spark, path_glob: str) -> DataFrame:
    """Ingest WARC files: ``binaryFile`` scan (one task per file — the
    Common Crawl parallelism unit) -> record parser. For sub-file
    parallelism on oversized shards, range-read via a :func:`cdx_index`
    companion instead."""
    files = spark.read.format("binaryFile").load(path_glob)
    return parse_warc(files, "content")


def cdx_index(
    df: DataFrame,
    shard_col: str = "shard",
    order_col: str = "doc_id",
    uri_col: str = "uri",
    record_col: str = "warc",
) -> DataFrame:
    """CDX-style companion index: (uri, shard, offset, length) with
    ``offset`` = exclusive prefix sum of record byte lengths within the
    shard in write order. A reader task can then ``seek(offset);
    read(length)`` — sub-file parallelism without scanning. The window is
    per-shard (bounded rows by construction), never corpus-global."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    length = F.octet_length(record_col).cast("long")
    return df.select(
        F.col(uri_col).alias("uri"),
        F.col(shard_col).alias("shard"),
        F.coalesce(F.sum(length).over(w), F.lit(0)).cast("long").alias("offset"),
        length.alias("length"),
    )
