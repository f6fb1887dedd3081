"""Generate the committed golden oracles for the crawl-engine driver
queries (``crawl_documents`` / ``crawl_seen_order`` in __spark_entry__).

The golden rows come from the PLAIN-PYTHON sequential reference semantics
(inform_spark.reference_impl — inform src/WebCrawler.js:244-273 at
concurrency=1), NOT from the Spark engine, so the driver's DuckDB
side-by-side check (`oracle_sql` reads these parquet files via
read_parquet) is a real independent oracle. tests/test_spark_entry_golden.py
regenerates the rows on every test run and fails if the committed files
drift.

Run: ``python tests/make_golden.py``  (pure Python — no Spark session).
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("text_md5", pa.string()),
    ]
)
SEEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),
        ("crawl_rank", pa.int64()),
    ]
)


def golden_rows() -> tuple[list[dict], list[dict]]:
    """(crawl_documents rows, crawl_seen_order rows) from the sequential
    oracle on the CRAWL_FIXTURE site — deterministic, seed 42."""
    import __spark_entry__ as entry
    from inform_spark.reference_impl import crawl_sequential
    from inform_spark.sources.pages import generate_site

    fx = entry.CRAWL_FIXTURE
    pages, robots = generate_site(fx["n_hosts"], fx["pages_per_host"])
    res = crawl_sequential(pages, robots, fx["seed"], limit=fx["limit"])
    doc_rows = [
        {
            "doc_id": d["doc_id"],
            "url": url,
            "kind": s["kind"],
            "media_ref": s["media_ref"],
            "offset": s["offset"],
            "text_md5": hashlib.md5((s["text"] or "").encode()).hexdigest(),
        }
        for url, d in res.documents.items()
        for s in d["spans"]
    ]
    seen_rows = [
        {"url": u, "status": res.seen[u], "crawl_rank": i + 1}
        for i, u in enumerate(res.order)
    ]
    return doc_rows, seen_rows


def write_golden(out_dir: str) -> tuple[int, int]:
    doc_rows, seen_rows = golden_rows()
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(doc_rows, schema=DOC_SCHEMA),
        os.path.join(out_dir, "crawl_documents.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(seen_rows, schema=SEEN_SCHEMA),
        os.path.join(out_dir, "crawl_seen_order.parquet"),
    )
    return len(doc_rows), len(seen_rows)


if __name__ == "__main__":
    import __spark_entry__ as entry

    n_docs, n_seen = write_golden(entry.GOLDEN_DIR)
    print(f"wrote {n_docs} span rows + {n_seen} seen rows -> {entry.GOLDEN_DIR}")
