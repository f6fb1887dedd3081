"""The committed golden oracle (tests/golden/*.parquet) must stay in sync
with the sequential reference semantics, and the engine's driver queries
must match it — closing the loop for the driver's DuckDB side-by-side
check on the two crawl queries."""

import os
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _read_committed(name: str) -> list[dict]:
    import __spark_entry__ as entry

    path = os.path.join(entry.GOLDEN_DIR, f"{name}.parquet")
    return pq.read_table(path).to_pylist()


def test_golden_matches_sequential_oracle():
    """Regenerate from reference_impl (pure Python) and diff against the
    committed files — catches fixture or renderer drift."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_golden import golden_rows

    doc_rows, seen_rows = golden_rows()
    assert _read_committed("crawl_documents") == doc_rows
    assert _read_committed("crawl_seen_order") == seen_rows


def test_engine_crawl_queries_match_golden(spark):
    """The Spark engine's q_crawl_documents / q_crawl_seen_order equal the
    golden row-for-row (what the driver's hash compare checks at sf0.01)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    seen = sorted(
        (r.asDict() for r in qs["crawl_seen_order"](spark, "").collect()),
        key=lambda r: r["crawl_rank"],
    )
    assert seen == _read_committed("crawl_seen_order")

    key = lambda r: (r["url"], r["offset"])  # noqa: E731
    docs = sorted((r.asDict() for r in qs["crawl_documents"](spark, "").collect()), key=key)
    golden = sorted(_read_committed("crawl_documents"), key=key)
    assert docs == golden
