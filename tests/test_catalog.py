"""Iceberg-shaped snapshot catalog: time-travel, history, rollback,
compaction, vacuum. The reference has no persistence at all (in-memory
sets, src/WebCrawler.js:54-58); these semantics implement the north_rule's
"checkpointed to Iceberg, resumable mid-crawl with per-partition lineage"
on plain parquet (no Iceberg runtime jar ships in this container —
checkpoint.py module docstring documents the mapping)."""

import os

import pytest
from pyspark.sql import functions as F

from inform_spark import schemas
from inform_spark.plans.checkpoint import CrawlCheckpoint, SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(
        spark, str(tmp_path), "t", "id long, val string"
    )


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )


def test_time_travel_reads_pinned_snapshot(spark, table):
    table.append(_df(spark, 0, 10), "a", n_files=1)
    table.append(_df(spark, 10, 30), "b", n_files=1)
    table.append(_df(spark, 30, 35), "c", n_files=1)
    assert table.read().count() == 35
    assert table.read_at(1).count() == 10
    assert table.read_at(2).count() == 30
    assert table.read_at(3).count() == 35
    assert table.read_at(0).count() == 0
    assert [s["version"] for s in table.snapshots()] == [1, 2, 3]


def test_compact_preserves_rows_and_keeps_time_travel(spark, table):
    for i in range(5):
        table.append(_df(spark, i * 10, i * 10 + 10), f"d{i}", n_files=2)
    before = {r["id"] for r in table.read().collect()}
    v = table.compact(n_files=1)
    assert v == 6
    after = {r["id"] for r in table.read().collect()}
    assert after == before
    # one dir, one file
    assert len(table._dirs) == 1
    files = [f for f in os.listdir(table._dirs[0]) if f.endswith(".parquet")]
    assert len(files) == 1
    # pre-compaction snapshots still readable (dirs not yet expired)
    assert table.read_at(2).count() == 20


def test_vacuum_expires_old_dirs(spark, table):
    for i in range(3):
        table.append(_df(spark, i * 10, i * 10 + 10), f"d{i}", n_files=1)
    table.compact(n_files=1)
    n_dirs_before = len(os.listdir(table.data_dir))
    removed = table.vacuum()
    assert removed == 3  # the three pre-compaction deltas
    assert len(os.listdir(table.data_dir)) == n_dirs_before - 3
    assert table.read().count() == 30  # current snapshot intact
    assert [s["version"] for s in table.snapshots()] == [4]


def test_catalog_history_and_rollback(spark, tmp_path):
    cat = CrawlCheckpoint(
        spark, str(tmp_path / "cat"), {"t": schemas.LINEAGE}
    )
    row = lambda b: (b, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0)  # noqa: E731
    cat.tables["t"].append_rows([row(1)], "b1")
    cat.commit({"batch_id": 1})
    cat.tables["t"].append_rows([row(2)], "b2")
    cat.commit({"batch_id": 2})
    cat.tables["t"].append_rows([row(3)], "b3")
    cat.commit({"batch_id": 3})

    h = cat.history()
    assert [c["state"]["batch_id"] for c in h] == [1, 2, 3]
    assert [c["state"]["_commit_seq"] for c in h] == [1, 2, 3]

    st = cat.rollback(2)
    assert st["batch_id"] == 2
    assert cat.tables["t"].read().count() == 2

    # a fresh catalog object restores the rolled-back head
    cat2 = CrawlCheckpoint(spark, str(tmp_path / "cat"), {"t": schemas.LINEAGE})
    st2 = cat2.restore()
    assert st2["batch_id"] == 2
    assert cat2.tables["t"].read().count() == 2


def test_engine_resume_after_rollback_matches_straight_run(spark, tmp_path):
    """Rollback to a batch boundary + resume == never having crawled past
    it: the crawl is deterministic, so the end states must be identical."""
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.schemas import ROBOTS
    from inform_spark.sources.pages import generate_site

    pages, robots = generate_site(2, 18)
    pages_df = spark.createDataFrame(pages)
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    )
    cfg = CrawlConfig(seeds=["https://site0.test/"], limit=40)

    ref = CrawlEngine(spark, pages_df, robots_df, cfg,
                      checkpoint_dir=str(tmp_path / "ref"))
    ref.run()
    expect = {(r["url"], r["crawl_rank"]) for r in ref.seen().collect()}

    eng = CrawlEngine(spark, pages_df, robots_df, cfg,
                      checkpoint_dir=str(tmp_path / "rb"))
    eng.run()  # complete crawl: commits at seeds + each batch
    h = eng.catalog.history()
    assert len(h) >= 3
    # roll back to after the FIRST crawl batch, then resume on a fresh
    # engine — it must replay the remaining batches identically
    eng.catalog.rollback(2)
    eng2 = CrawlEngine(spark, pages_df, robots_df, cfg,
                       checkpoint_dir=str(tmp_path / "rb"))
    eng2.run(resume=True)
    got = {(r["url"], r["crawl_rank"]) for r in eng2.seen().collect()}
    assert got == expect


def _site_engine(spark, tmp_path, name, **cfg_kw):
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.schemas import ROBOTS
    from inform_spark.sources.pages import generate_site

    pages, robots = generate_site(2, 18)
    pages_df = spark.createDataFrame(pages)
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    )
    cfg = CrawlConfig(seeds=["https://site0.test/"], limit=40, **cfg_kw)
    return CrawlEngine(spark, pages_df, robots_df, cfg,
                       checkpoint_dir=str(tmp_path / name))


def test_partition_lineage_matches_batch_totals(spark, tmp_path):
    eng = _site_engine(spark, tmp_path, "pl")
    eng.run()
    lin = {r["batch_id"]: r for r in eng.lineage().collect()}
    pl = eng.partition_lineage().collect()
    assert pl, "no partition lineage rows"
    by_batch = {}
    for r in pl:
        by_batch.setdefault(r["batch_id"], []).append(r)
    for b, rows in by_batch.items():
        assert sum(r["rows"] for r in rows) == lin[b]["pages_attempted"]
        los = [r["offset_lo"] for r in rows if r["offset_lo"] is not None]
        his = [r["offset_hi"] for r in rows if r["offset_hi"] is not None]
        assert min(los) == lin[b]["offset_lo"]
        assert max(his) == lin[b]["offset_hi"]


def test_compact_every_batch_preserves_results(spark, tmp_path):
    ref = _site_engine(spark, tmp_path, "nc")
    ref.run()
    expect = {(r["url"], r["crawl_rank"], r["status"])
              for r in ref.seen().collect()}

    eng = _site_engine(spark, tmp_path, "cc", compact_every_batches=1)
    eng.run()
    got = {(r["url"], r["crawl_rank"], r["status"])
           for r in eng.seen().collect()}
    assert got == expect
    # every batch folded the deltas: exactly one live dir per table
    assert len(eng.catalog.tables["attempts"]._dirs) == 1
    assert len(eng.catalog.tables["frontier"]._dirs) == 1
    # and a resumed crawl on the compacted checkpoint still behaves
    eng2 = _site_engine(spark, tmp_path, "cc", compact_every_batches=1)
    s = eng2.run(resume=True)
    assert s.attempted == 0  # nothing live left
    assert {(r["url"], r["crawl_rank"], r["status"])
            for r in eng2.seen().collect()} == expect
