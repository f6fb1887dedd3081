"""Snapshot-diff / adaptive-recrawl semantics (operators/recrawl)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.recrawl import (
    change_history_stats,
    due_now,
    recrawl_schedule,
    snapshot_diff,
)


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [("a", "f1"), ("b", "f2"), ("c", "f3")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("a", "f1"), ("b", "f2x"), ("d", "f4")], "url string, fingerprint string"
    )
    got = {r["url"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged",
        "b": "changed",
        "c": "removed",
        "d": "added",
    }


@pytest.fixture(scope="module")
def history(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # hot: checked 4x, changed every time
    for i in range(4):
        rows.append(("hot", t0 + dt.timedelta(hours=i), True))
    # cold: checked 4x, never changed
    for i in range(4):
        rows.append(("cold", t0 + dt.timedelta(hours=i), False))
    # once: single unchanged check
    rows.append(("once", t0, False))
    return spark.createDataFrame(
        rows, "url string, checked_at timestamp, changed boolean"
    )


def test_schedule_adapts(history):
    DAY, HOUR = 86_400_000, 3_600_000
    sched = {
        r["url"]: r
        for r in recrawl_schedule(change_history_stats(history)).collect()
    }
    # changed-every-time converges to ~base (5/5 * base = base)
    assert sched["hot"]["interval_ms"] == DAY
    # never-changed backs off: base * 5/1 = 5 days
    assert sched["cold"]["interval_ms"] == 5 * DAY
    # single check: base * 2/1 = 2 days
    assert sched["once"]["interval_ms"] == 2 * DAY
    # clamps
    tight = recrawl_schedule(
        change_history_stats(history), base_interval_ms=1000
    ).collect()
    assert all(r["interval_ms"] == HOUR for r in tight)  # min clamp
    wide = recrawl_schedule(
        change_history_stats(history), base_interval_ms=10**12
    ).collect()
    assert all(r["interval_ms"] == 2_592_000_000 for r in wide)  # max clamp
    # next_due is last check + interval
    for r in sched.values():
        assert r["next_due_ms"] == r["last_ms"] + r["interval_ms"]


def test_due_now_budget(history):
    sched = recrawl_schedule(change_history_stats(history))
    horizon = max(r["next_due_ms"] for r in sched.collect()) + 1
    allr = due_now(sched, horizon).collect()
    assert [r["url"] for r in allr] == ["hot", "once", "cold"]  # overdue first
    assert [r["url"] for r in due_now(sched, horizon, budget=1).collect()] == [
        "hot"
    ]
    assert due_now(sched, 0).count() == 0


def test_sitemap_informed_schedule(spark):
    """Sitemap lastmod overlay: declared-change-after-last-check pulls
    next_due down to the change time; stale or absent sitemap data
    leaves the adaptive schedule untouched."""
    from pyspark.sql import Row

    from inform_spark.operators.recrawl import sitemap_informed_schedule

    sched = spark.createDataFrame(
        [
            # url, checks, changes, last_ms, interval_ms, next_due_ms
            ("a", 4, 1, 1000, 500, 1500),  # lastmod AFTER last -> due at 1200
            ("b", 4, 1, 1000, 500, 1500),  # lastmod BEFORE last -> untouched
            ("c", 4, 1, 1000, 500, 1500),  # not in sitemap -> untouched
            ("d", 4, 1, 1000, 500, 1500),  # future lastmod past due -> capped at next_due
        ],
        "url string, checks long, changes long, last_ms long, "
        "interval_ms long, next_due_ms long",
    )
    inv = spark.createDataFrame(
        [Row(url="a", lastmod_ms=1200),
         Row(url="b", lastmod_ms=900),
         Row(url="d", lastmod_ms=9999)]
    )
    out = {
        r["url"]: r
        for r in sitemap_informed_schedule(sched, inv).collect()
    }
    assert out["a"]["next_due_ms"] == 1200 and out["a"]["sitemap_override"]
    assert out["b"]["next_due_ms"] == 1500 and not out["b"]["sitemap_override"]
    assert out["c"]["next_due_ms"] == 1500 and not out["c"]["sitemap_override"]
    # a spammed future lastmod can't push the page LATER than the
    # adaptive due time (least), though it flags the override
    assert out["d"]["next_due_ms"] == 1500 and out["d"]["sitemap_override"]
    # interval model never touched by hints
    assert all(r["interval_ms"] == 500 for r in out.values())


def test_sitemap_schedule_dedupes_inventory(spark):
    """A URL listed by two urlsets must not fan the schedule out into
    two rows — the newest declared change wins."""
    from pyspark.sql import Row

    from inform_spark.operators.recrawl import sitemap_informed_schedule

    sched = spark.createDataFrame(
        [("u", 2, 1, 1000, 500, 1500)],
        "url string, checks long, changes long, last_ms long, "
        "interval_ms long, next_due_ms long",
    )
    inv = spark.createDataFrame(
        [Row(url="u", lastmod_ms=1100), Row(url="u", lastmod_ms=1300)]
    )
    rows = sitemap_informed_schedule(sched, inv).collect()
    assert len(rows) == 1
    assert rows[0]["next_due_ms"] == 1300
    assert rows[0]["sitemap_override"]
