"""Exact value-histogram quantiles (operators/stats.value_quantiles)."""

import pytest

from pyspark.sql import functions as F

from inform_spark.operators.stats import value_quantiles

SCHEMA = "doc_id long, lang string, n_chars long"


def _ref_quantiles(rows, ps=(25, 50, 75, 90, 99)):
    """Sequential nearest-rank reference: value at rank ceil(p/100*n)."""
    import math

    by = {}
    for _, lang, v in rows:
        if v is not None:
            by.setdefault(lang, []).append(v)
    out = {}
    for lang, vs in by.items():
        vs.sort()
        n = len(vs)
        out[lang] = (n,) + tuple(
            vs[max(0, math.ceil(p * n / 100) - 1)] for p in ps
        )
    return out


def test_matches_sequential_nearest_rank(spark):
    import random

    rng = random.Random(13)
    rows = [
        (i, ["en", "de", "fr"][i % 3], rng.randrange(0, 500))
        for i in range(200)
    ]
    got = {
        r["lang"]: (r["n_rows"], r["p25"], r["p50"], r["p75"], r["p90"], r["p99"])
        for r in value_quantiles(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert got == _ref_quantiles(rows)


def test_duplicates_and_tiny_groups(spark):
    rows = [
        (0, "a", 5), (1, "a", 5), (2, "a", 5),   # all-equal group
        (3, "b", 1),                              # singleton: every p = 1
        (4, "c", 1), (5, "c", 100),               # p50 of [1,100] -> 1
    ]
    got = {
        r["lang"]: (r["n_rows"], r["p50"], r["p99"])
        for r in value_quantiles(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got["a"] == (3, 5, 5)
    assert got["b"] == (1, 1, 1)
    assert got["c"] == (2, 1, 100)
    ref = _ref_quantiles(rows)
    for lang, (n, p50, p99) in got.items():
        assert (n, p50, p99) == (ref[lang][0], ref[lang][2], ref[lang][5])


def test_nulls_excluded(spark):
    rows = [(0, "a", 10), (1, "a", None), (2, "b", None)]
    got = {r["lang"]: r for r in
           value_quantiles(spark.createDataFrame(rows, SCHEMA)).collect()}
    assert got["a"]["n_rows"] == 1 and got["a"]["p50"] == 10
    assert "b" not in got  # all-NULL group has no ranks


def test_partitioning_invariant(spark):
    rows = [(i, "x", (i * 37) % 23) for i in range(120)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(tuple(r) for r in value_quantiles(df).collect())
    b = sorted(
        tuple(r)
        for r in value_quantiles(df.repartition(11, "doc_id")).collect()
    )
    assert a == b
