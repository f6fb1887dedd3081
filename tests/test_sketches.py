"""HyperLogLog sketch semantics (operators/sketches).

Cross-engine exactness is pinned by the driver oracle
(hll_host_cardinality); these tests pin the MERGEABILITY claim (the
reason a sketch beats count-distinct at 10^10 scale), the
two-regime estimator switch, accuracy bounds, and
partitioning-independence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.sketches import (
    _lc_milli_table,
    hll_cardinality,
    hll_estimate,
    hll_registers,
)


@pytest.fixture(scope="module")
def items(spark):
    # 2 keys x ~900 distinct items with duplication
    return (
        spark.range(6000)
        .select(
            F.concat(F.lit("k"), (F.col("id") % 2).cast("string")).alias("key"),
            F.concat(F.lit("u"), (F.col("id") % 1800).cast("string")).alias(
                "item"
            ),
        )
        .cache()
    )


def test_merge_equals_whole(spark, items):
    """THE sketch property: registers built on two disjoint halves,
    union-merged with MAX, estimate row-for-row equal to the
    whole-corpus build — incremental maintenance is append+max, never
    a rebuild."""
    whole = hll_registers(items, "item", ["key"])
    empty = hll_registers(items.limit(0), "item", ["key"])
    # split by a hash of the item so both halves carry every key
    lo = items.filter(F.crc32(F.col("item")) % 2 == 0)
    hi = items.filter(F.crc32(F.col("item")) % 2 == 1)
    merged = (
        hll_registers(lo, "item", ["key"])
        .unionByName(hll_registers(hi, "item", ["key"]))
        .groupBy("key", "bucket")
        .agg(F.max("register").alias("register"))
    )
    est_whole = {
        r["key"]: (r["sum_scaled"], r["est_milli"])
        for r in hll_estimate(whole, ["key"]).collect()
    }
    est_merged = {
        r["key"]: (r["sum_scaled"], r["est_milli"])
        for r in hll_estimate(merged, ["key"]).collect()
    }
    assert est_whole == est_merged
    assert empty.count() == 0  # degenerate input yields no registers


def test_accuracy_within_bound(spark, items):
    """m=64 standard error is 1.04/sqrt(64) ~ 13%; assert every key's
    estimate is within 3 sigma of the exact count."""
    rows = hll_cardinality(items, "item", ["key"]).collect()
    assert len(rows) == 2
    for r in rows:
        est = r["est_milli"] / 1000.0
        exact = r["exact_distinct"]
        assert abs(est - exact) / exact < 0.39, (r["key"], est, exact)


def test_linear_counting_regime(spark):
    """A tiny set must take the committed linear-counting branch:
    est_milli equals the table value floor(64*ln(64/V)*1000) for the
    observed zero-register count, and is close to exact."""
    small = spark.range(10).select(
        F.lit("k").alias("key"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("item"),
    )
    row = hll_cardinality(small, "item", ["key"]).collect()[0]
    v = row["n_zero_registers"]
    assert v > 0
    assert row["est_milli"] == _lc_milli_table(64)[v - 1]
    assert abs(row["est_milli"] / 1000.0 - 10) < 3


def test_partitioning_independent(spark, items):
    a = sorted(
        tuple(r) for r in hll_cardinality(items, "item", ["key"]).collect()
    )
    b = sorted(
        tuple(r)
        for r in hll_cardinality(
            items.repartition(17), "item", ["key"]
        ).collect()
    )
    assert a == b


def test_p_range_guard(spark, items):
    with pytest.raises(ValueError):
        hll_registers(items, "item", ["key"], p=2)
    with pytest.raises(ValueError):
        hll_registers(items, "item", ["key"], p=20)


def test_register_bounds(spark, items):
    """Registers stay in the provable [1, 61-p] range — the int64
    safety envelope of the scaled sum."""
    regs = hll_registers(items, "item", ["key"], p=6).collect()
    assert all(1 <= r["register"] <= 55 for r in regs)
    assert all(0 <= r["bucket"] < 64 for r in regs)
