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


def test_cross_implementation_random_sweep(spark):
    """500 seeded-random (key, item) pairs: the Spark sketch must equal
    an INDEPENDENT pure-Python HLL (same published algorithm, separate
    code path) on every column — a third implementation alongside the
    DuckDB oracle."""
    import hashlib
    import random

    rng = random.Random(20260819)
    rows = [
        (
            f"k{rng.randrange(3)}",
            "i" + str(rng.randrange(1, 10 ** rng.randrange(1, 5))),
        )
        for _ in range(500)
    ]

    def py_hll(pairs, p=6, salt="hll"):
        m = 1 << p
        sh = 61 - p
        regs: dict[tuple[str, int], int] = {}
        exact: dict[str, set] = {}
        for k, it in pairs:
            exact.setdefault(k, set()).add(it)
            h = int(hashlib.md5((salt + it).encode()).hexdigest()[:15], 16)
            b = h % m
            w = h // m
            rank = (60 - p) - (w.bit_length() - 1) if w > 0 else 61 - p
            regs[(k, b)] = max(regs.get((k, b), 0), rank)
        import math as _math

        from inform_spark.operators.sketches import _c_literal

        out = {}
        c = _c_literal(m, p)
        lc = _lc_milli_table(m)
        for k in exact:
            present = [r for (kk, _), r in regs.items() if kk == k]
            v = m - len(present)
            s = sum(1 << (sh - r) for r in present) + v * (1 << sh)
            raw = _math.floor(c / float(s) * 1000.0)
            est = lc[v - 1] if (raw <= 2500 * m and v > 0) else raw
            out[k] = (len(exact[k]), v, s, est)
        return out

    expected = py_hll(rows)
    got = {
        r["key"]: (
            r["exact_distinct"],
            r["n_zero_registers"],
            r["sum_scaled"],
            r["est_milli"],
        )
        for r in hll_cardinality(
            spark.createDataFrame(rows, "key string, item string"),
            "item",
            ["key"],
        ).collect()
    }
    assert got == expected


def test_null_items_ignored(spark):
    """NULL item = no observation: it must not create a phantom
    max-rank register, keeping the sketch consistent with
    countDistinct (which ignores NULLs)."""
    with_null = spark.createDataFrame(
        [("k", "a"), ("k", "b"), ("k", None)], "key string, item string"
    )
    without = spark.createDataFrame(
        [("k", "a"), ("k", "b")], "key string, item string"
    )
    a = [tuple(r) for r in hll_cardinality(with_null, "item", ["key"]).collect()]
    b = [tuple(r) for r in hll_cardinality(without, "item", ["key"]).collect()]
    assert a == b


def test_estimate_p_guard(spark, items):
    """Estimating a table built at a larger p must raise (impossible
    bucket count), not return garbage."""
    from pyspark.errors import SparkRuntimeException

    regs8 = hll_registers(items, "item", ["key"], p=8)
    with pytest.raises(SparkRuntimeException, match="larger p"):
        hll_estimate(regs8, ["key"], p=6).collect()


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _cms_rows(spark, rows):
    return spark.createDataFrame(rows, "item string")


def test_cms_overestimates_never_under(spark):
    """est >= true for EVERY item, by construction (collisions only add).
    width=8 under 40 distinct items guarantees real collisions."""
    from inform_spark.operators.sketches import cms_frequencies

    rows = [(f"k{i % 40}",) for i in range(400)]
    out = cms_frequencies(
        _cms_rows(spark, rows), "item", depth=4, width=8
    ).collect()
    assert len(out) == 40
    assert all(r["cms_est"] >= r["true_cnt"] for r in out)
    assert any(r["cms_est"] > r["true_cnt"] for r in out)  # collisions real


def test_cms_exact_when_collision_free(spark):
    """With width >> distinct items, every estimate is exact."""
    from inform_spark.operators.sketches import cms_frequencies

    rows = [(f"k{i % 5}",) for i in range(50)]
    out = cms_frequencies(
        _cms_rows(spark, rows), "item", depth=4, width=4096
    ).collect()
    assert all(r["cms_est"] == r["true_cnt"] == 10 for r in out)


def test_cms_shard_merge_equals_whole_build(spark):
    """Counters are a commutative monoid: building per shard and
    SUM-merging must equal the whole-corpus build row-for-row."""
    from inform_spark.operators.sketches import cms_counters

    rows = [(f"k{i % 13}",) for i in range(130)]
    whole = cms_counters(_cms_rows(spark, rows), "item", 4, 16)
    a = cms_counters(_cms_rows(spark, rows[:70]), "item", 4, 16)
    b = cms_counters(_cms_rows(spark, rows[70:]), "item", 4, 16)
    merged = (
        a.unionByName(b)
        .groupBy("r", "c")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert sorted(tuple(x) for x in whole.collect()) == sorted(
        tuple(x) for x in merged.collect()
    )


def test_cms_partitioning_invariant(spark):
    from inform_spark.operators.sketches import cms_frequencies

    rows = [(f"k{i % 21}",) for i in range(210)]
    df = _cms_rows(spark, rows)
    a = sorted(tuple(r) for r in cms_frequencies(df, "item", 4, 16).collect())
    b = sorted(
        tuple(r)
        for r in cms_frequencies(df.repartition(9), "item", 4, 16).collect()
    )
    assert a == b


def test_cms_error_bound(spark):
    """Standard CMS guarantee: est - true <= 2N/width for all items with
    probability ~1-(1/2)^depth; with depth=4 over this deterministic
    hash family, assert the bound holds outright."""
    from inform_spark.operators.sketches import cms_frequencies

    n = 600
    rows = [(f"k{i % 60}",) for i in range(n)]
    out = cms_frequencies(
        _cms_rows(spark, rows), "item", depth=4, width=32
    ).collect()
    bound = 2 * n / 32
    assert all(r["cms_est"] - r["true_cnt"] <= bound for r in out)


def test_cms_and_hll_null_items_are_not_items(spark):
    """NULL means 'no item observed' — excluded from sketch, probes, and
    the exact side alike; an all-NULL key still appears in the HLL
    verification output with exact_distinct=0 / est 0 instead of being
    dropped by a null-unsafe inner join."""
    from inform_spark.operators.sketches import cms_frequencies, hll_cardinality

    rows = [("h1", "a"), ("h1", None), ("h2", None), ("h2", None)]
    df = spark.createDataFrame(rows, "host string, item string")
    out = {r["host"]: r for r in hll_cardinality(df, "item", ["host"]).collect()}
    assert set(out) == {"h1", "h2"}
    assert out["h2"]["exact_distinct"] == 0 and out["h2"]["est_milli"] == 0
    assert out["h1"]["exact_distinct"] == 1

    cms = cms_frequencies(df, "item").collect()
    assert {r["item"] for r in cms} == {"a"}
    assert all(r["cms_est"] >= r["true_cnt"] for r in cms)
