"""Skew diagnosis, salted-join rewrite, fractional-epoch upsampling —
sequential references + the invariants each rewrite must preserve."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# key_skew_stats
# ---------------------------------------------------------------------------


def test_key_skew_stats_exact(spark):
    from inform_spark.operators.skew import key_skew_stats

    # 1 key with 12 rows, 3 keys with 2 rows, 4 keys with 1 row
    rows = (
        [Row(k="hot") for _ in range(12)]
        + [Row(k=f"m{i}") for i in range(3) for _ in range(2)]
        + [Row(k=f"s{i}") for i in range(4)]
    )
    out = key_skew_stats(
        spark.createDataFrame(rows), "k", target_rows=5
    ).collect()[0]
    assert out["n_rows"] == 22
    assert out["n_keys"] == 8
    assert out["max_key_rows"] == 12
    assert out["top_key"] == "hot"
    # counts sorted: [1,1,1,1,2,2,2,12]; nearest-rank p50 = 4th+ with
    # cum*100 >= 50*8 -> cum >= 4 -> cnt 1; p99 -> cum >= 7.92 -> cnt 12
    assert out["p50_key_rows"] == 1
    assert out["p99_key_rows"] == 12
    # 1000 * 12 * 8 // 22 = 4363
    assert out["skew_ratio_milli"] == 4363
    # ceil(12/5) = 3
    assert out["suggested_salt"] == 3


def test_key_skew_stats_uniform_and_null_keys(spark):
    from inform_spark.operators.skew import key_skew_stats

    rows = [Row(k=str(i % 4)) for i in range(16)] + [Row(k=None)] * 4
    out = key_skew_stats(spark.createDataFrame(rows, "k string"), "k").collect()[0]
    # NULL is a key of its own: 5 keys x 4 rows, perfectly uniform
    assert out["n_keys"] == 5
    assert out["max_key_rows"] == 4
    assert out["skew_ratio_milli"] == 1000
    assert out["suggested_salt"] == 1


# ---------------------------------------------------------------------------
# salted_join
# ---------------------------------------------------------------------------


def _fact_dim(spark):
    # hot key 7 carries half the fact rows
    fact = spark.createDataFrame(
        [Row(fid=i, key=(7 if i % 2 == 0 else i % 5)) for i in range(40)]
    )
    dim = spark.createDataFrame(
        [Row(key=k, label=f"L{k}") for k in (0, 1, 2, 7)]
    )
    return fact, dim


def test_salted_join_equals_plain_inner(spark):
    from inform_spark.operators.skew import salted_join

    fact, dim = _fact_dim(spark)
    plain = Counter(
        (r["fid"], r["key"], r["label"])
        for r in fact.join(dim, "key").select("fid", "key", "label").collect()
    )
    for n_salt in (1, 3, 8):
        salted = Counter(
            (r["fid"], r["key"], r["label"])
            for r in salted_join(fact, dim, "key", n_salt, salt_src="fid").collect()
        )
        assert salted == plain


def test_salted_join_left_keeps_unmatched(spark):
    from inform_spark.operators.skew import salted_join

    fact, dim = _fact_dim(spark)
    out = {
        r["fid"]: r["label"]
        for r in salted_join(
            fact, dim, "key", 4, salt_src="fid", how="left"
        ).collect()
    }
    assert len(out) == 40
    # keys 3 and 4 have no dim row -> NULL label survives the left join
    unmatched = [r["fid"] for r in fact.filter(F.col("key").isin(3, 4)).collect()]
    assert unmatched and all(out[f] is None for f in unmatched)


def test_salted_join_spreads_hot_key(spark):
    from inform_spark.operators.skew import salted_join

    fact, dim = _fact_dim(spark)
    n_salt = 8
    # recompute the operator's salt formula for the hot key's rows:
    # they must not all land in one (key, salt) group
    hot = fact.filter(F.col("key") == 7).select(
        F.pmod(F.xxhash64(F.col("fid")), F.lit(n_salt)).alias("s")
    )
    assert hot.select("s").distinct().count() > 1
    # and the rewrite still returns them all
    got = salted_join(fact, dim, "key", n_salt, salt_src="fid").filter(
        F.col("key") == 7
    )
    assert got.count() == 20


def test_salted_join_rejects_bad_args(spark):
    from inform_spark.operators.skew import salted_join

    fact, dim = _fact_dim(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, "key", 0)
    with pytest.raises(ValueError):
        salted_join(fact, dim, "key", 4, how="full")


# ---------------------------------------------------------------------------
# upsample_epochs
# ---------------------------------------------------------------------------


def test_upsample_epochs_matches_sequential(spark):
    from inform_spark.operators.sampling import upsample_epochs

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, source=f"s{i % 4}", text=f"t{i}")
            for i in range(40)
        ]
    )
    weights = {"s0": 2450, "s1": 300, "s2": 0}  # s3 defaults to 1000
    got = Counter(
        (r["doc_id"], r["copy_idx"])
        for r in upsample_epochs(docs, weights).collect()
    )
    expect = Counter()
    for i in range(40):
        w = weights.get(f"s{i % 4}", 1000)
        k = w // 1000 + (1 if _h60(f"up-{i}") % 1000 < w % 1000 else 0)
        for c in range(k):
            expect[(i, c)] = 1
    assert got == expect
    # zero-epoch source emits nothing
    assert not any(i % 4 == 2 for (i, _c) in got)
    # every kept doc's copies are contiguous 0..k-1
    per_doc = Counter(i for (i, _c) in got)
    for (i, c) in got:
        assert 0 <= c < per_doc[i]


def test_upsample_epochs_identity_default(spark):
    from inform_spark.operators.sampling import upsample_epochs

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="zz", text="t") for i in range(10)]
    )
    rows = upsample_epochs(docs, {"other": 5000}).collect()
    assert len(rows) == 10
    assert all(r["copy_idx"] == 0 for r in rows)


def test_salted_join_rejects_reserved_column(spark):
    from inform_spark.operators.skew import salted_join

    fact, dim = _fact_dim(spark)
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact.withColumn("__salt", F.lit(1)), dim, "key", 4)
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact, dim.withColumn("__salt", F.lit(1)), "key", 4)
