"""Round-4 additions, third batch: seeded shuffle shards, boilerplate
media, snapshot-scoped dedup, per-IP politeness — each checked against
a sequential Python reference plus its characteristic invariant."""

import datetime
import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# seeded_shuffle_shards
# ---------------------------------------------------------------------------


def _mk_docs(spark, n=40):
    rows = [
        Row(doc_id=i, text=" ".join(["w%d" % (i * 31 + j) for j in range(i % 7)]) or "x")
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_shuffle_shards_matches_sequential(spark):
    from inform_spark.operators.shards import seeded_shuffle_shards

    docs = _mk_docs(spark)
    out, caches = seeded_shuffle_shards(docs, n_shards=4, seed="e1")
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    for c in caches:
        c.unpersist()

    # sequential reference
    toks = {i: len((" ".join(["w%d" % (i * 31 + j) for j in range(i % 7)]) or "x").split(" ")) for i in range(40)}
    order = sorted(toks, key=lambda i: (_h60(f"e1-{i}"), i))
    cum, total = {}, sum(toks.values())
    run = 0
    for i in order:
        cum[i] = run
        run += toks[i]
    for i in order:
        assert got[i]["n_tokens"] == toks[i]
        assert got[i]["cum_before"] == cum[i]
        assert got[i]["shard"] == cum[i] * 4 // total

    # shards are contiguous in permutation order and balanced within
    # one doc's tokens
    shards = [got[i]["shard"] for i in order]
    assert shards == sorted(shards)
    per = {}
    for i in order:
        per[got[i]["shard"]] = per.get(got[i]["shard"], 0) + toks[i]
    assert max(per.values()) - min(per.values()) <= max(toks.values()) + 4


def test_shuffle_shards_new_seed_new_permutation(spark):
    from inform_spark.operators.shards import seeded_shuffle_shards

    docs = _mk_docs(spark, n=30)
    a, ca = seeded_shuffle_shards(docs, n_shards=4, seed="e1")
    b, cb = seeded_shuffle_shards(docs, n_shards=4, seed="e2")
    ka = [r["doc_id"] for r in a.orderBy("shuffle_key", "doc_id").collect()]
    kb = [r["doc_id"] for r in b.orderBy("shuffle_key", "doc_id").collect()]
    for c in ca + cb:
        c.unpersist()
    assert sorted(ka) == sorted(kb)
    assert ka != kb  # 30! orders; identical permutations would mean the seed is ignored


def test_shuffle_shards_empty_and_zero_tokens(spark):
    from inform_spark.operators.shards import seeded_shuffle_shards

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="")]
    )
    # split("") -> [""] -> 1 token each under the whitespace count;
    # pass an explicit zero-token column to hit the total == 0 path
    z = docs.withColumn("tok", F.lit(0).cast("long"))
    out, caches = seeded_shuffle_shards(z, n_shards=4, seed="e", token_col="tok")
    rows = out.collect()
    for c in caches:
        c.unpersist()
    assert {r["shard"] for r in rows} == {0}


# ---------------------------------------------------------------------------
# media_boilerplate
# ---------------------------------------------------------------------------


def test_media_boilerplate_flags_cross_doc_assets(spark):
    from inform_spark.operators.multimodal import media_boilerplate

    rows = []
    # logo appears in 5 docs, content image in 1, icon in 2
    for d in range(5):
        rows.append(Row(doc_id=f"d{d}", media_ref=f"m://logo/{d}", fingerprint=7))
    rows.append(Row(doc_id="d0", media_ref="m://photo", fingerprint=1))
    rows.append(Row(doc_id="d1", media_ref="m://icon/a", fingerprint=3))
    rows.append(Row(doc_id="d2", media_ref="m://icon/b", fingerprint=3))
    occ = spark.createDataFrame(rows)
    out = {
        (r["doc_id"], r["media_ref"]): r.asDict()
        for r in media_boilerplate(occ, min_docs=3).collect()
    }
    assert len(out) == 8
    for d in range(5):
        r = out[(f"d{d}", f"m://logo/{d}")]
        assert r["doc_freq"] == 5 and r["is_boilerplate"] is True
    assert out[("d0", "m://photo")]["is_boilerplate"] is False
    assert out[("d1", "m://icon/a")]["doc_freq"] == 2
    assert out[("d1", "m://icon/a")]["is_boilerplate"] is False


def test_media_boilerplate_doc_freq_is_distinct_docs(spark):
    from inform_spark.operators.multimodal import media_boilerplate

    # same fingerprint twice in ONE doc counts once
    occ = spark.createDataFrame(
        [
            Row(doc_id="d0", media_ref="a", fingerprint=9),
            Row(doc_id="d0", media_ref="b", fingerprint=9),
            Row(doc_id="d1", media_ref="c", fingerprint=9),
        ]
    )
    rows = media_boilerplate(occ, min_docs=3).collect()
    assert all(r["doc_freq"] == 2 for r in rows)
    assert all(r["is_boilerplate"] is False for r in rows)


# ---------------------------------------------------------------------------
# snapshot_scoped_dedup
# ---------------------------------------------------------------------------


def test_snapshot_dedup_scoped_vs_global(spark):
    from inform_spark.operators.textops import snapshot_scoped_dedup

    rows = [
        # text A in snapshots 0 and 1 (global survivor in 0)
        Row(doc_id=1, text="A", snapshot=0),
        Row(doc_id=2, text="A", snapshot=1),
        # text B twice within snapshot 1 (scoped dedup collapses it too)
        Row(doc_id=3, text="B", snapshot=1),
        Row(doc_id=4, text="B", snapshot=1),
        # text C only in snapshot 1
        Row(doc_id=5, text="C", snapshot=1),
    ]
    out = {
        r["snapshot"]: r.asDict()
        for r in snapshot_scoped_dedup(spark.createDataFrame(rows)).collect()
    }
    assert out[0]["n_docs"] == 1
    assert out[0]["scoped_survivors"] == 1
    assert out[0]["global_survivors"] == 1
    assert out[1]["n_docs"] == 4
    # scoped: A, B, C survive within snapshot 1
    assert out[1]["scoped_survivors"] == 3
    # global: A's survivor lives in snapshot 0; B and C survive here
    assert out[1]["global_survivors"] == 2


def test_snapshot_dedup_global_survivor_is_earliest_snapshot(spark):
    from inform_spark.operators.textops import snapshot_scoped_dedup

    rows = [
        Row(doc_id=9, text="T", snapshot=2),
        Row(doc_id=1, text="T", snapshot=3),
    ]
    out = {
        r["snapshot"]: r.asDict()
        for r in snapshot_scoped_dedup(spark.createDataFrame(rows)).collect()
    }
    # min (snapshot, doc_id): snapshot wins over doc_id
    assert out[2]["global_survivors"] == 1
    assert out[3]["global_survivors"] == 0


# ---------------------------------------------------------------------------
# ip_paced_admissions
# ---------------------------------------------------------------------------


def _ts(sec):
    return datetime.datetime(2026, 1, 1, 0, 0, sec)


def test_ip_paced_budget_shared_across_hosts(spark):
    from inform_spark.streaming.stateful import ip_paced_admissions

    # 4 hosts behind one IP, 1 host on its own: budget 2/minute is
    # shared by the farm but private to the lone host
    cand = spark.createDataFrame(
        [
            Row(host=f"h{i}.farm", url=f"u{i}", ts=_ts(i)) for i in range(4)
        ]
        + [Row(host="solo.example", url="s0", ts=_ts(0))]
    )
    dns = spark.createDataFrame(
        [Row(host=f"h{i}.farm", ip="10.9.9.9") for i in range(4)]
        + [Row(host="solo.example", ip="10.1.1.1")]
    )
    out = {r["url"]: r.asDict() for r in
           ip_paced_admissions(cand, dns, budget=2, window_ms=60_000).collect()}
    admitted_farm = [u for u in ("u0", "u1", "u2", "u3") if out[u]["admitted"]]
    # (ts, url) order admits the two earliest farm candidates only
    assert admitted_farm == ["u0", "u1"]
    assert out["s0"]["admitted"] is True
    assert out["u0"]["ip"] == "10.9.9.9" and out["s0"]["ip"] == "10.1.1.1"


def test_ip_paced_unresolved_host_self_budget(spark):
    from inform_spark.streaming.stateful import ip_paced_admissions

    cand = spark.createDataFrame(
        [Row(host="x.example", url="a", ts=_ts(0)),
         Row(host="y.example", url="b", ts=_ts(1))]
    )
    dns = spark.createDataFrame([Row(host="x.example", ip="10.0.0.1")])
    out = {r["url"]: r.asDict() for r in
           ip_paced_admissions(cand, dns, budget=1, window_ms=60_000).collect()}
    # y has no DNS row: it budgets under its own name, never under a
    # shared bucket — both admitted
    assert out["a"]["admitted"] is True
    assert out["b"]["admitted"] is True
    assert out["b"]["ip"] == "y.example"


def test_ip_paced_matches_host_form_on_identity_dns(spark):
    from inform_spark.streaming.stateful import (
        ip_paced_admissions,
        paced_admissions_batch,
    )

    cand = spark.createDataFrame(
        [
            Row(host=f"h{i % 3}", url=f"u{i}", ts=_ts(i % 5))
            for i in range(20)
        ]
    )
    dns = cand.select("host").distinct().select(
        "host", F.col("host").alias("ip")
    )
    a = {
        (r["host"], r["url"]): (r["window_start_ms"], r["admitted"])
        for r in ip_paced_admissions(cand, dns, budget=2).collect()
    }
    b = {
        (r["host"], r["url"]): (r["window_start_ms"], r["admitted"])
        for r in paced_admissions_batch(cand, budget=2).collect()
    }
    assert a == b


def test_media_boilerplate_null_fingerprint_explicit_false(spark):
    from inform_spark.operators.multimodal import media_boilerplate
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("fingerprint", LongType()),
    ])
    occ = spark.createDataFrame(
        [("d0", "a", 5), ("d1", "b", None), ("d2", "c", None)], schema
    )
    out = {r["media_ref"]: r.asDict() for r in
           media_boilerplate(occ, min_docs=1).collect()}
    assert out["a"]["is_boilerplate"] is True
    # undecodable media: explicit false, never NULL
    assert out["b"]["is_boilerplate"] is False
    assert out["b"]["doc_freq"] == 0


def test_ip_paced_rejects_preexisting_ip_column(spark):
    import pytest
    from inform_spark.streaming.stateful import ip_paced_admissions

    cand = spark.createDataFrame(
        [Row(host="x", url="a", ts=_ts(0), ip="9.9.9.9")]
    )
    dns = spark.createDataFrame([Row(host="x", ip="10.0.0.1")])
    with pytest.raises(ValueError, match="ip"):
        ip_paced_admissions(cand, dns)


def test_snapshot_dedup_null_text_counts_as_survivor(spark):
    from inform_spark.operators.textops import snapshot_scoped_dedup

    rows = [
        Row(doc_id=1, text=None, snapshot=0),
        Row(doc_id=2, text=None, snapshot=1),
        Row(doc_id=3, text="A", snapshot=1),
    ]
    out = {
        r["snapshot"]: r.asDict()
        for r in snapshot_scoped_dedup(spark.createDataFrame(rows)).collect()
    }
    # NULL text is a dedup class like any other: one scoped survivor
    # per snapshot, one global survivor in the earliest snapshot
    assert out[0]["scoped_survivors"] == 1
    assert out[1]["scoped_survivors"] == 2
    assert out[0]["global_survivors"] == 1
    assert out[1]["global_survivors"] == 1


# ---------------------------------------------------------------------------
# round-5 ADVICE fixes: string snapshot labels, dns merge-on-read,
# upsample reserved-column guard
# ---------------------------------------------------------------------------


def test_snapshot_dedup_string_dump_labels(spark):
    """Real CommonCrawl dump labels are strings; the snapshot key must
    keep its native type (a cast('long') would NULL every label and
    collapse all global survivors into one group)."""
    from inform_spark.operators.textops import snapshot_scoped_dedup

    rows = [
        Row(doc_id=1, text="A", snapshot="CC-MAIN-2024-10"),
        Row(doc_id=2, text="A", snapshot="CC-MAIN-2024-18"),
        Row(doc_id=3, text="B", snapshot="CC-MAIN-2024-18"),
    ]
    out = {
        r["snapshot"]: r.asDict()
        for r in snapshot_scoped_dedup(spark.createDataFrame(rows)).collect()
    }
    assert set(out) == {"CC-MAIN-2024-10", "CC-MAIN-2024-18"}
    # A's global survivor lives in the lexically-earliest dump
    assert out["CC-MAIN-2024-10"]["global_survivors"] == 1
    assert out["CC-MAIN-2024-18"]["global_survivors"] == 1
    assert out["CC-MAIN-2024-18"]["scoped_survivors"] == 2


def test_ip_paced_duplicate_dns_rows_no_fanout(spark):
    """An append-style dns cache holds several rows per host; the join
    must merge-on-read (newest resolved_at_ms wins) instead of fanning
    candidates out and double-spending the budget."""
    from inform_spark.streaming.stateful import ip_paced_admissions

    cand = spark.createDataFrame(
        [Row(host="x.example", url=f"u{i}", ts=_ts(i)) for i in range(3)]
    )
    dns = spark.createDataFrame(
        [
            Row(host="x.example", ip="10.0.0.1", resolved_at_ms=1000),
            Row(host="x.example", ip="10.0.0.2", resolved_at_ms=2000),
        ]
    )
    rows = ip_paced_admissions(cand, dns, budget=2, window_ms=60_000).collect()
    # no fan-out: exactly one output row per candidate
    assert len(rows) == 3
    out = {r["url"]: r.asDict() for r in rows}
    # newest cache entry wins
    assert all(r["ip"] == "10.0.0.2" for r in rows)
    # budget spent once, not per-duplicate
    assert [out[f"u{i}"]["admitted"] for i in range(3)] == [True, True, False]


def test_ip_paced_duplicate_dns_rows_without_timestamp(spark):
    """A bare (host, ip) dim with duplicate hosts still merges to one
    deterministic row (max ip tie-break), never fans out."""
    from inform_spark.streaming.stateful import ip_paced_admissions

    cand = spark.createDataFrame([Row(host="x", url="a", ts=_ts(0))])
    dns = spark.createDataFrame(
        [Row(host="x", ip="10.0.0.1"), Row(host="x", ip="10.0.0.9")]
    )
    rows = ip_paced_admissions(cand, dns, budget=1).collect()
    assert len(rows) == 1
    assert rows[0]["ip"] == "10.0.0.9"


def test_upsample_epochs_rejects_reserved_columns(spark):
    import pytest

    from inform_spark.operators.sampling import upsample_epochs

    docs = spark.createDataFrame(
        [Row(doc_id="1", source="s", text="t", copy_idx=0)]
    )
    with pytest.raises(ValueError, match="copy_idx"):
        upsample_epochs(docs, {"s": 2000})
