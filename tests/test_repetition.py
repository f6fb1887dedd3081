"""Repetition gates, per-source caps, boilerplate line filtering.

The repetition fold (operators/repetition.py) must equal the relational
groupBy formulation exactly — including its tie-break (count desc, gram
asc) — and per_source_cap's hot-source prefilter must select the SAME
rows as the exact path."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.quality import boilerplate_line_filter
from inform_spark.operators.repetition import (
    ngram_repetition,
    repetition_gates,
)
from inform_spark.operators.sampling import per_source_cap

DOCS = [
    (1, "a b a b a c"),
    (2, "x y z"),
    (3, "r r r r r r r r r r"),
    (4, "one\ntwo\none\nthree two words here\none"),
    (5, "w"),
    (6, ""),
    (7, "spam spam spam ham spam spam spam eggs " * 4),
    (8, "line one\nline one\nline one\nunique tail line"),
]


def _py_repetition(text):
    """Relational reference: per-gram Counter, tie-break (cnt desc,
    gram asc), duplicate chars exclude each first occurrence."""
    out = {}
    words = text.lower().split(" ")
    nc = max(len(text), 1)
    for w, kind in [(2, "top"), (3, "top"), (4, "top"),
                    (5, "dup"), (8, "dup"), (10, "dup")]:
        grams = (
            [" ".join(words[i:i + w]) for i in range(len(words) - w + 1)]
            if len(words) >= w
            else []
        )
        c = Counter(grams)
        if kind == "top":
            if c:
                best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                out[f"top{w}_frac"] = round(best[1] * len(best[0]) / nc, 6)
            else:
                out[f"top{w}_frac"] = 0.0
        else:
            out[f"dup{w}_frac"] = round(
                sum((v - 1) * len(k) for k, v in c.items()) / nc, 6
            )
    lines = text.split("\n")
    lc = Counter(lines)
    out["dup_line_frac"] = round(
        sum(v - 1 for v in lc.values()) / max(len(lines), 1), 6
    )
    out["dup_line_char_frac"] = round(
        sum((v - 1) * len(k) for k, v in lc.items())
        / max(sum(len(x) for x in lines), 1),
        6,
    )
    return out


def test_fold_matches_relational(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in ngram_repetition(df).collect()}
    for doc_id, text in DOCS:
        exp = _py_repetition(text)
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-9), (
                doc_id, k, got[doc_id][k], v,
            )


def test_gates_flag_repetitive_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    g = {r["doc_id"]: r for r in repetition_gates(df).collect()}
    assert not g[7]["pass_all"]  # spam-dominated doc fails
    assert not g[7]["gate_top2"]
    assert not g[8]["gate_dup_line"]  # 3x duplicated line
    assert g[5]["pass_all"]  # single word: nothing repeats


def test_repetition_zero_shuffle_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = ngram_repetition(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_per_source_cap_exact(spark):
    rows = [(i, f"s{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = per_source_cap(df, "source", 10, "doc_id")
    per = Counter(r["source"] for r in out.collect())
    assert per == {"s0": 10, "s1": 10, "s2": 10}
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in per_source_cap(
            df.repartition(13), "source", 10, "doc_id"
        ).collect()
    )
    assert a == b
    # small sources keep everything
    tiny = per_source_cap(df.filter("doc_id < 5"), "source", 10, "doc_id")
    assert tiny.count() == 5


def test_per_source_cap_prefilter_identical(spark):
    # one hot source (600 rows >> 16*k), two cold ones
    rows = [(i, "hot") for i in range(600)] + [
        (1000 + i, f"cold{i % 2}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    exact = sorted(
        (r["source"], r["doc_id"], r["cap_rank"])
        for r in per_source_cap(df, "source", 8, "doc_id").collect()
    )
    fast = sorted(
        (r["source"], r["doc_id"], r["cap_rank"])
        for r in per_source_cap(
            df, "source", 8, "doc_id", prefilter=True
        ).collect()
    )
    assert exact == fast


def test_per_source_cap_prefilter_zero_survivor_source(spark):
    """A hot source whose rows ALL exceed the hash cutoff leaves no row in
    the survivor count — the shortness check must still catch it (LEFT
    join + coalesce(0)) and re-rank it without the cutoff, instead of
    silently dropping the source to 0 rows."""
    import hashlib

    k = 1
    # cutoff for a hot source of n rows is 4k/n of hash space; pick 20 ids
    # whose H60(str(id)) all land ABOVE it (each has p=0.8, so candidates
    # are plentiful)
    cut_frac = 4.0 * k / 20
    space = float(1 << 60)
    ids, i = [], 0
    while len(ids) < 20:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        if h / space > cut_frac:
            ids.append(i)
        i += 1
    rows = [(d, "allhigh") for d in ids] + [(10_000 + j, "cold") for j in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    exact = sorted(
        (r["source"], r["doc_id"])
        for r in per_source_cap(df, "source", k, "doc_id").collect()
    )
    fast = sorted(
        (r["source"], r["doc_id"])
        for r in per_source_cap(df, "source", k, "doc_id", prefilter=True).collect()
    )
    assert exact == fast
    assert ("allhigh", min(ids, key=lambda d: int(
        hashlib.md5(str(d).encode()).hexdigest()[:15], 16))) in fast


def test_boilerplate_filter_semantics(spark):
    text = "\n".join(
        [
            "This is a perfectly reasonable content line.",
            "ok",  # too short
            "1234 5678 !!",  # no letters
            "Enable JavaScript to view this site today.",  # pattern
            "We use cookies to improve your experience.",  # pattern
            "Another good line that should clearly survive.",
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = boilerplate_line_filter(df).collect()[0]
    kept = r["clean_text"].split("\n")
    assert kept == [
        "This is a perfectly reasonable content line.",
        "Another good line that should clearly survive.",
    ]
    assert r["kept_lines"] == 2 and r["total_lines"] == 6
    assert 0 < r["kept_char_ratio"] < 1
    # all-boilerplate doc -> empty string, ratio 0
    df2 = spark.createDataFrame([(2, "click here\nok")], "doc_id long, text string")
    r2 = boilerplate_line_filter(df2).collect()[0]
    assert r2["clean_text"] == "" and r2["kept_lines"] == 0
    assert r2["kept_char_ratio"] == 0.0
