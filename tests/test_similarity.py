"""Embedding near-dup candidates (group-scoped cosine top-k pairs)."""

import math

import pyspark.sql.functions as F
import pytest

from inform_spark.operators.similarity import embedding_neardup_topk


@pytest.fixture(scope="module")
def emb(spark):
    # 3 labels x 6 vectors, deterministic directions; label 0 contains an
    # exact duplicate pair (0, 1) -> cosine 1.0 must rank first
    rows = []
    for label in range(3):
        for i in range(6):
            vid = label * 10 + i
            if label == 0 and i == 1:
                vec = [1.0, 2.0, 3.0, 4.0]  # duplicate of vid 0
            else:
                t = vid + 1.0
                vec = [1.0 + (0 if i else 1), 2.0, math.sin(t), math.cos(t)]
            if label == 0 and i == 0:
                vec = [1.0, 2.0, 3.0, 4.0]
            rows.append((vid, [float(x) for x in vec], label))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


def test_neardup_scoped_and_ranked(emb):
    out = embedding_neardup_topk(emb, per_group=3).collect()
    assert len(out) == 9  # 3 groups x top-3
    by_group = {}
    for r in out:
        assert r["a"] < r["b"]
        assert r["a"] // 10 == r["g"] and r["b"] // 10 == r["g"]  # scoped
        by_group.setdefault(r["g"], []).append(r)
    for g, rs in by_group.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3]
        ordered = sorted(rs, key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in ordered]
        assert cosines == sorted(cosines, reverse=True)
    top0 = min(by_group[0], key=lambda r: r["rank"])
    assert (top0["a"], top0["b"]) == (0, 1) and top0["cosine"] == 1.0


def test_neardup_deterministic(emb):
    a = embedding_neardup_topk(emb).orderBy("g", "rank").collect()
    b = embedding_neardup_topk(emb.repartition(7)).orderBy("g", "rank").collect()
    assert a == b
