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


def test_ivf_topk_recall_and_shape(spark):
    """IVF cells bound the candidate set; recall vs exact brute force must
    stay high on a clusterable fixture (here: vectors near their own
    centroid => probing 2/4 cells finds every true neighbor)."""
    import random

    from inform_spark.operators.similarity import cosine_topk, ivf_topk

    rng = random.Random(42)
    rows = []
    # 4 tight clusters of 12 vectors around orthogonal-ish directions
    for c in range(4):
        base = [0.0] * 8
        base[c] = 1.0
        for i in range(12):
            vec = [b + rng.uniform(-0.05, 0.05) for b in base]
            rows.append((c * 12 + i, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # centroids = first 4 vectors => one per cluster (vec_id 0..3 are in
    # distinct clusters only if ids interleave; use ids 0,12,24,36 remapped)
    remap = {old: new for new, old in enumerate(
        [0, 12, 24, 36] + [i for i in range(48) if i not in (0, 12, 24, 36)]
    )}
    emb = emb.replace(0, 0)  # no-op to keep lints quiet
    remapped = spark.createDataFrame(
        [(remap[vid], vec) for vid, vec in rows],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r["q"], r["neighbor"])
        for r in cosine_topk(remapped, n_queries=4, k=5).collect()
    }
    approx = ivf_topk(remapped, n_queries=4, k=5, n_cells=4, n_probe=2).collect()
    got = {(r["q"], r["neighbor"]) for r in approx}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8
    # per-query rank contiguity
    by_q = {}
    for r in approx:
        by_q.setdefault(r["q"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_topk_deterministic(spark):
    from inform_spark.operators.similarity import ivf_topk

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = ivf_topk(emb).orderBy("q", "rank").collect()
    b = ivf_topk(emb.repartition(5)).orderBy("q", "rank").collect()
    assert a == b


def test_semdedup_families_and_survivor(spark):
    """Exact copies form a family; survivor is the member FARTHEST from
    its centroid (min ccos, tie on vec_id); non-dups keep themselves."""
    from inform_spark.operators.similarity import semdedup

    base = [1.0, 0.0, 0.0, 0.0]
    tilted = [0.9, 0.1, 0.0, 0.0]  # same family as base (cos ~ 0.9939)
    other = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, base),          # centroid 0
        (1, other),         # centroid 1
        (10, base),         # dup of 0's direction, exact
        (11, tilted),       # near-dup, farther from centroid 0
        (20, other),        # dup family with 1
        (30, [0.0, 0.0, 1.0, 0.0]),  # singleton (own cell winner varies)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in semdedup(emb, n_cells=2, tau=0.95).collect()}

    assert set(out) == {0, 1, 10, 11, 20, 30}
    # family {0, 10, 11} in cell 0: component = 0, survivor = 11 (lowest
    # ccos to centroid — the tilted member), exact copies dropped
    fam = {v for v in out if out[v]["component"] == 0}
    assert fam == {0, 10, 11}
    assert out[11]["keep"] == 1 and out[0]["keep"] == 0 and out[10]["keep"] == 0
    assert out[0]["n_members"] == 3
    # family {1, 20}: survivor is min vec_id on an exact ccos tie
    assert out[1]["component"] == 1 and out[20]["component"] == 1
    assert out[1]["keep"] == 1 and out[20]["keep"] == 0
    # singleton keeps itself
    assert out[30]["keep"] == 1 and out[30]["n_members"] == 1


def test_semdedup_all_docs_present_no_dups(spark):
    from inform_spark.operators.similarity import semdedup

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(emb, n_cells=2, tau=0.95).collect()
    assert len(out) == 4
    assert all(r["keep"] == 1 and r["n_members"] == 1 for r in out)


def test_semdedup_invariants_randomized(spark):
    """Seeded random corpus with planted duplicate groups: every family
    has exactly ONE survivor, survivors minimize (ccos, vec_id) within
    the family, and all family members share a cell."""
    import random

    rng = random.Random(13)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, v))
        if i % 7 == 0:
            rows.append((100 + i, list(v)))  # planted exact dup
    from inform_spark.operators.similarity import semdedup

    out = semdedup(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        n_cells=4,
        tau=0.99,
    ).collect()
    assert len(out) == len(rows)
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        assert sum(m["keep"] for m in members) == 1
        assert all(m["n_members"] == len(members) for m in members)
        assert len({m["cell"] for m in members}) == 1
        winner = min(members, key=lambda m: (m["ccos"], m["vec_id"]))
        assert next(m for m in members if m["keep"] == 1)["vec_id"] == winner["vec_id"]
    # the planted dups all landed in multi-member families
    for i in range(0, 40, 7):
        ra = next(r for r in out if r["vec_id"] == i)
        assert ra["n_members"] >= 2
