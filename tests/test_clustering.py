"""Fixed-point k-means trainer (operators/clustering.py).

The determinism contract is the point: identical output under any
repartitioning, and exact agreement with a sequential pure-Python
reference that implements the same integer arithmetic — the same
oracle discipline as linkgraph's fixed-point PageRank."""

import pytest

from pyspark.sql import functions as F

from inform_spark.operators.clustering import (
    MICRO,
    kmeans_assignments,
    kmeans_train,
)


def _vecs():
    """Two planted clusters around opposite prototypes + a straggler.
    vid 0 and 1 (the inits) sit one in each cluster."""
    import random

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        base = 0.5 if vid % 2 == 0 else -0.5
        rows.append(
            (vid, [base + rng.uniform(-0.05, 0.05) for _ in range(8)])
        )
    return rows


SCHEMA = "vec_id long, embedding array<float>"


def _ref_kmeans(rows, n_cells, iterations):
    """Sequential reference: identical quantization, L2, toward-zero
    division, empty-cell keep, (d2, cid) tie-break."""
    import math

    def q(v):
        # float32 storage then double widening, as parquet/Spark do
        import struct

        f32 = struct.unpack("f", struct.pack("f", v))[0]
        x = f32 * MICRO
        # round-half-away-from-zero on the double, like F.round/duckdb
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    pts = {vid: [q(x) for x in vec] for vid, vec in rows}
    cents = {cid: list(pts[cid]) for cid in range(n_cells) if cid in pts}

    def assign():
        out = {}
        for vid, qv in pts.items():
            best = None
            for cid, cv in sorted(cents.items()):
                d2 = sum((a - b) * (a - b) for a, b in zip(qv, cv))
                if best is None or d2 < best[0]:
                    best = (d2, cid)
            out[vid] = best
        return out

    def tz_div(s, n):
        return -((-s) // n) if s < 0 else s // n

    for _ in range(iterations):
        a = assign()
        sums, cnts = {}, {}
        for vid, (_, cid) in a.items():
            cnts[cid] = cnts.get(cid, 0) + 1
            acc = sums.setdefault(cid, [0] * len(pts[vid]))
            for i, v in enumerate(pts[vid]):
                acc[i] += v
        for cid in cents:
            if cid in cnts:
                cents[cid] = [tz_div(s, cnts[cid]) for s in sums[cid]]
    final = assign()
    roll = {}
    for vid, (d2, cid) in final.items():
        n, inertia = roll.get(cid, (0, 0))
        roll[cid] = (n + 1, inertia + d2)
    return {
        cid: (
            roll.get(cid, (0, 0))[0],
            roll.get(cid, (0, 0))[1],
            ",".join(str(x) for x in cv),
        )
        for cid, cv in cents.items()
    }


def test_matches_sequential_reference(spark):
    rows = _vecs()
    got = {
        r["cid"]: (r["n_assigned"], r["inertia"], r["centroid"])
        for r in kmeans_train(
            spark.createDataFrame(rows, SCHEMA), n_cells=2, iterations=2
        ).collect()
    }
    assert got == _ref_kmeans(rows, 2, 2)


def test_partitioning_invariant(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(
        tuple(r) for r in kmeans_train(df, n_cells=3, iterations=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in kmeans_train(
            df.repartition(13, "vec_id"), n_cells=3, iterations=2
        ).collect()
    )
    assert a == b


def test_planted_clusters_recovered(spark):
    """With inits one per planted cluster, the final assignment must
    equal the planted parity labels."""
    rows = _vecs()
    assigns = {
        r["vid"]: r["cid"]
        for r in kmeans_assignments(
            spark.createDataFrame(rows, SCHEMA), n_cells=2, iterations=2
        ).collect()
    }
    assert len(assigns) == len(rows)
    for vid, cid in assigns.items():
        assert cid == vid % 2


def test_empty_cell_keeps_init_vector(spark):
    """vids 0, 2, 3 share one byte-identical vector (so cell 0's mean
    never moves off it), vid 1 sits far away: cell 2's init ties with
    cell 0 at EVERY iteration, the cid-ascending tie-break drains it
    each time, and the empty cell must KEEP its init centroid with
    n_assigned=0 (never a data-dependent reseed)."""
    a = [0.25, -0.75, 0.5]
    rows = [(0, list(a)), (1, [9.0, 9.0, 9.0]), (2, list(a)), (3, list(a))]
    out = {
        r["cid"]: r
        for r in kmeans_train(
            spark.createDataFrame(rows, SCHEMA), n_cells=3, iterations=2
        ).collect()
    }
    assert out[2]["n_assigned"] == 0
    assert out[2]["inertia"] == 0
    ref = _ref_kmeans(rows, 3, 2)
    assert out[2]["centroid"] == ref[2][2]  # still the init quantization
    assert sum(r["n_assigned"] for r in out.values()) == len(rows)
    got = {
        cid: (r["n_assigned"], r["inertia"], r["centroid"])
        for cid, r in out.items()
    }
    assert got == ref


def test_assignments_consistent_with_rollup(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, SCHEMA)
    roll = {
        r["cid"]: r["n_assigned"]
        for r in kmeans_train(df, n_cells=2, iterations=2).collect()
    }
    a = kmeans_assignments(df, n_cells=2, iterations=2)
    counts = {
        r["cid"]: r["n"]
        for r in a.groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {k: v for k, v in roll.items() if v > 0}


def test_identical_vector_skew(spark):
    """A degenerate corpus — thousands of byte-identical vectors — must
    complete and put every copy in one cell (exact ties, cid tie-break
    deterministic)."""
    n = 3000
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") == 0, F.array(*[F.lit(float(i)) for i in [1, 0]]))
        .otherwise(F.array(F.lit(0.0), F.lit(1.0)))
        .cast("array<float>")
        .alias("embedding"),
    )
    out = {r["cid"]: r["n_assigned"] for r in
           kmeans_train(df, n_cells=2, iterations=2).collect()}
    assert sum(out.values()) == n
    assert out[1] == n - 1  # the identical mass lands in one cell


def test_trained_centroids_drop_into_ivf(spark):
    """ivf_topk(centroids=...) with trained cells must produce the
    same-shaped result as the default first-n-cells variant, and with
    n_probe = n_cells (every cell probed) it must equal exact brute
    force regardless of which centroids are used."""
    from inform_spark.operators import similarity
    from inform_spark.operators.clustering import (
        centroids_as_float,
        kmeans_centroids,
    )

    rows = _vecs()
    df = spark.createDataFrame(rows, SCHEMA)
    cents = centroids_as_float(kmeans_centroids(df, n_cells=2, iterations=2))
    got = similarity.ivf_topk(
        df, n_queries=4, k=3, n_probe=2, centroids=cents
    ).collect()
    brute = similarity.cosine_topk(df, n_queries=4, k=3).collect()
    key = lambda r: (r["q"], r["rank"])
    assert sorted(
        (r["q"], r["rank"], r["neighbor"]) for r in got
    ) == sorted((r["q"], r["rank"], r["neighbor"]) for r in brute)
