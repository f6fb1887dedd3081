"""Product quantization (operators/clustering.pq_codes / pq_adc_topk).

Same oracle discipline as the k-means trainer: all-integer arithmetic,
so a sequential pure-Python reference must reproduce the trained
codebook, every code assignment, and the ADC ranking exactly, under any
partitioning."""

import pytest

from pyspark.sql import functions as F

from inform_spark.operators.clustering import MICRO, pq_adc_topk, pq_codes

SCHEMA = "vec_id long, embedding array<float>"


def _vecs(n=48, dim=8):
    """Two planted clusters per subspace half, plus noise; vids 0..k-1
    serve as the deterministic inits."""
    import random

    rng = random.Random(11)
    rows = []
    for vid in range(n):
        base = 0.6 if vid % 2 == 0 else -0.6
        rows.append(
            (vid, [base + rng.uniform(-0.08, 0.08) for _ in range(dim)])
        )
    return rows


def _q(v):
    import math
    import struct

    f32 = struct.unpack("f", struct.pack("f", v))[0]
    x = f32 * MICRO
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _tz_div(s, n):
    return -((-s) // n) if s < 0 else s // n


def _ref_pq(rows, m, k, iterations):
    """Sequential PQ trainer + encoder with the identical integer
    contract. Returns (codes: vid -> (codes_str, qerr),
    cents: (sub, cid) -> list)."""
    pts = {vid: [_q(x) for x in vec] for vid, vec in rows}
    dim = len(next(iter(pts.values())))
    sd = dim // m
    subs = {
        (vid, s): pts[vid][s * sd : (s + 1) * sd]
        for vid in pts
        for s in range(m)
    }
    cents = {
        (s, cid): list(subs[(cid, s)])
        for s in range(m)
        for cid in range(k)
        if cid in pts
    }

    def assign():
        out = {}
        for (vid, s), v in subs.items():
            best = None
            for cid in range(k):
                cv = cents.get((s, cid))
                if cv is None:
                    continue
                d2 = sum((a - b) * (a - b) for a, b in zip(v, cv))
                if best is None or (d2, cid) < best:
                    best = (d2, cid)
            out[(vid, s)] = best
        return out

    for _ in range(iterations):
        a = assign()
        sums, cnts = {}, {}
        for (vid, s), (_, cid) in a.items():
            key = (s, cid)
            cnts[key] = cnts.get(key, 0) + 1
            acc = sums.setdefault(key, [0] * sd)
            for i, v in enumerate(subs[(vid, s)]):
                acc[i] += v
        for key in cents:
            if key in cnts:
                cents[key] = [_tz_div(x, cnts[key]) for x in sums[key]]
    final = assign()
    codes = {}
    for vid in pts:
        cs = [final[(vid, s)][1] for s in range(m)]
        qerr = sum(final[(vid, s)][0] for s in range(m))
        codes[vid] = (",".join(str(c) for c in cs), qerr)
    return codes, cents


def test_codes_match_sequential_reference(spark):
    rows = _vecs()
    ref, _ = _ref_pq(rows, m=4, k=4, iterations=2)
    got = {
        r["vid"]: (r["codes"], r["qerr"])
        for r in pq_codes(
            spark.createDataFrame(rows, SCHEMA), m=4, k=4, iterations=2
        ).collect()
    }
    assert got == ref


def test_partitioning_invariant(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(tuple(r) for r in pq_codes(df, m=2, k=3, iterations=2).collect())
    b = sorted(
        tuple(r)
        for r in pq_codes(
            df.repartition(11, "vec_id"), m=2, k=3, iterations=2
        ).collect()
    )
    assert a == b


def test_adc_matches_reference_ranking(spark):
    """ADC top-k must equal the sequential LUT ranking exactly (same
    integer distances, same (ad2, vid) tie-break)."""
    rows = _vecs()
    m, k, it, qvid, topk = 4, 4, 2, 0, 8
    codes, cents = _ref_pq(rows, m, k, it)
    pts = {vid: [_q(x) for x in vec] for vid, vec in rows}
    sd = len(pts[qvid]) // m
    ad = {}
    for vid, (cs, _) in codes.items():
        if vid == qvid:
            continue
        total = 0
        for s, cid in enumerate(int(c) for c in cs.split(",")):
            qs = pts[qvid][s * sd : (s + 1) * sd]
            cv = cents[(s, cid)]
            total += sum((a - b) * (a - b) for a, b in zip(qs, cv))
        ad[vid] = total
    want = sorted(ad.items(), key=lambda kv: (kv[1], kv[0]))[:topk]
    got = [
        (r["vid"], r["ad2"])
        for r in pq_adc_topk(
            spark.createDataFrame(rows, SCHEMA),
            query_vid=qvid, topk=topk, m=m, k=k, iterations=it,
        ).collect()
    ]
    assert got == [(v, d) for v, d in want]


def test_adc_recovers_planted_neighbors(spark):
    """On the separable parity corpus, every ADC top-k neighbor of
    vid 0 (an even/positive-cluster vector) is itself even."""
    rows = _vecs()
    got = pq_adc_topk(
        spark.createDataFrame(rows, SCHEMA), query_vid=0, topk=10,
        m=4, k=4, iterations=2,
    ).collect()
    assert len(got) == 10
    assert all(r["vid"] % 2 == 0 for r in got)
    # distances non-decreasing in output order
    ds = [r["ad2"] for r in got]
    assert ds == sorted(ds)


def test_codes_shape_and_qerr_positive(spark):
    rows = _vecs()
    out = pq_codes(
        spark.createDataFrame(rows, SCHEMA), m=4, k=4, iterations=2
    ).collect()
    assert len(out) == len(rows)
    for r in out:
        parts = r["codes"].split(",")
        assert len(parts) == 4
        assert all(0 <= int(p) < 4 for p in parts)
        assert r["qerr"] >= 0


def test_adc_batch_consistent_with_single_query(spark):
    """The batch scorer restricted to q=0 must equal pq_adc_topk."""
    from inform_spark.operators.clustering import pq_adc_batch

    rows = _vecs()
    df = spark.createDataFrame(rows, SCHEMA)
    single = [
        (r["vid"], r["ad2"])
        for r in pq_adc_topk(df, query_vid=0, topk=6, m=2, k=3).collect()
    ]
    batch = [
        (r["vid"], r["ad2"])
        for r in pq_adc_batch(df, n_queries=1, topk=6, m=2, k=3)
        .orderBy("rank")
        .collect()
    ]
    assert batch == single


def test_rerank_is_exact_order_of_candidates(spark):
    """Rerank output must equal the exact integer-L2 ranking of the ADC
    shortlist — and with the shortlist covering the whole corpus, the
    exact brute-force top-k."""
    from inform_spark.operators.clustering import (
        pq_rerank_batch,
        quantize_vectors,
    )

    rows = _vecs()
    df = spark.createDataFrame(rows, SCHEMA)
    got = [
        (r["vid"], r["d2"])
        for r in pq_rerank_batch(
            df, n_queries=1, topk=5, n_candidates=len(rows), m=4, k=4
        ).orderBy("rank").collect()
    ]
    pts = {
        r["vid"]: r["qv"]
        for r in quantize_vectors(df).collect()
    }
    exact = sorted(
        (
            (vid, sum((a - b) * (a - b) for a, b in zip(v, pts[0])))
            for vid, v in pts.items()
            if vid != 0
        ),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert got == exact
