"""Host-reputation gating, weighted sampling, and shingle tf-idf cosine
— the round-4 second-wave curation additions."""

import math

from pyspark.sql import functions as F

from inform_spark.operators.invindex import tfidf_cosine_topk
from inform_spark.operators.reputation import host_reputation, quality_milli_col
from inform_spark.operators.sampling import weighted_hash_sample

GOOD = (
    "the quick brown fox jumps over a lazy dog and runs to the river "
    "of winding water and the trees stand tall beside the path "
) * 5 + (
    "the travelers walked along the shore and watched the boats drift "
    "out to sea while gulls circled over the harbor and the town"
)  # ~130 words => length credit maxes at 500, mean word len in band


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------------------
# quality_milli_col — integer-exact analog of quality_score
# ---------------------------------------------------------------------------


def _quality_milli_py(text: str) -> int:
    words = text.lower().split(" ")
    n_words = len(words)
    n_chars_nosp = len(text) - (n_words - 1)
    n_stops = sum(1 for w in words if w in ("the", "a", "of", "and", "to"))
    credit = min(500, n_words * 5)
    if 3 * n_words <= n_chars_nosp <= 10 * n_words:
        credit += 300
    credit += min(200, (2000 * n_stops) // n_words)
    return credit


def test_quality_milli_matches_python_reference(spark):
    texts = [
        GOOD,
        "x",
        "spam " * 200,
        "the the the the the",
        "supercalifragilistic expialidocious antidisestablishmentarianism",
        "a b c d e f g h",
    ]
    df = spark.createDataFrame([(t.strip(),) for t in texts], "text string")
    got = {r["text"]: r["q"] for r in df.select("text", quality_milli_col().alias("q")).collect()}
    for t in texts:
        t = t.strip()
        assert got[t] == _quality_milli_py(t), t
        assert 0 <= got[t] <= 1000


# ---------------------------------------------------------------------------
# host_reputation
# ---------------------------------------------------------------------------


def test_host_reputation_blocks_junk_and_template_hosts(spark):
    rows = []
    # healthy host: 10 distinct good docs
    for i in range(10):
        rows.append((i, "good.example", GOOD + f" unique closing words number {i}"))
    # junk host: 10 ultra-short docs (quality_milli < 300)
    for i in range(10):
        rows.append((100 + i, "junk.example", f"x{i}"))
    # template mill: 10 docs, all the same text (distinct ratio 100000 ppm)
    for i in range(10):
        rows.append((200 + i, "mill.example", GOOD))
    out = host_reputation(_docs(spark, rows)).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["source"], []).append(r)
    assert all(not r["host_blocked"] and r["kept"] for r in by_host["good.example"])
    assert all(r["host_blocked"] and not r["kept"] for r in by_host["junk.example"])
    assert all(r["host_blocked"] for r in by_host["mill.example"])
    # the mill's docs are individually GOOD quality — blocked by the host
    assert all(r["quality_milli"] >= 650 for r in by_host["mill.example"])
    # aggregate columns are host-constant and exact
    g = by_host["good.example"][0]
    assert g["host_docs"] == 10
    assert g["host_distinct_ppm"] == 1_000_000
    m = by_host["mill.example"][0]
    assert m["host_distinct_ppm"] == 100_000


def test_host_reputation_verdict_is_host_scoped(spark):
    # one good doc on a junk host is still dropped — that is the point
    rows = [(0, "junk.example", GOOD)] + [
        (i, "junk.example", "y") for i in range(1, 12)
    ]
    out = {r["doc_id"]: r for r in host_reputation(_docs(spark, rows)).collect()}
    assert not out[0]["kept"]
    assert out[0]["quality_milli"] > out[1]["quality_milli"]


# ---------------------------------------------------------------------------
# weighted_hash_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_clamps_and_zero_weight_never_accepted(spark):
    df = spark.createDataFrame(
        [(i, 0 if i % 3 == 0 else (3000 if i % 3 == 1 else 500)) for i in range(300)],
        "k long, w long",
    )
    out = weighted_hash_sample(df, "k", "w", base_ppm=800_000).collect()
    for r in out:
        if r["w"] == 0:
            assert r["p_micro"] == 0 and not r["accepted"]
        elif r["w"] == 3000:
            assert r["p_micro"] == 1_000_000 and r["accepted"]  # clamped to certainty
        else:
            assert r["p_micro"] == 400_000
    mid = [r for r in out if r["w"] == 500]
    frac = sum(r["accepted"] for r in mid) / len(mid)
    assert 0.25 < frac < 0.55  # ~0.4 expected


def test_weighted_sample_monotone_in_base_rate(spark):
    df = spark.createDataFrame([(i, 700) for i in range(500)], "k long, w long")
    lo = {r["k"] for r in weighted_hash_sample(df, "k", "w", 300_000).collect() if r["accepted"]}
    hi = {r["k"] for r in weighted_hash_sample(df, "k", "w", 900_000).collect() if r["accepted"]}
    assert lo <= hi and len(lo) < len(hi)


def test_weighted_sample_partitioning_independent(spark):
    df1 = spark.createDataFrame([(i, 900) for i in range(400)], "k long, w long")
    a = {r["k"] for r in weighted_hash_sample(df1.repartition(1), "k", "w", 500_000).collect() if r["accepted"]}
    b = {r["k"] for r in weighted_hash_sample(df1.repartition(13, "k"), "k", "w", 500_000).collect() if r["accepted"]}
    assert a == b and a


# ---------------------------------------------------------------------------
# tfidf_cosine_topk
# ---------------------------------------------------------------------------


def test_tfidf_near_dup_pair_ranks_first(spark):
    filler = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet black white gray",
    ]
    near_a = "the crawler fetched the robots file and parsed every disallow rule slowly"
    near_b = "the crawler fetched the robots file and parsed every disallow rule quickly"
    rows = [(0, "s", near_a), (1, "s", near_b)] + [
        (i + 2, "s", t) for i, t in enumerate(filler)
    ]
    out = tfidf_cosine_topk(_docs(spark, rows), topk=3).collect()
    assert (out[0]["a"], out[0]["b"]) == (0, 1)
    assert 0 < out[0]["cos6"] <= 1.0
    assert out[0]["cos6"] > (out[1]["cos6"] if len(out) > 1 else 0)


def test_tfidf_cosine_matches_dense_reference(spark):
    rows = [
        (0, "s", "spark shuffles the sorted rows into partitioned buckets"),
        (1, "s", "spark shuffles the sorted rows into bucketed partitions"),
        (2, "s", "ducks swim across the quiet pond at dawn every morning"),
        (3, "s", "ducks swim across the quiet pond at dusk every evening"),
        (4, "s", "completely unrelated text about cooking pasta with garlic sauce"),
    ]
    out = {(r["a"], r["b"]): (r["dot"], r["cos6"]) for r in tfidf_cosine_topk(_docs(spark, rows), topk=50).collect()}

    # dense python reference with identical integer weighting
    def shingles(t):
        w = t.lower().split(" ")
        n = max(len(w) - 3, 0)
        return [" ".join(w[i : i + 3]) for i in range(n + 1)]

    docs = {i: shingles(t) for i, _, t in rows}
    df = {}
    for sh in docs.values():
        for term in set(sh):
            df[term] = df.get(term, 0) + 1
    n = len(docs)
    vecs = {}
    for i, sh in docs.items():
        v = {}
        for term in sh:
            bits = ((n * n) // (df[term] * df[term])).bit_length() - 1
            if bits >= 1:
                v[term] = v.get(term, 0) + bits
        vecs[i] = v
    for (a, b), (dot, cos6) in out.items():
        va, vb = vecs[a], vecs[b]
        ref_dot = sum(va[t] * vb[t] for t in va.keys() & vb.keys())
        assert dot == ref_dot, (a, b)
        ref_cos = round(
            ref_dot
            / math.sqrt(
                sum(x * x for x in va.values()) * sum(x * x for x in vb.values())
            ),
            6,
        )
        assert abs(cos6 - ref_cos) < 1e-9, (a, b)


def test_tfidf_stop_terms_never_pair(spark):
    # every doc shares "the common words here" — df == N ⇒ idf 0 ⇒ no pair
    rows = [(i, "s", f"the common words here unique{i} tail{i} extra{i} more{i}") for i in range(6)]
    out = tfidf_cosine_topk(_docs(spark, rows), topk=50).collect()
    assert out == []
