"""Integer-exact BM25 relevance (operators/relevance.py).

Cross-engine value equality is pinned by the driver oracle
(tests/verify/check_oracle.py bm25_relevance); these tests pin the
SEMANTICS: tf/idf monotonicity, every-doc-appears, rare-term dominance.
"""

from __future__ import annotations

import pytest

from inform_spark.operators.relevance import bm25_relevance


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        (1, "spark spark spark engine"),          # tf=3 for spark, short
        (2, "spark engine " + "pad " * 40),       # tf=1, long
        (3, "engine only no match here"),         # no query term
        (4, "rareword engine"),                   # only the rare term
        (5, "spark rareword"),                    # common + rare
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in bm25_relevance(docs, ["spark", "rareword"]).collect()
    }


def test_every_doc_appears_nonmatch_zero(scored):
    assert set(scored) == {1, 2, 3, 4, 5}
    assert scored[3]["n_matched"] == 0 and scored[3]["score_milli"] == 0


def test_tf_and_length_monotonicity(scored):
    # higher tf in a shorter doc must outscore tf=1 in a long doc
    assert scored[1]["score_milli"] > scored[2]["score_milli"] > 0
    assert scored[1]["n_matched"] == scored[2]["n_matched"] == 1


def test_rare_term_dominates(scored):
    # 'rareword' (df=2) carries more idf than 'spark' (df=3); doc 5
    # matching both must outscore any single-term match of doc 2
    assert scored[5]["n_matched"] == 2
    assert scored[5]["score_milli"] > scored[2]["score_milli"]


def test_dl_counts_all_tokens(scored):
    assert scored[1]["dl"] == 4
    assert scored[2]["dl"] == 42


def test_empty_query_rejected(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_relevance(docs, [])


def test_bm25_matches_python_reference(spark):
    """Cross-check the distributed milli-arithmetic against a sequential
    Python re-derivation on a randomized-but-seeded corpus."""
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "spark", "rare"]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 30))))
        for i in range(40)
    ]
    q = ["spark", "rare"]
    out = {
        r["doc_id"]: r
        for r in bm25_relevance(
            spark.createDataFrame(rows, "doc_id long, text string"), q
        ).collect()
    }

    docs = {i: t.lower().split(" ") for i, t in rows}
    docs = {i: [w for w in ws if w] for i, ws in docs.items()}
    n = len(docs)
    avgdl_milli = 1000 * sum(len(ws) for ws in docs.values()) // n
    df = {t: sum(1 for ws in docs.values() if t in ws) for t in q}
    for i, ws in docs.items():
        dl = len(ws)
        exp = 0
        matched = 0
        for t in q:
            tf = ws.count(t)
            if tf == 0 or df[t] == 0:
                continue
            matched += 1
            idf_bits = (2 + (2 * (n - df[t]) + 1) // (2 * df[t] + 1)).bit_length() - 1
            rel = 1000000 * dl // avgdl_milli
            denom = 1200 * 250 // 1000 + (1200 * 750 // 1000) * rel // 1000 + 1000 * tf
            exp += idf_bits * tf * 2200 * 1000 // denom
        assert out[i]["score_milli"] == exp, f"doc {i}"
        assert out[i]["n_matched"] == matched
        assert out[i]["dl"] == dl


def test_query_terms_case_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "spark engine core"), (2, "no match")],
        "doc_id long, text string",
    )
    lo = {r["doc_id"]: r["score_milli"]
          for r in bm25_relevance(docs, ["spark"]).collect()}
    up = {r["doc_id"]: r["score_milli"]
          for r in bm25_relevance(docs, ["SPARK"]).collect()}
    assert lo == up and lo[1] > 0
