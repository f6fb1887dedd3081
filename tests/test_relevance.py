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
