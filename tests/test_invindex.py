"""Positional inverted-index semantics (operators/invindex).

Cross-engine exactness is pinned by the driver oracle
(inverted_postings); these tests pin the postings-string contract on
a hand-checked corpus, the capped+audited heavy-hitter discipline,
and partitioning-independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.invindex import inverted_postings


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog"),
            (3, "cat cat cat"),
        ],
        "doc_id long, text string",
    ).cache()


def test_postings_exact(spark, corpus):
    rows = {r["term"]: r for r in inverted_postings(corpus).collect()}
    # 'the': doc1 at 0,4; doc2 at 0
    assert rows["the"]["df"] == 2
    assert rows["the"]["cf"] == 3
    assert rows["the"]["postings"] == "1:2:0.4;2:1:0"
    assert rows["the"]["n_dropped_docs"] == 0
    # 'cat': doc1 at 1; doc3 at 0,1,2
    assert rows["cat"]["postings"] == "1:1:1;3:3:0.1.2"
    assert rows["cat"]["cf"] == 4
    # singleton
    assert rows["dog"]["postings"] == "2:1:1"
    # every doc-1 token accounted for
    assert sum(r["cf"] for r in rows.values()) == 6 + 2 + 3


def test_cap_audit(spark, corpus):
    """cap=1 keeps the LOWEST doc_id per term; df/cf stay exact and
    the truncation is surfaced, never silent."""
    rows = {
        r["term"]: r
        for r in inverted_postings(corpus, max_docs_per_term=1).collect()
    }
    assert rows["the"]["postings"] == "1:2:0.4"
    assert rows["the"]["df"] == 2  # exact despite the cap
    assert rows["the"]["n_dropped_docs"] == 1
    assert rows["cat"]["postings"] == "1:1:1"
    assert rows["cat"]["n_dropped_docs"] == 1
    assert rows["dog"]["n_dropped_docs"] == 0


def test_empty_tokens_excluded(spark):
    """Double spaces split into empty tokens — they must not become
    index terms, but positions still count the raw split offsets
    (matching the corpus-wide whitespace-token convention)."""
    d = spark.createDataFrame([(7, "a  b")], "doc_id long, text string")
    rows = {r["term"]: r for r in inverted_postings(d).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["postings"] == "7:1:2"


def test_partitioning_independent(spark, corpus):
    a = sorted(tuple(r) for r in inverted_postings(corpus).collect())
    b = sorted(
        tuple(r)
        for r in inverted_postings(corpus.repartition(9)).collect()
    )
    assert a == b


def test_invertibility_random_sweep(spark):
    """120 seeded-random docs (messy whitespace included): the postings
    table must reconstruct every document's exact token->positions map,
    and df/cf must equal pure-Python recounts — the index loses
    nothing and invents nothing."""
    import random

    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(120):
        n = rng.randrange(0, 12)
        toks = [rng.choice(vocab) for _ in range(n)]
        text = " ".join(toks)
        # inject a double space (empty token) into some docs
        if toks and rng.random() < 0.3:
            cut = rng.randrange(len(text) + 1)
            text = text[:cut] + " " + text[cut:]
        rows.append((d, text))

    # pure-Python reference: position = raw split offset, empty tokens
    # occupy positions but are not terms (the module contract)
    ref_positions: dict[str, dict[int, list[int]]] = {}
    for d, text in rows:
        for i, t in enumerate(text.lower().split(" ")):
            if t:
                ref_positions.setdefault(t, {}).setdefault(d, []).append(i)

    got = inverted_postings(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    seen_terms = set()
    for r in got:
        term = r["term"]
        seen_terms.add(term)
        ref = ref_positions[term]
        assert r["df"] == len(ref)
        assert r["cf"] == sum(len(v) for v in ref.values())
        assert r["n_dropped_docs"] == 0
        # decode the canonical string back
        decoded = {}
        for entry in r["postings"].split(";"):
            doc_s, tf_s, poss = entry.split(":")
            decoded[int(doc_s)] = [int(x) for x in poss.split(".")]
            assert int(tf_s) == len(decoded[int(doc_s)])
        assert decoded == ref
        # doc order ascending in the string
        assert list(decoded) == sorted(decoded)
    assert seen_terms == set(ref_positions)
