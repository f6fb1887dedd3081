"""simhash_neardup_pairs semantics: pigeonhole recall, hamming verify,
and scoped candidate generation (cross-engine value equality is pinned
by the driver oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.textops import simhash, simhash_neardup_pairs


def test_exact_dups_and_near_dups_pair(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    rows = [
        (1, base),
        (2, base),                     # exact dup -> hamming 0
        (3, base + " extratoken"),     # near dup -> small hamming
        (4, "entirely different words " * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, bits=32).collect()
    }
    assert pairs[(1, 2)] == 0
    # the (1, 3) pair appears exactly iff its true hamming is <= 3 (a
    # one-token edit on a low-margin fingerprint can flip more bits)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, 32).collect()}
    h13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ((1, 3) in pairs) == (h13 <= 3)
    if (1, 3) in pairs:
        assert pairs[(1, 3)] == h13
    assert not any(4 in p for p in pairs)


def test_recall_matches_brute_force(spark):
    """Every pair within max_hamming of the full signature table must be
    found (the pigeonhole guarantee) — compare against a brute-force
    all-pairs hamming computation on a small corpus."""
    import itertools

    rows = [
        (i, f"tok{i % 4} common words shared by everyone here " * 3
            + f"tail{i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, 32).collect()}
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, bits=32).collect()
    }
    assert got == want


def test_invalid_params_rejected(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(AssertionError):
        simhash_neardup_pairs(docs, bits=16, n_bands=4, max_hamming=4)
