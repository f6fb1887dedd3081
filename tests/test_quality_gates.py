"""Gopher quality-gate semantics (operators/quality)."""

from __future__ import annotations

from inform_spark.operators.quality import gate_rejection_rollup, gopher_gates

GOOD = (
    "the quick brown fox jumps over that lazy dog and runs off to have "
    "a very fine day with friends in the woods near town " * 3
).strip()


def _gates(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in gopher_gates(df).collect()}


def test_good_doc_passes(spark):
    g = _gates(spark, [(1, GOOD)])[1]
    assert g["pass_all"] and g["gate_word_count"] and g["gate_stop_words"]


def test_short_doc_fails_word_count(spark):
    g = _gates(spark, [(1, "the cat sat with that hat")])[1]
    assert not g["gate_word_count"] and not g["pass_all"]
    assert g["gate_stop_words"]  # 'the', 'with', 'that' = 3 distinct


def test_symbol_ratio_gate(spark):
    noisy = GOOD + " " + "# # # # # # # # # # # # # # # # # # # #" * 2
    g = _gates(spark, [(1, noisy)])[1]
    assert g["symbol_ratio"] > 0.1 and not g["gate_symbol_ratio"]


def test_stop_word_gate_needs_two_distinct(spark):
    words = "zap " * 60 + "the the the the"  # only 1 distinct stop word
    g = _gates(spark, [(1, words.strip())])[1]
    assert g["stop_hits"] == 1 and not g["gate_stop_words"]


def test_bullet_lines_gate(spark):
    bullets = "\n".join(["- item the and"] * 10)
    g = _gates(spark, [(1, bullets)])[1]
    assert not g["gate_bullets"]  # 100% bulleted lines > 90%


def test_rejection_rollup(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, "too short the and")], "doc_id long, text string"
    )
    r = gate_rejection_rollup(gopher_gates(df)).collect()[0]
    assert r["n_docs"] == 2 and r["passed"] == 1
    assert r["rejected_word_count"] == 1
