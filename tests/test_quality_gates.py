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


# ---------------------------------------------------------------------------
# model-based quality scorer (fastText/DCLM-style hashed linear model)
# ---------------------------------------------------------------------------


def _py_model_score(text: str, dim: int = 1 << 18):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ws = text.lower().split(" ")
    feats = ws + [f"{ws[i]}_{ws[i + 1]}" for i in range(len(ws) - 1)]
    return len(feats), sum(
        h60(f"qw{h60(f) % dim}") % 2001 - 1000 for f in feats
    )


def test_model_quality_score_matches_sequential(spark):
    from inform_spark.operators.quality import model_quality_score

    rows = [
        (1, "Hello World this is a Reasonable document"),
        (2, ""),
        (3, "one-token"),
        (4, "repeat repeat repeat repeat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in model_quality_score(docs).collect()}
    for doc_id, text in rows:
        n, s = _py_model_score(text)
        assert (got[doc_id]["n_feats"], got[doc_id]["score_milli"]) == (n, s)
        assert got[doc_id]["keep"] == (s > 0)


def test_model_quality_score_weights_join_path(spark):
    """The trained-weights (broadcast-join) path must equal the in-row
    synthetic-weights path when the weights table carries the same
    values — proving the production shape is a drop-in."""
    import hashlib

    from pyspark.sql import functions as F

    from inform_spark.operators.quality import model_quality_score

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    dim = 1 << 10  # small dim so the full weights table is enumerable
    rows = [(i, f"doc number {i} words vary w{i % 17} w{i % 5}")
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    weights = spark.createDataFrame(
        [(b, h60(f"qw{b}") % 2001 - 1000) for b in range(dim)],
        "bucket long, w_milli long",
    )
    derived = sorted(
        tuple(r) for r in model_quality_score(docs, dim=dim).collect()
    )
    joined_df = model_quality_score(docs, weights=weights, dim=dim)
    joined = sorted(tuple(r) for r in joined_df.collect())
    assert derived == joined
    # and the join is a broadcast, never a shuffle of the doc side's rows
    # (plan read AFTER collect — AQE finalizes the executed QE)
    plan = joined_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_model_quality_score_threshold(spark):
    from inform_spark.operators.quality import model_quality_score

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    strict = {
        r["doc_id"]: r["keep"]
        for r in model_quality_score(docs, threshold_milli=10_000).collect()
    }
    # mean milli-weight can never exceed 1000, so threshold 10000 keeps none
    assert not any(strict.values())
