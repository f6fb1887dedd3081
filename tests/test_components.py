"""Connected-components cluster resolution + line-level global dedup.

Covers the graph algorithm directly on adversarial shapes (a long chain
— the pointer-jumping case — plus a star, a pair, and isolation), the
minhash cluster/survivor wrappers, and dedup_lines first-occurrence
semantics including the short-line exemption and a fully-deduped doc.
"""

from pyspark.sql import functions as F

from inform_spark.operators.components import (
    connected_components,
    minhash_clusters,
    minhash_survivors,
)
from inform_spark.operators.textops import dedup_lines


def _cc_map(spark, edges, max_iter=25):
    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df, max_iter=max_iter).collect()
    return {r["v"]: r["component"] for r in rows}


def test_cc_chain_star_pair(spark):
    # chain 0-1-2-...-9 ; star 100<-{101,102,103}; pair (200,201)
    edges = [(i, i + 1) for i in range(9)]
    edges += [(101, 100), (102, 100), (103, 100)]
    edges += [(200, 201)]
    got = _cc_map(spark, edges)
    assert all(got[i] == 0 for i in range(10))
    assert all(got[i] == 100 for i in (100, 101, 102, 103))
    assert got[200] == 200 and got[201] == 200


def test_cc_long_chain_converges_in_log_rounds(spark):
    # 64-node chain: hash-min alone needs 63 rounds; pointer jumping
    # must resolve it within the default bound (O(log n))
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_map(spark, edges, max_iter=12)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_cc_symmetric_and_duplicate_edges(spark):
    # duplicate + reversed edges must not change the result
    edges = [(1, 2), (2, 1), (1, 2), (3, 2)]
    got = _cc_map(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_minhash_clusters_and_survivors(spark):
    # 0 and 1 are identical (same shingles -> same signature -> pair);
    # 2 is unrelated
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine ten",
    ]
    docs = _docs_df(spark, texts)
    cl = {r["doc_id"]: r["cluster_id"] for r in minhash_clusters(docs).collect()}
    assert cl[0] == 0 and cl[1] == 0 and cl[2] == 2
    sv = {r["doc_id"]: r["n_members"] for r in minhash_survivors(docs).collect()}
    assert sv == {0: 2, 2: 1}


def test_dedup_lines_first_occurrence_wins(spark):
    texts = [
        "shared navigation line\nunique line of doc zero",
        "shared navigation line\nunique line of doc one",
    ]
    out = {
        r["doc_id"]: r for r in dedup_lines(_docs_df(spark, texts)).collect()
    }
    assert out[0]["text_dedup"] == texts[0]
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_dropped"] == 0
    assert out[1]["text_dedup"] == "unique line of doc one"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_dropped"] == 1


def test_dedup_lines_short_line_exemption(spark):
    # "ok" repeats but is under min_chars -> always kept
    texts = ["ok\nthis is a long repeated line", "ok\nthis is a long repeated line"]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(_docs_df(spark, texts), min_chars=5).collect()
    }
    assert out[0]["text_dedup"] == texts[0]
    assert out[1]["text_dedup"] == "ok"
    assert out[1]["n_lines_dropped"] == 1


def test_dedup_lines_fully_deduped_doc_keeps_row(spark):
    texts = ["only line in the corpus", "only line in the corpus"]
    out = {
        r["doc_id"]: r for r in dedup_lines(_docs_df(spark, texts)).collect()
    }
    assert out[1]["text_dedup"] == "" and out[1]["n_lines_kept"] == 0
    assert out[1]["n_lines_dropped"] == 1


def test_dedup_lines_intra_doc_duplicates(spark):
    # the same line twice within one doc: second instance dropped
    out = dedup_lines(
        _docs_df(spark, ["repeat me please\nmiddle row\nrepeat me please"])
    ).collect()[0]
    assert out["text_dedup"] == "repeat me please\nmiddle row"
    assert out["n_lines_kept"] == 2 and out["n_lines_dropped"] == 1


def test_minhash_incremental_verdicts(spark):
    A = "alpha beta gamma delta epsilon zeta eta theta"
    B = "one two three four five six seven eight nine ten"
    C = "unrelated words entirely fresh content never seen anywhere else"
    index = spark.createDataFrame([(0, A)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, A), (11, B), (12, B), (13, C)], "doc_id long, text string"
    )
    from inform_spark.operators.components import minhash_incremental

    got = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in minhash_incremental(new, index).collect()
    }
    assert got[10] == ("dup_of_index", 0)
    assert got[11] == ("kept", None)
    assert got[12] == ("dup_of_new", 11)
    assert got[13] == ("kept", None)


def test_vocab_topk_order_and_ties(spark):
    from inform_spark.operators.textops import vocab_topk

    docs = spark.createDataFrame(
        [(0, "b a a"), (1, "c b A")], "doc_id long, text string"
    )
    rows = vocab_topk(docs, k=2).collect()
    # a appears 3x (lowercased), b 2x; ties broken by token asc
    assert [(r["token"], r["cnt"]) for r in rows] == [("a", 3), ("b", 2)]


def test_duplicate_passage_stats(spark):
    from inform_spark.operators.textops import duplicate_passage_stats

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (0, shared + " tail unique to zero entirely"),
            (1, shared + " other completely different ending here"),
            (2, "nothing in common with anyone at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicate_passage_stats(docs, w=8).collect()}
    # docs 0 and 1 share exactly the one full 'shared' window
    assert got[0]["n_shared"] == 1 and got[1]["n_shared"] == 1
    assert got[2]["n_shared"] == 0 and got[2]["dup_frac"] == 0.0
    assert 0 < got[0]["dup_frac"] < 1


def test_exact_substring_dedup_semantics(spark):
    """Lee et al. exact-substring cut: any w-token span occurring >=2
    times anywhere in the corpus (cross- OR intra-doc) is removed from
    every occurrence; the rest of each document survives in order."""
    from inform_spark.operators.textops import exact_substring_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one two three"),
            (2, "prefix words alpha beta gamma delta suffix stuff"),
            (3, "totally different content with no duplication at all"),
            (4, "alpha beta gamma delta alpha beta gamma delta"),
            (5, "tiny"),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in exact_substring_dedup(docs, w=4).collect()
    }
    assert got[1] == ("unique one two three", 8, 4)
    assert got[2] == ("prefix words suffix stuff", 8, 4)
    assert got[3] == (
        "totally different content with no duplication at all", 8, 0
    )
    # intra-doc repetition: both occurrences cut -> fully removed
    assert got[4] == ("", 8, 8)
    # shorter than the window: untouched
    assert got[5] == ("tiny", 1, 0)
    assert got[6] == ("", 1, 0)


def test_exact_substring_dedup_scale_shape(spark):
    """No pair/bucket materialization: the plan is joins + aggregates,
    never a cartesian product or a per-bucket array collect."""
    from inform_spark.operators.textops import exact_substring_dedup

    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common span here plus doc {i} tail") for i in range(200)],
        "doc_id long, text string",
    )
    df = exact_substring_dedup(docs, w=4)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "collect_set" not in plan


def test_incremental_prebanded_index_equivalent(spark):
    """index_bands (the persisted signature store) must verdict exactly
    like re-banding index_docs from raw text — the production path."""
    from inform_spark.operators import textops
    from inform_spark.operators.components import minhash_incremental

    idx = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    a = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in minhash_incremental(new, idx).collect()
    }
    b = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in minhash_incremental(
            new, index_bands=textops.minhash_band_keys(idx)
        ).collect()
    }
    assert a == b
    assert a[10] == ("dup_of_index", 0)

    import pytest

    with pytest.raises(ValueError):
        minhash_incremental(new)
    with pytest.raises(ValueError):
        minhash_incremental(
            new, idx, index_bands=textops.minhash_band_keys(idx)
        )
