"""BPE merge training + segmentation (operators/subword.bpe_train /
bpe_segment).

The determinism contract: pair counts are associative long sums, the
per-round argmax is a (cnt desc, a asc, b asc) head, and the merge
application is a left-to-right non-overlapping ``replace`` scan — so a
sequential pure-Python reference using ``str.replace`` (identical
scan semantics to Java's and DuckDB's ``replace``) must reproduce the
whole training run exactly, under any partitioning."""

import pytest

from pyspark.sql import functions as F

from inform_spark.operators.subword import bpe_segment, bpe_train

SCHEMA = "doc_id long, text string"


def _corpus():
    return [
        (0, "low lower lowest low low"),
        (1, "new newer newest new newer"),
        (2, "wide wider widest new low"),
        (3, "low low low newer wide"),
    ]


def _ref_train(rows, n_merges):
    """Sequential BPE (Sennrich et al. 2016) with the identical
    tie-break and scan semantics."""
    freq = {}
    for _, text in rows:
        for w in text.lower().split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    # symbol sequences as the same double-space-separated string form
    seqs = {"  ".join(w): f for w, f in freq.items()}
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs = {}
        for seq, f in seqs.items():
            syms = seq.split("  ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rnd, a, b, a + b, cnt))
        pat, rep = f" {a}  {b} ", f" {a}{b} "
        nxt = {}
        for seq, f in seqs.items():
            ns = (" " + seq + " ").replace(pat, rep).strip()
            nxt[ns] = nxt.get(ns, 0) + f
        seqs = nxt
    return merges, seqs


def _ref_segment(rows, merges):
    """Per-doc (n_subword_tokens, n_words) under the trained merges."""
    def tok(w):
        seq = "  ".join(w)
        for _, a, b, _, _ in sorted(merges):
            seq = (" " + seq + " ").replace(
                f" {a}  {b} ", f" {a}{b} "
            ).strip()
        return len(seq.split("  "))

    out = {}
    for did, text in rows:
        words = [w for w in text.lower().split(" ") if w]
        out[did] = (sum(tok(w) for w in words), len(words))
    return out


def test_bpe_train_matches_reference(spark):
    rows = _corpus()
    ref, _ = _ref_train(rows, 8)
    got = [
        (r["round"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_train(
            spark.createDataFrame(rows, SCHEMA), n_merges=8
        ).orderBy("round").collect()
    ]
    assert got == ref


def test_bpe_consecutive_and_overlap(spark):
    """'aaaa' must merge pairwise left-to-right in ONE pass
    ('a a a a' -> 'aa aa', never 'aaa a' or a rescan into 'aaaa');
    'aaa' -> 'aa a'."""
    rows = [(0, "aaaa aaa aaaa")]
    df = spark.createDataFrame(rows, SCHEMA)
    m = [
        (r["round"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_train(df, n_merges=2).orderBy("round").collect()
    ]
    ref, _ = _ref_train(rows, 2)
    assert m == ref
    # round 1 merges (a, a): 3 + 2 + 3 adjacent positions
    assert m[0][1:] == ("a", "a", "aa", 8)
    # after round 1 the corpus is 'aa aa', 'aa a', 'aa aa':
    # most frequent adjacent pair is (aa, aa), count 2
    assert m[1][1:] == ("aa", "aa", "aaaa", 2)
    seg = {
        r["doc_id"]: (r["n_subword_tokens"], r["n_words"])
        for r in bpe_segment(df, m).collect()
    }
    # 'aaaa' -> [aaaa] (1), 'aaa' -> [aa, a] (2)
    assert seg == {0: (1 + 2 + 1, 3)}


def test_bpe_segment_matches_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, SCHEMA)
    merges = [
        (r["round"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_train(df, n_merges=6).collect()
    ]
    got = {
        r["doc_id"]: (r["n_subword_tokens"], r["n_words"])
        for r in bpe_segment(df, merges).collect()
    }
    assert got == _ref_segment(rows, merges)
    # merging strictly shrinks token counts vs raw characters
    for did, text in rows:
        n_chars = sum(len(w) for w in text.split(" ") if w)
        assert got[did][0] < n_chars


def test_bpe_partitioning_invariant(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, SCHEMA)
    a = [tuple(r) for r in bpe_train(df, n_merges=5).orderBy("round").collect()]
    b = [
        tuple(r)
        for r in bpe_train(df.repartition(7, "doc_id"), n_merges=5)
        .orderBy("round")
        .collect()
    ]
    assert a == b


def test_bpe_train_exhausts_gracefully(spark):
    """Single-char words have no adjacent pairs: training stops early
    and returns an empty merge table instead of raising."""
    df = spark.createDataFrame([(0, "a b c a")], SCHEMA)
    assert bpe_train(df, n_merges=3).count() == 0


def test_exhausted_corpus_oracle_agrees(spark, tmp_path):
    """The DuckDB replay of bpe_token_counts must match Spark on a
    corpus that exhausts before 8 merges (empty b{i} rounds must be
    no-ops, not NULL-poisoned replaces)."""
    import duckdb

    import __spark_entry__ as entry

    rows = [(0, "ab ab c d"), (1, "c d c")]  # one learnable merge
    df = spark.createDataFrame(rows, SCHEMA)
    pq = str(tmp_path / "documents.parquet")
    df.write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{pq}/*.parquet'")
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(entry.oracle_sql()["bpe_token_counts"]).fetchall()
    }
    merges = [
        (r["round"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_train(df, n_merges=8).collect()
    ]
    assert len(merges) < 8  # genuinely exhausted
    got = {
        r["doc_id"]: (r["n_subword_tokens"], r["n_words"])
        for r in bpe_segment(df, merges).collect()
    }
    assert got == oracle
