"""Streaming CDC chunk ingest: sequential-reference equality,
cross-batch first-arrival store semantics, replay idempotence."""

import hashlib
import os

from inform_spark.streaming.chunkdedup import (
    chunk_ingest_stream,
    init_chunk_index,
    process_batch,
    read_chunk_verdicts,
)

SCHEMA = "doc_id long, text string"
W, D = 3, 4

A = "the quick brown fox jumps over the lazy dog again and again today"
B = "a b c d e f g h i j k l m n o p q r s t u v w x y z"
C = "spark rows keys tables spark rows keys tables spark rows keys tables"


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _chunks_py(text):
    toks = text.lower().split(" ")
    n = len(toks)
    ends = [
        j + W - 1
        for j in range(0, n - W + 1)
        if _h60(" ".join(toks[j : j + W])) % D == 0
    ]
    if not ends or ends[-1] != n - 1:
        ends.append(n - 1)
    out, prev = [], -1
    for e in ends:
        out.append((_h60(" ".join(toks[prev + 1 : e + 1])), e - prev))
        prev = e
    return out


def _ingest_py(batches, index=None):
    """Sequential reference of the ingest loop: index maps h -> owner."""
    index = dict(index or {})
    verdicts = {}
    for rows in batches:
        batch_new = {}
        for doc_id, text in sorted(rows):
            v = dict(n_chunks=0, stored_chunks=0, stored_tokens=0,
                     dup_chunks=0, dup_tokens=0)
            for h, tk in _chunks_py(text):
                v["n_chunks"] += 1
                if h in index or h in batch_new:
                    # already stored: by the index, an earlier doc of
                    # this batch, or this doc's own earlier occurrence
                    v["dup_chunks"] += 1
                    v["dup_tokens"] += tk
                else:
                    v["stored_chunks"] += 1
                    v["stored_tokens"] += tk
                    batch_new[h] = doc_id
            verdicts[doc_id] = v
        index.update(batch_new)
    return verdicts, index


def _run_stream(spark, tmp, batches, seed_docs=None):
    index_dir = os.path.join(tmp, "index")
    verdicts_dir = os.path.join(tmp, "verdicts")
    ck = os.path.join(tmp, "ck")
    in_dir = os.path.join(tmp, "incoming")
    os.makedirs(in_dir)
    init_chunk_index(
        spark, index_dir,
        spark.createDataFrame(seed_docs, SCHEMA) if seed_docs else None,
        w=W, divisor=D,
    )
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = chunk_ingest_stream(stream, index_dir, verdicts_dir, ck, w=W, divisor=D)
    q.awaitTermination(120)
    return {
        r["doc_id"]: {
            k: r[k]
            for k in ("n_chunks", "stored_chunks", "stored_tokens",
                      "dup_chunks", "dup_tokens")
        }
        for r in read_chunk_verdicts(spark, verdicts_dir).collect()
    }, index_dir


def test_single_batch_matches_sequential_reference(spark, tmp_path):
    rows = [(1, A), (2, A), (3, B), (4, C)]
    got, _ = _run_stream(spark, str(tmp_path), [rows])
    ref, _ = _ingest_py([rows])
    assert got == ref
    # doc 1 stores everything, its identical twin doc 2 stores nothing
    assert got[2]["stored_chunks"] == 0
    assert got[2]["dup_tokens"] == got[1]["stored_tokens"]


def test_cross_batch_first_arrival_and_totals(spark, tmp_path):
    b1, b2 = [(1, A), (2, B)], [(3, A), (4, C)]
    got, index_dir = _run_stream(spark, str(tmp_path), [b1, b2])
    ref, ref_index = _ingest_py([b1, b2])
    assert got == ref
    # doc 3 arrives after doc 1 stored A's chunks: pure dup
    assert got[3]["stored_chunks"] == 0 and got[3]["dup_chunks"] > 0
    # store-cost invariant: total stored tokens == sum of distinct
    # chunk token counts; index has exactly the distinct chunk hashes
    idx = spark.read.parquet(index_dir)
    assert idx.count() == len(ref_index)
    assert sum(v["stored_tokens"] for v in got.values()) == sum(
        dict((h, tk) for t in (A, B, C) for h, tk in _chunks_py(t)).values()
    )


def test_seeded_index_makes_arrivals_dup(spark, tmp_path):
    got, _ = _run_stream(spark, str(tmp_path), [[(10, A)]], seed_docs=[(0, A)])
    assert got[10]["stored_chunks"] == 0
    assert got[10]["dup_chunks"] == got[10]["n_chunks"]


def test_replay_idempotent(spark, tmp_path):
    """Re-running the identical batch after the index append committed
    must reproduce identical verdicts and append nothing twice."""
    index_dir = os.path.join(str(tmp_path), "index")
    verdicts_dir = os.path.join(str(tmp_path), "verdicts")
    init_chunk_index(spark, index_dir, w=W, divisor=D)
    batch = spark.createDataFrame([(1, A), (2, A), (3, B)], SCHEMA)

    process_batch(batch, 0, index_dir, verdicts_dir, w=W, divisor=D)
    first = sorted(
        read_chunk_verdicts(spark, verdicts_dir).collect(),
        key=lambda r: r["doc_id"],
    )
    n_idx = spark.read.parquet(index_dir).count()

    process_batch(batch, 0, index_dir, verdicts_dir, w=W, divisor=D)  # replay
    second = sorted(
        read_chunk_verdicts(spark, verdicts_dir).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r.asDict() for r in first] == [r.asDict() for r in second]
    assert spark.read.parquet(index_dir).count() == n_idx
