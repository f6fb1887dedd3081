"""Interleaved-span operator semantics (operators/spans.py).

Cross-engine equality with DuckDB is pinned by the driver oracle
(tests/verify/check_oracle.py spans_synthesize span_stats span_rechunk
span_render media_manifest); these tests pin the SEMANTICS: interleave
structure, chunk boundaries, render round-trip, caption pairing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inform_spark.operators.spans import (
    media_manifest,
    span_rechunk,
    span_render,
    span_stats,
    synthesize_interleaved,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, ("alpha beta gamma delta " * 12).strip()),  # 48 words -> 4 text spans
        (2, "one two three"),  # 3 words -> 1 text span
        (3, ""),  # empty text -> 1 (empty) text span
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def spans_df(corpus):
    return synthesize_interleaved(corpus).cache()


def test_interleave_structure(spans_df):
    rows = {r["doc_id"]: r["spans"] for r in spans_df.collect()}
    for doc_id, spans in rows.items():
        # offsets number the sequence contiguously from 0
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        # first span is always text; media spans carry a ref and no text
        assert spans[0]["kind"] == "text"
        for prev, cur in zip(spans, spans[1:]):
            if cur["kind"] == "media":
                assert prev["kind"] == "text"  # media follows its text span
                assert cur["media_ref"].startswith(f"media://{doc_id}/")
                assert cur["text"] is None
            else:
                assert cur["media_ref"] is None
    # doc 1: 48 words = 4 text spans of exactly 12 words
    texts = [s["text"] for s in rows["1"] if s["kind"] == "text"]
    assert len(texts) == 4 and all(len(t.split(" ")) == 12 for t in texts)
    # doc 3: empty text still yields one (empty) text span
    assert [s["kind"] for s in rows["3"]][0] == "text"


def test_synthesis_deterministic(corpus):
    a = synthesize_interleaved(corpus).collect()
    b = synthesize_interleaved(corpus.repartition(7)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_stats_consistent(spans_df):
    got = {r["doc_id"]: r for r in span_stats(spans_df).collect()}
    raw = {r["doc_id"]: r["spans"] for r in spans_df.collect()}
    for doc_id, spans in raw.items():
        st = got[doc_id]
        assert st["n_spans"] == len(spans)
        assert st["n_media"] == sum(1 for s in spans if s["kind"] == "media")
        assert st["n_text"] + st["n_media"] == st["n_spans"]
        assert st["text_chars"] == sum(
            len(s["text"]) for s in spans if s["kind"] == "text"
        )


def test_rechunk_boundaries(spans_df):
    out = span_rechunk(spans_df, max_chars=40, media_cost=7).collect()
    raw = {r["doc_id"]: r["spans"] for r in spans_df.collect()}
    by_doc: dict[str, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["offset"])
        spans = raw[doc_id]
        assert len(rows) == len(spans)  # every span assigned, none torn
        cum = 0
        for r, s in zip(rows, spans):
            assert r["chunk_id"] == cum // 40
            assert r["char_start"] == cum % 40
            cum += len(s["text"]) if s["kind"] == "text" else 7
        # chunk ids are non-decreasing in offset order
        ids = [r["chunk_id"] for r in rows]
        assert ids == sorted(ids)


def test_render_round_trip(corpus, spans_df):
    """Concatenating the text spans of the render recovers the source
    text exactly (media markers removed, word order preserved)."""
    md = {r["doc_id"]: r["md"] for r in span_render(spans_df).collect()}
    src = {str(r["doc_id"]): r["text"] for r in corpus.collect()}
    for doc_id, m in md.items():
        parts = [
            p for p in m.split("\n\n") if not p.startswith("![media](")
        ]
        assert " ".join(parts) == src[doc_id]
        # media markers render the ref verbatim
        for p in m.split("\n\n"):
            if p.startswith("![media]("):
                assert p.endswith(")") and f"media://{doc_id}/" in p


def test_manifest_captions(spans_df):
    got = media_manifest(spans_df).collect()
    raw = {r["doc_id"]: r["spans"] for r in spans_df.collect()}
    n_media = sum(
        1 for spans in raw.values() for s in spans if s["kind"] == "media"
    )
    assert len(got) == n_media
    for r in got:
        spans = raw[r["doc_id"]]
        me = spans[r["offset"]]
        assert me["kind"] == "media" and me["media_ref"] == r["media_ref"]
        assert r["caption"] == spans[r["offset"] - 1]["text"]


def test_rechunk_is_narrow(spans_df):
    """The rechunk plan must contain NO exchange — the whole operator is
    in-row higher-order functions (the 100 TB design point)."""
    plan = span_rechunk(spans_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_span_pii_redact_preserves_interleave(spark):
    """PII is scrubbed inside text spans only; media spans, span count,
    kinds, media_refs and offsets are byte-identical; counts are summed
    over text spans with the pii_redact chain semantics."""
    from inform_spark.operators.spans import span_pii_redact

    rows = [
        (
            1,
            "write to bob@example.com or alice@test.org "
            "box at 10.0.0.1 ping " * 1,
        ),
        (2, "call +1 415 555 0100 now " * 6),  # phone split across spans? no: 5 words/rep
        (3, "clean text with no pii at all " * 3),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    df = synthesize_interleaved(corpus)
    before = {r["doc_id"]: r["spans"] for r in df.collect()}
    out = {r["doc_id"]: r for r in span_pii_redact(df).collect()}

    for doc_id, b in before.items():
        a = out[doc_id]["spans"]
        assert len(a) == len(b)
        for sb, sa in zip(b, a):
            assert sa["kind"] == sb["kind"]
            assert sa["media_ref"] == sb["media_ref"]
            assert sa["offset"] == sb["offset"]
            if sb["kind"] == "media":
                assert sa["text"] == sb["text"]

    joined = {
        doc_id: " ".join(
            s["text"] for s in out[doc_id]["spans"] if s["kind"] == "text"
        )
        for doc_id in before
    }
    assert "<EMAIL>" in joined["1"] and "bob@example.com" not in joined["1"]
    assert "<IP>" in joined["1"] and "10.0.0.1" not in joined["1"]
    assert out["1"]["n_emails"] == 2 and out["1"]["n_ipv4"] == 1
    assert out["1"]["n_pii"] == (
        out["1"]["n_emails"] + out["1"]["n_ipv4"] + out["1"]["n_phones"]
    )
    assert "<PHONE>" in joined["2"]
    assert out["2"]["n_phones"] >= 1
    assert out["3"]["n_pii"] == 0 and "<" not in joined["3"]


def test_span_pii_redact_is_narrow(spark):
    from inform_spark.operators.spans import span_pii_redact

    corpus = spark.createDataFrame(
        [(1, "mail me a@b.co now " * 8)], "doc_id long, text string"
    )
    plan = (
        span_pii_redact(synthesize_interleaved(corpus))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_manifest_document_initial_media(spark):
    """A document whose FIRST span is media still emits a manifest row —
    with a NULL caption (lag semantics), not a silent drop."""
    rows = [(
        "d1",
        [
            ("media", None, "media://d1/0", 0),
            ("text", "caption for next", None, 1),
            ("media", None, "media://d1/1", 2),
        ],
    )]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {r["media_ref"]: r for r in media_manifest(df).collect()}
    assert set(got) == {"media://d1/0", "media://d1/1"}
    assert got["media://d1/0"]["caption"] is None
    assert got["media://d1/1"]["caption"] == "caption for next"
