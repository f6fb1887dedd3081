"""PII redaction, C4 badword/blocklist gate, unigram surprisal band."""

from pyspark.sql import functions as F

from inform_spark.operators.importance import unigram_surprisal
from inform_spark.operators.pii import pii_redact
from inform_spark.operators.quality import badword_filter


def test_pii_redact_all_three_categories(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@sub.example.co.uk today"),
            (1, "server 192.168.001.9 and 10.0.0.1 up"),
            (2, "call +1 415 555-0134 or +442071838750 now"),
            (3, "plain text with no pii at all"),
            (4, "u@h.io from 8.8.8.8 dial +33 1 42 68 53 00"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[0]["n_emails"] == 1 and "<EMAIL>" in out[0]["clean_text"]
    assert "jane.doe" not in out[0]["clean_text"]
    assert out[1]["n_ipv4"] == 2 and out[1]["clean_text"].count("<IP>") == 2
    assert out[2]["n_phones"] == 2
    assert out[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_pii"] == 0 and out[3]["clean_text"] == docs.collect()[3]["text"]
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (1, 1, 1)


def test_pii_email_digits_not_double_counted(spark):
    # digit runs inside an email must not count as IP/phone after the
    # email pass rewrote them
    docs = spark.createDataFrame(
        [(0, "ping user.10.2.3.9@ex.org ok")], "doc_id long, text string"
    )
    row = pii_redact(docs).collect()[0]
    assert row["n_emails"] == 1 and row["n_ipv4"] == 0 and row["n_phones"] == 0


def test_pii_plan_is_narrow(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    plan = pii_redact(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: pure map


def test_badword_filter_word_and_domain_branches(spark):
    docs = spark.createDataFrame(
        [
            (0, "clean text here", "good.org"),
            (1, "this has badword inside", "good.org"),
            (2, "NSFW shouting", "good.org"),       # lowercased token match
            (3, "notbadword substring safe", "good.org"),  # whole-token only
            (4, "clean text here", "evil.example"),
        ],
        "doc_id long, text string, source string",
    )
    blocked = spark.createDataFrame([("evil.example",)], "source: string")
    out = {
        r["doc_id"]: r
        for r in badword_filter(docs, blocked_sources=blocked).collect()
    }
    assert out[0]["keep"] and out[0]["n_bad_words"] == 0
    assert not out[1]["keep"] and out[1]["n_bad_words"] == 1
    assert not out[2]["keep"] and out[2]["n_bad_words"] == 1
    assert out[3]["keep"], "substring must not match (C4 whole-token rule)"
    assert not out[4]["keep"] and out[4]["source_blocked"]
    assert out[4]["n_bad_words"] == 0


def test_badword_domain_join_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "words", f"s{i % 3}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    blocked = spark.createDataFrame([("s1",)], "source: string")
    plan = (
        badword_filter(docs, blocked_sources=blocked)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan
    assert "SortMergeJoin" not in plan


def test_unigram_surprisal_rare_tokens_cost_more(spark):
    # 'common' appears 16x, 'rare' once: doc of rare tokens scores higher
    rows = [(i, "common common common common", ) for i in range(4)]
    rows += [(4, "raretoken common common common")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    assert out[4]["surprisal_bits"] > out[0]["surprisal_bits"]
    assert out[0]["n_tokens"] == 4
    # floor-log2 exactness: common count=19, total=20 -> 20 div 19 = 1,
    # floor log2 = 0 bits; rare -> 20 div 1 = 20 -> 4 bits
    assert out[0]["surprisal_bits"] == 0
    assert out[4]["surprisal_bits"] == 4


def test_unigram_surprisal_partitioning_independent(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} tok{i % 11} filler") for i in range(60)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["surprisal_bits"] for r in unigram_surprisal(docs).collect()}
    b = {
        r["doc_id"]: r["surprisal_bits"]
        for r in unigram_surprisal(docs.repartition(13)).collect()
    }
    assert a == b


def test_unigram_surprisal_zero_token_doc_explicit(spark):
    docs = spark.createDataFrame(
        [(0, "some words here"), (1, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    assert out[1]["n_tokens"] == 0
    assert out[1]["surprisal_bits"] is None and not out[1]["keep"]
