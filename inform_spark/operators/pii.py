"""PII detection + redaction over document text — the scrub pass every
published web-corpus pipeline runs before training (FineWeb / Dolma /
the BigCode PII pipeline all redact emails, IP addresses and phone-like
strings; see Penedo et al. 2024 §3.4, Soldaini et al. 2024 §2.3). The
reference has no analog (it archives markdown verbatim); this is
builder-brief scope: a corpus operator the crawl's document table feeds.

Patterns are deliberately written in the COMMON subset of Java regex
(Spark, executor-side codegen) and RE2 (DuckDB oracle) — character
classes, bounded repetition and ``\\b`` only, no lookaround, no
backreferences — so the operator is engine-exact and the oracle can
hash-match it. Both engines do leftmost-first non-overlapping global
replacement, so the sequential three-pass redaction is deterministic.

Scale: a pure narrow map — regexp_count + a three-stage regexp_replace
chain inside whole-stage codegen. Zero shuffle, zero Python; a 100 TB
scrub is a column-pruned scan and rewrite. Counts are emitted BEFORE
redaction so the audit (how much PII per source / per shard) is free.
Pass order matters and is fixed: emails first (their local parts may
contain digit runs a phone pattern would claim), then IPs, then phones
(the replacement tokens themselves contain no digits or ``@``, so later
passes can never re-match earlier rewrites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Common Java-regex / RE2 subset. \d and the classes below are ASCII in
# both engines (Java \d is ASCII unless UNICODE_CHARACTER_CLASS; RE2 \d
# is ASCII by definition).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# E.164-ish: +country-code then 7..14 digits with optional single space
# or hyphen separators, ending in a digit.
PHONE_RE = r"\+\d[\d \-]{5,13}\d"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ipv4, n_phones, n_pii): redact
    emails, IPv4 addresses and E.164-style phone numbers with typed
    placeholder tokens, counting each category before redaction.

    ``n_pii`` is the total; a pipeline filters on it (drop documents that
    are mostly PII), buckets it per source for the scrub audit, or keeps
    ``clean_text`` as the training text."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE)).cast("long")
    # each category is counted on the text the replacement chain actually
    # sees at that stage (an IP-like or digit run inside an already
    # redacted email must not double-count)
    after_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    n_ipv4 = F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long")
    after_ip = F.regexp_replace(after_email, IPV4_RE, IPV4_TOKEN)
    n_phones = F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long")
    clean = F.regexp_replace(after_ip, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        (n_emails + n_ipv4 + n_phones).alias("n_pii"),
    )
