"""WARC serialization/parsing (sources/warc.py) — framing edge cases the
round-trip oracle can't isolate: adversarial payloads, gzip members,
byte-exact CDX offsets, and the write->read e2e path."""

import gzip
import hashlib
import os

import pytest
from pyspark.sql import Row, functions as F

from inform_spark.sources import warc


def _one_record(spark, payload, uri="https://x.test/a", ship=True):
    if ship:
        from inform_spark.session import ship_package

        ship_package(spark)
    df = spark.createDataFrame(
        [Row(uri=uri, warc_date="2026-01-01T00:00:00Z",
             content_type="text/plain; charset=utf-8", payload=payload)]
    )
    return warc.serialize_warc(df).select("warc").first()["warc"]


def test_record_framing_bytes(spark):
    rec = _one_record(spark, "hello world")
    raw = rec.encode("utf-8")
    assert raw.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert b"WARC-Target-URI: https://x.test/a\r\n" in raw
    assert b"Content-Length: 11\r\n\r\nhello world\r\n\r\n" in raw
    assert raw.endswith(b"\r\n\r\n")


def test_content_length_is_bytes_not_chars(spark):
    payload = "café 中文"  # 6 chars after 'caf', multi-byte
    rec = _one_record(spark, payload)
    n_bytes = len(payload.encode("utf-8"))
    assert f"Content-Length: {n_bytes}\r\n" in rec
    (parsed,) = list(warc.iter_warc_records(rec.encode("utf-8")))
    assert parsed["payload"].decode("utf-8") == payload
    assert parsed["content_length"] == n_bytes


def test_payload_containing_warc_header_not_split(spark):
    # a page ABOUT warc files: Content-Length framing must not be fooled
    evil = "intro\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake body\r\n\r\ntail"
    rec = _one_record(spark, evil)
    recs = list(warc.iter_warc_records(rec.encode("utf-8") * 3))
    assert len(recs) == 3
    assert all(r["payload"].decode("utf-8") == evil for r in recs)


def test_empty_payload_record(spark):
    rec = _one_record(spark, "")
    (parsed,) = list(warc.iter_warc_records(rec.encode("utf-8")))
    assert parsed["content_length"] == 0
    assert parsed["payload"] == b""


def test_gzip_member_records():
    # .warc.gz convention: each record its own gzip member, concatenated
    raw1 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://g.test/1\r\n"
        b"Content-Length: 5\r\n\r\nabcde\r\n\r\n"
    )
    raw2 = raw1.replace(b"/1", b"/2").replace(b"abcde", b"fghij")
    blob = gzip.compress(raw1) + gzip.compress(raw2)
    recs = list(warc.iter_warc_records(blob))
    assert [r["target_uri"] for r in recs] == [
        "https://g.test/1", "https://g.test/2"
    ]
    assert [r["payload"] for r in recs] == [b"abcde", b"fghij"]


def test_negative_content_length_raises():
    # a negative length would move the cursor backward: at best garbage,
    # at worst an infinite re-parse loop on a corrupt/hostile archive
    bad = (
        b"WARC/1.0\r\nWARC-Target-URI: https://n.test\r\n"
        b"Content-Length: -10\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError, match="negative WARC Content-Length"):
        list(warc.iter_warc_records(bad))


def test_null_uri_raises_instead_of_silent_drop(spark):
    # F.concat null-propagates; a NULL uri must fail loudly, not vanish
    # from the shard while cdx_index still counts it
    df = spark.createDataFrame(
        [(None, "2026-01-01T00:00:00Z", "text/plain", "x")],
        "uri string, warc_date string, content_type string, payload string",
    )
    with pytest.raises(Exception, match="NULL uri or date"):
        warc.serialize_warc(df).select("warc").collect()


def test_null_payload_becomes_empty_record(spark):
    df = spark.createDataFrame(
        [("https://p.test/", "2026-01-01T00:00:00Z", None, None)],
        "uri string, warc_date string, content_type string, payload string",
    )
    rec = warc.serialize_warc(df).select("warc").first()["warc"]
    (parsed,) = list(warc.iter_warc_records(rec.encode("utf-8")))
    assert parsed["payload"] == b""
    assert parsed["content_length"] == 0


def test_truncated_payload_raises():
    raw = (
        b"WARC/1.0\r\nWARC-Target-URI: https://t.test\r\n"
        b"Content-Length: 100\r\n\r\nshort"
    )
    with pytest.raises(ValueError, match="truncated WARC payload"):
        list(warc.iter_warc_records(raw))


def test_stray_newlines_between_records_tolerated():
    raw = (
        b"WARC/1.0\r\nWARC-Target-URI: https://s.test\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    recs = list(warc.iter_warc_records(raw + b"\n" + raw + b"\r\n\n" + raw))
    assert len(recs) == 3


def test_cdx_offsets_are_byte_exact(spark):
    from inform_spark.session import ship_package

    ship_package(spark)
    rows = [
        Row(doc_id=i, uri=f"https://c.test/{i}",
            warc_date="2026-01-01T00:00:00Z", content_type="text/plain",
            payload=("x" * (i * 7 + 1)) + "é")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    recs = warc.serialize_warc(df).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(2))
    )
    idx = {r["uri"]: r for r in warc.cdx_index(recs).collect()}
    # rebuild each shard buffer in write order, then range-read by the
    # index and re-parse the single record at (offset, length)
    for shard in (0, 1):
        members = sorted(
            (r for r in recs.collect() if r["shard"] == shard),
            key=lambda r: r["doc_id"],
        )
        blob = "".join(r["warc"] for r in members).encode("utf-8")
        for r in members:
            e = idx[r["uri"]]
            window = blob[e["offset"] : e["offset"] + e["length"]]
            (parsed,) = list(warc.iter_warc_records(window))
            assert parsed["target_uri"] == r["uri"]
            assert parsed["payload"].decode("utf-8") == r["payload"]
        # offsets tile the shard exactly: sum of lengths == blob size
        assert sum(idx[r["uri"]]["length"] for r in members) == len(blob)


def test_write_then_read_warc_e2e(spark, tmp_path):
    from inform_spark.session import ship_package

    ship_package(spark)
    rows = [
        Row(uri=f"https://e.test/{i}", warc_date="2026-01-01T00:00:00Z",
            content_type="text/html", payload=f"<p>doc {i} — body</p>")
        for i in range(20)
    ]
    df = warc.serialize_warc(spark.createDataFrame(rows)).repartition(3)
    out = os.path.join(str(tmp_path), "archive")
    warc.write_warc(df, out)
    back = warc.read_warc(spark, out).collect()
    assert len(back) == 20
    got = {r["target_uri"]: r["payload"].decode("utf-8") for r in back}
    want = {r.uri: r.payload for r in rows}
    assert got == want
    # payload digests survive the full cycle
    for r in back:
        assert hashlib.md5(r["payload"]).hexdigest() == hashlib.md5(
            want[r["target_uri"]].encode("utf-8")
        ).hexdigest()


def test_written_file_is_byte_exact(spark, tmp_path):
    """A written shard's bytes == the in-memory record concat, so CDX
    offsets computed before the write hold against the file on disk."""
    from inform_spark.session import ship_package

    ship_package(spark)
    rows = [
        Row(uri=f"https://b.test/{i}", warc_date="2026-01-01T00:00:00Z",
            content_type="text/plain", payload=f"päge {i}\r\nwith crlf")
        for i in range(5)
    ]
    df = warc.serialize_warc(spark.createDataFrame(rows))
    expect = "".join(
        r["warc"] for r in df.orderBy("uri").collect()
    ).encode("utf-8")
    out = os.path.join(str(tmp_path), "shard")
    warc.write_warc(df.orderBy("uri").coalesce(1), out)
    (part,) = [f for f in os.listdir(out) if f.startswith("part-")]
    with open(os.path.join(out, part), "rb") as f:
        assert f.read() == expect


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:
    _fuzz_given = given(
        payloads=st.lists(
            st.text(
                # surrogates can't encode to utf-8; everything else goes,
                # including CRLFs, header-lookalikes, and astral chars
                alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=300,
            ),
            min_size=1,
            max_size=5,
        )
    )

    @settings(max_examples=150, deadline=None)
    @_fuzz_given
    def test_serialize_parse_identity_fuzz(payloads):
        """Property: parse(concat(serialize(p_i))) recovers every payload
        byte-for-byte, for arbitrary unicode payloads — the plain-Python
        mirror of warc_record_col's template (kept in sync by the
        byte-level framing tests above and the oracle round trip)."""
        import hashlib

        def record(uri, payload: str) -> bytes:
            body = payload.encode("utf-8")
            h = hashlib.md5(f"{uri}\n2026-01-01T00:00:00Z".encode()).hexdigest()
            rid = f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
            hdr = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                f"WARC-Record-ID: {rid}\r\n"
                f"Content-Type: text/plain; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            )
            return hdr.encode("utf-8") + body + b"\r\n\r\n"

        blob = b"".join(
            record(f"https://f.test/{i}", p) for i, p in enumerate(payloads)
        )
        recs = list(warc.iter_warc_records(blob))
        assert len(recs) == len(payloads)
        for i, (r, p) in enumerate(zip(recs, payloads)):
            assert r["target_uri"] == f"https://f.test/{i}"
            assert r["payload"] == p.encode("utf-8")
