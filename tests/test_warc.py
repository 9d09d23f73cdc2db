"""WARC ingest: Content-Length framing, per-record gzip members, HTTP
response splitting, error isolation, and the Spark kernel's shuffle-free
plan.  WARC 1.0 / ISO 28500 semantics; the synth contract is asserted
against frontier.synth.synth_warc_segments so the warc_ingest oracle's
closed forms stay honest."""

from __future__ import annotations

import gzip
from datetime import datetime

import pytest

from frontier.warc import (
    build_http_response,
    build_warc_record,
    gunzip_members,
    iter_warc_records,
    parse_http_response,
    parse_warc_date,
    warc_records,
)


def _segment(bodies: list[bytes], status: int = 200) -> bytes:
    parts = [build_warc_record("warcinfo", b"software: test\r\n")]
    for i, body in enumerate(bodies):
        url = f"http://h.example.com/{i}"
        parts.append(
            build_warc_record("request", b"GET / HTTP/1.1\r\n", url=url)
        )
        parts.append(
            build_warc_record(
                "response",
                build_http_response(status, "OK", "text/html; charset=UTF-8", body),
                url=url,
                date=f"2025-01-01T00:00:{i:02d}Z",
            )
        )
    return b"".join(parts)


def test_framing_survives_banner_in_body():
    """A body that CONTAINS a full fake WARC record must not desync the
    walk — only Content-Length framing gets this right."""
    fake = build_warc_record("response", b"decoy")  # a whole record as body text
    seg = _segment([b"plain", fake, b"tail"])
    recs = list(iter_warc_records(seg))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "request", "response",
        "request", "response",
    ]
    _, _, body1, _ = parse_http_response(recs[4][1])
    assert body1 == fake  # the decoy came back intact as payload


def test_gzip_members_roundtrip():
    seg = _segment([b"alpha", b"beta"])
    # re-split into per-record members exactly like synth does
    records = list(iter_warc_records(seg))
    rebuilt = []
    pos = 0
    # compress the raw segment in arbitrary chunk boundaries too
    gz = b"".join(
        gzip.compress(chunk, mtime=0)
        for chunk in (seg[: len(seg) // 2], seg[len(seg) // 2 :])
    )
    assert gunzip_members(gz) == seg
    assert gunzip_members(seg) == seg  # non-gzip passthrough
    assert len(list(iter_warc_records(gunzip_members(gz)))) == len(records)


def test_truncated_tail_is_dropped_not_raised():
    seg = _segment([b"one", b"two"])
    for cut in (len(seg) - 1, len(seg) - 40, len(seg) // 2, 3):
        recs = list(iter_warc_records(seg[:cut]))  # must not raise
        assert len(recs) < 7
    assert list(iter_warc_records(b"")) == []
    assert list(iter_warc_records(b"garbage not warc")) == []
    # truncated gzip member: whatever decoded is a clean prefix, no raise
    gz = gzip.compress(seg, mtime=0)
    assert seg.startswith(gunzip_members(gz[: len(gz) // 2]))


def test_http_response_split_and_params():
    status, ctype, body, http = parse_http_response(
        build_http_response(
            301, "Moved", "Text/HTML; charset=latin-1", b"x\r\n\r\ny",
            extra={"ETag": chr(34) + "abc" + chr(34), "X-Robots-Tag": "noindex, nofollow"},
        )
    )
    assert (status, ctype) == (301, "text/html")
    assert body == b"x\r\n\r\ny"  # body's own CRLFCRLF untouched
    assert http["etag"] == chr(34) + "abc" + chr(34)
    assert http["x-robots-tag"] == "noindex, nofollow"
    status, ctype, body, http = parse_http_response(b"not http at all")
    assert status is None and ctype is None and body == b"not http at all"
    assert http == {}


def test_header_continuation_and_date():
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://a/\r\n"
        b"\t continued-garbage\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    (headers, block), = iter_warc_records(rec)
    assert headers["warc-target-uri"] == "http://a/ continued-garbage"
    assert block == b"hi"
    assert parse_warc_date("2025-02-03T04:05:06Z") == datetime(2025, 2, 3, 4, 5, 6)
    assert parse_warc_date("junk") is None and parse_warc_date(None) is None


def test_warc_records_dataframe(spark):
    seg_plain = _segment([b"<html>a</html>", b"<html>b</html>"])
    # gz variant: per-record members, like synth's odd segments
    parts = list(iter_warc_records(seg_plain))
    seg_gz = b"".join(
        gzip.compress(
            build_warc_record(
                h["warc-type"], blk,
                url=h.get("warc-target-uri"), date=h.get("warc-date"),
            ),
            mtime=0,
        )
        for h, blk in parts
    )
    df = spark.createDataFrame(
        [(0, bytearray(seg_plain)), (1, bytearray(seg_gz))],
        "segment_id long, payload binary",
    )
    rows = warc_records(df).collect()
    assert len(rows) == 10  # (warcinfo + 2*(req+resp)) * 2 segments
    mix = {r.warc_type for r in rows}
    assert mix == {"warcinfo", "request", "response"}
    resp = [r for r in rows if r.warc_type == "response"]
    assert all(r.http_status == 200 and r.content_type == "text/html" for r in resp)
    assert sorted(bytes(r.html) for r in resp) == sorted(
        [b"<html>a</html>", b"<html>b</html>"] * 2
    )
    assert all(r.warc_ts is not None and r.url for r in resp)
    only = warc_records(df, responses_only=True).collect()
    assert len(only) == 4 and all(r.warc_type == "response" for r in only)


def test_warc_kernel_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(0, bytearray(_segment([b"x"])))], "segment_id long, payload binary"
    )
    plan = warc_records(df, responses_only=True)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_synth_contract_matches_oracle_formulas(spark):
    """Pin the synth_warc_segments closed forms the warc_ingest oracle
    relies on, over a tiny hand-made documents frame that exercises every
    modulus branch (7, 13, 5, 2, gzip-odd-segment)."""
    from frontier.synth import synth_warc_segments

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 6) for i in range(0, 30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    recs = warc_records(synth_warc_segments(docs), responses_only=True).collect()
    assert len(recs) == 30
    by_url = {r.url: r for r in recs}
    for i in range(30):
        r = by_url[f"http://host{i % 50}.example.com/doc/{i}"]
        assert r.http_status == (404 if i % 13 == 0 else 200)
        assert r.content_type == ("text/plain" if i % 5 == 0 else "text/html")
        expect = (
            (b"WARC/1.0\r\n\r\n" if i % 7 == 0 else b"")
            + f"<html><body>text {i}</body></html>".encode()
        )
        assert bytes(r.html) == expect
        assert r.warc_ts == datetime(2025, 1, 1, 0, i // 60, i % 60)
        # validator + robots-policy headers captured at ingest
        import hashlib

        if i % 3 != 0:
            assert r.etag == '"' + hashlib.md5(f"text {i}".encode()).hexdigest() + '"'
        else:
            assert r.etag is None
        assert r.last_modified == r.warc_ts  # synth stamps them equal
        assert r.x_robots == ("noindex" if i % 11 == 0 else None)


def test_warc_revisit_dedup_semantics(spark):
    """Revisit classification: every duplicate-payload capture becomes a
    `revisit` pointing at the FIRST capture of that digest; mirrors whose
    banner membership changed under the id shift are genuinely different
    payloads and must stay `response`."""
    import __spark_entry__ as e

    rows = e.queries()["warc_dedup_digest"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_url = {r.url: r for r in rows}
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert len(rows) == n_docs + len(
        [i for i in range(n_docs) if i % 6 == 0]
    )
    for i in range(0, n_docs, 6):
        m = by_url[f"http://host{(i + 100000) % 50}.example.com/doc/{i + 100000}"]
        orig = by_url[f"http://host{i % 50}.example.com/doc/{i}"]
        assert orig.record_type == "response"
        if i % 7 in (0, 2):
            # banner flag flips under +100000 (== +5 mod 7): not a dup
            assert m.record_type == "response"
            assert m.refers_to_url is None and m.saved_bytes == 0
        else:
            assert m.record_type == "revisit"
            assert m.refers_to_url == orig.url
            assert m.refers_to_ts == orig.capture_ts
            assert m.body_md5 == orig.body_md5
            assert m.saved_bytes > 0
    # originals are all first captures: no original is ever a revisit
    assert all(
        by_url[f"http://host{i % 50}.example.com/doc/{i}"].record_type
        == "response"
        for i in range(n_docs)
    )
