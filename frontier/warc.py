"""WARC (ISO 28500 / WARC 1.0) segment ingest — the Common-Crawl container
format — into the north-rule page-table shape ``(url, warc_ts, html, ...)``.

A crawl corpus arrives as segments: each segment is one ``.warc`` /
``.warc.gz`` file holding a ``warcinfo`` record followed by
request/response record pairs.  Records are framed by ``Content-Length``
(NOT by scanning for the next ``WARC/1.0`` banner — response bodies may
legitimately contain that byte string), and ``.warc.gz`` segments are
concatenations of per-record gzip members.

Spark shape: :func:`warc_records` is a shuffle-free Arrow-batched
``mapInPandas`` kernel over the segment blobs — the classic CC ingest plan
(one task per segment, no exchange until the caller aggregates record
rows, which never carry the segment payload).  Parsing is error-isolated:
a malformed tail truncates that segment's record stream instead of
failing the task, mirroring the engine's parse-error contract
(usp's parser never raises on bad payloads — see
/root/reference/usp/fetch_parse.py error handling; same policy here).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone as _tz
from email.utils import parsedate_to_datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the ``.warc.gz``
    layout: one member per record) into the plain byte stream.  Returns
    the input unchanged when it is not gzip.  A corrupt member truncates
    the stream at the last good byte (error isolation)."""
    if len(payload) < 2 or payload[:2] != b"\x1f\x8b":
        return payload
    out = []
    buf = payload
    while buf[:2] == b"\x1f\x8b":
        obj = zlib.decompressobj(wbits=31)
        try:
            out.append(obj.decompress(buf))
        except zlib.error:
            break
        if not obj.eof:
            break  # truncated member: keep what decoded, drop the tail
        buf = obj.unused_data
    return b"".join(out)


def _parse_header_block(block: bytes) -> dict[str, str]:
    """WARC/HTTP header lines → lowercase-keyed dict.  Continuation lines
    (leading SP/TAB, per the grammar) append to the previous value."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(_CRLF):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + raw.strip().decode("latin-1")
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            continue
        last = name.strip().lower().decode("latin-1")
        headers[last] = value.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk a plain WARC byte stream by ``Content-Length`` framing,
    yielding ``(warc_headers, block_bytes)`` per record.  Stops (never
    raises) at the first malformed record boundary."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding newlines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if data[pos : pos + 5] != b"WARC/":
            return  # lost framing: stop rather than guess
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            return
        headers = _parse_header_block(data[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + len(_HDR_END)
        if clen < 0 or body_start + clen > n:
            # truncated final record: drop it (error isolation)
            return
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def parse_http_response(block: bytes):
    """HTTP response block → ``(status, media_type, body_bytes, headers)``.
    ``media_type`` is the ``Content-Type`` main type, lowercased, with
    parameters (``; charset=...``) stripped; ``headers`` is the full
    lowercase-keyed header dict (callers pick out validators like ETag /
    Last-Modified and policy like X-Robots-Tag).  Returns
    ``(None, None, block, {})`` when the block is not an HTTP response."""
    head, sep, body = block.partition(_HDR_END)
    if not sep or not head.startswith(b"HTTP/"):
        return None, None, block, {}
    status_line, _, hdr_rest = head.partition(_CRLF)
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block, {}
    headers = _parse_header_block(hdr_rest)
    ctype = headers.get("content-type")
    if ctype is not None:
        ctype = ctype.split(";", 1)[0].strip().lower() or None
    return status, ctype, body, headers


def parse_http_date(value: str | None):
    """RFC 9110 HTTP-date (``Sun, 09 Mar 2025 14:05:06 GMT``) → UTC-naive
    datetime, or None when absent/malformed."""
    if not value:
        return None
    try:
        parsed = parsedate_to_datetime(value)
    except (TypeError, ValueError):
        return None
    if parsed.tzinfo is not None:
        parsed = parsed.astimezone(_tz.utc).replace(tzinfo=None)
    return parsed


def parse_warc_date(value: str | None):
    """``WARC-Date`` (``2025-01-01T00:00:05Z``) → UTC-naive datetime, or
    None when absent/malformed — the engine's UTC-naive instant
    convention (schemas.py)."""
    if not value:
        return None
    try:
        return datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType()),
        T.StructField("rec_seq", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("etag", T.StringType()),
        T.StructField("last_modified", T.TimestampType()),
        T.StructField("x_robots", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def warc_records(
    segments: DataFrame,
    payload_col: str = "payload",
    id_col: str = "segment_id",
    responses_only: bool = False,
) -> DataFrame:
    """``(segment_id, payload binary)`` segments → one row per WARC record.

    Response records carry ``(url, warc_ts, http_status, content_type,
    html)``; other record types (warcinfo, request, metadata, ...) keep
    their ``warc_type`` with NULL payload fields so callers can audit the
    record mix.  Shuffle-free ``mapInPandas``; gzip segments are detected
    per row, so mixed plain/compressed corpora work."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: dict[str, list] = {f.name: [] for f in WARC_RECORDS_SCHEMA}
            for seg_id, payload in zip(batch[id_col], batch[payload_col]):
                if payload is None:
                    continue
                data = gunzip_members(bytes(payload))
                for seq, (headers, block) in enumerate(iter_warc_records(data)):
                    wtype = headers.get("warc-type", "unknown").lower()
                    etag = last_mod = x_robots = None
                    if wtype == "response":
                        status, ctype, body, http = parse_http_response(block)
                        url = headers.get("warc-target-uri")
                        html = body
                        etag = http.get("etag")
                        last_mod = parse_http_date(http.get("last-modified"))
                        x_robots = http.get("x-robots-tag")
                    else:
                        if responses_only:
                            continue
                        status = ctype = url = html = None
                    rows["segment_id"].append(int(seg_id))
                    rows["rec_seq"].append(seq)
                    rows["warc_type"].append(wtype)
                    rows["url"].append(url)
                    rows["warc_ts"].append(
                        parse_warc_date(headers.get("warc-date"))
                    )
                    rows["http_status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["etag"].append(etag)
                    rows["last_modified"].append(last_mod)
                    rows["x_robots"].append(x_robots)
                    rows["html"].append(html)
            out = pd.DataFrame(rows)
            out["rec_seq"] = out["rec_seq"].astype("int32")
            out["http_status"] = out["http_status"].astype("Int32")
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            out["last_modified"] = pd.to_datetime(out["last_modified"])
            yield out

    df = segments.select(id_col, payload_col).mapInPandas(
        run, WARC_RECORDS_SCHEMA
    )
    return df.filter("warc_type = 'response'") if responses_only else df


# --- record/segment BUILDING (synth + sink side) -------------------------------


def build_warc_record(
    warc_type: str,
    block: bytes,
    *,
    url: str | None = None,
    date: str | None = None,
    extra: dict[str, str] | None = None,
) -> bytes:
    """Assemble one spec-correct WARC 1.0 record (header block +
    Content-Length-framed body + CRLF CRLF trailer)."""
    lines = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    if url is not None:
        lines.append(b"WARC-Target-URI: " + url.encode())
    if date is not None:
        lines.append(b"WARC-Date: " + date.encode())
    for k, v in (extra or {}).items():
        lines.append(f"{k}: {v}".encode())
    lines.append(b"Content-Length: " + str(len(block)).encode())
    return _CRLF.join(lines) + _HDR_END + block + _HDR_END


def build_http_response(
    status: int,
    reason: str,
    content_type: str,
    body: bytes,
    extra: dict[str, str] | None = None,
) -> bytes:
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode()
    for k, v in (extra or {}).items():
        head += f"{k}: {v}\r\n".encode()
    return head + _CRLF + body
