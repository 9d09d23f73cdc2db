"""Scalar normalization primitives shared by the parse kernel.

Each function reproduces the observable behavior of a reference helper
(cited per-function into /root/reference) without copying its structure.
These are plain-Python so they can be unit-tested without a JVM and called
row-batch-wise from inside Arrow UDFs.
"""

from __future__ import annotations

import datetime as _dt
import functools as _functools
import gzip as _gzip
import html as _html
import io as _io
import re as _re
from urllib.parse import unquote_plus, urlparse, urlunparse

from dateutil.parser import parse as _dateutil_parse

#: Matches http(s) URLs; semantics of usp/helpers.py:29.
_HTTP_URL_RE = _re.compile(r"^https?://[^\s/$.?#].[^\s]*$", _re.IGNORECASE)


class GunzipError(Exception):
    """Raised when a payload cannot be gunzipped (usp/exceptions.py GunzipException)."""


class HomepageStripError(Exception):
    """Raised when a URL cannot be reduced to its homepage (StripURLToHomepageException)."""


def is_http_url(url: str | None) -> bool:
    """True iff ``url`` is a fetchable http(s) URL.

    Behavior of usp/helpers.py:47-86: regex gate, then urlparse round-trip,
    scheme in {http, https}, hostname present.
    """
    if not url:
        return False
    if not _HTTP_URL_RE.search(url):
        return False
    try:
        parts = urlparse(url)
        urlunparse(parts)
        hostname = parts.hostname
    except Exception:
        return False
    if not parts.scheme or parts.scheme.lower() not in ("http", "https"):
        return False
    return bool(hostname)


def html_unescape_strip(value: str | None) -> str | None:
    """Entity-decode + strip; empty/whitespace-only collapses to None.

    Behavior of usp/helpers.py:89-101 (note: falsy input passes through
    unchanged, so ``""`` returns ``""`` — preserved for parity).
    """
    if value:
        value = _html.unescape(value).strip()
        if not value:
            return None
    return value


@_functools.lru_cache(maxsize=65536)
def parse_iso8601_date(date_string: str) -> _dt.datetime | None:
    """ISO-8601 → datetime; graceful fallback to the general dateutil parser.

    Behavior of usp/helpers.py:104-129 on Python >= 3.11: ``fromisoformat``
    first, then ``dateutil.parser.parse``, unparseable → None. The source
    UTC offset is preserved in ``tzinfo`` (naive stays naive).

    Cached: sitemap lastmod stamps repeat heavily within a crawl (sites emit
    one generation timestamp across many pages); the returned datetime is
    immutable, so sharing is safe. Raises on empty input BEFORE caching
    matters (falsy guard below).
    """
    if not date_string:
        raise ValueError("empty date string")
    try:
        return _dt.datetime.fromisoformat(date_string)
    except ValueError:
        pass
    try:
        return _dateutil_parse(date_string)
    except ValueError:
        return None


def parse_rfc2822_date(date_string: str) -> _dt.datetime | None:
    """RFC-2822 (RSS ``pubDate``) → datetime; usp/helpers.py:132-145."""
    if not date_string:
        raise ValueError("empty date string")
    try:
        return _dateutil_parse(date_string)
    except ValueError:
        return None


def looks_gzipped(url: str, content_type: str | None) -> bool:
    """Gzip sniff: URL path ends with ``.gz`` (percent-decoded, case-insensitive)
    or content-type mentions gzip. Behavior of usp/helpers.py:198-216."""
    try:
        path = unquote_plus(urlparse(url).path)
    except Exception:
        path = ""
    ct = (content_type or "").lower()
    return path.lower().endswith(".gz") or "gzip" in ct


def gunzip(data: bytes, max_output_bytes: int | None = None) -> bytes:
    """Chunked gunzip with an output-size cap. Behavior of usp/helpers.py:219-259."""
    if data is None:
        raise GunzipError("no data")
    if not isinstance(data, (bytes, bytearray)):
        raise GunzipError(f"not bytes: {data!r}")
    if len(data) == 0:
        raise GunzipError("empty payload cannot be a gzip archive")
    out: list[bytes] = []
    size = 0
    try:
        with _gzip.GzipFile(fileobj=_io.BytesIO(data)) as stream:
            while chunk := stream.read(1 << 20):
                size += len(chunk)
                if max_output_bytes is not None and size > max_output_bytes:
                    raise GunzipError(
                        f"gunzipped payload exceeds cap of {max_output_bytes} bytes"
                    )
                out.append(chunk)
    except Exception as exc:
        raise GunzipError(f"unable to gunzip: {exc}")
    return b"".join(out)


def decode_sitemap_body(
    url: str,
    content_type: str | None,
    body: bytes,
    max_uncompressed_bytes: int | None = None,
) -> str:
    """Gunzip-if-sniffed then decode utf-8-sig/replace.

    Behavior of usp/helpers.py:262-291 including the fallback: a body that
    sniffs gzipped but fails to gunzip is treated as raw (mislabelled ``.gz``).
    """
    if looks_gzipped(url, content_type):
        try:
            body = gunzip(body, max_output_bytes=max_uncompressed_bytes)
        except GunzipError:
            pass  # assume a non-gzipped sitemap with a .gz name
    return body.decode("utf-8-sig", errors="replace")


def strip_url_to_homepage(url: str) -> str:
    """Reduce a URL to ``scheme://netloc/``. Behavior of usp/helpers.py:294-325."""
    if not url:
        raise HomepageStripError("URL is empty.")
    try:
        parts = urlparse(url)
        if not parts.scheme or parts.scheme.lower() not in ("http", "https"):
            raise ValueError("scheme must be http(s)")
        return urlunparse((parts.scheme, parts.netloc, "/", "", "", ""))
    except Exception as exc:
        raise HomepageStripError(f"Unable to parse URL {url}: {exc}")


def canonical_host(url: str) -> str | None:
    """Lower-cased hostname of a URL (politeness partition key; north rule)."""
    try:
        return urlparse(url).hostname
    except Exception:
        return None
