"""Arrow-batched parse stage: one ``mapInPandas`` pass per crawl wave.

Input: pending frontier rows left-joined with the fetch store
(``status``/``final_url``/``content_type``/``body`` are null for unmatched
URLs → the 404 fallback of the reference test harness,
tests/tree/base.py:31-39). Output: the flat union PARSE_OUT_SCHEMA —
``node`` rows (one per consumed pending row), ``page`` rows (exploded
records), ``child`` rows (ready-made pending rows for the next wave with
depth-limit / ancestor-cycle pre-checks already applied).

All per-row work happens here, batched over Arrow; everything around it is
declarative DataFrame plumbing (SURVEY.md §2.6 "UDF surface").
"""

from __future__ import annotations

import datetime as _dt
from http import HTTPStatus
from typing import Any, Iterable, Iterator

import pandas as pd

from . import parse as K
from .schemas import extend_path_key
from .textnorm import decode_sitemap_body

_OUT_COLUMNS = [
    "rec",
    "seed",
    "url",
    "requested_url",
    "parent_url",
    "seq",
    "level",
    "lineage",
    "path_key",
    "parent_urls",
    "kind",
    "reason",
    "quiet_404",
    "child_url",
    "blocked_reason",
    "page",
]

_FLUSH_ROWS = 20_000


def _as_list(value) -> list:
    """Arrow hands array columns to pandas as numpy arrays (or None)."""
    if value is None:
        return []
    if isinstance(value, list):
        return value
    try:
        return list(value)
    except TypeError:
        return []


def _as_opt_int(value):
    if value is None or (isinstance(value, float) and pd.isna(value)):
        return None
    return int(value)


def status_message(status: int | None) -> str:
    """HTTP error text as the requests client would report it
    (usp/web_client/requests_client.py:151-176): "<code> <phrase>"."""
    if status is None:
        status = 404
    try:
        phrase = HTTPStatus(status).phrase
    except ValueError:
        phrase = "Unknown"
    return f"{status} {phrase}"


def _utc_and_offset(value: _dt.datetime | None):
    """Split an (optionally tz-aware) datetime into a UTC-naive instant plus
    the source offset in seconds (None for naive input) — see schemas.py."""
    if value is None:
        return None, None
    if value.tzinfo is None:
        return value, None
    offset = value.utcoffset()
    return (
        value.astimezone(_dt.timezone.utc).replace(tzinfo=None),
        int(offset.total_seconds()) if offset is not None else None,
    )


def _news_struct(story: dict[str, Any] | None):
    if story is None:
        return None
    publish, offset = _utc_and_offset(story.get("publish_date"))
    return {
        "title": story.get("title"),
        "publish_date": publish,
        "publish_date_offset_seconds": offset,
        "publication_name": story.get("publication_name"),
        "publication_language": story.get("publication_language"),
        "access": story.get("access"),
        "genres": story.get("genres") or [],
        "keywords": story.get("keywords") or [],
        "stock_tickers": story.get("stock_tickers") or [],
    }


def page_struct(record: dict[str, Any]) -> dict[str, Any]:
    """Kernel page record → PAGE_STRUCT dict."""
    lastmod, offset = _utc_and_offset(record.get("last_modified"))
    return {
        "url": record["url"],
        "priority": record.get("priority", K.DEFAULT_PRIORITY),
        "last_modified": lastmod,
        "last_modified_offset_seconds": offset,
        "change_frequency": record.get("change_frequency"),
        "news_story": _news_struct(record.get("news_story")),
        "images": record.get("images"),
        "alternates": record.get("alternates"),
    }


def depth_exceeded_reason(child_url: str) -> str:
    """fetch_parse.py:109-112 wrapped by :754-758."""
    return (
        f"Unable to add sub-sitemap from URL {child_url}: "
        f"Recursion level exceeded {K.MAX_RECURSION_LEVEL} for URL {child_url}."
    )


def ancestor_cycle_reason(child_url: str, parent_urls: Iterable[str]) -> str:
    """fetch_parse.py:119-125 wrapped by :754-758 (set repr, as the reference
    formats its ``parent_urls`` set)."""
    return (
        f"Unable to add sub-sitemap from URL {child_url}: "
        f"Recursion detected in URL {child_url} with parent URLs {set(parent_urls)}."
    )


def redirect_cycle_reason(url: str, final_url: str, parent_urls: Iterable[str]) -> str:
    """fetch_parse.py:164-173."""
    return (
        f"Recursion detected when {url} redirected to {final_url} "
        f"with parent URLs {set(parent_urls)}."
    )


def unfetchable_reason(url: str, message: str) -> str:
    """fetch_parse.py:157-161."""
    return f"Unable to fetch sitemap from {url}: {message}"


def process_pending_row(row: dict[str, Any]) -> Iterator[dict[str, Any]]:
    """Consume one pending row (+ its fetch result) → node/page/child dicts."""
    lineage = _as_list(row["lineage"])
    parent_urls = _as_list(row["parent_urls"])
    base = {
        "seed": row["seed"],
        "requested_url": row["url"],
        "parent_url": row["parent_url"],
        "seq": _as_opt_int(row["seq"]),
        "level": _as_opt_int(row["level"]),
        "lineage": lineage,
        "path_key": row["path_key"],
        "parent_urls": parent_urls,
        "quiet_404": bool(row["quiet_404"]),
        "child_url": None,
        "blocked_reason": None,
        "page": None,
        "kind": None,
        "reason": None,
    }

    def node(url: str, kind: str, reason: str | None):
        return {**base, "rec": "node", "url": url, "kind": kind, "reason": reason}

    # pre-blocked children (depth limit / ancestor cycle) surface as
    # InvalidSitemap nodes without any fetch (fetch_parse.py:754-758)
    if row.get("blocked_reason"):
        yield node(row["url"], K.KIND_INVALID, row["blocked_reason"])
        return

    status = _as_opt_int(row.get("status"))
    if status is None or not (200 <= status < 300):
        yield node(
            row["url"], K.KIND_INVALID, unfetchable_reason(row["url"], status_message(status))
        )
        return

    final_url = row.get("final_url")
    if final_url is None or (isinstance(final_url, float) and pd.isna(final_url)):
        final_url = row["url"]
    if final_url in parent_urls:
        yield node(
            row["url"],
            K.KIND_INVALID,
            redirect_cycle_reason(row["url"], final_url, parent_urls),
        )
        return

    body = row.get("body")
    if body is None or isinstance(body, float):
        body = b""
    text = decode_sitemap_body(
        final_url, row.get("content_type"), bytes(body), K.MAX_SITEMAP_BYTES
    )
    doc = K.parse_sitemap_text(final_url, text)

    yield node(final_url, doc.kind, doc.reason)

    for i, record in enumerate(doc.pages):
        yield {
            **base,
            "rec": "page",
            "url": final_url,
            "seq": i,
            "page": page_struct(record),
        }

    child_level = base["level"] + 1
    child_parents = parent_urls + [final_url]
    for i, child_url in enumerate(doc.children):
        blocked = None
        if child_level > K.MAX_RECURSION_LEVEL:
            blocked = depth_exceeded_reason(child_url)
        elif child_url in child_parents:
            blocked = ancestor_cycle_reason(child_url, child_parents)
        yield {
            **base,
            "rec": "child",
            "url": final_url,
            "child_url": child_url,
            "seq": i,
            "level": child_level,
            "lineage": lineage + [i],
            "path_key": extend_path_key(row["path_key"], i),
            "parent_urls": child_parents,
            "blocked_reason": blocked,
        }


def parse_wave(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over (pending ⟕ fetches) rows."""
    out: list[dict[str, Any]] = []
    for batch in batches:
        for row in batch.to_dict("records"):
            out.extend(process_pending_row(row))
            if len(out) >= _FLUSH_ROWS:
                yield pd.DataFrame(out, columns=_OUT_COLUMNS)
                out = []
    if out:
        yield pd.DataFrame(out, columns=_OUT_COLUMNS)
