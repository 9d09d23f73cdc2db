"""S2/S3 — retry-on-retryable policy and error-as-data conversion.

Two forms of the same semantics (usp/helpers.py:151-195):

- :func:`fetch_with_retry` — the imperative per-URL loop, for a live
  fetcher inside a fetch UDF.
- :func:`resolve_attempts` — the engine integration: an offline fetch store
  may carry an ``attempt`` column (one row per fetch attempt, the way a
  real crawl log records every try). The declarative resolution picks, per
  URL, exactly the row the reference's retry loop would have returned:
  the FIRST non-retryable attempt within the retry budget, else the LAST
  budgeted attempt. ``prepare_fetches`` applies it automatically when the
  column is present, so the wave engine crawls the effective store.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from http import HTTPStatus
from typing import Callable

from pyspark.sql import DataFrame, functions as F

#: Statuses worth retrying (usp/web_client/abstract_client.py:8-47):
#: transient server/network conditions, rate limiting, and 400 (some servers
#: return it transiently per the reference's comment).
RETRYABLE_STATUSES = frozenset(
    {400, 408, 429, 500, 502, 503, 504, 499, 509, 520, 521, 522, 523, 524,
     525, 526, 527, 530, 598}
)

DEFAULT_RETRY_COUNT = 5  # usp/helpers.py:154
DEFAULT_SLEEP_S = 1.0  # usp/helpers.py:155


@dataclass
class FetchResult:
    """Error-as-data fetch outcome (S3): never raises, mirrors
    WebClientErrorResponse / success (abstract_client.py:113-148)."""

    url: str
    status: int | None
    body: bytes | None = None
    content_type: str | None = None
    final_url: str | None = None

    @property
    def ok(self) -> bool:
        return self.status is not None and 200 <= self.status < 300

    @property
    def retryable(self) -> bool:
        return self.status in RETRYABLE_STATUSES

    def message(self) -> str:
        if self.status is None:
            return "no response"
        try:
            phrase = HTTPStatus(self.status).phrase
        except ValueError:
            phrase = "Unknown"
        return f"{self.status} {phrase}"


def fetch_with_retry(
    url: str,
    fetch_once: Callable[[str], FetchResult],
    retry_count: int = DEFAULT_RETRY_COUNT,
    sleep_between_retries: float = DEFAULT_SLEEP_S,
    sleep: Callable[[float], None] = time.sleep,
) -> FetchResult:
    """Retry loop semantics of usp/helpers.py:151-195: up to ``retry_count``
    attempts, sleeping between them, retrying ONLY on retryable errors;
    non-retryable errors return immediately; the last response wins."""
    assert retry_count > 0
    result: FetchResult | None = None
    for _ in range(retry_count):
        result = fetch_once(url)
        if result.ok or not result.retryable:
            return result
        sleep(sleep_between_retries)
    return result


def resolve_attempts(
    fetches: DataFrame, retry_count: int = DEFAULT_RETRY_COUNT
) -> DataFrame:
    """Collapse an attempt-coded store to the row the retry loop returns.

    Input columns: the usual store columns plus ``attempt`` (1-based try
    number). Per URL: attempts beyond ``retry_count`` are never made; the
    first attempt whose status is NOT retryable (success, redirect, or a
    permanent error — exactly the complement of the
    ``abstract_client.py:8-47`` whitelist) short-circuits the loop; if every
    budgeted attempt is retryable, the last one's response is returned
    (helpers.py:151-195 "the last response wins").

    One aggregation on url (map-side combinable; only (url, attempt, status)
    enter the shuffle — bodies stay put until the final semi-join, which AQE
    broadcasts at fixture/bench sizes; at 10^10-URL scale both sides live
    url-bucketed in the store, making the semi-join co-located). The
    ``attempt`` column is dropped — downstream engine stages are unchanged.
    """
    statuses = F.lit(sorted(RETRYABLE_STATUSES))
    budgeted = fetches.filter(F.col("attempt") <= retry_count)
    # a NULL status ("no response") is terminal: FetchResult.retryable is
    # False for status=None, so the imperative loop returns immediately —
    # without the isNull branch, ~array_contains(NULL) is NULL and the row
    # silently falls through to last_budgeted instead
    terminal = F.col("status").isNull() | ~F.array_contains(
        statuses, F.col("status")
    )
    picks = budgeted.groupBy("url").agg(
        F.min(F.when(terminal, F.col("attempt"))).alias("first_terminal"),
        F.max("attempt").alias("last_budgeted"),
    ).select(
        "url",
        F.coalesce("first_terminal", "last_budgeted").alias("attempt"),
    )
    return budgeted.join(picks, ["url", "attempt"], "semi").drop("attempt")
