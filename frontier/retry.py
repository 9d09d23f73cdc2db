"""S2/S3 — retry-on-retryable policy and error-as-data conversion.

In the sandbox the fetch store is deterministic, so the retry loop is a pure
policy function validated by unit tests; in a live deployment it wraps the
per-host fetch stage inside the fetch UDF.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from http import HTTPStatus
from typing import Callable

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
