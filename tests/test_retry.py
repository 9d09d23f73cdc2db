"""S2 retry policy unit tests (reference usp/helpers.py:151-195 behavior,
tests/test_helpers.py retry section)."""

from frontier.retry import RETRYABLE_STATUSES, FetchResult, fetch_with_retry


def make_fetcher(script):
    """Return fetch_once yielding scripted statuses, counting calls."""
    calls = []

    def fetch_once(url):
        status = script[min(len(calls), len(script) - 1)]
        calls.append(status)
        return FetchResult(url=url, status=status, body=b"x")

    return fetch_once, calls


def test_success_first_try():
    fetch, calls = make_fetcher([200])
    res = fetch_with_retry("http://x/", fetch, sleep=lambda s: None)
    assert res.ok and len(calls) == 1


def test_non_retryable_returns_immediately():
    fetch, calls = make_fetcher([404])
    res = fetch_with_retry("http://x/", fetch, sleep=lambda s: None)
    assert not res.ok and res.message() == "404 Not Found"
    assert len(calls) == 1


def test_retryable_then_success():
    fetch, calls = make_fetcher([503, 503, 200])
    res = fetch_with_retry("http://x/", fetch, sleep=lambda s: None)
    assert res.ok and len(calls) == 3


def test_gives_up_after_retry_count():
    fetch, calls = make_fetcher([429])
    res = fetch_with_retry("http://x/", fetch, retry_count=5, sleep=lambda s: None)
    assert not res.ok and len(calls) == 5
    assert res.message() == "429 Too Many Requests"


def test_retryable_status_set():
    # reference whitelist (abstract_client.py:8-47)
    for s in (400, 408, 429, 500, 502, 503, 504, 520, 530, 598):
        assert s in RETRYABLE_STATUSES
    for s in (401, 403, 404, 410, 200, 301):
        assert s not in RETRYABLE_STATUSES
