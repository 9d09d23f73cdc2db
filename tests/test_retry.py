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


# --- engine integration: resolve_attempts + attempt-coded crawl ---------------


def _attempts_df(spark, rows):
    """rows: (url, attempt, status, body-str)."""
    import pandas as pd

    df = pd.DataFrame(rows, columns=["url", "attempt", "status", "body_s"])
    sdf = spark.createDataFrame(df)
    from pyspark.sql import functions as F

    return sdf.select(
        "url",
        F.col("attempt").cast("int"),
        F.col("status").cast("int"),
        F.col("url").alias("final_url"),
        F.lit("application/xml").alias("content_type"),
        F.encode("body_s", "utf-8").alias("body"),
    )


def test_resolve_attempts_semantics(spark):
    """Declarative resolution == fetch_with_retry row-for-row:
    first-success wins, permanent error short-circuits, all-retryable
    exhausts to the LAST budgeted attempt, attempts past the budget are
    never taken."""
    from frontier.retry import resolve_attempts

    rows = [
        # success on 3rd try after two retryables
        ("http://a/", 1, 503, "a1"), ("http://a/", 2, 429, "a2"),
        ("http://a/", 3, 200, "a3"), ("http://a/", 4, 200, "a4"),
        # permanent 404 on attempt 1 short-circuits despite later 200
        ("http://b/", 1, 404, "b1"), ("http://b/", 2, 200, "b2"),
        # all retryable: last budgeted (5th) wins; 6th never attempted
        ("http://c/", 1, 500, "c1"), ("http://c/", 2, 502, "c2"),
        ("http://c/", 3, 503, "c3"), ("http://c/", 4, 520, "c4"),
        ("http://c/", 5, 429, "c5"), ("http://c/", 6, 200, "c6"),
        # 400 is retryable per the reference whitelist; 301 is terminal
        ("http://d/", 1, 400, "d1"), ("http://d/", 2, 301, "d2"),
    ]
    out = {
        r.url: (r.status, bytes(r.body).decode())
        for r in resolve_attempts(_attempts_df(spark, rows)).collect()
    }
    assert out == {
        "http://a/": (200, "a3"),
        "http://b/": (404, "b1"),
        "http://c/": (429, "c5"),
        "http://d/": (301, "d2"),
    }


def test_crawl_over_attempt_coded_store(spark):
    """End-to-end S2: prepare_fetches detects the attempt column and the
    wave engine crawls the effective store — a robots.txt that succeeds on
    retry 3 and a sitemap whose budget exhausts on retryables surfaces as
    the invalid node the retry loop's LAST response produces."""
    from frontier.waves import sitemap_tree_for_homepages

    base = "http://retryhost.example.com/"
    robots_ok = "User-agent: *\nSitemap: " + base + "sm.xml\n"
    sm = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<url><loc>{base}p1.html</loc></url></urlset>"
    )
    rows = [
        (base + "robots.txt", 1, 503, ""),
        (base + "robots.txt", 2, 429, ""),
        (base + "robots.txt", 3, 200, robots_ok),
        (base + "sm.xml", 1, 500, ""),
        (base + "sm.xml", 2, 502, ""),
        (base + "sm.xml", 3, 503, ""),
        (base + "sm.xml", 4, 504, ""),
        (base + "sm.xml", 5, 520, ""),
        (base + "sm.xml", 6, 200, sm),  # out of budget — never reached
    ]
    forest = sitemap_tree_for_homepages(
        spark, [base], _attempts_df(spark, rows), use_known_paths=False
    )
    nodes = {n.url: n for n in forest.nodes.collect()}
    assert nodes[base + "robots.txt"].kind == "robots"
    sm_node = nodes[base + "sm.xml"]
    assert sm_node.kind == "invalid"
    assert "520" in sm_node.reason
    assert forest.pages.isEmpty()


def test_resolve_attempts_null_status_is_terminal(spark):
    """A NULL status ("no response") must short-circuit like the imperative
    loop (FetchResult.retryable is False for None) — ADVICE r2."""
    from frontier.retry import resolve_attempts

    rows = [
        # attempt 1: retryable 503; attempt 2: null status (terminal);
        # attempt 3: would win only if null were wrongly treated retryable
        ("http://h/x", 1, 503, b"a"),
        ("http://h/x", 2, None, b"b"),
        ("http://h/x", 3, 200, b"c"),
    ]
    df = spark.createDataFrame(
        rows, "url string, attempt int, status int, body binary"
    )
    got = resolve_attempts(df).collect()
    assert len(got) == 1
    assert got[0].status is None and bytes(got[0].body) == b"b"
