"""URL canonicalization column expressions: documented contract cases +
plan shape (codegen-only, no UDF/shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier.urlnorm import canonical_url

CASES = [
    # scheme/host case-folding, path case preserved
    ("HTTP://WWW.Example.COM/Path/File.HTML", "http://www.example.com/Path/File.HTML"),
    # default ports stripped, non-default kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),  # not https default
    # empty path -> /
    ("http://example.com", "http://example.com/"),
    ("http://example.com?a=1", "http://example.com/?a=1"),
    # fragment dropped
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2#frag", "http://example.com/a?b=2"),
    # tracking params dropped, remainder sorted, empty query -> no '?'
    ("http://example.com/a?utm_source=x&b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?gclid=123", "http://example.com/a"),
    ("http://example.com/a?fbclid=1&msclkid=2&utm_campaign=c", "http://example.com/a"),
    ("http://example.com/a?z=1&y=2&x=3", "http://example.com/a?x=3&y=2&z=1"),
    # params that merely CONTAIN tracking names are kept
    ("http://example.com/a?xutm_source=1", "http://example.com/a?xutm_source=1"),
    ("http://example.com/a?utm_sourcey=1", "http://example.com/a"),  # utm_* prefix
    # duplicate-slash / percent-encoding / index.html are NOT touched
    ("http://example.com//a//b", "http://example.com//a//b"),
    ("http://example.com/a%2Fb", "http://example.com/a%2Fb"),
    ("http://example.com/index.html", "http://example.com/index.html"),
]


def test_canonical_url_contract(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["c"] for r in df.select(canonical_url("url").alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = df.select(canonical_url("url").alias("url"))
    twice = once.select(canonical_url("url").alias("url"))
    assert [r["url"] for r in once.collect()] == [
        r["url"] for r in twice.collect()
    ]


def test_canonical_url_plan_is_pure_projection(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        df.select(canonical_url("url").alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


REVIEW_CASES = [
    # review-caught: '?' inside the fragment is not a query
    ("http://example.com/p#sec?x=1", "http://example.com/p"),
    ("http://example.com/p?a=1#sec?x=9", "http://example.com/p?a=1"),
    # review-caught: unparseable URLs pass through unchanged (no ':///'
    # collapse that would merge distinct rows in canonical-keyed dedup)
    ("example.com/page1", "example.com/page1"),
    ("example.com/page2", "example.com/page2"),
    ("not a url", "not a url"),
    ("http://", "http://"),
]


def test_canonical_url_review_regressions(spark):
    df = spark.createDataFrame([(u,) for u, _ in REVIEW_CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in REVIEW_CASES]
