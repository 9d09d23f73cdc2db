"""Streaming ↔ engine integrations: RFC 9309 rules on a live fetch stream
(stream-static join), and the stream-first-seen → batch seen-set → next
crawl round handoff the north rule's compaction loop describes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from frontier.dedup import UrlSeenSet
from frontier.robots import parse_robots_rules, robots_filter
from frontier.streaming import (
    STREAM_FETCH_SCHEMA,
    read_fetch_stream,
    run_available_now,
    stream_first_seen,
)
from frontier.synth import synth_crawl_corpus
from frontier.waves import sitemap_tree_for_homepages


def _land(spark, path, rows):
    spark.createDataFrame(rows, STREAM_FETCH_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_robots_filter_on_stream(spark, tmp_path):
    """The rules snapshot is a static DataFrame; filtering a fetch stream
    through it is a stateless stream-static join + codegen projection —
    disallowed URLs never reach the parser."""
    rules = parse_robots_rules(
        spark.createDataFrame(
            [Row(host="h1.example.com",
                 body="User-agent: *\nDisallow: /private/\n")]
        )
    )
    landing = str(tmp_path / "landing")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/private/s.xml", None, 200,
             "application/xml", b"<urlset/>", t0),
            ("http://h1.example.com/public/s.xml", None, 200,
             "application/xml", b"<urlset/>", t0),
            ("http://h2.example.com/private/s.xml", None, 200,
             "application/xml", b"<urlset/>", t0),
        ],
    )
    allowed = robots_filter(read_fetch_stream(spark, landing), rules)
    assert allowed.isStreaming
    run_available_now(allowed, str(tmp_path / "ck"), "allowed_fetches")
    urls = {r.url for r in spark.sql("SELECT url FROM allowed_fetches").collect()}
    assert urls == {
        "http://h1.example.com/public/s.xml",
        "http://h2.example.com/private/s.xml",  # no rules row → allowed
    }


def test_stream_first_seen_feeds_batch_crawl(spark, tmp_path):
    """North-rule compaction loop: first occurrences surfaced by the
    streaming dedup are recorded into the batch UrlSeenSet; the next batch
    crawl round then skips exactly those sitemap URLs."""
    landing = str(tmp_path / "landing")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    # the stream observed host0's index + leaf_0 (e.g. another crawler's
    # fetches flowing through the landing zone), some of them twice
    seen_urls = [
        "http://host0.example.com/sitemap_index.xml",
        "http://host0.example.com/leaf_0.xml",
    ]
    _land(
        spark,
        landing,
        [(u, None, 200, "application/xml", b"<urlset/>", t0) for u in seen_urls]
        + [(seen_urls[0], None, 200, "application/xml", b"<urlset/>",
            t0 + dt.timedelta(seconds=5))],
    )
    firsts = stream_first_seen(read_fetch_stream(spark, landing))
    run_available_now(
        firsts, str(tmp_path / "ck"), "first_seen", output_mode="update"
    )
    first_df = spark.sql("SELECT url FROM first_seen")
    assert first_df.count() == 2  # duplicate collapsed by the stream

    seen = UrlSeenSet(spark, str(tmp_path / "seen"), expected_urls=4096)
    seen.record_seen(first_df)
    seen.compact()

    corpus = synth_crawl_corpus(spark, 2, leaves_per_host=2, pages_per_leaf=5)
    forest = sitemap_tree_for_homepages(
        spark,
        [f"http://host{i}.example.com/" for i in range(2)],
        corpus,
        use_known_paths=False,
        seen_set=seen,
    )
    node_urls = {r.url for r in forest.nodes.collect()}
    assert "http://host0.example.com/sitemap_index.xml" not in node_urls
    assert "http://host0.example.com/leaf_0.xml" not in node_urls
    # host0's robots was NOT seen → still fetched; its children are all
    # skipped (index was seen), so host0 contributes no pages
    assert "http://host0.example.com/robots.txt" in node_urls
    per_host = {
        r["h"]: r["n"]
        for r in forest.pages.groupBy(
            F.parse_url("page_url", F.lit("HOST")).alias("h")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert per_host == {"host1.example.com": 10}
    forest.unpersist()
