"""R8 cross-crawl URL-seen set wired into the wave loop (north rule: skip
re-fetch of already-seen sitemap URLs across seeds / crawl rounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frontier.dedup import UrlSeenSet, make_unseen_filter
from frontier.synth import synth_crawl_corpus
from frontier.waves import sitemap_tree_for_homepages


def _crawl(spark, corpus, n_hosts, **kw):
    seeds = [f"http://host{i}.example.com/" for i in range(n_hosts)]
    return sitemap_tree_for_homepages(
        spark, seeds, corpus, use_known_paths=False, **kw
    )


def test_make_unseen_filter_reusable(spark):
    seen = spark.createDataFrame(
        [(f"http://s.com/p{i}",) for i in range(0, 100, 2)], "url string"
    )
    flt = make_unseen_filter(seen, expected_urls=256, fpp=0.1)
    cand_a = spark.createDataFrame(
        [(f"http://s.com/p{i}",) for i in range(50)], "url string"
    )
    cand_b = spark.createDataFrame(
        [(f"http://s.com/p{i}",) for i in range(50, 100)], "url string"
    )
    # two applications of ONE prepared filter, each exactly ≡ anti-join
    for cand in (cand_a, cand_b):
        got = {r["url"] for r in flt(cand).collect()}
        expect = {
            r["url"] for r in cand.join(seen, "url", "left_anti").collect()
        }
        assert got == expect


def test_second_crawl_skips_everything(spark, tmp_path):
    corpus = synth_crawl_corpus(spark, 2, leaves_per_host=2, pages_per_leaf=5)
    seen = UrlSeenSet(spark, str(tmp_path / "seen"), expected_urls=4096)

    first = _crawl(spark, corpus, 2, seen_set=seen, record_seen=True)
    assert first.pages.count() == 2 * 2 * 5
    n_recorded = spark.read.parquet(str(tmp_path / "seen")).count()
    assert n_recorded == 2 * 4  # robots + index + 2 leaves per host

    second = _crawl(spark, corpus, 2, seen_set=seen)
    # every sitemap URL is seen → only synthetic roots remain, no pages
    assert second.pages.count() == 0
    assert second.nodes.filter(F.col("level") >= 0).count() == 0
    assert second.nodes.count() == 2  # the website roots
    first.unpersist(), second.unpersist()


def test_partial_seen_skips_only_that_subtree(spark, tmp_path):
    corpus = synth_crawl_corpus(spark, 2, leaves_per_host=2, pages_per_leaf=5)
    seen = UrlSeenSet(spark, str(tmp_path / "seen"), expected_urls=4096)
    # pre-record ONE leaf of host0 — e.g. from another crawler's round
    seen.record_seen(
        spark.createDataFrame(
            [("http://host0.example.com/leaf_0.xml",)], "url string"
        )
    )
    forest = _crawl(spark, corpus, 2, seen_set=seen)
    # host0 loses exactly leaf_0's 5 pages; host1 is complete
    per_host = {
        r["h"]: r["n"]
        for r in forest.pages.groupBy(
            F.parse_url("page_url", F.lit("HOST")).alias("h")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert per_host == {
        "host0.example.com": 5,
        "host1.example.com": 10,
    }
    urls = {r["url"] for r in forest.nodes.collect()}
    assert "http://host0.example.com/leaf_0.xml" not in urls
    assert "http://host1.example.com/leaf_0.xml" in urls
    forest.unpersist()


def test_new_seeds_crawl_fully_after_rounds(spark, tmp_path):
    corpus = synth_crawl_corpus(spark, 3, leaves_per_host=1, pages_per_leaf=4)
    seen = UrlSeenSet(spark, str(tmp_path / "seen"), expected_urls=4096)

    # round 1: hosts 0-1; round 2 adds host2 — only host2 is new work
    seeds_r1 = [f"http://host{i}.example.com/" for i in range(2)]
    f1 = sitemap_tree_for_homepages(
        spark, seeds_r1, corpus, use_known_paths=False,
        seen_set=seen, record_seen=True,
    )
    assert f1.pages.count() == 2 * 4
    seen.compact()

    seeds_r2 = [f"http://host{i}.example.com/" for i in range(3)]
    f2 = sitemap_tree_for_homepages(
        spark, seeds_r2, corpus, use_known_paths=False,
        seen_set=seen, record_seen=True,
    )
    hosts = {
        r["h"]
        for r in f2.pages.select(
            F.parse_url("page_url", F.lit("HOST")).alias("h")
        ).distinct().collect()
    }
    assert hosts == {"host2.example.com"}
    assert f2.pages.count() == 4
    # union of both rounds' seen tables covers all three hosts' sitemaps
    assert spark.read.parquet(str(tmp_path / "seen")).distinct().count() == 3 * 3
    f1.unpersist(), f2.unpersist()


def test_compact_crash_recovery(spark, tmp_path):
    """Review-caught: a crash between compact()'s two renames leaves no
    live dir but a complete __trash-* copy; the next read/compact must
    restore it instead of treating the seen set as empty (and the leftover
    sweep must never delete the only surviving copy)."""
    import os

    base = str(tmp_path / "seen")
    seen = UrlSeenSet(spark, base, expected_urls=1024)
    seen.record_seen(
        spark.createDataFrame([(f"http://s.com/p{i}",) for i in range(10)],
                              "url string")
    )
    # simulate the crash window: base renamed to trash, tmp snapshot left
    os.rename(base, base + "__trash-deadbeef")
    os.makedirs(base + "__compact-cafebabe")

    # a plain read recovers the table
    assert seen._seen_table().count() == 10
    assert os.path.exists(base)

    # and a full compact afterwards sweeps the leftovers, keeps the data
    os.rename(base, base + "__trash-deadbee2")
    seen.compact()
    assert spark.read.parquet(base).count() == 10
    leftovers = [e for e in os.listdir(str(tmp_path))
                 if "__trash-" in e or "__compact-" in e]
    assert leftovers == []
