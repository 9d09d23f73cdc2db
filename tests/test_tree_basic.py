"""Golden-tree test ported from the reference basic suite
(/root/reference/tests/tree/test_basic.py:23-133): same mini-site, same
expected pages/sitemaps, requests_mock replaced by a fetches DataFrame."""

import datetime as dt
from decimal import Decimal

from frontier.synth import (
    TEST_BASE_URL as BASE,
    TEST_PUBLICATION_LANGUAGE,
    TEST_PUBLICATION_NAME,
    reference_site_fetches,
)
from frontier.waves import sitemap_tree_for_homepages

UTC_INSTANT = dt.datetime(2009, 12, 17, 10, 4, 56)  # 12:04:56+02:00 as UTC
OFFSET = 7200


def crawl(spark):
    fetches = reference_site_fetches(spark)
    return sitemap_tree_for_homepages(spark, [BASE], fetches)


def test_basic_tree_pages(spark):
    forest = crawl(spark)
    pages = forest.all_pages().collect()

    # 6 pages: cross-sitemap duplicate bar.html retained (test_basic.py:132)
    assert [p.page_url for p in pages] == [
        f"{BASE}/about.html",
        f"{BASE}/contact.html",
        f"{BASE}/news/foo.html",
        f"{BASE}/news/bar.html",
        f"{BASE}/news/bar.html",
        f"{BASE}/news/baz.html",
    ]

    about = pages[0]
    assert about.priority == Decimal("0.80")
    assert about.change_frequency == "monthly"
    assert about.last_modified == UTC_INSTANT
    assert about.last_modified_offset_seconds == OFFSET
    assert about.news_story is None

    contact = pages[1]
    # invalid changefreq -> 'always'; invalid priority 1.1 -> 0.5
    assert contact.change_frequency == "always"
    assert contact.priority == Decimal("0.50")

    foo = pages[2]
    assert foo.news_story.title == "Foo <foo>"  # entity decoding
    assert foo.news_story.publish_date == UTC_INSTANT
    assert foo.news_story.publish_date_offset_seconds == OFFSET
    assert foo.news_story.publication_name == TEST_PUBLICATION_NAME
    assert foo.news_story.publication_language == TEST_PUBLICATION_LANGUAGE
    assert foo.last_modified is None  # <lastmod /> empty element

    baz = pages[5]
    assert baz.news_story.title == "Bąž"  # CDATA + UTF-8


def test_basic_tree_nodes(spark):
    forest = crawl(spark)
    nodes = forest.all_sitemaps().collect()

    # 7 sitemaps + website root (test_basic.py:133 counts all_sitemaps()=7,
    # which excludes the root itself)
    assert len(nodes) == 8
    by_url = {(n.url, n.path_key): n for n in nodes}

    assert [(n.url, n.kind, n.depth) for n in nodes] == [
        (f"{BASE}/", "website_index", 0),
        (f"{BASE}/robots.txt", "robots", 1),
        (f"{BASE}/sitemap_pages.xml", "xml_pages", 2),
        (f"{BASE}/sitemap_news_index_1.xml", "xml_index", 2),
        (f"{BASE}/sitemap_news_1.xml", "xml_pages", 3),
        (f"{BASE}/sitemap_news_index_2.xml", "xml_index", 3),
        (f"{BASE}/sitemap_news_2.xml", "xml_pages", 4),
        (f"{BASE}/sitemap_news_missing.xml", "invalid", 4),
    ]

    missing = [n for n in nodes if n.kind == "invalid"][0]
    assert missing.reason == (
        f"Unable to fetch sitemap from {BASE}/sitemap_news_missing.xml: "
        "404 Not Found"
    )


def test_no_robots_no_known_paths(spark):
    fetches = reference_site_fetches(spark)
    forest = sitemap_tree_for_homepages(
        spark, [BASE], fetches, use_robots=False, use_known_paths=False
    )
    assert forest.pages.isEmpty()
    assert forest.nodes.count() == 1  # just the website root
