"""T5/S8 export parity — port of /root/reference/tests/tree/test_save.py
(pickle round-trip, tree to_dict shape, exact page dicts) plus the
scale-path ``to_json_tree`` distributed export (no reference analogue: the
reference's to_dict is driver-side only)."""

import datetime
import json
import pickle
from decimal import Decimal

import pytest

from frontier.synth import TEST_BASE_URL as BASE, reference_site_fetches
from frontier.waves import sitemap_tree_for_homepages

TZ = datetime.timezone(datetime.timedelta(seconds=7200))
PUBLISH = datetime.datetime(2009, 12, 17, 12, 4, 56, tzinfo=TZ)


@pytest.fixture(scope="module")
def forest(spark):
    return sitemap_tree_for_homepages(spark, [BASE], reference_site_fetches(spark))


@pytest.fixture(scope="module")
def tree(forest):
    roots = forest.to_dict()
    assert len(roots) == 1
    return roots[0]


def test_pickle(tree, forest, tmp_path):
    """test_save.py:20-38 — the reference pickles the live tree (its pages
    live in temp-file swap); the flat-table analogue pickles the nested
    export and checks the page stream survives the round trip."""
    with open(tmp_path / "sitemap.pickle", "wb") as f:
        pickle.dump(tree, f)
    with open(tmp_path / "sitemap.pickle", "rb") as f:
        tree_loaded = pickle.load(f)
    assert tree_loaded == tree
    # all_sitemaps() == 7 (the reference excludes the website root)
    assert forest.nodes.count() - 1 == 7


def test_tree_to_dict(tree):
    """test_save.py:40-47."""
    assert len(tree["sub_sitemaps"][0]["sub_sitemaps"][0]["pages"]) == 2
    index = tree["sub_sitemaps"][0]["sub_sitemaps"][1]  # sitemap_news_index_1
    assert "pages" not in index, "index sitemap has pages key"
    leaf = tree["sub_sitemaps"][0]["sub_sitemaps"][0]  # sitemap_pages.xml
    assert "sub_sitemaps" not in leaf, "page sitemap has sub_sitemaps key"


def _news(title: str) -> dict:
    return {
        "title": title,
        "publish_date": PUBLISH,
        "publication_name": "Test publication",
        "publication_language": "en",
        "access": None,
        "genres": [],
        "keywords": [],
        "stock_tickers": [],
    }


def _all_pages(node: dict) -> list[dict]:
    out = list(node.get("pages", []))
    for sub in node.get("sub_sitemaps", []):
        out.extend(_all_pages(sub))
    return out


def test_page_to_dict(tree):
    """test_save.py:49-150 — byte-for-byte page dict parity (offset-aware
    datetimes, Decimal priorities, key order-insensitive dict equality)."""
    assert _all_pages(tree) == [
        {
            "url": f"{BASE}/about.html",
            "priority": Decimal("0.8"),
            "last_modified": PUBLISH,
            "change_frequency": "monthly",
            "images": None,
            "news_story": None,
        },
        {
            "url": f"{BASE}/contact.html",
            "priority": Decimal("0.5"),
            "last_modified": PUBLISH,
            "change_frequency": "always",
            "images": None,
            "news_story": None,
        },
        {
            "url": f"{BASE}/news/foo.html",
            "priority": Decimal("0.5"),
            "last_modified": None,
            "change_frequency": None,
            "images": None,
            "news_story": _news("Foo <foo>"),
        },
        {
            "url": f"{BASE}/news/bar.html",
            "priority": Decimal("0.5"),
            "last_modified": None,
            "change_frequency": None,
            "images": None,
            "news_story": _news("Bar & bar"),
        },
        {
            "url": f"{BASE}/news/bar.html",
            "priority": Decimal("0.5"),
            "last_modified": None,
            "change_frequency": None,
            "images": None,
            "news_story": _news("Bar & bar"),
        },
        {
            "url": f"{BASE}/news/baz.html",
            "priority": Decimal("0.5"),
            "last_modified": None,
            "change_frequency": None,
            "images": None,
            "news_story": _news("Bąž"),
        },
    ]


# --- distributed nested export ------------------------------------------------


def _jsonable(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def test_to_json_tree_matches_to_dict(forest, tree):
    """to_json_tree builds the exact to_dict document distributedly."""
    rows = forest.to_json_tree().collect()
    assert len(rows) == 1 and rows[0].seed == f"{BASE}/"
    assert json.loads(rows[0].json) == _jsonable(tree)


def test_to_json_tree_without_pages(forest):
    doc = json.loads(forest.to_json_tree(with_pages=False).first().json)
    leaf = doc["sub_sitemaps"][0]["sub_sitemaps"][0]
    assert leaf["url"] == f"{BASE}/sitemap_pages.xml"
    assert "pages" not in leaf
