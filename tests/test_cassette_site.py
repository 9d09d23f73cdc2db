"""Cassette-style END-TO-END differential: one realistic multi-format site
(robots directives, a sitemapindex chain with a gzipped child and a 404
child, a nested index, RSS + Atom feeds, a plain-text list, a known-path-
only sitemap) frozen as a request/response cassette, crawled BOTH by the
actual reference (``usp.tree.sitemap_tree_for_homepage`` over a dict-backed
web client — the same shape as its VCR integration cassettes,
/root/reference/tests/integration/) and by our wave engine over the same
bodies as a fetches DataFrame. The reference output IS the expectation:
page order, field values, node structure, and invalid-node reasons must
all agree."""

from __future__ import annotations

import datetime as dt
import gzip
import importlib.metadata as _md
import sys

import pytest

# --- import the reference read-only (same version-stub dance as
# test_differential_reference.py) -------------------------------------------
_orig_version = _md.version


def _stub_version(name: str) -> str:
    if "sitemap" in name:
        return "1.8.1"
    return _orig_version(name)


_md.version = _stub_version
try:
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    usp_tree = pytest.importorskip("usp.tree")
finally:
    _md.version = _orig_version

from usp.objects.sitemap import InvalidSitemap  # noqa: E402
from usp.web_client.abstract_client import (  # noqa: E402
    AbstractWebClient,
    AbstractWebClientSuccessResponse,
    WebClientErrorResponse,
)

BASE = "http://cassette-site.example.com"
TS = "2024-03-05T10:30:00+02:00"
UTC_TS = dt.datetime(2024, 3, 5, 8, 30, 0)

_PRODUCTS = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>{BASE}/p/widget.html</loc><lastmod>{TS}</lastmod>
      <changefreq>weekly</changefreq><priority>0.9</priority></url>
  <url><loc>{BASE}/p/gadget.html</loc><priority>0.4</priority></url>
  <url><loc>{BASE}/p/widget.html</loc><priority>0.1</priority></url>
</urlset>"""

_ARCHIVE = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>{BASE}/a/2023.html</loc><changefreq>yearly</changefreq></url>
  <url><loc>{BASE}/a/2024.html</loc><lastmod>{TS}</lastmod></url>
</urlset>"""

_DEEP = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>{BASE}/d/one.html</loc></url>
  <url><loc>{BASE}/d/two.html</loc><priority>0.75</priority></url>
</urlset>"""

_NESTED_INDEX = f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>{BASE}/sitemap_deep.xml</loc></sitemap>
  <sitemap><loc>{BASE}/feed.atom</loc></sitemap>
</sitemapindex>"""

_INDEX = f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>{BASE}/sitemap_products.xml</loc><lastmod>{TS}</lastmod></sitemap>
  <sitemap><loc>{BASE}/sitemap_archive.xml.gz</loc></sitemap>
  <sitemap><loc>{BASE}/sitemap_missing.xml</loc></sitemap>
  <sitemap><loc>{BASE}/sitemap_nested_index.xml</loc></sitemap>
</sitemapindex>"""

_RSS = f"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0"><channel>
  <title>Cassette feed</title><link>{BASE}/</link>
  <item><title>First post</title><link>{BASE}/blog/first.html</link>
        <pubDate>Tue, 05 Mar 2024 10:30:00 +0200</pubDate></item>
  <item><title>Second post</title><link>{BASE}/blog/second.html</link></item>
</channel></rss>"""

_ATOM = f"""<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Cassette atom</title>
  <entry><title>Entry one</title>
         <link href="{BASE}/atom/one.html" />
         <updated>{TS}</updated></entry>
  <entry><title>Entry two</title>
         <link href="{BASE}/atom/two.html" /></entry>
</feed>"""

_PLAIN = f"""{BASE}/t/alpha.html
not a url at all
{BASE}/t/beta.html

{BASE}/t/alpha.html
{BASE}/t/gamma.html"""

_ROBOTS = f"""User-agent: *
Disallow: /private

Sitemap: {BASE}/sitemap_index.xml
Sitemap: {BASE}/feed.rss
Sitemap: {BASE}/urls.txt"""

_KNOWN_ONLY = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>{BASE}/k/known.html</loc><changefreq>daily</changefreq></url>
</urlset>"""

#: url -> (status, content_type, body bytes). Everything else 404s.
CASSETTE: dict[str, tuple[int, str, bytes]] = {
    f"{BASE}/robots.txt": (200, "text/plain", _ROBOTS.encode()),
    f"{BASE}/sitemap_index.xml": (200, "application/xml", _INDEX.encode()),
    f"{BASE}/sitemap_products.xml": (
        200, "application/xml", _PRODUCTS.encode(),
    ),
    f"{BASE}/sitemap_archive.xml.gz": (
        200, "application/octet-stream",
        gzip.compress(_ARCHIVE.encode(), mtime=0),
    ),
    f"{BASE}/sitemap_nested_index.xml": (
        200, "application/xml", _NESTED_INDEX.encode(),
    ),
    f"{BASE}/sitemap_deep.xml": (200, "application/xml", _DEEP.encode()),
    f"{BASE}/feed.atom": (200, "application/atom+xml", _ATOM.encode()),
    f"{BASE}/feed.rss": (200, "application/rss+xml", _RSS.encode()),
    f"{BASE}/urls.txt": (200, "text/plain", _PLAIN.encode()),
    f"{BASE}/sitemap.xml": (200, "application/xml", _KNOWN_ONLY.encode()),
}


class _DictSuccess(AbstractWebClientSuccessResponse):
    def __init__(self, url: str, status: int, ctype: str, body: bytes):
        self._url, self._status, self._ctype, self._body = (
            url, status, ctype, body,
        )

    def status_code(self) -> int:
        return self._status

    def status_message(self) -> str:
        return "OK"

    def header(self, name: str):
        return self._ctype if name.lower() == "content-type" else None

    def raw_data(self) -> bytes:
        return self._body

    def url(self) -> str:
        return self._url


class _DictError(WebClientErrorResponse):
    pass


class _DictWebClient(AbstractWebClient):
    """The reference's VCR-cassette replay shape, minus the network."""

    def set_max_response_data_length(self, n) -> None:
        pass

    def get(self, url: str):
        hit = CASSETTE.get(url)
        if hit is None:
            return _DictError("404 Not Found", retryable=False)
        return _DictSuccess(url, *hit)


def _ref_forest():
    return usp_tree.sitemap_tree_for_homepage(
        f"{BASE}/", web_client=_DictWebClient()
    )


def _utc_naive(value):
    if value is None or value == "":
        return None
    if value.tzinfo is None:
        return value
    return value.astimezone(dt.timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def ours(spark):
    from frontier.waves import sitemap_tree_for_homepages

    rows = [
        {
            "url": u,
            "final_url": u,
            "status": status,
            "content_type": ctype,
            "body": body,
        }
        for u, (status, ctype, body) in CASSETTE.items()
    ] + [
        {
            "url": f"{BASE}/sitemap_missing.xml",
            "final_url": f"{BASE}/sitemap_missing.xml",
            "status": 404,
            "content_type": "text/html",
            "body": b"not found",
        }
    ]
    from frontier.schemas import FETCHES_SCHEMA

    fetches = spark.createDataFrame(rows, FETCHES_SCHEMA)
    return sitemap_tree_for_homepages(spark, [f"{BASE}/"], fetches)


def test_cassette_pages_match_reference(ours):
    ref_pages = [
        (
            p.url,
            p.priority,
            p.change_frequency.value if p.change_frequency else None,
            _utc_naive(p.last_modified),
        )
        for p in _ref_forest().all_pages()
    ]
    our_pages = [
        (
            r.page_url,
            r.priority,
            r.change_frequency,
            r.last_modified,
        )
        for r in ours.all_pages().collect()
    ]
    assert our_pages == ref_pages
    # the crawl genuinely spanned >= 4 formats (the fixture's point)
    urls = [u for (u, *_rest) in ref_pages]
    assert any("/p/" in u for u in urls)  # xml urlset (via index)
    assert any("/a/" in u for u in urls)  # gzipped urlset
    assert any("/blog/" in u for u in urls)  # RSS
    assert any("/atom/" in u for u in urls)  # Atom (nested index)
    assert any("/t/" in u for u in urls)  # plain text
    assert any("/k/" in u for u in urls)  # known-path-only urlset


def test_cassette_nodes_match_reference(ours):
    ref = _ref_forest()
    ref_nodes = [
        (s.url, isinstance(s, InvalidSitemap)) for s in ref.all_sitemaps()
    ]
    our_rows = ours.all_sitemaps().collect()
    our_nodes = [
        (n.url, n.kind == "invalid") for n in our_rows if n.depth > 0
    ]
    assert sorted(our_nodes) == sorted(ref_nodes)
    # preorder traversal order agrees too (child declaration order)
    assert [u for u, _ in our_nodes] == [u for u, _ in ref_nodes]
    # the 404 index child is an invalid NODE with the same reason text
    ref_invalid = {
        s.url: s.reason for s in ref.all_sitemaps()
        if isinstance(s, InvalidSitemap)
    }
    our_invalid = {
        n.url: n.reason for n in our_rows if n.kind == "invalid"
    }
    assert our_invalid == ref_invalid
