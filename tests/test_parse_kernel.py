"""Parse-kernel tests ported from the reference suite — pure Python, no JVM.

Sources (under /root/reference/tests/): tree/test_basic.py, tree/test_edges.py,
tree/test_xml.py, tree/test_rss_atom.py, tree/test_plain_text.py,
tree/test_xml_exts.py, tree/test_security.py, tree/test_from_str.py.
"""

import datetime as dt
from decimal import Decimal

from frontier.parse import (
    KIND_ATOM,
    KIND_INVALID,
    KIND_PLAIN_TEXT,
    KIND_ROBOTS,
    KIND_RSS,
    KIND_XML_INDEX,
    KIND_XML_PAGES,
    parse_sitemap_text,
)
from frontier.waves import sitemap_from_str, unfetched_children

BASE = "http://test_ultimate-sitemap-parser.com"
DATE = dt.datetime(2009, 12, 17, 12, 4, 56, tzinfo=dt.timezone(dt.timedelta(hours=2)))
ISO = DATE.isoformat()


def parse(url_suffix: str, content: str):
    return parse_sitemap_text(BASE + url_suffix, content)


# --- robots.txt ---------------------------------------------------------------


def test_robots_directives():
    doc = parse(
        "/robots.txt",
        f"""User-agent: *
Disallow: /whatever

Sitemap: {BASE}/sitemap_pages.xml
site-MAP: {BASE}/sitemap_news.xml
Site-map: {BASE}/sitemap_pages.xml
Sitemap: not-an-url
Sitemap: {BASE}/other.xml""",
    )
    assert doc.kind == KIND_ROBOTS
    # case-insensitive both spellings, invalid dropped, first-wins dedup
    assert doc.children == [
        f"{BASE}/sitemap_pages.xml",
        f"{BASE}/sitemap_news.xml",
        f"{BASE}/other.xml",
    ]


def test_robots_no_sitemaps():
    doc = parse("/robots.txt", "User-agent: *\nDisallow: /whatever")
    assert doc.kind == KIND_ROBOTS
    assert doc.children == []


# --- plain text -----------------------------------------------------------------


def test_plain_text_junk_and_dedup():
    doc = parse(
        "/sitemap_1.txt",
        f"""
{BASE}/news/foo.html


{BASE}/news/bar.html
  {BASE}/news/bar.html
Some other stuff which totally doesn't look like an URL
""",
    )
    assert doc.kind == KIND_PLAIN_TEXT
    assert [p["url"] for p in doc.pages] == [
        f"{BASE}/news/foo.html",
        f"{BASE}/news/bar.html",
    ]
    page = doc.pages[0]
    assert page["priority"] == Decimal("0.5")
    assert page["last_modified"] is None
    assert page["news_story"] is None


# --- XML urlset -----------------------------------------------------------------


def test_urlset_field_coercions():
    doc = parse(
        "/sitemap_pages.xml",
        f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url>
        <loc>{BASE}/about.html</loc>
        <lastmod>{ISO}</lastmod>
        <changefreq>monthly</changefreq>
        <priority>0.8</priority>
    </url>
    <url>
        <loc>{BASE}/contact.html</loc>
        <lastmod>{ISO}</lastmod>
        <changefreq>when we feel like it</changefreq>
        <priority>1.1</priority>
    </url>
</urlset>""",
    )
    assert doc.kind == KIND_XML_PAGES
    about, contact = doc.pages
    assert about["priority"] == Decimal("0.8")
    assert about["change_frequency"] == "monthly"
    assert about["last_modified"] == DATE
    assert contact["change_frequency"] == "always"  # invalid → always
    assert contact["priority"] == Decimal("0.5")  # out-of-range → default


def test_urlset_news_entities_cdata_dedup():
    body = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">
    <url>
        <loc>{BASE}/news/foo.html</loc>
        <lastmod />
        <news:news>
            <news:publication>
                <news:name>Test publication</news:name>
                <news:language>en</news:language>
            </news:publication>
            <news:publication_date>{ISO}</news:publication_date>
            <news:title>Foo &lt;foo&gt;</news:title>
        </news:news>
    </url>
    <url>
        <loc>{BASE}/news/foo.html</loc>
        <news:news>
            <news:publication><news:name>Dup</news:name></news:publication>
            <news:publication_date>{ISO}</news:publication_date>
            <news:title>Duplicate entry, first wins</news:title>
        </news:news>
    </url>
    <url>
        <loc>{BASE}/news/baz.html</loc>
        <news:news>
            <news:publication>
                <news:name>Test publication</news:name>
                <news:language>en</news:language>
            </news:publication>
            <news:publication_date>{ISO}</news:publication_date>
            <news:title><![CDATA[Bąž]]></news:title>
        </news:news>
    </url>
</urlset>"""
    doc = parse("/sitemap_news.xml", body)
    assert [p["url"] for p in doc.pages] == [
        f"{BASE}/news/foo.html",
        f"{BASE}/news/baz.html",
    ]
    foo, baz = doc.pages
    assert foo["news_story"]["title"] == "Foo <foo>"
    assert foo["news_story"]["publish_date"] == DATE
    assert foo["last_modified"] is None  # empty <lastmod />
    assert baz["news_story"]["title"] == "Bąž"


def test_urlset_news_genres_keywords_tickers():
    doc = parse(
        "/sitemap.xml",
        f"""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">
    <url>
        <loc>{BASE}/a.html</loc>
        <news:news>
            <news:publication_date>{ISO}</news:publication_date>
            <news:title>T</news:title>
            <news:genres> PressRelease , Blog </news:genres>
            <news:keywords>a, b</news:keywords>
            <news:stock_tickers>NASDAQ:A, NASDAQ:B</news:stock_tickers>
            <news:access>Subscription</news:access>
        </news:news>
    </url>
</urlset>""",
    )
    story = doc.pages[0]["news_story"]
    assert story["genres"] == ["PressRelease", "Blog"]
    assert story["keywords"] == ["a", "b"]
    assert story["stock_tickers"] == ["NASDAQ:A", "NASDAQ:B"]
    assert story["access"] == "Subscription"


def test_urlset_story_requires_title_and_date():
    doc = parse(
        "/sitemap.xml",
        f"""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">
    <url>
        <loc>{BASE}/a.html</loc>
        <news:news><news:title>No date</news:title></news:news>
    </url>
</urlset>""",
    )
    assert doc.pages[0]["news_story"] is None


# --- truncation tolerance (tests/tree/test_edges.py:153-235) --------------------


def _urlset_open(n: int) -> str:
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    )
    for x in range(n):
        xml += f"  <url><loc>{BASE}/page_{x}.html</loc></url>\n"
    return xml


def test_truncated_missing_close_urlset():
    doc = parse("/sitemap.xml", _urlset_open(50))  # no </urlset>
    assert doc.kind == KIND_XML_PAGES
    assert len(doc.pages) == 50


def test_truncated_mid_url():
    body = _urlset_open(49) + f"  <url><loc>{BASE}/page_"
    doc = parse("/sitemap.xml", body)
    assert len(doc.pages) == 49
    assert doc.pages[-1]["url"].endswith("page_48.html")


# --- missing-xmlns recovery (tests/tree/test_edges.py:237-323) -------------------


def test_no_namespace_urlset():
    doc = parse(
        "/sitemap_pages.xml",
        f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset>
    <url>
        <loc>{BASE}/about.html</loc>
        <lastmod>{ISO}</lastmod>
        <changefreq>monthly</changefreq>
        <priority>0.8</priority>
        <random_tag>random_value</random_tag>
    </url>
</urlset>""",
    )
    assert doc.kind == KIND_XML_PAGES
    assert doc.pages[0]["url"] == f"{BASE}/about.html"
    assert doc.pages[0]["priority"] == Decimal("0.8")


def test_no_namespace_sitemapindex():
    doc = parse(
        "/sitemap_index.xml",
        f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex>
    <sitemap>
        <loc>{BASE}/sitemap_pages.xml</loc>
        <lastmod>{ISO}</lastmod>
    </sitemap>
</sitemapindex>""",
    )
    assert doc.kind == KIND_XML_INDEX
    assert doc.children == [f"{BASE}/sitemap_pages.xml"]


# --- XML index ---------------------------------------------------------------


def test_index_whitespace_dedup_invalid():
    doc = parse(
        "/sitemap_index.xml",
        f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <sitemap><loc>  {BASE}/a.xml  </loc></sitemap>
    <sitemap><loc>{BASE}/a.xml</loc></sitemap>
    <sitemap><loc>not a url</loc></sitemap>
    <sitemap><loc>{BASE}/b.xml</loc></sitemap>
</sitemapindex>""",
    )
    assert doc.children == [f"{BASE}/a.xml", f"{BASE}/b.xml"]


# --- security hardening (tests/tree/test_security.py:11-58) ----------------------


def test_billion_laughs_rejected():
    lolz = (
        '<?xml version="1.0" encoding="UTF-8"?>\n<!DOCTYPE lolz [\n'
        '<!ENTITY lol "lol">\n'
        + "\n".join(
            f'<!ENTITY lol{i} "{"&lol%d;" % (i - 1) * 10}">' for i in range(1, 10)
        )
        + f'\n]>\n<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<url><loc>{BASE}/page.html</loc></url></urlset>"
    )
    doc = parse("/sitemap.xml", lolz)
    assert doc.kind == KIND_INVALID
    assert doc.reason == f"No parsers support sitemap from {BASE}/sitemap.xml"


def test_unsupported_root():
    doc = parse("/sitemap.xml", "<h1>404 Not Found!</h1>")
    assert doc.kind == KIND_INVALID
    assert "No parsers support" in doc.reason


# --- RSS / Atom (tests/tree/test_rss_atom.py) ------------------------------------


RSS_BODY = f"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0">
    <channel>
        <title>Test RSS 2.0 feed</title>
        <description>This is a test RSS 2.0 feed.</description>
        <link>{BASE}</link>
        <pubDate>Thu, 17 Dec 2009 12:04:56 +0200</pubDate>
        <item>
            <title>Test RSS 2.0 story #1</title>
            <description>This is a test RSS 2.0 story #1.</description>
            <link>{BASE}/rss_story_1.html</link>
            <guid isPermaLink="true">{BASE}/rss_story_1.html</guid>
            <pubDate>Thu, 17 Dec 2009 12:04:56 +0200</pubDate>
        </item>
        <item>
            <title>Test RSS 2.0 story #2</title>
            <description>This is a test RSS 2.0 story #2.</description>
            <link>{BASE}/rss_story_2.html</link>
            <guid isPermaLink="true">{BASE}/rss_story_2.html</guid>
            <pubDate>Thu, 17 Dec 2009 12:04:56 +0200</pubDate>
        </item>
    </channel>
</rss>"""


def test_rss_2_0():
    doc = parse("/sitemap_rss.xml", RSS_BODY)
    assert doc.kind == KIND_RSS
    assert [p["url"] for p in doc.pages] == [
        f"{BASE}/rss_story_1.html",
        f"{BASE}/rss_story_2.html",
    ]
    story = doc.pages[0]["news_story"]
    assert story["title"] == "Test RSS 2.0 story #1"
    assert story["publish_date"] == DATE
    assert doc.pages[0]["priority"] == Decimal("0.5")
    assert doc.pages[0]["last_modified"] is None


def test_rss_empty():
    doc = parse(
        "/sitemap_rss.xml",
        f"""<rss version="2.0"><channel>
        <title>Feed</title><description>D</description><link>{BASE}</link>
        </channel></rss>""",
    )
    assert doc.kind == KIND_RSS
    assert doc.pages == []


def test_atom_0_3():
    doc = parse(
        "/sitemap_atom_0_3.xml",
        f"""<?xml version="1.0" encoding="UTF-8"?>
<feed version="0.3" xmlns="http://purl.org/atom/ns#">
    <title>Test Atom 0.3 feed</title>
    <link rel="alternate" type="text/html" href="{BASE}" />
    <modified>{ISO}</modified>
    <entry>
        <title>Test Atom 0.3 story #1</title>
        <link rel="alternate" type="text/html" href="{BASE}/atom_0_3_story_1.html" />
        <id>{BASE}/atom_0_3_story_1.html</id>
        <issued>{ISO}</issued>
    </entry>
    <entry>
        <title>Test Atom 0.3 story #2</title>
        <link rel="alternate" type="text/html" href="{BASE}/atom_0_3_story_2.html" />
        <id>{BASE}/atom_0_3_story_2.html</id>
        <issued>{ISO}</issued>
    </entry>
</feed>""",
    )
    assert doc.kind == KIND_ATOM
    assert [p["url"] for p in doc.pages] == [
        f"{BASE}/atom_0_3_story_1.html",
        f"{BASE}/atom_0_3_story_2.html",
    ]
    assert doc.pages[0]["news_story"]["publish_date"] == DATE


def test_atom_1_0_link_precedence():
    doc = parse(
        "/sitemap_atom_1_0.xml",
        f"""<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
    <title>Test Atom 1.0 feed</title>
    <link href="{BASE}/sitemap_atom_1_0.xml" rel="self" />
    <link href="{BASE}" />
    <updated>{ISO}</updated>
    <entry>
        <title>Story #1</title>
        <link href="{BASE}/atom_1_0_story_1.html" />
        <link rel="alternate" type="text/html" href="{BASE}/atom_1_0_story_1.html?alt" />
        <link rel="edit" href="{BASE}/atom_1_0_story_1.html?edit" />
        <updated>{ISO}</updated>
        <summary>This is test atom 1.0 story #1.</summary>
    </entry>
</feed>""",
    )
    assert doc.kind == KIND_ATOM
    # no-rel link counts as rel=self; later alternate/edit links don't override
    assert doc.pages[0]["url"] == f"{BASE}/atom_1_0_story_1.html"
    # 'updated' used only when issued/published absent
    assert doc.pages[0]["news_story"]["publish_date"] == DATE


def test_atom_entry_without_link_dropped():
    doc = parse(
        "/atom.xml",
        f"""<feed xmlns="http://www.w3.org/2005/Atom">
    <entry><title>No link</title><updated>{ISO}</updated></entry>
    <entry><title>Has link</title><link href="{BASE}/x.html"/><updated>{ISO}</updated></entry>
</feed>""",
    )
    assert [p["url"] for p in doc.pages] == [f"{BASE}/x.html"]


# --- Google Image extension (tests/tree/test_xml_exts.py:14-107) -----------------


def test_image_extension():
    doc = parse(
        "/sitemap_images.xml",
        f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
    xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
  <url>
    <loc>{BASE}/sample1.html</loc>
    <image:image>
      <image:loc>{BASE}/image.jpg</image:loc>
      <image:caption>Example Caption</image:caption>
      <image:geo_location>Sheffield, UK</image:geo_location>
      <image:title>Example Title</image:title>
      <image:license>https://creativecommons.org/publicdomain/zero/1.0/</image:license>
    </image:image>
    <image:image>
      <image:loc>{BASE}/photo.jpg</image:loc>
    </image:image>
  </url>
  <url>
    <loc>{BASE}/sample2.html</loc>
    <image:image>
      <image:loc>{BASE}/picture.jpg</image:loc>
    </image:image>
  </url>
</urlset>""",
    )
    p1, p2 = doc.pages
    assert p1["images"] == [
        {
            "loc": f"{BASE}/image.jpg",
            "caption": "Example Caption",
            "geo_location": "Sheffield, UK",
            "title": "Example Title",
            "license": "https://creativecommons.org/publicdomain/zero/1.0/",
        },
        {
            "loc": f"{BASE}/photo.jpg",
            "caption": None,
            "geo_location": None,
            "title": None,
            "license": None,
        },
    ]
    assert p2["images"][0]["loc"] == f"{BASE}/picture.jpg"


# --- hreflang alternates (tests/tree/test_xml_exts.py:110-225) -------------------


def _hreflang_urlset(links: list[str]) -> str:
    urls = "".join(
        f"<url><loc>{BASE}/p{i}</loc>{link}</url>" for i, link in enumerate(links)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
        f'xmlns:xhtml="http://www.w3.org/1999/xhtml">{urls}</urlset>'
    )


def test_hreflang_alternates():
    doc = parse(
        "/sitemap.xml",
        _hreflang_urlset(
            [f'<xhtml:link rel="alternate" hreflang="fr-FR" href="{BASE}/fr"/>']
        ),
    )
    assert doc.pages[0]["alternates"] == [{"hreflang": "fr-FR", "href": f"{BASE}/fr"}]


def test_hreflang_missing_attrs_dropped():
    doc = parse(
        "/sitemap.xml",
        _hreflang_urlset(
            [
                f'<xhtml:link rel="alternate" href="{BASE}/fr"/>',  # no hreflang
                f'<xhtml:link hreflang="fr-FR" href="{BASE}/fr2"/>',  # no rel
                '<xhtml:link rel="alternate" hreflang="en-GB"/>',  # no href
                f'<xhtml:link hreflang="en-GB" href="{BASE}/en2"/>',  # no rel
            ]
        ),
    )
    assert all(p["alternates"] is None for p in doc.pages)


# --- string-parse mode (tests/tree/test_from_str.py) -----------------------------


def test_sitemap_from_str_index_children_unfetched():
    doc = sitemap_from_str(
        f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <sitemap><loc>{BASE}/a.xml</loc></sitemap>
    <sitemap><loc>{BASE}/b.xml</loc></sitemap>
</sitemapindex>"""
    )
    assert doc.kind == KIND_XML_INDEX
    kids = unfetched_children(doc)
    assert [k["url"] for k in kids] == [f"{BASE}/a.xml", f"{BASE}/b.xml"]
    assert all(k["reason"] == "Un-fetched child sitemap" for k in kids)


def test_utc_and_offset_same_instant_different_offsets():
    """Regression: same-instant tz-aware datetimes with different offsets hash
    equal, so a datetime-keyed cache returned a stale offset (ADVICE r2)."""
    import datetime as dt

    from frontier.udfs import _utc_and_offset

    plus2 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone(dt.timedelta(hours=2)))
    utc = dt.datetime(2024, 1, 1, 8, 0, tzinfo=dt.timezone.utc)
    assert plus2 == utc  # the collision precondition
    got_plus2 = _utc_and_offset(plus2)
    got_utc = _utc_and_offset(utc)
    assert got_plus2 == (dt.datetime(2024, 1, 1, 8, 0), 7200)
    assert got_utc == (dt.datetime(2024, 1, 1, 8, 0), 0)
    # and reversed query order, against a fresh cache
    from frontier.udfs import _utc_naive_cached

    _utc_naive_cached.cache_clear()
    assert _utc_and_offset(utc) == (dt.datetime(2024, 1, 1, 8, 0), 0)
    assert _utc_and_offset(plus2) == (dt.datetime(2024, 1, 1, 8, 0), 7200)
    # naive input passes through untouched
    naive = dt.datetime(2024, 1, 1, 8, 0)
    assert _utc_and_offset(naive) == (naive, None)
