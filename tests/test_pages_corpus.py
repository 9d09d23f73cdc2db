"""Pages-corpus surface (north-rule input shape): extraction invariant,
seeds derivation, latest-capture dedup, and the corpus→seeds→crawl loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier.pages import (
    PAGES_CORPUS_SCHEMA,
    extract_anchors,
    extract_links,
    extract_text,
    host_link_graph,
    html_anchors,
    html_outlinks,
    html_to_text,
    latest_capture,
    mirror_hosts,
    seeds_from_pages,
    snapshot_diff,
)
from frontier.synth import synth_crawl_corpus, synth_pages_corpus
from frontier.waves import sitemap_tree_for_homepages


# --- scalar extraction contract -------------------------------------------------


@pytest.mark.parametrize(
    "html,expected",
    [
        (b"<p>hello</p>", "hello"),
        (b"<p>a</p><p>b</p>", "a\nb"),
        (b"<h1>T &amp; U</h1>", "T & U"),  # entity decode
        (b"<p>x<b>y</b>z</p>", "x\ny\nz"),  # tag boundary flushes blocks
        (b"<script>var a=1;</script><p>ok</p>", "ok"),
        (b"<style>p{}</style>ok", "ok"),
        (b"<p>  spaced  </p>", "  spaced  "),  # verbatim, no stripping
        (b"<br/>line", "line"),
        (b"", ""),
        (None, ""),
        (b"<p>unclosed", "unclosed"),  # malformed never raises
        ("plain str é".encode(), "plain str é"),
        (b"bad utf8 \xff", "bad utf8 �"),
        (b"<script><p>nested ignored</p></script>after", "after"),
    ],
)
def test_html_to_text_contract(html, expected):
    assert html_to_text(html) == expected


# --- corpus generator + distributed extraction ----------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_pages_corpus(spark, n_hosts=4, pages_per_host=10).cache()


def test_corpus_shape(corpus):
    assert corpus.schema == PAGES_CORPUS_SCHEMA
    assert corpus.count() == 40
    langs = {r["lang"] for r in corpus.select("lang").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es"}


def test_extract_text_byte_identical(corpus):
    """The per-row invariant: engine extraction == corpus ground truth."""
    out = extract_text(corpus)
    mismatches = out.filter(
        F.col("extracted_text") != F.col("text")
    ).count()
    assert mismatches == 0
    # and the extraction is non-trivial (entities decoded, script dropped)
    row = out.filter(F.col("url") == "http://host0.example.com/p0.html").first()
    assert " & rev 0\n" in row["extracted_text"]
    assert "var x" not in row["extracted_text"]


def test_extract_text_no_shuffle(corpus):
    plan = (
        extract_text(corpus)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_seeds_from_pages(corpus):
    seeds = {r["seed"] for r in seeds_from_pages(corpus).collect()}
    assert seeds == {f"http://host{i}.example.com/" for i in range(4)}


def test_latest_capture(spark):
    multi = synth_pages_corpus(
        spark, n_hosts=2, pages_per_host=5, captures_per_page=3
    )
    latest = latest_capture(multi).cache()
    assert latest.count() == 10
    rows = {r["url"]: r for r in latest.collect()}
    for url, row in rows.items():
        assert row["n_captures"] == 3
        # capture c=2 has the largest warc_ts (c*1009 hour offset) and its
        # revision marker survives in both html and text
        assert " & rev 2\n" in row["text"]
        assert b"rev 2" in bytes(row["html"])


def test_latest_capture_single_shuffle(spark):
    multi = synth_pages_corpus(spark, 2, 5, captures_per_page=2)
    plan = latest_capture(multi)._jdf.queryExecution().executedPlan().toString()
    # one exchange on url, no window/global sort (max_by plans as
    # SortAggregate — partition-local sort — because struct agg buffers
    # aren't hash-aggregable; still a single shuffle of compact structs)
    assert plan.count("Exchange") == 1
    assert "Window" not in plan


# --- link discovery --------------------------------------------------------------

_BASE = "http://h.example.com/a/b/page.html"


@pytest.mark.parametrize(
    "html,expected",
    [
        (b'<a href="c.html">x</a>', ["http://h.example.com/a/b/c.html"]),
        (b'<a href="../up.html">x</a>', ["http://h.example.com/a/up.html"]),
        (b'<a href="/root.html">x</a>', ["http://h.example.com/root.html"]),
        (b'<a href="//other.com/p">x</a>', ["http://other.com/p"]),
        (b'<a href="https://abs.com/p?q=1">x</a>', ["https://abs.com/p?q=1"]),
        # fragment stripped; frag-variant collapses with the plain spelling
        (
            b'<a href="c.html#s"></a><a href="c.html"></a>',
            ["http://h.example.com/a/b/c.html"],
        ),
        (b'<a href="#top">x</a>', []),
        (b'<a href="mailto:a@b.c">x</a><a href="javascript:void(0)">x</a>', []),
        (b'<a href="tel:+1">x</a><a href="data:text/plain,x">x</a>', []),
        (b'<a href="ftp://f.com/x">x</a>', []),  # resolves non-http → skip
        (b'<a name="anchor">no href</a><a href="">empty</a>', []),
        (b"<p>no links</p>", []),
        (b"", []),
        (None, []),
        (b'<a href="c.html', []),  # malformed never raises
        (b'<A HREF="c.html">caps</A>', ["http://h.example.com/a/b/c.html"]),
        (b'<a href="d.html"/>', ["http://h.example.com/a/b/d.html"]),
    ],
)
def test_html_outlinks_contract(html, expected):
    assert html_outlinks(html, _BASE) == expected


def test_html_outlinks_order_and_dedup():
    html = b'<a href="b"></a><a href="a"></a><a href="b"></a>'
    assert html_outlinks(html, "http://h.com/") == [
        "http://h.com/b",
        "http://h.com/a",
    ]


def test_html_outlinks_bad_base_never_raises():
    # urljoin raises ValueError on an unmatched IPv6 bracket — skipped, not raised
    assert html_outlinks(b'<a href="x">b</a>', "http://[") == []


@pytest.mark.parametrize(
    "html,expected",
    [
        (b'<a href="c.html">go &amp; see</a>',
         [("http://h.example.com/a/b/c.html", "go & see")]),
        # first occurrence's anchor wins on duplicate hrefs
        (b'<a href="c.html">first</a><a href="c.html">second</a>',
         [("http://h.example.com/a/b/c.html", "first")]),
        # contentless (image) link -> empty anchor
        (b'<a href="c.html"><img src="i.png"/></a>',
         [("http://h.example.com/a/b/c.html", "")]),
        # unclosed anchor: superseded by the next one, dangling flushes at EOF
        (b'<a href="c.html">one<a href="d.html">two',
         [("http://h.example.com/a/b/c.html", "one"),
          ("http://h.example.com/a/b/d.html", "two")]),
        # text inside nested inline tags accumulates
        (b'<a href="c.html">a <b>bold</b> link</a>',
         [("http://h.example.com/a/b/c.html", "a bold link")]),
        (b'<a href="#top">skipped</a>', []),
    ],
)
def test_html_anchors_contract(html, expected):
    assert html_anchors(html, _BASE) == expected


def test_extract_anchors_dataframe(spark):
    pages = spark.createDataFrame(
        [("http://h0.com/", b'<a href="/a">go</a><a href="mailto:x">m</a>')],
        "url string, html binary",
    )
    rows = extract_anchors(pages).collect()
    assert [tuple(r) for r in rows] == [("http://h0.com/", "http://h0.com/a", "go")]


def test_host_link_graph_weights_and_self_drop(spark):
    edges = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/2", "http://b.com/y"),
            ("http://a.com/1", "http://a.com/self"),  # self-host: dropped
            ("http://b.com/1", "http://a.com/z"),
            ("not a url", "http://b.com/x"),  # null src host: dropped
        ],
        "url string, outlink string",
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(edges).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def test_extract_links_edges_and_plan(spark):
    pages = spark.createDataFrame(
        [
            ("http://h0.com/d/p.html", b'<a href="r.html"></a><a href="/a"></a>'),
            ("http://h1.com/", b'<a href="mailto:x@y.z"></a>'),
            ("http://h2.com/", None),
        ],
        "url string, html binary",
    )
    edges = extract_links(pages)
    assert sorted(map(tuple, edges.collect())) == [
        ("http://h0.com/d/p.html", "http://h0.com/a"),
        ("http://h0.com/d/p.html", "http://h0.com/d/r.html"),
    ]
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    @given(
        html=st.one_of(st.binary(max_size=400), st.text(max_size=400)),
        base=st.one_of(
            st.just("http://h.example.com/a/b.html"),
            st.just("https://h.com"),
            st.just("http://["),  # malformed base
            st.text(max_size=40),
        ),
    )
    @settings(max_examples=200, deadline=None)
    def test_html_outlinks_fuzz_invariants(html, base):
        """The kernel never raises on arbitrary input and its outputs obey
        the contract: absolute http(s), defragmented, deduped; html_anchors
        yields the same links in the same order with string anchors."""
        links = html_outlinks(html, base)
        anchors = html_anchors(html, base)
        assert [a[0] for a in anchors] == links
        assert len(set(links)) == len(links)
        for link in links:
            assert link.lower().startswith(("http://", "https://"))
            assert "#" not in link  # urldefrag splits at the first '#'
        for _, text in anchors:
            assert isinstance(text, str)


def _link_corpus(spark, adjacency):
    """Tiny corpus where page u links to adjacency[u]."""
    rows = [
        (
            f"http://x.com/{u}",
            "".join(f'<a href="/{v}">l</a>' for v in vs).encode(),
        )
        for u, vs in adjacency.items()
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_expand_frontier_min_depth_and_cycle(spark):
    from frontier.pages import expand_frontier

    # a->b->c->a cycle, a->d, d->c (c reachable at depth 2 via d, 2 via b),
    # e isolated, f unreachable from a
    corpus = _link_corpus(
        spark,
        {"a": ["b", "d"], "b": ["c"], "c": ["a"], "d": ["c"], "f": ["a"]},
    )
    seeds = spark.createDataFrame([("http://x.com/a",)], "url string")
    got = {
        r["url"].rsplit("/", 1)[1]: r["depth"]
        for r in expand_frontier(corpus, seeds, max_depth=5).collect()
    }
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2}


def test_expand_frontier_depth_cap_and_seed_dedup(spark):
    from frontier.pages import expand_frontier

    # chain a->b->c->d; cap at 2 hops; duplicate seed rows collapse
    corpus = _link_corpus(spark, {"a": ["b"], "b": ["c"], "c": ["d"]})
    seeds = spark.createDataFrame(
        [("http://x.com/a",), ("http://x.com/a",)], "url string"
    )
    got = {
        r["url"].rsplit("/", 1)[1]: r["depth"]
        for r in expand_frontier(corpus, seeds, max_depth=2).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}


# --- corpus → seeds → sitemap crawl integration ----------------------------------


def test_corpus_seeds_drive_crawl(spark, tmp_path):
    """The north-rule loop: pages corpus → homepage seeds (DataFrame path,
    no driver list) → sitemap discovery over the matching fetch store →
    discovered pages join back to corpus URLs."""
    corpus = synth_pages_corpus(spark, n_hosts=3, pages_per_host=4).cache()
    seeds = seeds_from_pages(corpus)
    store = synth_crawl_corpus(spark, n_hosts=3, leaves_per_host=2, pages_per_leaf=5)
    forest = sitemap_tree_for_homepages(
        spark, seeds, store, use_known_paths=False,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pages = forest.all_pages()
    assert pages.count() == 3 * 2 * 5
    hosts = {
        r["h"]
        for r in pages.select(
            F.parse_url("page_url", F.lit("HOST")).alias("h")
        ).distinct().collect()
    }
    assert hosts == {f"host{i}.example.com" for i in range(3)}


# --- snapshot diff (incremental crawl) ------------------------------------------


def test_snapshot_diff_classifies(spark):
    import hashlib

    old = spark.createDataFrame(
        [("u/removed", "gone"), ("u/same", "stable"), ("u/edit", "v1")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u/same", "stable"), ("u/edit", "v2"), ("u/added", "fresh")],
        "url string, text string",
    )
    rows = {r["url"]: r for r in snapshot_diff(old, new).collect()}
    assert {u: r["change"] for u, r in rows.items()} == {
        "u/removed": "removed",
        "u/same": "unchanged",
        "u/edit": "changed",
        "u/added": "added",
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows["u/edit"]["old_fp"] == md5("v1")
    assert rows["u/edit"]["new_fp"] == md5("v2")
    assert rows["u/added"]["old_fp"] is None
    assert rows["u/removed"]["new_fp"] is None


def test_snapshot_diff_plan_bodies_never_shuffle(spark):
    """The md5 collapse happens below the join exchange: the shuffled
    projection carries (url, fp) only — the text column name must not
    appear anywhere in the physical plan above the scan projections."""
    old = spark.createDataFrame([("u", "body-old")], "url string, page_body string")
    new = spark.createDataFrame([("u", "body-new")], "url string, page_body string")
    plan = (
        snapshot_diff(old, new, text_col="page_body")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "md5" in plan
    # every Exchange (if any — tiny frames may broadcast) partitions on url,
    # never on or with the body column
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "url" in line and "page_body" not in line


# --- cross-host mirror detection -------------------------------------------------


def test_mirror_hosts_pairs(spark):
    pages = spark.createDataFrame(
        [
            ("h1", "shared-X"),
            ("h2", "shared-X"),
            ("h3", "shared-X"),
            ("h2", "shared-Y"),
            ("h4", "shared-Y"),
            ("h1", "unique-1"),
            ("h4", "unique-2"),
            ("h2", "shared-X"),  # duplicate (host, text) counts once
        ],
        "host string, text string",
    )
    got = sorted(map(tuple, mirror_hosts(pages).collect()))
    assert got == [
        ("h1", "h2", 1),
        ("h1", "h3", 1),
        ("h2", "h3", 1),
        ("h2", "h4", 1),
    ]


def test_mirror_hosts_cap_is_deterministic(spark):
    """Above the cap, the host set is truncated to the sorted first k —
    a bounded, reproducible fan-out instead of a quadratic blow-up."""
    pages = spark.createDataFrame(
        [(f"h{i}", "boilerplate") for i in range(5)],
        "host string, text string",
    )
    got = sorted(map(tuple, mirror_hosts(pages, max_hosts_per_fp=3).collect()))
    assert got == [("h0", "h1", 1), ("h0", "h2", 1), ("h1", "h2", 1)]


# --- nofollow + <base href> crawl semantics --------------------------------------


def test_html_outlinks_nofollow_and_base():
    html = (
        b'<head><base href="/sub/dir/"></head>'
        b'<a href="a.html">kept</a>'
        b'<a rel="nofollow" href="b.html">dropped when respected</a>'
        b'<a rel="NOFOLLOW,noopener" href="c.html">token list, any case</a>'
        b'<a rel="nofollowish" href="d.html">substring does NOT match</a>'
    )
    base = "http://h.com/page.html"
    # default: nofollow ignored, base honored
    assert html_outlinks(html, base) == [
        "http://h.com/sub/dir/a.html",
        "http://h.com/sub/dir/b.html",
        "http://h.com/sub/dir/c.html",
        "http://h.com/sub/dir/d.html",
    ]
    assert html_outlinks(html, base, respect_nofollow=True) == [
        "http://h.com/sub/dir/a.html",
        "http://h.com/sub/dir/d.html",
    ]
    # anchors stay in lockstep
    assert [a for a, _ in html_anchors(html, base, respect_nofollow=True)] == (
        html_outlinks(html, base, respect_nofollow=True)
    )


def test_html_outlinks_meta_robots_nofollow():
    html = (
        b'<head><meta name="ROBOTS" content="noindex, NoFollow"></head>'
        b'<a href="x.html">gone</a>'
    )
    assert html_outlinks(html, "http://h.com/") == ["http://h.com/x.html"]
    assert html_outlinks(html, "http://h.com/", respect_nofollow=True) == []
    # an unrelated meta must not trip the flag
    other = b'<meta name="viewport" content="nofollow-looking"><a href="y">t</a>'
    assert html_outlinks(other, "http://h.com/", respect_nofollow=True) == [
        "http://h.com/y"
    ]


def test_html_outlinks_base_href_edge_cases():
    # absolute <base>, first-wins on duplicates, malformed base falls back
    html = (
        b'<base href="http://other.example.net/root/">'
        b'<base href="http://ignored.example.com/">'
        b'<a href="p.html">x</a>'
    )
    assert html_outlinks(html, "http://h.com/deep/page.html") == [
        "http://other.example.net/root/p.html"
    ]
    bad = b'<base href="http://["><a href="q.html">y</a>'
    assert html_outlinks(bad, "http://h.com/dir/page.html") == [
        "http://h.com/dir/q.html"
    ]


def test_extract_links_respect_nofollow(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://h0.com/p.html",
                b'<a href="a.html"></a><a rel="nofollow" href="b.html"></a>',
            )
        ],
        "url string, html binary",
    )
    default = sorted(r["outlink"] for r in extract_links(pages).collect())
    strict = sorted(
        r["outlink"]
        for r in extract_links(pages, respect_nofollow=True).collect()
    )
    assert default == ["http://h0.com/a.html", "http://h0.com/b.html"]
    assert strict == ["http://h0.com/a.html"]


# --- main-content extraction (boilerplate removal) --------------------------------


def test_html_main_text_contract():
    from frontier.pages import html_main_text

    html = (
        b'<body>'
        b'<nav><a href="/">Home</a><a href="/x">Products and services</a></nav>'
        b'<p>This paragraph is long enough to clear the minimum and has '
        b'no links at all inside it.</p>'
        b'<p>Mostly <a href="/y">anchor text that dominates this whole '
        b'block by far, way past half</a>.</p>'
        b'<div>short</div>'
        b'<script>var boilerplate = "This is long enough but must never '
        b'appear in output";</script>'
        b'<p>Inline <b>bold</b> and <em>emphasis</em> do not split this '
        b'block into pieces.</p>'
        b'</body>'
    )
    got = html_main_text(html)
    assert got == (
        "This paragraph is long enough to clear the minimum and has "
        "no links at all inside it.\n"
        "Inline bold and emphasis do not split this block into pieces."
    )
    # knobs: lower the bar and the short div survives
    assert "short" in html_main_text(html, min_block_chars=3)
    # raise allowed density and the link-heavy block survives
    assert "dominates" in html_main_text(html, max_link_density=1.0)


def test_html_main_text_edges():
    from frontier.pages import html_main_text

    assert html_main_text(None) == ""
    assert html_main_text(b"") == ""
    assert html_main_text(b"no markup at all but long enough to keep here") == (
        "no markup at all but long enough to keep here"
    )
    # exactly-half link density is kept (strict > drops)
    half = b'<p>' + b'x' * 20 + b'<a href="/">' + b'y' * 20 + b'</a></p>'
    assert html_main_text(half, min_block_chars=10) == "x" * 20 + "y" * 20


def test_extract_main_text_dataframe(spark):
    from frontier.pages import extract_main_text

    pages = spark.createDataFrame(
        [
            ("u1", b"<p>a genuinely long enough paragraph of content</p>"
                   b"<nav><a href='/'>HomeHomeHomeHomeHomeHomeHome</a></nav>"),
            ("u2", None),
        ],
        "url string, html binary",
    )
    got = {r["url"]: r["main_text"] for r in extract_main_text(pages).collect()}
    assert got == {
        "u1": "a genuinely long enough paragraph of content",
        "u2": "",
    }


def test_html_feed_links_kernel():
    from frontier.pages import html_feed_links

    html = (
        '<html><head><base href="/sub/">'
        '<link rel="ALTERNATE" type="application/rss+xml; charset=utf-8" href="r.xml">'
        '<link rel="alternate home" type="APPLICATION/ATOM+XML" href="/a.xml"/>'
        '<link rel="alternate" type="application/rss+xml" href="r.xml">'  # dup
        '<link rel="alternate" type="text/html" href="not-a-feed.html">'
        '<link rel="stylesheet" href="s.css">'
        '<link rel="alternate" type="application/rss+xml">'  # no href
        "</head><body></body></html>"
    )
    got = html_feed_links(html.encode(), "http://h.example.com/dir/p.html")
    assert got == [
        ("http://h.example.com/sub/r.xml", "rss"),
        ("http://h.example.com/a.xml", "atom"),
    ]
    assert html_feed_links(None, "http://h/") == []
    assert html_feed_links(b"<<<garbage", "http://h/") == []
    # skip-scheme and fragment rules inherited from _resolve_href
    assert html_feed_links(
        b'<link rel="alternate" type="application/rss+xml" href="javascript:x()">',
        "http://h/",
    ) == []


def test_extract_feed_links_plan_and_rows(spark):
    from frontier.pages import extract_feed_links

    pages = spark.createDataFrame(
        [
            ("http://a.example.com/",
             bytearray(b'<link rel="alternate" type="application/atom+xml" href="f.atom">')),
            ("http://b.example.com/", bytearray(b"<p>no feeds</p>")),
        ],
        "url string, html binary",
    )
    rows = extract_feed_links(pages).collect()
    assert [(r.url, r.feed_url, r.feed_kind) for r in rows] == [
        ("http://a.example.com/", "http://a.example.com/f.atom", "atom")
    ]
    plan = extract_feed_links(pages)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan  # shuffle-free kernel + explode


def test_sniff_charset_precedence_and_edges():
    from frontier.pages import decode_html_bytes, sniff_charset

    # BOM beats a contradicting header
    assert sniff_charset(b"\xef\xbb\xbfx", "text/html; charset=ISO-8859-1") == (
        "utf-8", "bom",
    )
    # header beats meta
    assert sniff_charset(
        b"<meta charset=windows-1252>", "text/html; charset=utf-8"
    ) == ("utf-8", "header")
    # bogus header label falls through to meta
    assert sniff_charset(
        b'<meta charset="ISO-8859-1">', "text/html; charset=bogus-enc"
    ) == ("iso-8859-1", "meta")
    # meta past the first 1024 bytes is not scanned
    far = b" " * 1025 + b"<meta charset=windows-1252>"
    assert sniff_charset(far) == ("utf-8", "default")
    # alias normalization via header
    assert sniff_charset(b"", "text/html; charset=Latin1")[0] == "iso-8859-1"
    # undecodable bytes replace, never raise
    charset, source, text = decode_html_bytes(b"\xff\xff\xfa", None)
    assert (charset, source) == ("utf-8", "default") and "�" in text
    assert decode_html_bytes(None) == ("utf-8", "default", "")


def test_warc_to_text_ingest_pipeline(spark):
    """End-to-end webtext ingest: WARC segments → record walk → charset
    decode → text extraction, composed as one shuffle-free plan."""
    from frontier.pages import decode_pages, extract_text
    from frontier.synth import synth_warc_segments
    from frontier.warc import warc_records

    docs = spark.createDataFrame(
        [(i, f"doc body {i}", "en", "s", 10) for i in range(12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    recs = warc_records(synth_warc_segments(docs), responses_only=True)
    decoded = decode_pages(recs, html_col="html", ctype_col="content_type")
    out = extract_text(decoded, html_col="html", out_col="extracted")
    rows = out.select("url", "charset", "text", "extracted").collect()
    assert len(rows) == 12
    for r in rows:
        i = int(r.url.rsplit("/", 1)[1])
        assert r.charset == "utf-8"  # synth WARC bodies are utf-8
        assert f"doc body {i}" in r.text
        # tags stripped; i%7==0 bodies keep their planted WARC banner as
        # leading character data (it IS page text, not a record boundary)
        banner = "WARC/1.0\r\n\r\n\n" if i % 7 == 0 else ""
        assert r.extracted == f"{banner}doc body {i}"


# --- rel=canonical extraction ------------------------------------------------

import pytest as _pytest

from frontier.pages import extract_canonical_links, html_canonical


@_pytest.mark.parametrize(
    "html,expected",
    [
        # absolute declaration
        ('<link rel="canonical" href="http://a.com/x">', "http://a.com/x"),
        # relative, resolved against the page URL
        ('<link rel="canonical" href="/x">', "http://h.com/x"),
        ('<link rel="canonical" href="x2">', "http://h.com/dir/x2"),
        # <base href> changes the resolution root
        ('<base href="/b/"><link rel="canonical" href="x">', "http://h.com/b/x"),
        # rel is a token list; order and case don't matter
        ('<link rel="Alternate CANONICAL" href="/t">', "http://h.com/t"),
        # first declaration wins
        (
            '<link rel="canonical" href="/first">'
            '<link rel="canonical" href="/second">',
            "http://h.com/first",
        ),
        # decoys: wrong rel token, missing href, substring token
        ('<link rel="stylesheet" href="/s.css">', None),
        ('<link rel="canonical">', None),
        ('<link rel="canonicalish" href="/x">', None),
        # no declaration / empty / None input
        ("<html><body>hi</body></html>", None),
        ("", None),
        (None, None),
    ],
)
def test_html_canonical_contract(html, expected):
    base = "http://h.com/dir/page.html"
    assert html_canonical(html, base) == expected


def test_html_canonical_bytes_and_self(spark):
    page_url = "http://h.com/p"
    html = f'<link rel="canonical" href="{page_url}">'.encode()
    assert html_canonical(html, page_url) == page_url
    df = spark.createDataFrame(
        [(page_url, bytearray(html)), ("http://h.com/q", bytearray(b"<p>n</p>"))],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in extract_canonical_links(df).collect()}
    assert rows[page_url]["canonical_url"] == page_url
    assert rows[page_url]["is_self"] is True
    assert rows["http://h.com/q"]["canonical_url"] is None
