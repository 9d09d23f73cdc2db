"""Pages-corpus surface (north-rule input shape): extraction invariant,
seeds derivation, latest-capture dedup, and the corpus→seeds→crawl loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier.pages import (
    PAGES_CORPUS_SCHEMA,
    extract_text,
    html_to_text,
    latest_capture,
    seeds_from_pages,
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
