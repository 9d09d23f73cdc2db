"""Structured Streaming ingestion: landing-zone stream → stateless parse →
watermarked per-host window metrics, drained with availableNow triggers."""

import datetime as dt

from frontier import parse as K
from frontier.streaming import (
    STREAM_FETCH_SCHEMA,
    host_window_metrics,
    parse_stream,
    read_fetch_stream,
    run_available_now,
)

BODY = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://h/a.html</loc></url>"
    "<url><loc>http://h/b.html</loc></url></urlset>"
).encode()

INDEX = (
    '<?xml version="1.0"?>'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>http://h2.example.com/leaf.xml</loc></sitemap></sitemapindex>"
).encode()


def _land(spark, path, rows):
    spark.createDataFrame(rows, STREAM_FETCH_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_parse_and_metrics(spark, tmp_path):
    landing = str(tmp_path / "landing")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/s.xml", None, 200, "application/xml", BODY, t0),
            ("http://h2.example.com/i.xml", None, 200, "application/xml", INDEX,
             t0 + dt.timedelta(seconds=30)),
            ("http://h1.example.com/missing.xml", None, 404, None, None,
             t0 + dt.timedelta(seconds=45)),
        ],
    )

    parsed = parse_stream(read_fetch_stream(spark, landing))
    run_available_now(parsed, str(tmp_path / "ck1"), "parsed_sink")
    rows = {r.url: r for r in spark.sql("SELECT * FROM parsed_sink").collect()}
    assert rows["http://h1.example.com/s.xml"].kind == K.KIND_XML_PAGES
    assert rows["http://h1.example.com/s.xml"].n_pages == 2
    assert rows["http://h2.example.com/i.xml"].kind == K.KIND_XML_INDEX
    assert rows["http://h2.example.com/i.xml"].n_children == 1
    assert rows["http://h1.example.com/missing.xml"].kind == K.KIND_INVALID

    # second micro-batch lands later data; metrics sink aggregates windows
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/s2.xml", None, 200, "application/xml", BODY,
             t0 + dt.timedelta(minutes=2)),
        ],
    )
    metrics = host_window_metrics(
        parse_stream(read_fetch_stream(spark, landing))
    )
    # complete-mode-free: append mode only emits finalized windows, so use
    # the availableNow drain with update-less complete semantics via memory
    run_available_now(
        metrics, str(tmp_path / "ck2"), "metrics_sink", output_mode="complete"
    )
    m = {
        (r.host, r.window_start): r
        for r in spark.sql("SELECT * FROM metrics_sink").collect()
    }
    first = m[("h1.example.com", t0)]
    assert first.n_fetches == 2  # s.xml + missing.xml in the 12:00 window
    assert first.n_invalid == 1
    assert first.n_pages == 2
    later = m[("h1.example.com", t0 + dt.timedelta(minutes=2))]
    assert later.n_pages == 2
    assert m[("h2.example.com", t0)].n_children == 1


def test_stream_first_seen_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState seen-set: a URL is emitted only on its first
    appearance, even when the repeat arrives in a LATER micro-batch
    (maxFilesPerTrigger=1 forces one file per batch)."""
    import datetime as dt

    from frontier.streaming import stream_first_seen

    landing = str(tmp_path / "landing_fs")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    # file 1: two urls on h1, one on h2 (h1 has an in-batch duplicate)
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/a.xml", None, 200, None, None, t0),
            ("http://h1.example.com/a.xml", None, 200, None, None, t0),
            ("http://h1.example.com/b.xml", None, 200, None, None, t0),
            ("http://h2.example.com/a.xml", None, 200, None, None, t0),
        ],
    )
    # file 2: cross-batch duplicates + one genuinely new url
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/a.xml", None, 200, None, None,
             t0 + dt.timedelta(minutes=1)),
            ("http://h2.example.com/a.xml", None, 200, None, None,
             t0 + dt.timedelta(minutes=1)),
            ("http://h2.example.com/new.xml", None, 200, None, None,
             t0 + dt.timedelta(minutes=1)),
        ],
    )

    stream = (
        spark.readStream.schema(STREAM_FETCH_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    run_available_now(
        stream_first_seen(stream),
        str(tmp_path / "ck_fs"),
        "first_seen_sink",
        output_mode="update",
    )
    got = sorted(
        (r.host, r.url)
        for r in spark.sql("SELECT * FROM first_seen_sink").collect()
    )
    assert got == [
        ("h1.example.com", "http://h1.example.com/a.xml"),
        ("h1.example.com", "http://h1.example.com/b.xml"),
        ("h2.example.com", "http://h2.example.com/a.xml"),
        ("h2.example.com", "http://h2.example.com/new.xml"),
    ]
