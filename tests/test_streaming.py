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


def test_stream_first_seen_state_stays_flat(spark, tmp_path):
    """The per-host bloom state is a FIXED-SIZE bitmap: after many
    micro-batches of new URLs, the state store holds one row per host whose
    bloom is exactly bloom_bits/8 bytes — a long-running stream cannot grow
    it (round-2 verdict #3)."""
    from frontier.streaming import read_fetch_stream, stream_first_seen

    landing = str(tmp_path / "landing_flat")
    ck = str(tmp_path / "ck_flat")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    bloom_bits = 1 << 13  # 1 KiB per host, plenty for 120 keys at k=4
    # 6 files -> 6 micro-batches (maxFilesPerTrigger=1 below), 20 NEW urls
    # per batch on h1 plus a repeat of batch 0's urls on every later batch
    for b in range(6):
        urls = [f"http://h1.example.com/{b}_{i}.xml" for i in range(20)]
        if b > 0:
            urls += [f"http://h1.example.com/0_{i}.xml" for i in range(20)]
        _land(spark, landing, [(u, None, 200, None, None, t0) for u in urls])

    stream = (
        spark.readStream.schema(STREAM_FETCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    run_available_now(
        stream_first_seen(stream, bloom_bits=bloom_bits),
        ck,
        "flat_sink",
        output_mode="update",
    )
    emitted = [r.url for r in spark.sql("SELECT url FROM flat_sink").collect()]
    assert len(emitted) == 120  # every new url exactly once, repeats dropped
    assert len(set(emitted)) == 120

    state = spark.read.format("statestore").load(ck).collect()
    assert len(state) == 1  # one row per host, however many batches ran
    row = state[0]
    assert row.key.host == "h1.example.com"
    assert len(bytes(row.value.groupState.bloom)) == bloom_bits // 8
    assert row.value.groupState.n_inserted == 120


def test_stream_first_seen_timeout_expires_state(spark, tmp_path):
    """State expiry on a processing-time trigger: an idle host's bloom is
    removed after state_timeout_ms, so a later repeat of its URL re-emits.
    (The availableNow + ProcessingTimeTimeout combination is wedged on this
    build — the drain re-triggers micro-batches forever, observed 30+
    epochs in 60 s — so timeouts are exercised on the processingTime
    trigger they are designed for; see stream_first_seen's docstring.)"""
    import time

    from frontier.streaming import read_fetch_stream, stream_first_seen

    landing = str(tmp_path / "landing_ttl")
    ck = str(tmp_path / "ck_ttl")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    _land(spark, landing, [("http://h1.example.com/x.xml", None, 200, None, None, t0)])

    q = (
        stream_first_seen(read_fetch_stream(spark, landing), state_timeout_ms=2000)
        .writeStream.format("memory")
        .queryName("ttl_sink")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def wait_for(pred, deadline_s=90):
        end = time.monotonic() + deadline_s
        while time.monotonic() < end:
            if pred():
                return True
            time.sleep(0.5)
        return False

    def count(url):
        return spark.sql(
            f"SELECT count(*) AS c FROM ttl_sink WHERE url = '{url}'"
        ).first().c

    try:
        assert wait_for(lambda: count("http://h1.example.com/x.xml") == 1)
        time.sleep(3)  # let h1's 2 s timeout lapse with no h1 data
        # a batch with OTHER-host data fires the hasTimedOut path for h1
        _land(
            spark, landing,
            [("http://h2.example.com/y.xml", None, 200, None, None, t0)],
        )
        assert wait_for(lambda: count("http://h2.example.com/y.xml") == 1)
        # h1's state is gone -> the same URL is 'first seen' again
        _land(
            spark, landing,
            [("http://h1.example.com/x.xml", None, 200, None, None, t0)],
        )
        assert wait_for(lambda: count("http://h1.example.com/x.xml") == 2), (
            "timed-out host state was not expired; URL not re-emitted"
        )
    finally:
        q.stop()


def test_stream_politeness_gate_budget_per_batch(spark, tmp_path):
    """Per-host budget gate: at most k admissions per host per micro-batch,
    deterministic (fetch_ts, url) admission order, every row emitted with an
    admitted flag, served_total accumulates across batches."""
    import datetime as dt

    from frontier.streaming import stream_politeness_gate

    landing = str(tmp_path / "landing_gate")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    # batch 1: h1 has 3 candidates (budget 2), h2 has 1
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/c.xml", None, 200, None, None, t0),
            ("http://h1.example.com/a.xml", None, 200, None, None, t0),
            ("http://h1.example.com/b.xml", None, 200, None, None, t0),
            ("http://h2.example.com/a.xml", None, 200, None, None, t0),
        ],
    )
    # batch 2: h1 gets 2 more — the budget resets per batch
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/d.xml", None, 200, None, None,
             t0 + dt.timedelta(minutes=1)),
            ("http://h1.example.com/e.xml", None, 200, None, None,
             t0 + dt.timedelta(minutes=1)),
        ],
    )

    stream = (
        spark.readStream.schema(STREAM_FETCH_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    run_available_now(
        stream_politeness_gate(stream, budget_per_batch=2),
        str(tmp_path / "ck_gate"),
        "gate_sink",
        output_mode="update",
    )
    rows = spark.sql("SELECT * FROM gate_sink").collect()
    by_url = {r.url: r for r in rows}
    assert len(rows) == 6  # every candidate emitted, admitted or not
    # batch 1, h1: ties on fetch_ts broken by url -> a,b admitted, c deferred
    assert by_url["http://h1.example.com/a.xml"].admitted
    assert by_url["http://h1.example.com/b.xml"].admitted
    assert not by_url["http://h1.example.com/c.xml"].admitted
    assert by_url["http://h2.example.com/a.xml"].admitted
    # batch 2, h1: fresh budget; cumulative served_total = 2 + 2
    assert by_url["http://h1.example.com/d.xml"].admitted
    assert by_url["http://h1.example.com/e.xml"].admitted
    assert by_url["http://h1.example.com/d.xml"].served_total == 4
    assert by_url["http://h2.example.com/a.xml"].served_total == 1


def test_stream_outlinks_matches_batch_kernel(spark, tmp_path):
    """Stateless streaming link discovery: edges identical to a batch
    extract_links pass over the same rows; failures and redirects handled."""
    import datetime as dt

    from frontier.streaming import stream_outlinks

    landing = str(tmp_path / "landing_links")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    html = b'<a href="/a">a</a><a href="b.html">b</a><a href="#x">skip</a>'
    _land(
        spark,
        landing,
        [
            # redirected fetch: links resolve against final_url, not url
            ("http://h3.example.com/p", "http://h3.example.com/dir/p.html",
             200, "text/html", html, t0),
            ("http://h4.example.com/gone", None, 404, None, None, t0),
            ("http://h5.example.com/null-status", None, None, None, html, t0),
        ],
    )
    edges = stream_outlinks(read_fetch_stream(spark, landing))
    assert edges.isStreaming
    run_available_now(edges, str(tmp_path / "ck3"), "edges_sink")
    rows = sorted(
        (r.url, r.outlink, r.host, r.fetch_ts)
        for r in spark.sql("SELECT * FROM edges_sink").collect()
    )
    assert rows == [
        ("http://h3.example.com/dir/p.html", "http://h3.example.com/a",
         "h3.example.com", t0),
        ("http://h3.example.com/dir/p.html", "http://h3.example.com/dir/b.html",
         "h3.example.com", t0),
    ]


def test_stream_warc_ingest_matches_batch(spark, tmp_path):
    """WARC segment ingest is stateless mapInPandas, so the same kernel
    runs unchanged on a segment STREAM — continuous Common-Crawl-style
    landing of .warc/.warc.gz blobs — and yields exactly the batch rows."""
    from frontier.synth import synth_warc_segments
    from frontier.warc import warc_records

    docs = spark.createDataFrame(
        [(i, f"stream doc {i}", "en", "s", 11) for i in range(16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    segs = synth_warc_segments(docs)
    landing = str(tmp_path / "warc_landing")
    segs.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema("segment_id long, payload binary").parquet(
        landing
    )
    out = warc_records(stream, responses_only=True)
    assert out.isStreaming
    run_available_now(out, str(tmp_path / "ck_warc"), "warc_sink")
    got = sorted(
        (r.url, r.http_status, bytes(r.html))
        for r in spark.sql("SELECT * FROM warc_sink").collect()
    )
    want = sorted(
        (r.url, r.http_status, bytes(r.html))
        for r in warc_records(segs, responses_only=True).collect()
    )
    assert got == want and len(got) == 16


def test_stream_trainset_gate_matches_batch_semantics(spark, tmp_path):
    """The streaming trainset gate applies the same stages as the batch
    capstone: non-2xx, non-html, meta-noindex, too-short-main-text and
    out-of-token-range rows drop; survivors carry the main text's token
    count and md5 fingerprint."""
    import datetime as dt

    from frontier.streaming import stream_trainset_gate

    landing = str(tmp_path / "landing_trainset")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    para = "a paragraph comfortably longer than thirty characters of text"
    good = f"<html><body><p>{para}</p></body></html>".encode()
    noindexed = (
        '<html><head><meta name="robots" content="noindex"></head>'
        f"<body><p>{para}</p></body></html>"
    ).encode()
    tiny = b"<html><body><p>tiny.</p></body></html>"
    _land(
        spark,
        landing,
        [
            ("http://h1.example.com/keep", None, 200, "text/html", good, t0),
            ("http://h2.example.com/404", None, 404, "text/html", good, t0),
            ("http://h3.example.com/plain", None, 200, "text/plain", good, t0),
            ("http://h4.example.com/noindex", None, 200, "text/html",
             noindexed, t0),
            ("http://h5.example.com/short", None, 200, "text/html", tiny, t0),
        ],
    )
    gated = stream_trainset_gate(read_fetch_stream(spark, landing))
    assert gated.isStreaming
    run_available_now(gated, str(tmp_path / "ck_ts"), "trainset_sink")
    rows = spark.sql("SELECT * FROM trainset_sink").collect()
    assert [r.url for r in rows] == ["http://h1.example.com/keep"]
    assert rows[0].main_text == para
    assert rows[0].n_tokens == len(para.split())
    import hashlib

    assert rows[0].fp == hashlib.md5(para.encode()).hexdigest()


def test_stream_adaptive_budgets_matches_batch_ladder(spark, tmp_path):
    """The AIMD ladder on the live stream: a healthy host stays at 32, a
    >=10% 5xx host drops to 4 — same integer thresholds as the batch
    adaptive_politeness operator, per event-time window."""
    from frontier.streaming import stream_adaptive_budgets

    landing = str(tmp_path / "landing_aimd")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows = []
    # h1: 10 healthy fetches in window [12:00, 12:01)
    for i in range(10):
        rows.append(
            (f"http://h1.example.com/p{i}", None, 200, None, None,
             t0 + dt.timedelta(seconds=i))
        )
    # h2: 2 errors out of 10 -> 20% >= 10% -> budget 4
    for i in range(10):
        rows.append(
            (f"http://h2.example.com/p{i}", None, 503 if i < 2 else 200,
             None, None, t0 + dt.timedelta(seconds=i))
        )
    # h1 again, later window [12:05, 12:06): all errors -> budget 4 there
    rows.append(
        ("http://h1.example.com/late", None, 500, None, None,
         t0 + dt.timedelta(minutes=5))
    )
    _land(spark, landing, rows)

    budgets = stream_adaptive_budgets(read_fetch_stream(spark, landing))
    run_available_now(
        budgets, str(tmp_path / "ck_aimd"), "aimd_sink", output_mode="complete"
    )
    got = {
        (r.host, r.window_start): r
        for r in spark.sql("SELECT * FROM aimd_sink").collect()
    }
    assert got[("h1.example.com", t0)].next_budget == 32
    assert got[("h2.example.com", t0)].next_budget == 4
    assert got[("h2.example.com", t0)].n_errors == 2
    late = got[("h1.example.com", t0 + dt.timedelta(minutes=5))]
    assert late.next_budget == 4


def test_stream_adaptive_budgets_latency_rung(spark, tmp_path):
    """With a latency column in the landing zone, the slow-share rung
    fires: >=25% of fetches at >=1500 ms drop a healthy-status host to 8."""
    from pyspark.sql import functions as F, types as T

    from frontier.streaming import stream_adaptive_budgets

    landing = str(tmp_path / "landing_lat")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows = [
        (f"http://h3.example.com/p{i}", None, 200, None, None,
         t0 + dt.timedelta(seconds=i))
        for i in range(8)
    ]
    _land(spark, landing, rows)

    # latency joins the stream as a derived column (a real landing zone
    # would carry it); 2 of 8 >= 1500 ms is 25% -> budget 8
    src = read_fetch_stream(spark, landing).withColumn(
        "latency_ms",
        F.when(F.col("url").endswith("p0") | F.col("url").endswith("p1"),
               F.lit(2000)).otherwise(F.lit(10)).cast(T.LongType()),
    )
    budgets = stream_adaptive_budgets(src, latency_col="latency_ms")
    run_available_now(
        budgets, str(tmp_path / "ck_lat"), "lat_sink", output_mode="complete"
    )
    got = {r.host: r for r in spark.sql("SELECT * FROM lat_sink").collect()}
    assert got["h3.example.com"].n_slow == 2
    assert got["h3.example.com"].next_budget == 8


def test_media_kernels_run_on_streams(spark, tmp_path):
    """The multimodal decode kernels are stateless mapInPandas stages, so
    they run UNCHANGED on a streaming source: land real BMP + WAV payloads
    in a landing zone, readStream them, and drive image_pixel_stats /
    audio_pcm_stats through an availableNow drain — same rows as batch."""
    import numpy as np

    from frontier.multimodal import (
        audio_pcm_stats, build_wav_payload, encode_bmp, image_pixel_stats,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    samples = np.array([7, -7, 7, -7], dtype="<i2")
    landing = str(tmp_path / "media_landing")
    spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(px))),
            (2, bytearray(build_wav_payload(1, 8000, 16, 4, data=samples.tobytes()))),
        ],
        "doc_id long, payload binary",
    ).coalesce(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema("doc_id long, payload binary").parquet(landing)
    )
    run_available_now(
        image_pixel_stats(stream), str(tmp_path / "ck_px"), "px_sink"
    )
    run_available_now(
        audio_pcm_stats(stream), str(tmp_path / "ck_pcm"), "pcm_sink"
    )

    px_rows = spark.sql("SELECT * FROM px_sink").collect()
    assert len(px_rows) == 1 and px_rows[0].doc_id == 1
    assert px_rows[0].sum_r == int(px[:, :, 0].sum())
    pcm_rows = spark.sql("SELECT * FROM pcm_sink").collect()
    assert len(pcm_rows) == 1 and pcm_rows[0].doc_id == 2
    assert pcm_rows[0].zero_crossings == 3


def test_stream_member_filter_blocklist_gate(spark, tmp_path):
    """The Bloom member filter runs unchanged on a STREAM: the flagger is a
    stateless mapInPandas and the exact confirm is a stream-static semi
    join — the supported shape for gating a fetch stream against a large
    member set (blocklist, decontamination grams, seen digests). Verdicts
    must equal the batch path exactly."""
    from frontier.dedup import make_member_filter

    members = spark.createDataFrame(
        [(f"http://blocked{i}.example.com/",) for i in range(50)],
        "url string",
    )
    member = make_member_filter(members, expected_keys=64, fpp=0.2)

    rows = [
        (f"http://blocked{i}.example.com/" if i % 3 == 0
         else f"http://ok{i}.example.com/",)
        for i in range(90)
    ]
    landing = str(tmp_path / "member_landing")
    spark.createDataFrame(rows, "url string").coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    stream = (
        spark.readStream.schema("url string").parquet(landing)
    )
    out = member(stream)
    assert out.isStreaming
    run_available_now(out, str(tmp_path / "ck_member"), "member_sink")
    got = sorted(
        r.url for r in spark.sql("SELECT * FROM member_sink").collect()
    )
    want = sorted(
        r.url
        for r in member(spark.read.parquet(landing)).collect()
    )
    assert got == want
    # and both equal the ground truth: blocked{i} for i % 3 == 0, i < 50
    assert got == sorted(
        f"http://blocked{i}.example.com/"
        for i in range(90)
        if i % 3 == 0 and i < 50
    )


def test_stream_hll_cardinality_matches_batch_and_estimates(spark, tmp_path):
    """Windowed per-host HLL on the stream: bit-identical to the same
    function applied in batch (nothing is stream-specific but the
    watermark), and the estimate lands within the m=64 error band of the
    exact distinct count."""
    from frontier.streaming import stream_hll_cardinality

    landing = str(tmp_path / "landing_hll")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows = []
    # h1: 3000 fetches, 1500 distinct URLs (each fetched twice), one window
    for i in range(3000):
        rows.append(
            (f"http://h1.example.com/p{i % 1500}", None, 200, None, None,
             t0 + dt.timedelta(milliseconds=i * 10))
        )
    # h2: 800 fetches, 800 distinct, split across two windows
    for i in range(800):
        rows.append(
            (f"http://h2.example.com/q{i}", None, 200, None, None,
             t0 + dt.timedelta(seconds=0 if i % 2 == 0 else 90))
        )
    _land(spark, landing, rows)

    est = stream_hll_cardinality(read_fetch_stream(spark, landing))
    run_available_now(
        est, str(tmp_path / "ck_hll"), "hll_sink", output_mode="complete"
    )
    got = {
        (r.host, r.window_start): r
        for r in spark.sql("SELECT * FROM hll_sink").collect()
    }

    # batch equality: same function over the same rows read statically
    batch = {
        (r.host, r.window_start): r
        for r in stream_hll_cardinality(spark.read.parquet(landing)).collect()
    }
    assert set(got) == set(batch)
    for key, r in got.items():
        b = batch[key]
        assert (r.n_urls, r.s_scaled, r.distinct_urls_est) == (
            b.n_urls, b.s_scaled, b.distinct_urls_est
        ), key

    h1 = got[("h1.example.com", t0)]
    assert h1.n_urls == 3000
    # m=64 -> sigma ~13%; 3-sigma band against the true 1500
    assert abs(h1.distinct_urls_est - 1500) / 1500 < 0.40, h1.distinct_urls_est
    h2a = got[("h2.example.com", t0)]
    h2b = got[("h2.example.com", t0 + dt.timedelta(seconds=60))]
    assert h2a.n_urls == 400 and h2b.n_urls == 400
    assert abs(h2a.distinct_urls_est - 400) / 400 < 0.40
    assert abs(h2b.distinct_urls_est - 400) / 400 < 0.40


def test_stream_url_cms_matches_batch_and_never_undercounts(spark, tmp_path):
    """Windowed CMS cells on the stream == the same function in batch, and
    probing a known URL with the MIN-over-d rule never undercounts its
    true window frequency."""
    from frontier.streaming import stream_url_cms

    landing = str(tmp_path / "landing_cms")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows = []
    # hot URL fetched 50x, 40 background URLs fetched 2x each, one window
    for i in range(50):
        rows.append(("http://h/hot", None, 200, None, None,
                     t0 + dt.timedelta(seconds=i)))
    for u in range(40):
        for rep in range(2):
            rows.append((f"http://h/cold{u}", None, 200, None, None,
                         t0 + dt.timedelta(seconds=u + rep)))
    _land(spark, landing, rows)

    cells = stream_url_cms(read_fetch_stream(spark, landing))
    run_available_now(
        cells, str(tmp_path / "ck_cms"), "cms_sink", output_mode="complete"
    )
    got = {(r.row, r.col): r.cell_count
           for r in spark.sql("SELECT * FROM cms_sink").collect()}
    batch = {(r.row, r.col): r.cell_count
             for r in stream_url_cms(spark.read.parquet(landing)).collect()}
    assert got == batch
    assert sum(got.values()) == 2 * len(rows)  # d=2 increments per fetch

    # probe the hot URL: MIN over its d cells >= true count (50)
    h = spark.sql(
        "SELECT CAST(conv(substr(md5('http://h/hot'), 1, 14), 16, 10) AS BIGINT) h1,"
        " CAST(conv(substr(md5('http://h/hot'), 15, 14), 16, 10) AS BIGINT) | 1 h2"
    ).collect()[0]
    est = min(got[(i, (h.h1 + i * h.h2) % 16)] for i in range(2))
    assert est >= 50


def test_reconcile_first_seen_repairs_saturated_bloom(spark, tmp_path):
    """Stream↔batch reconciliation (round-3 verdict #4): saturate one
    host's bloom far past m/10 so the stream VISIBLY false-drops new URLs,
    then prove (emitted ∖ batch-seen) ∪ repairs equals the batch-only
    exact first-seen set — and that repairs never resurrect URLs the
    compacted seen table already holds."""
    from frontier.dedup import UrlSeenSet
    from frontier.streaming import reconcile_first_seen, stream_first_seen

    landing = str(tmp_path / "landing_rec")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)
    pre = [f"http://h1.example.com/pre_{i}.xml" for i in range(50)]
    new = [f"http://h1.example.com/new_{i}.xml" for i in range(900)]
    # batch table knows the pre URLs from an earlier crawl round
    seen = UrlSeenSet(spark, str(tmp_path / "seen_rec"), expected_urls=4096)
    seen.record_seen(
        spark.createDataFrame([(u,) for u in pre], "url string")
    )
    seen.compact()
    # 3 micro-batches: 300 new urls each + the pre urls re-observed
    for b in range(3):
        urls = new[b * 300 : (b + 1) * 300] + pre
        _land(spark, landing, [(u, None, 200, None, None, t0) for u in urls])

    stream = (
        spark.readStream.schema(STREAM_FETCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    # 1024-bit bloom: 950 distinct urls ≈ n = m -> ~half the new urls drop
    run_available_now(
        stream_first_seen(stream, bloom_bits=1 << 10),
        str(tmp_path / "ck_rec"),
        "rec_sink",
        output_mode="update",
    )
    emitted = spark.sql("SELECT url FROM rec_sink")
    emitted_urls = {r.url for r in emitted.collect()}
    dropped = set(new) - emitted_urls
    assert len(dropped) > 50, (
        f"bloom did not saturate (only {len(dropped)} drops) — the repair "
        "path is not being exercised"
    )

    observed = spark.read.parquet(landing)
    repairs = reconcile_first_seen(observed, emitted, seen)
    repair_urls = {r.url for r in repairs.collect()}
    # repairs are exactly the dropped NEW urls: disjoint from emitted,
    # never resurrecting batch-known urls
    assert repair_urls == dropped - set(pre)
    assert not (repair_urls & emitted_urls)
    assert not (repair_urls & set(pre))
    # composed pipeline == batch-only exact first-seen set
    composed = (emitted_urls - set(pre)) | repair_urls
    assert composed == set(new)
    # and the post-reconciliation table is complete for the next window
    seen.record_seen(emitted.union(repairs.select("url")))
    seen.compact()
    assert seen.filter_unseen(observed.select("url")).count() == 0
