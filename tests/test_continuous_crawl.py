"""continuous_crawl_e2e capstone: cross-round composition invariants the
oracle hash implies but a reader wants stated directly, plus the plan audit
(no page body ever crosses an exchange between rounds)."""

from __future__ import annotations

import re

import duckdb
import pytest

from frontier.datapipe import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def capstone(spark):
    df = REGISTRY["continuous_crawl_e2e"].build(spark, SF_DIR)
    return df, df.collect()


def test_admission_respects_per_host_budgets(capstone):
    _, rows = capstone
    per_host: dict[str, list] = {}
    for r in rows:
        if r.admitted:
            per_host.setdefault(r.canonical_host, []).append(r)
    assert per_host, "no host admitted anything"
    for host, admitted in per_host.items():
        budgets = {r.fetch_budget for r in admitted}
        assert len(budgets) == 1, f"{host} saw conflicting budgets"
        budget = budgets.pop()
        assert len(admitted) <= budget
        ranks = sorted(r.fetch_rank for r in admitted)
        assert ranks == list(range(1, len(admitted) + 1)), (
            f"{host} ranks not contiguous from 1: {ranks}"
        )


def test_discovery_channel_equals_closed_form_added_set(capstone):
    """The REAL seen-set (bloom prefilter + exact anti-join over the
    compacted round-1 table) must admit exactly the URLs round 1 never
    crawled: listed in round 2 (doc_id%5!=0) and absent from round 1
    (doc_id%7==0)."""
    _, rows = capstone
    got = {r.url for r in rows if r.change == "added"}
    con = duckdb.connect()
    want = {
        u
        for (u,) in con.execute(
            "SELECT 'http://h' || CAST(doc_id % 23 AS VARCHAR)"
            " || '.example.com/p' || CAST(doc_id AS VARCHAR)"
            f" FROM '{SF_DIR}/documents.parquet'"
            " WHERE doc_id % 5 <> 0 AND doc_id % 7 = 0"
        ).fetchall()
    }
    con.close()
    assert got == want


def test_round2_state_derives_from_round1(capstone):
    """in_seen_after comes from re-reading the post-compaction parquet
    table, and must equal (was seen in round 1) OR (admitted this round):
    an over-budget discovery stays OUT of the table so it can be retried
    next round."""
    _, rows = capstone
    skipped_new = 0
    for r in rows:
        was_seen = r.change != "added"
        assert r.in_seen_after == (was_seen or r.admitted), r
        if r.change == "added" and not r.admitted:
            skipped_new += 1
    assert skipped_new > 0, (
        "fixture too small: no over-budget discovery exercised the "
        "stays-unseen branch"
    )
    # validator choice is round-1 state: discovered rows cannot send one
    for r in rows:
        if r.change == "added":
            assert r.strategy == "unconditional" and r.cond_header is None
        else:
            assert r.strategy in ("if-none-match", "if-modified-since")
            assert r.cond_header is not None
        if r.admitted:
            assert r.predicted_304 == (r.change == "unchanged")
            assert (r.bytes_saved > 0) == r.predicted_304 or (
                r.predicted_304 and r.bytes_saved >= 0
            )


def test_no_body_crosses_an_exchange_between_rounds(spark, capstone):
    """Plan audit for the capstone claim: page text reaches md5/octet_length
    in the scan projection and never rides a shuffle. The post-checkpoint
    plan's exchanges carry only url/metadata; the pre-checkpoint change
    signal (snapshot_diff over the same synthesized rounds) exchanges only
    (url, fingerprint) pairs."""
    df, _ = capstone
    plan = df._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)

    from frontier.pages import snapshot_diff

    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    old = spark.sql(
        "SELECT CAST(doc_id AS STRING) AS url, text FROM documents "
        "WHERE doc_id % 7 <> 0"
    )
    new = spark.sql(
        "SELECT CAST(doc_id AS STRING) AS url, "
        "CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text "
        "FROM documents WHERE doc_id % 5 <> 0"
    )
    diff_plan = (
        snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in diff_plan  # the url-keyed fp join exists
    for m in re.finditer(r"Exchange [^\n]*", diff_plan):
        line = m.group(0)
        assert "text" not in line, line
        assert "old_fp" in line or "new_fp" in line or "url" in line, line
