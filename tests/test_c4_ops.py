"""Semantic tests for the C4-family operators (Raffel et al. 2020) — beyond
the bit-for-bit DuckDB oracle replica (test_datapipe_oracle.py), these pin
the *meaning* of each published rule: which residue classes die on which
gate, that the first occurrence of a shared three-sentence span keeps its
text while later copies lose exactly the span, and that domain blocking is
suffix-semantics (www/subdomains blocked, TLD siblings kept)."""

import os

import pytest

from frontier.datapipe import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def c4_rows(spark):
    df = REGISTRY["text_c4_filters"].build(spark, SF_DIR)
    return {r["doc_id"]: r for r in df.collect()}


def test_c4_page_gates_drop_whole_pages(c4_rows):
    # %5 lorem-ipsum, %7 curly-brace, %11 bad-word pages are gone entirely
    for doc_id in (10, 15, 20, 14, 21, 28, 22, 33):
        if doc_id % 5 == 0 or doc_id % 7 == 0 or doc_id % 11 == 0:
            assert doc_id not in c4_rows, doc_id


def test_c4_sentence_count_gate(c4_rows):
    # doc 117 = %9 (drops L3+L4) ∧ %13 (drops L5): only 2 sentences remain,
    # so the >=3-sentence page gate kills it post-aggregation
    assert 117 not in c4_rows
    # doc 9 = %9 only: exactly the 3-sentence boundary — retained
    assert c4_rows[9]["n_sentences"] == 3
    assert c4_rows[9]["n_lines_kept"] == 3


def test_c4_clean_doc_keeps_five_lines(c4_rows):
    # doc 1 trips no rule: L0 + the three ELSE lines + L6 survive
    row = c4_rows[1]
    assert row["n_lines_kept"] == 5
    assert row["n_sentences"] == 5
    for line in row["clean_text"].split("\n"):
        assert line[-1] in '.!?"', line
        assert len(line.split()) >= 5, line


def test_c4_javascript_line_filter(c4_rows):
    # doc 4 is %4: its javascript line is dropped but the page survives
    row = c4_rows[4]
    assert "javascript" not in row["clean_text"].lower()
    assert row["n_lines_kept"] == 4


@pytest.fixture(scope="module")
def span_rows(spark):
    df = REGISTRY["dedup_sentence_spans"].build(spark, SF_DIR)
    return {r["doc_id"]: r for r in df.collect()}


def test_span_first_occurrence_keeps_block(span_rows):
    # doc 0 is the lowest doc_id of residue group 0: keeps all 5 sentences
    row = span_rows[0]
    assert row["n_removed"] == 0
    assert "Shared span sentence one of group 0." in row["kept_text"]


def test_span_later_copies_lose_exactly_the_block(span_rows):
    # doc 10 shares group 0's block: sentences 1-3 excised, 0 and 4 kept
    row = span_rows[10]
    assert row["n_removed"] == 3
    assert row["kept_text"] == (
        "Opening sentence unique to document 10. "
        "Closing sentence unique to document 10."
    )


def test_span_unique_docs_untouched(span_rows):
    # doc 3 (residue 3, outside the shared groups) keeps everything
    row = span_rows[3]
    assert row["n_removed"] == 0
    assert "Middle sentence two unique to document 3." in row["kept_text"]


@pytest.fixture(scope="module")
def block_rows(spark):
    df = REGISTRY["url_blocklist_filter"].build(spark, SF_DIR)
    return {r["host"]: r for r in df.collect()}


def test_blocklist_suffix_semantics(block_rows):
    # exact-host entry blocks through the www. subdomain
    row = block_rows["www.h7.example.com"]
    assert row["kept"] == 0 and row["blocked_by"] == "h7.example.com"
    # subdomain of a blocked parent domain is blocked
    row = block_rows["x0.ads.badzone.example"]
    assert row["kept"] == 0 and row["blocked_by"] == "badzone.example"
    # blocked .org host
    row = block_rows["h13.example.org"]
    assert row["kept"] == 0 and row["blocked_by"] == "h13.example.org"


def test_blocklist_tld_sibling_kept(block_rows):
    # h7.example.org is NOT h7.example.com: suffix match must not cross TLDs
    row = block_rows["h7.example.org"]
    assert row["kept"] == 1 and row["blocked_by"] is None


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_c4_family_plan_shapes(spark):
    """Scale-critical plan properties of the C4-family + incremental-dedup
    queries, pinned in plan form."""
    # text_c4_filters: page gates ride the exploded rows — no join back;
    # exactly one hash exchange (the reassembly groupBy)
    plan = _plan_of(REGISTRY["text_c4_filters"].build(spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning") == 1

    # url_blocklist_filter: the blocklist meets the suffix stream through a
    # broadcast join — the (exploded) URL side is never exchanged on the
    # join key
    plan = _plan_of(REGISTRY["url_blocklist_filter"].build(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan

    # dedup_sentence_spans: windows + co-partitioned join only — never an
    # all-pairs product; the fp window exists (first-wins)
    plan = _plan_of(REGISTRY["dedup_sentence_spans"].build(spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan

    # dedup_incremental_minhash: history is probed via the persisted
    # signature views (InMemoryTableScan), never recomputed per reference
    plan = _plan_of(REGISTRY["dedup_incremental_minhash"].build(spark, SF_DIR))
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
