"""Plan-shape pins for the round-3 sketch / protocol / mining operators:
the physical properties the 100-TB story depends on, asserted against the
executed plan so a refactor that silently breaks them fails CI.
"""

from __future__ import annotations

from frontier.datapipe import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].build(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_registers_ride_partial_aggregation(spark):
    """The (host, reg) register max MUST be a partial agg (per-partition
    HLL sketches merging in the shuffle) — that is what bounds the
    exchange at <=256 rows/host regardless of URL count."""
    plan = _plan(spark, "host_url_hll")
    assert "partial_max" in plan, plan
    # scan reads only the two columns the synth needs (column pruning)
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in plan, plan


def test_scope_audit_is_pure_codegen(spark):
    """No joins, no hash exchanges: the admission gate rides the scan
    (the only exchange is the presentation sort)."""
    plan = _plan(spark, "sitemap_scope_audit")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_latency_quantiles_single_host_exchange_no_global_sort(spark):
    """ONE hash exchange on host; the sort is in-partition (window), never
    a rangepartitioning global sort before aggregation."""
    plan = _plan(spark, "fetch_latency_quantiles")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_canonical_collapse_bodies_never_shuffle(spark):
    """HTML bodies stay inside the Arrow kernel's scan stage: no exchange
    operator's output carries the html column."""
    plan = _plan(spark, "url_canonical_collapse")
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "html" not in m.group(0), m.group(0)
    # extraction is mapInPandas riding the scan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan


def test_cms_cells_are_map_side_combined(spark):
    """Token counts partial-agg before any exchange (the CMS build's
    map-side combine)."""
    plan = _plan(spark, "token_cms_topk")
    assert "partial_count" in plan, plan
