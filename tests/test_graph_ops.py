"""Semantic tests for the graph-shaped pipeline operators: cluster
resolution (connected components), integer PageRank, frontier merge-upsert.
The driver oracle gate proves engine parity; these pin the SEMANTICS."""

from pyspark.sql import functions as F

from frontier.datapipe import REGISTRY, _PR_ROUNDS, _PR_SCALE
from frontier.dedup import connected_components

SF_DIR = "/root/testdata/sf0.001"


def test_cc_chain_converges_logarithmically(spark):
    """A 64-node chain has diameter 63; pointer jumping must resolve it in
    far fewer than 63 rounds (log2(63) ~ 6, allow slack) — the property that
    makes CC feasible on a chain-heavy 10^10-node dedup graph."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    out = connected_components(edges, max_rounds=10).collect()
    assert len(out) == 64
    assert all(r.component == 0 for r in out)


def test_cc_disjoint_components_and_min_label(spark):
    # two triangles + an isolated edge; components = min member id
    e = [(10, 11), (11, 12), (12, 10), (20, 21), (21, 22), (5, 7)]
    out = {
        r.node: r.component
        for r in connected_components(
            spark.createDataFrame(e, "src long, dst long")
        ).collect()
    }
    assert out == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 5: 5, 7: 5}


def test_cc_respects_lsh_candidates(spark):
    """Every LSH candidate pair must land in one cluster, and each cluster
    id must equal the minimum doc_id among its members."""
    pairs = REGISTRY["dedup_minhash_lsh"].build(spark, SF_DIR).collect()
    clusters = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["dedup_cluster_cc"].build(spark, SF_DIR).collect()
    }
    assert clusters, "expected non-empty clustering at sf0.001"
    for p in pairs:
        assert clusters[p.doc_a] == clusters[p.doc_b]
    by_cluster: dict[int, list[int]] = {}
    for doc, c in clusters.items():
        by_cluster.setdefault(c, []).append(doc)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_pagerank_integer_invariants(spark):
    rows = REGISTRY["host_pagerank"].build(spark, SF_DIR).collect()
    assert len(rows) == 40
    total = sum(r.rank_units for r in rows)
    # floor division leaks at most 1 unit per node per term per round plus
    # dangling-node leakage; ranks must stay positive and within the mass
    assert all(r.rank_units > 0 for r in rows)
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE * 0.80  # bounded leakage over _PR_ROUNDS rounds
    # the synthetic host graph must have VARIABLE degree — a permutation
    # graph converges to uniform ranks and tests nothing
    assert len({r.rank_units for r in rows}) > 1
    # deterministic: a second build is bit-identical (integer arithmetic)
    again = REGISTRY["host_pagerank"].build(spark, SF_DIR).collect()
    assert sorted((r.host_id, r.rank_units) for r in rows) == sorted(
        (r.host_id, r.rank_units) for r in again
    )
    assert _PR_ROUNDS >= 3


def test_merge_upsert_classification(spark):
    out = REGISTRY["frontier_merge_upsert"].build(spark, SF_DIR)
    rows = out.collect()
    assert {r.action for r in rows} <= {"insert", "update", "keep"}
    assert {r.action for r in rows} >= {"insert", "keep"}
    # rebuild the two sides independently and check the classification
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView("events")
    side = """
        SELECT 'http://h' || CAST(user_id AS STRING) || '.example.com/p'
               || CAST(event_id % 97 AS STRING) AS url,
               MAX(date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS')) AS ts
        FROM events WHERE event_id % 3 {op} 0 GROUP BY 1
    """
    existing = {r.url: r.ts for r in spark.sql(side.format(op="<>")).collect()}
    incoming = {r.url: r.ts for r in spark.sql(side.format(op="=")).collect()}
    assert len(rows) == len(set(existing) | set(incoming))
    for r in rows:
        if r.action == "insert":
            assert r.url not in existing and r.latest_ts == incoming[r.url]
        elif r.action == "update":
            assert incoming[r.url] > existing[r.url]
            assert r.latest_ts == incoming[r.url]
        else:
            assert r.latest_ts == existing[r.url]


def test_opic_cash_conservation_and_dangling(spark):
    """OPIC invariants: total mass (hist never decreases, cash stays within
    the initial grant modulo floor dust), dangling hosts keep receiving
    cash through the virtual node, and the run is bit-deterministic."""
    rows = REGISTRY["host_opic_priority"].build(spark, SF_DIR).collect()
    assert len(rows) == 40
    # cash is conserved up to floor-division dust: never exceeds the grant
    total_cash = sum(r.cash_units for r in rows)
    assert 0 < total_cash <= _PR_SCALE
    assert total_cash >= _PR_SCALE * 0.80
    # every host was visited every round -> hist = sum of its past cash > 0
    assert all(r.hist_units > 0 for r in rows)
    assert all(
        r.importance_units == r.hist_units + r.cash_units for r in rows
    )
    # the graph has dangling hosts (dst-only); the virtual node must have
    # routed cash back to them, so no host starves to zero cash
    assert all(r.cash_units > 0 for r in rows)
    # cash differentiates hosts (a uniform result would test nothing)
    assert len({r.cash_units for r in rows}) > 1
    again = REGISTRY["host_opic_priority"].build(spark, SF_DIR).collect()
    assert sorted((r.host_id, r.cash_units, r.hist_units) for r in rows) == \
        sorted((r.host_id, r.cash_units, r.hist_units) for r in again)


def test_hits_invariants(spark):
    """HITS: L1 renormalization keeps each vector's total at ~SCALE every
    round (floor leaks at most 1 unit per node), scores are non-negative,
    both vectors are non-uniform on the variable-degree synth graph, and
    the build is deterministic (exact integer arithmetic)."""
    rows = REGISTRY["host_hits_scores"].build(spark, SF_DIR).collect()
    assert len(rows) == 40
    for col in ("auth_units", "hub_units"):
        vals = [r[col] for r in rows]
        assert all(v >= 0 for v in vals)
        # floor(SCALE*raw/S) loses < 1 unit per node: total in (SCALE-n, SCALE]
        assert _PR_SCALE - 40 < sum(vals) <= _PR_SCALE, (col, sum(vals))
        assert len(set(vals)) > 1, f"{col} degenerated to uniform"
    again = REGISTRY["host_hits_scores"].build(spark, SF_DIR).collect()
    assert sorted((r.host_id, r.auth_units, r.hub_units) for r in rows) == \
        sorted((r.host_id, r.auth_units, r.hub_units) for r in again)
