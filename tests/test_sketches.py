"""Estimator-quality tests for the sketch-summary operators.

The driver's DuckDB oracle gate proves the Spark and DuckDB renderings of
each sketch are bit-identical; these tests prove the sketches are also
*good estimators* — HLL within its published error band against exact
COUNT(DISTINCT), CMS never under-counting (and genuinely colliding at its
deliberately narrow width), nearest-rank quantiles equal to a NumPy
recomputation.
"""

from __future__ import annotations

import numpy as np

from frontier.datapipe import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def test_hll_matches_exact_distinct_within_error_band(spark):
    rows = REGISTRY["host_url_hll"].build(spark, SF_DIR).collect()
    assert rows, "HLL produced no hosts"
    # exact distinct per host over the same synthesized URL set
    exact = {
        r["host"]: r["exact"]
        for r in spark.sql(
            """
            SELECT source AS host,
                   COUNT(DISTINCT (doc_id * 40 + i) % 4096) AS exact
            FROM documents LATERAL VIEW explode(sequence(0, 39)) t AS i
            GROUP BY source
            """
        ).collect()
    }
    rel_errors = []
    for r in rows:
        true = exact[r["host"]]
        # raw-HLL band only (no linear counting implemented): the synth
        # corpus keeps per-host cardinality well above 5m/2 = 640
        assert true > 640, f"host {r['host']} fell into the LC band ({true})"
        err = abs(r["hll_est"] - true) / true
        rel_errors.append(err)
        # 1.04/sqrt(256) = 6.5% std error; 4 sigma is a generous per-host cap
        assert err < 0.26, f"{r['host']}: est={r['hll_est']} true={true}"
    assert float(np.mean(rel_errors)) < 0.10


def test_hll_registers_merge_like_partial_aggregation(spark):
    """Max-of-rho is associative: the sketch over the union equals the
    cell-wise max of per-slice sketches (this is what makes the groupBy
    partial agg a real distributed HLL merge)."""
    df = spark.sql(
        """
        WITH urls AS (
            SELECT source AS host, doc_id % 2 AS slice,
                   'http://' || source || '.example.com/page/'
                       || CAST((doc_id * 40 + i) % 4096 AS STRING) AS url
            FROM documents LATERAL VIEW explode(sequence(0, 39)) t AS i
        ),
        hashed AS (
            SELECT host, slice,
                   CAST(conv(substr(md5(url), 1, 14), 16, 10) AS BIGINT) AS h
            FROM urls
        ),
        regs AS (
            SELECT host, slice,
                   CAST(h DIV 281474976710656 AS INT) AS reg,
                   h % 281474976710656 AS rem
            FROM hashed
        ),
        per_slice AS (
            SELECT host, slice, reg,
                   MAX(CASE WHEN rem = 0 THEN 49
                            ELSE 49 - length(bin(rem)) END) AS m_j
            FROM regs GROUP BY host, slice, reg
        ),
        merged AS (
            SELECT host, reg, MAX(m_j) AS m_merged
            FROM per_slice GROUP BY host, reg
        ),
        direct AS (
            SELECT host, reg,
                   MAX(CASE WHEN rem = 0 THEN 49
                            ELSE 49 - length(bin(rem)) END) AS m_direct
            FROM regs GROUP BY host, reg
        )
        SELECT COUNT(*) AS mismatches
        FROM merged FULL OUTER JOIN direct USING (host, reg)
        WHERE m_merged IS DISTINCT FROM m_direct
        """
    )
    assert df.collect()[0]["mismatches"] == 0


def test_cms_never_undercounts_and_collides(spark):
    top = REGISTRY["token_cms_topk"].build(spark, SF_DIR).collect()
    assert len(top) == 20
    exact = {
        r["w"]: r["c"]
        for r in spark.sql(
            """
            SELECT w, COUNT(*) AS c
            FROM (SELECT explode(filter(split(lower(text), '[^a-z0-9]+'),
                                        x -> x <> '')) AS w
                  FROM documents)
            GROUP BY w
            """
        ).collect()
    }
    overcounts = 0
    for r in top:
        true = exact[r["token"]]
        assert r["cms_est"] >= true, (
            f"CMS undercounted {r['token']}: {r['cms_est']} < {true}"
        )
        if r["cms_est"] > true:
            overcounts += 1
    # vocab (31) > width (16): the pigeonhole guarantees collisions, and a
    # collision on both of a token's d=2 rows yields an overestimate — the
    # property CMS trades for its O(d*w) footprint. If every estimate were
    # exact the test data stopped exercising the sketch.
    assert overcounts > 0


def test_latency_quantiles_match_numpy_nearest_rank(spark):
    rows = REGISTRY["fetch_latency_quantiles"].build(spark, SF_DIR).collect()
    assert len(rows) == 16
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_host: dict[str, list[int]] = {}
    for e in events:
        host = f"h{e['user_id'] % 16}"
        by_host.setdefault(host, []).append(int(np.floor(e["value"] * 100 + 0.5)))
    for r in rows:
        lat = np.sort(np.array(by_host[r["host"]], dtype=np.int64))
        n = len(lat)
        assert r["n"] == n
        for p, col in ((0.50, "p50_c"), (0.95, "p95_c"), (0.99, "p99_c")):
            expect = int(lat[int(np.ceil(p * n)) - 1])
            assert r[col] == expect, (r["host"], col, r[col], expect)
        assert r["max_c"] == int(lat[-1])


def test_kmv_novelty_estimates_within_error_band(spark):
    """KMV set algebra vs the closed-form truth of the synthesized crawls
    (|A| = |B| = 10000, overlap 5000): per-sketch error ~1/sqrt(256) =
    6.25%, so generous 3-4 sigma bands; novelty is a difference of
    estimates and gets a wider band."""
    row = REGISTRY["crawl_novelty_kmv"].build(spark, SF_DIR).collect()[0]
    assert abs(row.est_a - 10000) / 10000 < 0.20
    assert abs(row.est_b - 10000) / 10000 < 0.20
    assert abs(row.est_union - 15000) / 15000 < 0.20
    assert abs(row.novelty_est - 5000) / 5000 < 0.40
    assert abs(row.jaccard_permille - 333) < 120
