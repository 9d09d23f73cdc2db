"""Bucketed-table co-location: the write-once shuffle is really skipped.

Asserts the PHYSICAL plan property that makes bucketing matter at 10^10
rows: a bucketed table's side of an equi/anti-join has no Exchange at all,
so the giant table never re-shuffles across crawl rounds — only transient
wave-sized inputs do.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier.bucketed import open_bucketed, save_bucketed, seen_anti_join_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so Exchange counting is deterministic."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


@pytest.fixture()
def seen_table(spark, tmp_path):
    name = "seen_bucketed_t"
    urls = spark.range(0, 5000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url")
    )
    save_bucketed(urls, name, str(tmp_path / "seen"), "url", 8)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_seen_side_has_no_exchange(spark, seen_table, no_broadcast):
    candidates = spark.range(4000, 6000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url")
    )
    out = seen_anti_join_bucketed(spark, candidates, seen_table)
    plan = _plan(out)
    # exactly ONE exchange: the candidate side hashing into the seen
    # table's bucket layout; the seen scan feeds the join directly
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
    # correctness: matches a plain anti-join on the raw data
    plain = candidates.join(
        open_bucketed(spark, seen_table).select("url"), "url", "left_anti"
    )
    assert out.count() == 1000  # ids 5000..5999 are unseen
    assert sorted(r["url"] for r in out.collect()) == sorted(
        r["url"] for r in plain.collect()
    )


def test_unbucketed_baseline_pays_both_exchanges(spark, seen_table, tmp_path,
                                                 no_broadcast):
    # same rows written WITHOUT bucket metadata: both sides shuffle
    raw_path = str(tmp_path / "seen_raw")
    open_bucketed(spark, seen_table).write.parquet(raw_path)
    seen_raw = spark.read.parquet(raw_path)
    candidates = spark.range(4000, 6000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url")
    )
    plan = _plan(candidates.join(seen_raw, "url", "left_anti"))
    assert plan.count("Exchange") == 2, plan


def test_cobucketed_tables_join_with_zero_exchanges(spark, seen_table,
                                                    tmp_path, no_broadcast):
    # the compaction shape: seen set and its per-round delta, both bucketed
    # on url with the same bucket count -> the join has NO exchange at all
    delta_name = "seen_delta_bucketed_t"
    delta = spark.range(4500, 5500).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url"),
        F.lit(7).alias("round"),
    )
    try:
        save_bucketed(delta, delta_name, str(tmp_path / "delta"), "url", 8)
        joined = open_bucketed(spark, seen_table).join(
            open_bucketed(spark, delta_name), "url", "inner"
        )
        plan = _plan(joined)
        assert plan.count("Exchange") == 0, plan
        assert joined.count() == 500  # overlap 4500..4999
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {delta_name}")
