"""R9 — per-host politeness budgets + fetch priority queue (north rule).

The reference fetches sequentially with an optional inter-request sleep
(``RequestWaiter``, usp/web_client/abstract_client.py:223-253). At cluster
scale the analogue is: co-locate each host's URLs (range partition on
canonical host), order within host by (priority desc, lastmod desc), and cap
each host at its politeness budget per round. Mega-host skew is handled by
salting the rank computation: ranks are computed per (host, salt) bucket and
merged, so no single task ever holds a whole mega-host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def with_canonical_host(df: DataFrame, url_col: str = "page_url") -> DataFrame:
    """Lower-cased hostname as the politeness partition key (D2 analogue).

    Regex-extracted (:func:`frontier.urlnorm.host_expr`) — never throws on
    the malformed URLs a web corpus contains, and agrees with the robots
    engine's host derivation so rules, budgets and the plan all key on the
    same string."""
    from frontier.urlnorm import host_expr

    return df.withColumn("canonical_host", host_expr(url_col))


def fetch_plan(
    pages: DataFrame,
    budget_per_host: int,
    url_col: str = "page_url",
    salt_buckets: int = 0,
) -> DataFrame:
    """Next-round fetch plan: top-``budget_per_host`` URLs per host ordered by
    (priority desc, last_modified desc, url) — the north rule's priority
    queue.

    ``salt_buckets > 0`` enables mega-host skew handling: a two-level top-k —
    per (host, salt) bucket first (parallel, bounded state), then a cheap
    merge rank over at most ``salt_buckets * budget`` survivors per host.
    Both levels use the same total order, so the result is identical to the
    unsalted plan.
    """
    ordered = (F.col("priority").desc(), F.col("last_modified").desc_nulls_last(),
               F.col(url_col))
    df = with_canonical_host(pages, url_col)

    if salt_buckets > 0:
        df = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
        )
        bucket_rank = F.row_number().over(
            Window.partitionBy("canonical_host", "_salt").orderBy(*ordered)
        )
        df = (
            df.withColumn("_bucket_rank", bucket_rank)
            .filter(F.col("_bucket_rank") <= budget_per_host)
            .drop("_salt", "_bucket_rank")
        )

    rank = F.row_number().over(Window.partitionBy("canonical_host").orderBy(*ordered))
    return (
        df.withColumn("fetch_rank", rank)
        .filter(F.col("fetch_rank") <= budget_per_host)
    )


def host_budgets_report(plan: DataFrame) -> DataFrame:
    """Telemetry: per-host planned fetches + priority stats."""
    return plan.groupBy("canonical_host").agg(
        F.count("*").alias("n_planned"),
        F.max("priority").alias("max_priority"),
        F.min("fetch_rank").alias("first_rank"),
    )
