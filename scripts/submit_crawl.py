"""spark-submit job entry for the frontier engine (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

The engine ships as a plain package zip — no repo checkout on the cluster:

    cd /root/repo && zip -qr /tmp/frontier.zip frontier
    spark-submit --master <cluster> --py-files /tmp/frontier.zip \\
        scripts/submit_crawl.py --n-hosts 24000 \\
        --checkpoint-dir hdfs:///crawl/ckpt --output hdfs:///crawl/plan

With no real cluster in this sandbox, ``scripts/spark_submit_smoke.sh``
exercises the identical packaging path on ``local[4]`` (imports resolve
from the zip, not the repo).

The job: synthesize (or read) a fetch store, run the end-to-end
``crawl_fetch_plan`` (sitemap discovery → RFC 9309 robots rules →
Crawl-delay budgets → salted priority queue), write the plan, print a
one-line JSON metrics record.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-hosts", type=int, default=8)
    ap.add_argument("--leaves-per-host", type=int, default=2)
    ap.add_argument("--pages-per-leaf", type=int, default=25)
    ap.add_argument("--store", help="existing fetch-store parquet path "
                    "(default: synthesize deterministically)")
    ap.add_argument("--checkpoint-dir", help="shared-FS dir for wave "
                    "snapshots + page sink (required on a non-local master)")
    ap.add_argument("--output", required=True, help="plan parquet output")
    ap.add_argument("--round-seconds", type=float, default=30.0)
    ap.add_argument("--default-budget", type=int, default=12)
    ap.add_argument("--salt-buckets", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from frontier.robots import crawl_fetch_plan
    from frontier.synth import synth_crawl_corpus

    spark = SparkSession.builder.appName("frontier-crawl-plan").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.store:
        store = spark.read.parquet(args.store)
    else:
        store = synth_crawl_corpus(
            spark, args.n_hosts, args.leaves_per_host, args.pages_per_leaf,
            robots_rules=True,
        )
    seeds = [f"http://host{i}.example.com/" for i in range(args.n_hosts)]

    start = time.perf_counter()
    plan = crawl_fetch_plan(
        spark, seeds, store,
        round_seconds=args.round_seconds,
        default_budget=args.default_budget,
        salt_buckets=args.salt_buckets,
        use_known_paths=False,
        checkpoint_dir=args.checkpoint_dir,
    )
    plan.write.mode("overwrite").parquet(args.output)
    elapsed = time.perf_counter() - start

    n_planned = spark.read.parquet(args.output).count()
    print(json.dumps({
        "job": "crawl_fetch_plan",
        "n_hosts": args.n_hosts,
        "n_planned": n_planned,
        "seconds": round(elapsed, 2),
        "output": args.output,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
