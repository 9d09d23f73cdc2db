"""Two-parallelism scaling evidence (BASELINE.json north rule): run the
IDENTICAL frontier crawl at local[8] and local[32] on the same materialized
corpus, report throughput at both plus scaling efficiency
eff = (thr_32 / thr_8) / 4. Writes/updates BENCH/BASELINE.md.

    python scripts/bench_scaling.py [n_hosts]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark

N_LOW, N_HIGH = 8, 32


def run_crawl(cpus: int, corpus_path: str, n_hosts: int) -> dict:
    from bench import warmup_crawl
    from frontier.waves import sitemap_tree_for_homepages

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        corpus = spark.read.parquet(corpus_path)
        seeds = [f"http://host{i}.example.com/" for i in range(n_hosts)]
        # untimed JIT/worker warm-up (identical at both parallelism levels)
        warmup_crawl(spark, corpus, n_hosts)
        start = time.perf_counter()
        forest = sitemap_tree_for_homepages(
            spark, seeds, corpus, use_known_paths=False, store_urls_unique=True
        )
        n_pages = forest.pages.count()
        n_nodes = forest.nodes.count()
        elapsed = time.perf_counter() - start
        urls = n_pages + (n_nodes - n_hosts)
        return {
            "cpus": cpus,
            "seconds": round(elapsed, 2),
            "urls": urls,
            "urls_per_sec": round(urls / elapsed, 1),
        }
    finally:
        spark.stop()


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    leaves, pages = 4, 250

    workdir = f"/tmp/frontier_scaling_{os.getpid()}"
    corpus_path = os.path.join(workdir, "corpus")

    # materialize the corpus once (untimed, shared by both runs)
    spark = build_spark(N_HIGH)
    spark.sparkContext.setLogLevel("ERROR")
    from frontier.synth import synth_crawl_corpus

    synth_crawl_corpus(
        spark, n_hosts, leaves_per_host=leaves, pages_per_leaf=pages,
        partitions=128,
    ).write.mode("overwrite").parquet(corpus_path)
    spark.stop()

    try:
        low = run_crawl(N_LOW, corpus_path, n_hosts)
        high = run_crawl(N_HIGH, corpus_path, n_hosts)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    eff = (high["urls_per_sec"] / low["urls_per_sec"]) / (N_HIGH / N_LOW)
    result = {"low": low, "high": high, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH/BASELINE — frontier throughput + scaling efficiency\n\n"
            "Same job, same materialized corpus "
            f"({n_hosts} hosts x {leaves} leaf sitemaps x {pages} pages = "
            f"{low['urls']} URLs scheduled+parsed), two parallelism levels "
            "(north rule: N vs 4N executors evidenced in-sandbox as "
            "local[8] vs local[32]).\n\n"
            "| parallelism | wall s | URLs | URLs/sec |\n|---|---|---|---|\n"
            f"| local[{N_LOW}] | {low['seconds']} | {low['urls']} | {low['urls_per_sec']} |\n"
            f"| local[{N_HIGH}] | {high['seconds']} | {high['urls']} | {high['urls_per_sec']} |\n\n"
            f"**Scaling efficiency (thr_4N / thr_N) / 4 = {result['scaling_efficiency']}** "
            "(target >= 0.8 per BASELINE.json).\n\n"
            "Reference single-core baseline: ~43k URLs/s parse-only "
            "(BASELINE.md, BBC 2.6M URLs < 60 s).\n"
        )


if __name__ == "__main__":
    main()
