"""One-off crawl profiler: per-wave timings + stage task widths at a given
core count. Usage: python scripts/profile_crawl.py [cpus] [n_hosts]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["FRONTIER_WAVE_TIMING"] = "1"

from bench import SCRATCH, build_spark


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    corpus_path = os.path.join(SCRATCH or "/tmp", f"profile_corpus_{n_hosts}")

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from frontier.synth import synth_crawl_corpus
    from frontier.waves import (
        cluster_fetch_store,
        prepare_fetches,
        sitemap_tree_for_homepages,
    )

    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        cluster_fetch_store(
            synth_crawl_corpus(
                spark, n_hosts, leaves_per_host=4, pages_per_leaf=250,
                partitions=256,
            ),
            corpus_path,
        )

    corpus = prepare_fetches(
        spark.read.parquet(corpus_path), cache=False, resolve_redirects=False
    )
    seeds = [f"http://host{i}.example.com/" for i in range(n_hosts)]

    def crawl(tag: str) -> None:
        t0 = time.perf_counter()
        forest = sitemap_tree_for_homepages(
            spark, seeds, corpus,
            use_known_paths=False, store_urls_unique=True,
            fetches_prepared=True,
        )
        t1 = time.perf_counter()
        print(f"[{tag}] waves done {t1 - t0:.2f}s", file=sys.stderr)
        n_pages = forest.pages.count()
        t2 = time.perf_counter()
        print(f"[{tag}] pages.count()={n_pages} {t2 - t1:.2f}s", file=sys.stderr)
        n_nodes = forest.nodes.count()
        t3 = time.perf_counter()
        print(f"[{tag}] nodes.count()={n_nodes} {t3 - t2:.2f}s", file=sys.stderr)
        print(f"[{tag}] TOTAL {t3 - t0:.2f}s", file=sys.stderr)
        forest.unpersist()

    crawl("warmup")
    crawl("timed")
    spark.stop()


if __name__ == "__main__":
    main()
