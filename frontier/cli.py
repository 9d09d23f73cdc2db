"""CLI — the reference ``usp ls`` command (usp/cli/_ls.py) over the wave
engine: crawl seeds against a parquet fetch store, print the tree
(tab-indented, T3) or the flat page list (T4).

    python -m frontier.cli ls http://host0.example.com/ \
        --fetches /path/to/fetches.parquet --format tabtree
    python -m frontier.cli ls URL --fetches ... --format pages --strip-url-base
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession, functions as F


def _build_session(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("frontier-ls")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def cmd_ls(args: argparse.Namespace) -> int:
    from .waves import sitemap_tree_for_homepages

    spark = _build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fetches = spark.read.parquet(args.fetches)
    forest = sitemap_tree_for_homepages(
        spark,
        [args.url],
        fetches,
        use_robots=not args.no_robots,
        use_known_paths=not args.no_known_paths,
    )

    if args.format == "tabtree":
        # nested print: each sitemap indented by depth, its pages below it
        # (reference _ls.py:82-94)
        nodes = forest.nodes.select(
            "seed",
            "path_key",
            F.lit(0).alias("is_page"),
            F.lit(None).cast("int").alias("seq"),
            F.concat(F.expr("repeat('\\t', depth)"), F.col("url")).alias("line"),
        )
        pages = forest.pages.join(
            forest.nodes.select(F.col("path_key"), F.col("depth")),
            "path_key",
        ).select(
            "seed",
            "path_key",
            F.lit(1).alias("is_page"),
            "seq",
            F.concat(F.expr("repeat('\\t', depth + 1)"), F.col("page_url")).alias(
                "line"
            ),
        )
        rows = (
            nodes.unionByName(pages)
            .orderBy("seed", "path_key", "is_page", "seq")
            .select("line")
            .collect()
        )
    else:  # pages
        out = forest.all_pages().select("page_url")
        if args.strip_url_base:
            import re as _re

            prefix = _re.escape(args.url.rstrip("/"))
            stripped = F.regexp_replace("page_url", f"^{prefix}", "")
            out = out.select(
                F.concat(F.lit("/"), F.regexp_replace(stripped, "^/+", "")).alias(
                    "page_url"
                )
            )
        rows = out.withColumnRenamed("page_url", "line").collect()

    for row in rows:
        print(row.line)
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="frontier")
    sub = parser.add_subparsers(dest="command", required=True)

    ls = sub.add_parser("ls", help="crawl and list a site's sitemap tree")
    ls.add_argument("url", help="homepage URL seed")
    ls.add_argument("--fetches", required=True, help="parquet fetch store path")
    ls.add_argument("--format", choices=("tabtree", "pages"), default="tabtree")
    ls.add_argument("--no-robots", action="store_true")
    ls.add_argument("--no-known-paths", action="store_true")
    ls.add_argument("--strip-url-base", action="store_true")
    ls.add_argument("--cpus", default="4")
    ls.set_defaults(func=cmd_ls)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
