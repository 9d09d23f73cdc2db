"""CLI — the reference ``usp ls`` command (usp/cli/_ls.py:16-121 +
usp/cli/_util.py:32-76) over the wave engine: crawl a seed against a parquet
fetch store, print the tree (tab-indented, T3) or the flat page list (T4).

    python -m frontier.cli ls http://host0.example.com/ \
        --fetches /path/to/fetches.parquet --format tabtree
    python -m frontier.cli ls URL --fetches ... -f pages -u

Flag surface mirrors the reference (``-f/--format``, ``-r/--no-robots``,
``-k/--no-known``, ``-u/--strip-url``, ``-v``, ``-l/--log-file``); the
``--fetches`` store path replaces live HTTP (the offline boundary this
engine is built around), and ``--cpus`` sizes the local session.
"""

from __future__ import annotations

import argparse
import logging
import sys

from pyspark.sql import SparkSession, functions as F

LS_FORMATS = {
    "tabtree": "Sitemaps and pages, nested with tab indentation",
    "pages": "Flat list of pages, one per line",
}

_LOG_LEVELS = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}


def format_help(choices: dict[str, str], opt_help: str) -> str:
    """Choice help text (reference _util.py:6-17)."""
    h = f"{opt_help} (default: %(default)s)\nchoices:\n"
    for fmt, key in choices.items():
        h += f"  {fmt}: {key}\n"
    return h


def setup_logging(verbosity: int, log_path: str | None) -> None:
    """-v/-vv → INFO/DEBUG; with a log file, console output is suppressed
    (reference _util.py:71-76)."""
    log_level = _LOG_LEVELS.get(verbosity, logging.DEBUG)
    if log_path is not None:
        logging.basicConfig(level=log_level, filename=log_path)
    else:
        logging.basicConfig(level=log_level)


class CountAction(argparse.Action):
    """Capped count action (reference _util.py:32-68)."""

    def __init__(self, option_strings, dest, default=None, required=False,
                 help=None, max_count=None):
        super().__init__(option_strings=option_strings, dest=dest, nargs=0,
                         default=default, required=required, help=help)
        self.max_count = max_count

    def __call__(self, parser, namespace, values, option_string=None):
        count = getattr(namespace, self.dest, None) or 0
        if self.max_count:
            count = min(count, self.max_count)
        setattr(namespace, self.dest, count + 1)


def _strip_expr(col: str):
    """Column-level ``_strip_url`` (reference _ls.py:70-75): removeprefix of
    the row's own seed, then ensure a leading '/'. Multi-seed safe — the
    prefix is the ``seed`` column, not a constant."""
    stripped = F.when(
        F.col(col).startswith(F.col("seed")),
        F.expr(f"substring({col}, length(seed) + 1)"),
    ).otherwise(F.col(col))
    return F.when(
        stripped.startswith("/"), stripped
    ).otherwise(F.concat(F.lit("/"), stripped))


def _build_session(cpus: str) -> tuple[SparkSession, bool]:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("frontier-ls")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    ), True


def tabtree_lines(forest, strip: bool) -> "DataFrame":
    """Nested tabtree print order (reference _ls.py:82-94): each sitemap
    indented by depth, its pages below it at depth+1; root never stripped."""
    node_url = _strip_expr("url") if strip else F.col("url")
    node_url = F.when(F.col("depth") == 0, F.col("url")).otherwise(node_url)
    nodes = forest.nodes.select(
        "seed",
        F.col("path_key").alias("sort_key"),
        F.lit(None).cast("int").alias("seq"),
        F.concat(F.expr("repeat('\\t', depth)"), node_url).alias("line"),
    )
    page_url = _strip_expr("page_url") if strip else F.col("page_url")
    # join on (seed, path_key): path_key alone collides across seeds.
    # Pages sort under 'P.~': '~' (0x7E) > any digit, so a node's pages
    # print AFTER its whole sub-sitemap subtree ('P.0000…' descendants),
    # matching the reference's sub_sitemaps-first _output_sitemap_nested
    # when a node carries both pages and children.
    pages = forest.pages.join(
        forest.nodes.select("seed", "path_key", "depth"),
        ["seed", "path_key"],
    ).select(
        "seed",
        F.concat(F.col("path_key"), F.lit(".~")).alias("sort_key"),
        "seq",
        F.concat(F.expr("repeat('\\t', depth + 1)"), page_url).alias("line"),
    )
    return (
        nodes.unionByName(pages)
        .orderBy("seed", "sort_key", "seq")
        .select("line")
    )


def cmd_ls(args: argparse.Namespace) -> int:
    from .waves import sitemap_tree_for_homepages

    setup_logging(args.verbosity, args.log_file)
    spark, created = _build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fetches = spark.read.parquet(args.fetches)
    forest = sitemap_tree_for_homepages(
        spark,
        [args.url],
        fetches,
        use_robots=not args.no_robots,
        use_known_paths=not args.no_known,
    )

    strip = args.strip_url
    if args.format == "tabtree":
        rows = tabtree_lines(forest, strip).collect()
    else:  # pages (reference _ls.py:97-99)
        out = forest.all_pages()
        line = _strip_expr("page_url") if strip else F.col("page_url")
        rows = out.select(line.alias("line")).collect()

    for row in rows:
        sys.stdout.write(row.line + "\n")
    forest.unpersist()
    if created:
        spark.stop()
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="frontier")
    parser.add_argument("-V", "--version", action="version",
                        version="frontier-spark (usp-parity 1.8.1)")
    sub = parser.add_subparsers(dest="command", required=True)

    ls = sub.add_parser(
        "ls",
        help="List sitemap pages",
        description="crawl a fetch store, parse and list the sitemap structure",
        formatter_class=argparse.RawTextHelpFormatter,
    )
    ls.add_argument("url", type=str, help="URL of the site including protocol")
    ls.add_argument("--fetches", required=True, help="parquet fetch store path")
    ls.add_argument("-f", "--format", choices=LS_FORMATS, default="tabtree",
                    help=format_help(LS_FORMATS, "set output format"),
                    metavar="FORMAT")
    ls.add_argument("-r", "--no-robots", action="store_true",
                    help="don't discover sitemaps through robots.txt")
    ls.add_argument("-k", "--no-known", action="store_true",
                    help="don't discover sitemaps through well-known URLs")
    ls.add_argument("-u", "--strip-url", action="store_true",
                    help="strip the supplied URL from each page and sitemap URL")
    ls.add_argument("-v", "--verbose", action=CountAction, dest="verbosity",
                    default=0, max_count=2,
                    help="increase output verbosity (-v=INFO, -vv=DEBUG)")
    ls.add_argument("-l", "--log-file", type=str,
                    help="write log to this file and suppress console output")
    ls.add_argument("--cpus", default="4")
    ls.set_defaults(func=cmd_ls)
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
