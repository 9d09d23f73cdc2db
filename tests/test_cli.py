"""CLI tests — port of the reference CLI suite
(/root/reference/tests/cli/test_ls.py, test_root.py, conftest.py:8-21) to the
wave engine's ``frontier ls``: argparse matrix via mocks, plus golden output
checks the reference can't do offline (we have a deterministic fetch store)."""

import shlex
from unittest.mock import MagicMock

import pytest

from frontier.cli import main as cli_main
from frontier.synth import TEST_BASE_URL as BASE, reference_site_fetches


@pytest.fixture
def run_cmd(capsys):
    def _run_cmd(args, expected_exit=0):
        argv = shlex.split(args)
        try:
            code = cli_main(argv)
        except SystemExit as excinfo:  # argparse help/usage paths
            code = excinfo.code
        assert code == expected_exit
        outerr = capsys.readouterr()
        return outerr.out.rstrip(), outerr.err.rstrip()

    return _run_cmd


@pytest.fixture(scope="module")
def store_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "fetches")
    reference_site_fetches(spark).write.mode("overwrite").parquet(path)
    return path


# --- argparse matrix (reference tests/cli/test_ls.py:4-14, test_root.py) ------


def test_root_command_usage_error(run_cmd):
    out, err = run_cmd("ls", expected_exit=2)
    assert "usage: frontier ls" in err


@pytest.mark.parametrize("flag", ["-h", "--help"])
def test_help(run_cmd, flag):
    out, _ = run_cmd(f"ls {flag}")
    assert out.startswith("usage: frontier ls")


def test_root_help(run_cmd):
    out, _ = run_cmd("-h")
    assert out.startswith("usage: frontier")


# --- crawl-arg forwarding (test_ls.py:36-66), via mock like the reference ----


@pytest.fixture
def mock_forest(monkeypatch):
    import frontier.waves as waves

    mock = MagicMock()
    mock.return_value.all_pages.return_value.select.return_value.collect.return_value = []
    monkeypatch.setattr(waves, "sitemap_tree_for_homepages", mock)
    return mock


@pytest.mark.parametrize(
    ("robot_arg", "exp_robot"), [("", True), ("-r", False), ("--no-robots", False)]
)
@pytest.mark.parametrize(
    ("known_arg", "exp_known"), [("", True), ("-k", False), ("--no-known", False)]
)
def test_discovery_args(
    run_cmd, mock_forest, store_path, robot_arg, exp_robot, known_arg, exp_known
):
    run_cmd(f"ls {BASE} --fetches {store_path} -f pages {robot_arg} {known_arg}")
    assert mock_forest.call_count == 1
    kwargs = mock_forest.call_args.kwargs
    assert kwargs["use_robots"] is exp_robot
    assert kwargs["use_known_paths"] is exp_known
    assert mock_forest.call_args.args[1] == [BASE]


@pytest.mark.parametrize(
    ("v_arg", "exp_lvl"),
    [("", 0), ("-v", 1), ("--verbose", 1), ("-vv", 2), ("--verbose --verbose", 2)],
)
def test_log_verbosity(run_cmd, monkeypatch, mock_forest, store_path, v_arg, exp_lvl):
    import frontier.cli as cli

    mock_logging = MagicMock()
    monkeypatch.setattr(cli, "setup_logging", mock_logging)
    run_cmd(f"ls {BASE} --fetches {store_path} -f pages {v_arg}")
    mock_logging.assert_called_once_with(exp_lvl, None)


def test_log_file_arg(run_cmd, monkeypatch, mock_forest, store_path):
    import frontier.cli as cli

    mock_logging = MagicMock()
    monkeypatch.setattr(cli, "setup_logging", mock_logging)
    run_cmd(f"ls {BASE} --fetches {store_path} -f pages -l log.txt")
    mock_logging.assert_called_once_with(0, "log.txt")


# --- golden output over the reference fixture site ---------------------------
# Expected shapes derive from the ported golden tree
# (/root/reference/tests/tree/test_basic.py:23-133): 7 sitemap nodes + root,
# 6 pages with the bar.html cross-sitemap duplicate retained.

PAGES = [
    f"{BASE}/about.html",
    f"{BASE}/contact.html",
    f"{BASE}/news/foo.html",
    f"{BASE}/news/bar.html",
    f"{BASE}/news/bar.html",
    f"{BASE}/news/baz.html",
]


def test_ls_pages_golden(run_cmd, store_path):
    out, _ = run_cmd(f"ls {BASE} --fetches {store_path} -f pages")
    assert out.splitlines() == PAGES


@pytest.mark.parametrize("flag", ["-u", "--strip-url"])
def test_ls_pages_strip_golden(run_cmd, store_path, flag):
    """removeprefix parity (reference _ls.py:70-75): the seed (with trailing
    slash) is removed and a leading '/' restored."""
    out, _ = run_cmd(f"ls {BASE} --fetches {store_path} -f pages {flag}")
    assert out.splitlines() == [
        "/about.html",
        "/contact.html",
        "/news/foo.html",
        "/news/bar.html",
        "/news/bar.html",
        "/news/baz.html",
    ]


def test_ls_tabtree_golden(run_cmd, store_path):
    out, _ = run_cmd(f"ls {BASE} --fetches {store_path}")
    assert out.splitlines() == [
        f"{BASE}/",
        f"\t{BASE}/robots.txt",
        f"\t\t{BASE}/sitemap_pages.xml",
        f"\t\t\t{BASE}/about.html",
        f"\t\t\t{BASE}/contact.html",
        f"\t\t{BASE}/sitemap_news_index_1.xml",
        f"\t\t\t{BASE}/sitemap_news_1.xml",
        f"\t\t\t\t{BASE}/news/foo.html",
        f"\t\t\t\t{BASE}/news/bar.html",
        f"\t\t\t{BASE}/sitemap_news_index_2.xml",
        f"\t\t\t\t{BASE}/sitemap_news_2.xml",
        f"\t\t\t\t\t{BASE}/news/bar.html",
        f"\t\t\t\t\t{BASE}/news/baz.html",
        f"\t\t\t\t{BASE}/sitemap_news_missing.xml",
    ]


def test_ls_tabtree_strip_golden(run_cmd, store_path):
    """Tabtree with -u strips every URL except the depth-0 root
    (reference _ls.py:82-88)."""
    out, _ = run_cmd(f"ls {BASE} --fetches {store_path} -u")
    assert out.splitlines() == [
        f"{BASE}/",
        "\t/robots.txt",
        "\t\t/sitemap_pages.xml",
        "\t\t\t/about.html",
        "\t\t\t/contact.html",
        "\t\t/sitemap_news_index_1.xml",
        "\t\t\t/sitemap_news_1.xml",
        "\t\t\t\t/news/foo.html",
        "\t\t\t\t/news/bar.html",
        "\t\t\t/sitemap_news_index_2.xml",
        "\t\t\t\t/sitemap_news_2.xml",
        "\t\t\t\t\t/news/bar.html",
        "\t\t\t\t\t/news/baz.html",
        "\t\t\t\t/sitemap_news_missing.xml",
    ]


def test_tabtree_mixed_node_pages_after_subtree(spark):
    """A node carrying BOTH pages and child sitemaps prints its sub-sitemap
    subtree first, pages last — the reference's _output_sitemap_nested
    nesting (_ls.py:82-94). No parser emits such a node today; the sort-key
    contract is pinned here directly against a hand-built forest."""
    from types import SimpleNamespace

    from frontier.cli import tabtree_lines

    seed = "http://x.com/"
    nodes = spark.createDataFrame(
        [
            (seed, "0000000", 0, "http://x.com/sitemap_index.xml"),
            (seed, "0000000.0000000", 1, "http://x.com/child.xml"),
        ],
        "seed string, path_key string, depth int, url string",
    )
    pages = spark.createDataFrame(
        [
            # pages on the MIXED root node (it also has a child sitemap)
            (seed, "0000000", 0, "http://x.com/root-page-a.html"),
            (seed, "0000000", 1, "http://x.com/root-page-b.html"),
            # pages on the leaf child
            (seed, "0000000.0000000", 0, "http://x.com/leaf-page.html"),
        ],
        "seed string, path_key string, seq int, page_url string",
    )
    forest = SimpleNamespace(nodes=nodes, pages=pages)
    lines = [r.line for r in tabtree_lines(forest, strip=False).collect()]
    assert lines == [
        "http://x.com/sitemap_index.xml",
        "\thttp://x.com/child.xml",
        "\t\thttp://x.com/leaf-page.html",
        "\thttp://x.com/root-page-a.html",
        "\thttp://x.com/root-page-b.html",
    ]
