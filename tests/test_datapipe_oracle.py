"""Every REGISTRY operator vs its DuckDB oracle at sf0.001 — a pytest
replica of the driver's correctness gate (rowcount + sorted-value equality
after column-name sort), so regressions surface before the driver runs."""

import os
from decimal import Decimal

import duckdb
import pandas as pd
import pytest

from frontier.datapipe import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def conv(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if isinstance(v, Decimal):
            return str(v)
        if isinstance(v, float):
            return f"{v:.9g}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return repr(list(v))
        return str(v)

    for col in df.columns:
        df[col] = df[col].map(conv)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_query_matches_oracle(spark, duck, name):
    qd = REGISTRY[name]
    got = _normalize(qd.build(spark, SF_DIR).toPandas())
    assert len(got) > 0, f"{name} produced no rows at {SF_DIR}"
    if qd.oracle is None:
        return
    want = _normalize(duck.execute(qd.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want)


def test_sitemap_write_roundtrip_pagination(spark):
    """Writer pagination: 25 URLs/host at 10 URLs/file -> 3 files per host
    (10+10+5), every source row survives the XML round-trip exactly once,
    and records point at the file that carried them."""
    from frontier.datapipe import REGISTRY

    rows = REGISTRY["sitemap_write_roundtrip"].build(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 500  # one parsed record per source row
    by_file: dict[str, int] = {}
    for r in rows:
        by_file[r["sitemap_url"]] = by_file.get(r["sitemap_url"], 0) + 1
    assert len(by_file) == 60  # 20 hosts x 3 files
    sizes = sorted(by_file.values())
    assert sizes.count(5) == 20 and sizes.count(10) == 40
    # spot field fidelity on one known row (doc_id=0: priority 0.0,
    # lastmod 2025-01-01, changefreq always)
    r0 = next(r for r in rows if r["url"].endswith("/p0"))
    assert (r0["priority"], r0["last_modified"], r0["change_frequency"]) == (
        "0.0", "2025-01-01 00:00:00", "always"
    )
