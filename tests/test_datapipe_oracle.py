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
