"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + sorted-column value equality. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        def conv(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return "<null>"
            if isinstance(v, Decimal):
                return str(v)
            if isinstance(v, float):
                # STRICT=1 → bit-exact float comparison (predicts the
                # driver's value hash); default keeps 9-sig-digit slack.
                if os.environ.get("STRICT"):
                    return float(v).hex()
                return f"{v:.9g}"
            if hasattr(v, "isoformat"):
                return v.isoformat()
            if isinstance(v, (list, tuple)):
                return repr(list(v))
            return str(v)
        df[col] = df[col].map(conv)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount spark={len(a)} duck={len(b)}")
            failures += 1
        elif list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())} differing rows; first:")
            idx = diff[diff].index[:3]
            for i in idx:
                print("  spark:", a.loc[i].to_dict())
                print("  duck :", b.loc[i].to_dict())
            failures += 1
        else:
            print(f"ok {name}: {len(a)} rows match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
