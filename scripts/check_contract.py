"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at sf0.01;
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_contract.py [name ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from canal_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.notna().any() else None, (list, np.ndarray)):
            df[c] = s.map(lambda a: None if a is None else tuple(a))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def main(names: list[str]) -> int:
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    todo = names or list(qs)
    spark = get_spark(app="contract_check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    failures = []
    for name in todo:
        try:
            got = qs[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"  ~ {name:32s} rows-only: {len(got)} rows  cols={list(got.columns)}")
                continue
            exp = con.execute(oracles[name]).df()
            if sorted(got.columns) != sorted(exp.columns):
                raise AssertionError(f"schema: spark={sorted(got.columns)} duckdb={sorted(exp.columns)}")
            if len(got) != len(exp):
                raise AssertionError(f"rowcount: spark={len(got)} duckdb={len(exp)}")
            g, e = canon(got), canon(exp)
            if not g.equals(e):
                diff_cols = [c for c in g.columns if not g[c].equals(e[c])]
                sample = pd.concat(
                    [g[diff_cols].head(3).add_prefix("spark_"), e[diff_cols].head(3).add_prefix("duck_")],
                    axis=1,
                )
                raise AssertionError(f"values differ in {diff_cols}\n{sample}\ndtypes spark={g.dtypes.to_dict()} duck={e.dtypes.to_dict()}")
            print(f"  ✓ {name:32s} {len(got)} rows")
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"  ✗ {name}: {ex}")
            if "--trace" in sys.argv:
                traceback.print_exc()
    print(f"\n{len(todo) - len(failures)}/{len(todo)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main([a for a in sys.argv[1:] if not a.startswith("-")]))
