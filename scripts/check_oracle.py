"""Driver-like correctness harness: run every registered query on Spark at
sf0.01 and diff against its DuckDB oracle (row count + schema-width +
order-insensitive value hash). Used by tests/ and for local iteration.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from incremental_dagster_delta_spark.queries import QUERIES
from incremental_dagster_delta_spark.session import get_spark
from incremental_dagster_delta_spark.tables import TABLE_NAMES


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb_con(sf_dir)
    failures = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(spec.oracle)
            orows = [tuple(r) for r in rel.fetchall()]
            ocols = rel.columns
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = ok_cols and table_hash(srows, scols) == table_hash(orows, ocols)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS  {name}: {len(srows)} rows")
        else:
            failures += 1
            print(
                f"FAIL  {name}: rows {len(srows)} vs {len(orows)} match={ok_rows}; "
                f"cols match={ok_cols} ({scols} vs {ocols}); hash match={ok_hash}"
            )
            if ok_rows and ok_cols and srows:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                snorm = sorted("|".join(_norm_cell(r[i]) for i in order) for r in srows)
                onorm = sorted("|".join(_norm_cell(r[i]) for i in order) for r in orows)
                for a, b in zip(snorm, onorm):
                    if a != b:
                        print(f"      first diff:\n      spark : {a[:200]}\n      oracle: {b[:200]}")
                        break
    print(f"\n{'OK' if failures == 0 else 'FAILURES'}: {len(QUERIES)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
